"""Unit tests for the LLM-prep operators: the positive PII path the
zero-hit corpus oracle can't exercise, quantization round-trip
properties, and split determinism/leakage-safety."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pii_redact_positive_paths(spark):
    from node_gedcom_graph_spark.operators.llmprep import redact_pii

    rows = [
        ("mail me at John.Doe+spam@Example.COM please",),
        ("server at 10.0.254.3 responded",),
        ("card 4111111119 on file",),
        # email wins over the digit run inside it; short digit runs stay.
        ("a12345b@host.org and pin 123456 stay-partial",),
        ("clean text with no identifiers at all",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r.red for r in df.select(redact_pii(F.col("text")).alias("red")).collect()]
    assert got[0] == "mail me at [PII] please"
    assert got[1] == "server at [PII] responded"
    assert got[2] == "card [PII] on file"
    # 123456 is only 6 digits — below the digit-run floor, kept.
    assert got[3] == "[PII] and pin 123456 stay-partial"
    assert got[4] == rows[4][0]


def test_quantize_int8_round_trip_properties(spark):
    """Reconstruction error of symmetric int8 is bounded by scale/2 per
    element => per-row MSE <= (scale/2)^2; and an all-zero vector must
    not divide by zero."""
    from node_gedcom_graph_spark.operators import all_queries
    import node_gedcom_graph_spark.operators.llmprep as L
    import node_gedcom_graph_spark.sources.tables as T

    rows = [
        (1, [1.0, -0.5, 0.25, 127.0], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 1),  # zero vector: scale 0, sse 0
        (3, [-2.0, 2.0, -2.0, 2.0], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = T.load_table
    all_queries()  # import every module before patching (binding capture)
    try:
        T.load_table = lambda s, d, name: emb  # noqa: E731
        L.load_table = T.load_table
        out = {r.label: r for r in L.embedding_quantize_int8(spark, "x").collect()}
    finally:
        T.load_table = orig
        L.load_table = orig
    # label 1 is the zero vector alone: scale and mse exactly 0.
    assert out[1].avg_scale == 0.0 and out[1].avg_mse == 0.0
    # max per-element error is scale/2 => mse <= scale^2/4 for any row;
    # the largest scale in label 0 is 127/127 = 1.0.
    assert out[0].max_mse <= (1.0 / 2) ** 2 + 1e-12
    assert out[0].avg_mse >= 0.0


def test_split_is_deterministic_and_leakage_safe(spark):
    """Same normalized text => same split regardless of formatting; the
    three splits partition the corpus and roughly follow 80/10/10."""
    from node_gedcom_graph_spark.operators.llmprep import (
        split_train_valid_test,
    )
    from node_gedcom_graph_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    out = split_train_valid_test(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == n_docs
    assert 0.60 <= by_split.get("train", 0) / n_docs <= 0.95
    for s in ("valid", "test"):
        assert by_split.get(s, 0) / n_docs <= 0.25

    # Leakage-safety: a doc and its formatting-mangled twin co-assign.
    from node_gedcom_graph_spark.functions.scalar import normalize_text

    docs = load_table(spark, sf, "documents").limit(20)
    mangled = docs.select(
        F.upper(F.regexp_replace("text", " ", "  ")).alias("text")
    )
    key = F.md5(normalize_text(F.col("text")))
    b = F.substring(key, 1, 2)
    split_expr = (
        F.when(b < "cc", "train").when(b < "e6", "valid").otherwise("test")
    )
    a = sorted(r[0] for r in docs.select(split_expr).collect())
    m = sorted(r[0] for r in mangled.select(split_expr).collect())
    assert a == m


def test_vocab_topk_rank_contract(spark):
    from node_gedcom_graph_spark.operators.llmprep import token_vocab_topk

    rows = token_vocab_topk(spark, SF_DIR).collect()
    assert rows, "vocab must be non-empty"
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks) == list(range(1, len(rows) + 1))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_tfidf_every_source_gets_five(spark):
    from node_gedcom_graph_spark.operators.llmprep import (
        tfidf_top_source_terms,
    )

    rows = tfidf_top_source_terms(spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r.rank)
    for src, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_chunk_overlap_tiling_contract(spark):
    """Chunks tile each document: stride-spaced indices 0..ceil(len/150)-1,
    every chunk but the last is exactly 200 chars, consecutive chunks
    overlap by 50 (verified on reconstructed text), and chunk_md5 matches
    a locally computed md5 of the same substring."""
    import hashlib
    import math

    from node_gedcom_graph_spark.operators.llmprep import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk_overlap,
    )

    sf = "/root/testdata/sf0.001"
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    rows = doc_chunk_overlap(spark, sf).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs.items():
        if not text:
            assert doc_id not in per
            continue
        chunks = sorted(per[doc_id], key=lambda r: r.chunk_idx)
        n_expected = math.ceil(len(text) / CHUNK_STRIDE)
        assert [c.chunk_idx for c in chunks] == list(range(n_expected))
        for c in chunks:
            sub = text[c.chunk_idx * CHUNK_STRIDE :][:CHUNK_SIZE]
            assert c.chunk_len == len(sub)
            assert c.chunk_md5 == hashlib.md5(sub.encode()).hexdigest()


def test_chunk_overlap_property_random_unicode(spark):
    """Property: for arbitrary unicode documents (including multi-byte
    and empty strings), the chunker emits exactly the pure-Python
    reference decomposition — same indices, lengths, and md5s computed
    over UTF-8 bytes of codepoint slices (pins Spark's
    character-not-byte substring semantics)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from node_gedcom_graph_spark.operators.llmprep import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk_overlap,
    )

    def reference(text):
        return [
            (
                i // CHUNK_STRIDE,
                hashlib.md5(text[i : i + CHUNK_SIZE].encode()).hexdigest(),
                len(text[i : i + CHUNK_SIZE]),
            )
            for i in range(0, len(text), CHUNK_STRIDE)
        ]

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.text(min_size=0, max_size=700),
            min_size=1,
            max_size=30,
        )
    )
    def check(texts):
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df = spark.createDataFrame(
                [(i, t, "xx", "src", len(t)) for i, t in enumerate(texts)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            got = {}
            for r in doc_chunk_overlap(spark, d).collect():
                got.setdefault(r.doc_id, []).append(
                    (r.chunk_idx, r.chunk_md5, r.chunk_len)
                )
            for i, t in enumerate(texts):
                assert sorted(got.get(i, [])) == sorted(reference(t)), (
                    f"doc {i!r} len {len(t)}"
                )

    check()
