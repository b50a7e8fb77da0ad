"""Pure-Python differential tests for the winnowing sketch and the
smoothed bigram LM (§5.3 strategy — independent reimplementations)."""

import hashlib
import math
import re
from collections import Counter

from node_gedcom_graph_spark.operators.textstats import (
    BIGRAM_ALPHA,
    WINNOW_KGRAM,
    WINNOW_WINDOW,
    doc_winnowing_fingerprints,
    text_bigram_logprob,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(text: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()


def test_winnowing_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {}
    for d in docs:
        t = _norm(d.text)
        n = len(t) - WINNOW_KGRAM + 1
        if n < 1:
            continue
        hashes = [
            hashlib.md5(t[p : p + WINNOW_KGRAM].encode()).hexdigest()
            for p in range(n)
        ]
        sels = [
            min(hashes[p : p + WINNOW_WINDOW])
            for p in range(n - WINNOW_WINDOW + 1)
        ]
        expected[d.doc_id] = (
            n,
            len(set(sels)),
            min(sels) if sels else None,
        )
    got = {
        r.doc_id: (r.n_kgrams, r.n_fingerprints, r.min_fingerprint)
        for r in doc_winnowing_fingerprints(spark, SF_DIR).collect()
    }
    assert got == expected


def test_winnow_density_bound(spark):
    """Winnowing guarantee: selected-set density is at most 1 per
    window start and at least 1 per WINNOW_WINDOW consecutive
    positions -> n_fingerprints <= full windows and >= full_windows /
    WINNOW_WINDOW (each selection can be shared by at most w
    consecutive windows)."""
    for r in doc_winnowing_fingerprints(spark, SF_DIR).collect():
        full_windows = r.n_kgrams - WINNOW_WINDOW + 1
        if full_windows < 1:
            continue
        assert 1 <= r.n_fingerprints <= full_windows
        assert r.n_fingerprints >= math.ceil(full_windows / WINNOW_WINDOW)


def test_bigram_logprob_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per_doc = {}
    cb = Counter()
    vocab = set()
    for d in docs:
        toks = re.findall(r"[a-z0-9]+", (d.text or "").lower())
        vocab.update(toks)
        bis = list(zip(toks, toks[1:]))
        if bis:
            per_doc[d.doc_id] = bis
            cb.update(bis)
    cu = Counter()
    for (a, _), c in cb.items():
        cu[a] += c
    V = len(vocab)
    got = {r.doc_id: r for r in text_bigram_logprob(spark, SF_DIR).collect()}
    assert set(got) == set(per_doc)
    for doc_id, bis in per_doc.items():
        nll = [
            -math.log((cb[b] + BIGRAM_ALPHA) / (cu[b[0]] + BIGRAM_ALPHA * V))
            for b in bis
        ]
        r = got[doc_id]
        assert r.n_bigrams == len(bis)
        assert abs(r.avg_nll - sum(nll) / len(nll)) < 1e-9
