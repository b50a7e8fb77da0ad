"""Property-based equivalence for the llmprep4 collapse rewrites:
on RANDOM duplicate-heavy corpora, the probe-gated text-collapse path
must produce byte-identical output to the direct (passthrough) path —
collapse is an optimization, never a semantic change. Hypothesis
generates small word-soup corpora with forced exact duplicates (so
shingles, bands, and spans genuinely collide), both paths run against
the same on-disk fixture, and rows are compared exactly (doubles to
1e-9, far tighter than the gate's 6-decimal rounding)."""

from __future__ import annotations

import os

import hypothesis.strategies as st
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings

import node_gedcom_graph_spark.operators.dedup as dd
import node_gedcom_graph_spark.operators.llmprep4 as l4

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@st.composite
def corpus(draw):
    n_base = draw(st.integers(3, 6))
    base = [
        " ".join(
            draw(
                st.lists(st.sampled_from(VOCAB), min_size=5, max_size=40)
            )
        )
        for _ in range(n_base)
    ]
    docs = []
    n_docs = draw(st.integers(6, 12))
    for i in range(n_docs):
        if draw(st.booleans()):  # duplicate an existing base text
            text = draw(st.sampled_from(base))
        else:
            text = " ".join(
                draw(
                    st.lists(st.sampled_from(VOCAB), min_size=5, max_size=40)
                )
            )
        docs.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en",
                "source": draw(st.sampled_from(["src0", "src1", "src2"])),
                "n_chars": len(text),
            }
        )
    return docs


def _write_fixture(tmpdir: str, docs: list[dict]) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(docs), os.path.join(tmpdir, "documents.parquet")
    )
    return tmpdir


def _rows(df) -> list[tuple]:
    out = []
    for r in df.collect():
        row = []
        for v in r:
            row.append(round(v, 9) if isinstance(v, float) else v)
        out.append(tuple(row))
    return sorted(out, key=repr)


OPS = [
    "boilerplate_span_removal",
    "dsir_importance_weights",
    "quality_classifier_logit",
    "dedup_minhash_incremental",
    "decontaminate_ngram_bloom",
    # rides dedup's probe bound (_ngram_jaccard_rep_pairs), patched below
    "split_leakage_near_dup",
    "curation_funnel_report",
    "dedup_threshold_calibration",
]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus())
def test_collapse_path_equals_passthrough(spark, tmp_path_factory, docs):
    sf_dir = _write_fixture(
        str(tmp_path_factory.mktemp("llmprep4prop")), docs
    )
    orig_l4, orig_dd = l4.DUP_COLLAPSE_MIN_EXTRA, dd.DUP_COLLAPSE_MIN_EXTRA
    try:
        for name in OPS:
            fn = getattr(l4, name)
            # force the DIRECT path (probe can never exceed the bound)
            l4.DUP_COLLAPSE_MIN_EXTRA = dd.DUP_COLLAPSE_MIN_EXTRA = 10**9
            direct = _rows(fn(spark, sf_dir))
            # force the COLLAPSED path (any duplication engages it)
            l4.DUP_COLLAPSE_MIN_EXTRA = dd.DUP_COLLAPSE_MIN_EXTRA = -1
            collapsed = _rows(fn(spark, sf_dir))
            assert collapsed == direct, name
    finally:
        l4.DUP_COLLAPSE_MIN_EXTRA = orig_l4
        dd.DUP_COLLAPSE_MIN_EXTRA = orig_dd
