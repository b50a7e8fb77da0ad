"""Semantic pins for the retrieval-quality eval: recall@k of the two
pruned-ANN geometries (SRP buckets, fixed-centroid IVF cells) against
the exact brute-force top-k ground truth."""

from __future__ import annotations

from node_gedcom_graph_spark.operators.similarity import (
    RECALL_K,
    retrieval_recall_at_k,
    topk_cosine,
)
from node_gedcom_graph_spark.sources.tables import load_table
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# One 4-bit SRP band / one of 16 IVF cells both prune candidates to
# ~1/16 of the corpus, so a method no better than random bucketing
# would score ~0.0625 mean recall. The floors pin "measurably better
# than chance" per method (observed at sf0.001/sf0.01: srp ~0.13-0.14,
# ivf ~0.19-0.20) without overfitting the fixture.
RECALL_FLOORS = {"srp": 0.08, "ivf": 0.12}


def test_recall_floor_and_row_invariants(spark):
    rows = retrieval_recall_at_k(spark, SF_DIR).collect()
    assert rows, "query panel must be non-empty"
    # one row per (method, exact-side query) = every vec_id % 4 == 0
    n_queries = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .count()
    )
    assert len(rows) == 2 * n_queries
    for r in rows:
        assert r.method in RECALL_FLOORS
        assert 0 <= r.hits <= min(r.ann_candidates, RECALL_K)
        assert 0 <= r.ann_candidates <= RECALL_K
        assert abs(r.recall_at_k - r.hits / RECALL_K) < 1e-12
    for method, floor in RECALL_FLOORS.items():
        rec = [r.recall_at_k for r in rows if r.method == method]
        assert len(rec) == n_queries
        mean_recall = sum(rec) / len(rec)
        assert mean_recall >= floor, (method, mean_recall)


def test_recall_hits_are_true_intersections(spark):
    """Recompute the hit counts from the underlying top-k sets — the
    eval must report exactly |exact ∩ ann| per (method, query)."""
    from node_gedcom_graph_spark.operators.similarity import (
        _ivf_fixed_scored,
        _srp_scored,
    )
    from pyspark.sql import Window as W

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = topk_cosine(
        emb, emb.filter(F.col("vec_id") % 4 == 0), k=RECALL_K
    )
    by_query = {}
    for r in exact.collect():
        by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {
        (r.method, r.query_id): r
        for r in retrieval_recall_at_k(spark, SF_DIR).collect()
    }
    assert {q for (_, q) in got} == set(by_query)

    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    for method, scored in (
        ("srp", _srp_scored(spark, SF_DIR)),
        ("ivf", _ivf_fixed_scored(spark, SF_DIR)),
    ):
        ann = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= RECALL_K)
        )
        ann_by_query = {}
        for r in ann.collect():
            ann_by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
        for qid, truth in by_query.items():
            row = got[(method, qid)]
            expect = len(truth & ann_by_query.get(qid, set()))
            assert row.hits == expect, (method, qid)


# ---------------------------------------------- production IVF geometry (r7)

# Measured means at sf0.001 (deterministic end-to-end): ivf_flat 0.520,
# ivf_pq_refine 0.382, ivf_pq_adc 0.153. Floors sit ~25-35% below the
# measurement — failures mean a real geometry/kernel regression, not
# noise (there is no randomness anywhere in the pipeline). The absolute
# levels reflect the NEAR-UNIFORM fixture embeddings (cell pruning and
# a 4x16-entry codebook both lose more on noise than on real clumpy
# corpora); the pinned ORDERING flat > refine > adc is the structural
# claim.
SCALED_FLOORS = {"ivf_flat": 0.40, "ivf_pq_refine": 0.25, "ivf_pq_adc": 0.10}


def test_scaled_ivf_geometry_is_sublinear():
    from node_gedcom_graph_spark.operators.similarity import (
        scaled_ivf_geometry,
    )

    assert scaled_ivf_geometry(100) == (16, 4)          # floor binds
    assert scaled_ivf_geometry(500) == (22, 5)
    assert scaled_ivf_geometry(2_000_000) == (1414, 353)
    # |cell| = n/nlist grows like sqrt(n), NOT linearly (the fixed-16
    # geometry's n/16 cell is the r6 sweep's 89.7 s ADC wall).
    for n in (10_000, 1_000_000, 100_000_000):
        nlist, _ = scaled_ivf_geometry(n)
        assert n / nlist <= 1.05 * n**0.5


def test_scaled_ivf_recall_floors_and_tier_ordering(spark):
    from node_gedcom_graph_spark.operators.similarity import (
        ann_ivf_scaled_recall,
    )

    rows = ann_ivf_scaled_recall.__wrapped__(spark, SF_DIR).collect()
    by_method = {}
    for r in rows:
        by_method.setdefault(r.method, []).append(r.recall_at_k)
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.nlist == 22 and r.nprobe == 5  # sqrt(500) geometry
    assert set(by_method) == set(SCALED_FLOORS)
    means = {m: sum(v) / len(v) for m, v in by_method.items()}
    for m, floor in SCALED_FLOORS.items():
        assert means[m] >= floor, (m, means[m])
    # Exact-rescore recovers quantization loss: refine beats raw ADC,
    # and the unquantized flat tier beats both.
    assert means["ivf_pq_refine"] > means["ivf_pq_adc"]
    assert means["ivf_flat"] > means["ivf_pq_refine"]


def test_sampled_recall_panel_binds_and_floors(spark):
    """The md5-rank sampled panel (retrieval_recall_at_k_sampled): at
    sf0.1 the %4 set is 500 queries, so the 128-query sample BINDS;
    the selected panel must be exactly the md5-rank-lowest 128 (the
    oracle's ORDER BY md5(vec_id), vec_id LIMIT 128), and each
    method's sampled mean recall must clear the same floors as the
    full eval (the sample is a uniform-in-hash subset)."""
    import hashlib

    from node_gedcom_graph_spark.operators.similarity import (
        RECALL_SAMPLE_PANEL,
        retrieval_recall_at_k_sampled,
    )

    sf01 = "/root/testdata/sf0.1"
    rows = retrieval_recall_at_k_sampled(spark, sf01).collect()
    got_panel = {r.query_id for r in rows}
    all_q = [
        r.vec_id
        for r in load_table(spark, sf01, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select("vec_id")
        .collect()
    ]
    assert len(all_q) > RECALL_SAMPLE_PANEL  # the sample must bind here
    want_panel = set(
        sorted(
            all_q,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:RECALL_SAMPLE_PANEL]
    )
    assert got_panel == want_panel
    assert len(rows) == 2 * RECALL_SAMPLE_PANEL
    for method, floor in RECALL_FLOORS.items():
        rec = [r.recall_at_k for r in rows if r.method == method]
        assert len(rec) == RECALL_SAMPLE_PANEL
        assert sum(rec) / len(rec) >= floor, method


def test_sampled_matryoshka_matches_full_on_panel(spark):
    """ann_matryoshka_trunc_recall_sampled is the full eval restricted
    to the md5 panel: at sf0.001 the %4 set is under the sample size,
    so sampled == full row-for-row; the metric itself is pinned by
    test_matryoshka_recall_bounded_and_lossy."""
    from node_gedcom_graph_spark.operators.llmprep4 import (
        ann_matryoshka_trunc_recall,
        ann_matryoshka_trunc_recall_sampled,
    )

    full = {
        (r.query_id, r.hits)
        for r in ann_matryoshka_trunc_recall(spark, SF_DIR).collect()
    }
    sampled = {
        (r.query_id, r.hits)
        for r in ann_matryoshka_trunc_recall_sampled(spark, SF_DIR).collect()
    }
    assert sampled == full and full
