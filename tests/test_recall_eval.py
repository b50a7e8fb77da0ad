"""Semantic pins for the retrieval-quality eval: recall@k of the
SRP-bucketed ANN against the exact brute-force top-k ground truth."""

from __future__ import annotations

from node_gedcom_graph_spark.operators.similarity import (
    RECALL_K,
    retrieval_recall_at_k,
    topk_cosine,
)
from node_gedcom_graph_spark.sources.tables import load_table
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# One 4-bit SRP band prunes candidates to ~1/16 of the corpus, so a
# method no better than random bucketing would score ~0.0625 mean
# recall. The floor pins "measurably better than chance" (observed
# ~0.13-0.14 at sf0.001/sf0.01) without overfitting the fixture.
RECALL_FLOOR = 0.08


def test_recall_floor_and_row_invariants(spark):
    rows = retrieval_recall_at_k(spark, SF_DIR).collect()
    assert rows, "query panel must be non-empty"
    # one row per exact-side query = every vec_id % 4 == 0 vector
    n_queries = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .count()
    )
    assert len(rows) == n_queries
    for r in rows:
        assert 0 <= r.hits <= min(r.ann_candidates, RECALL_K)
        assert 0 <= r.ann_candidates <= RECALL_K
        assert abs(r.recall_at_k - r.hits / RECALL_K) < 1e-12
    mean_recall = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean_recall >= RECALL_FLOOR, mean_recall


def test_recall_hits_are_true_intersections(spark):
    """Recompute one query's hit count from the two underlying top-k
    sets — the eval must report exactly |exact ∩ ann|."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = topk_cosine(
        emb, emb.filter(F.col("vec_id") % 4 == 0), k=RECALL_K
    )
    by_query = {}
    for r in exact.collect():
        by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {r.query_id: r for r in retrieval_recall_at_k(spark, SF_DIR).collect()}
    assert set(got) == set(by_query)
    # spot-check every query whose ann side found anything
    from node_gedcom_graph_spark.operators.similarity import _srp_scored
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ann = (
        _srp_scored(spark, SF_DIR)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RECALL_K)
    )
    ann_by_query = {}
    for r in ann.collect():
        ann_by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid, row in got.items():
        expect = len(by_query[qid] & ann_by_query.get(qid, set()))
        assert row.hits == expect
