"""Semantic pins for the round-4 additions: the PQ asymmetric-distance
scan (differential against a pure-Python/numpy ADC), bipartite HITS
(differential against dict-based power iteration), and the Neyman
stratified sampler (allocation optimality mechanics)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.graphalgo import bipartite_hits_parts2
from node_gedcom_graph_spark.operators.llmprep3 import (
    NEYMAN_TOTAL,
    sample_stratified_neyman,
)
from node_gedcom_graph_spark.operators.similarity import (
    PQ_M,
    PQ_SUBDIM,
    ann_pq_adc_topk,
)
from tests.conftest import SF_DIR


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


def _dot32(a, b) -> float:
    """Sequential float32 fold — the engine's dot_f32 contract."""
    acc = np.float32(0.0)
    for x, y in zip(a, b):
        acc = np.float32(acc + np.float32(np.float32(x) * np.float32(y)))
    return float(acc)


def test_adc_matches_pure_python(spark):
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    cent_ids = sorted(emb, key=lambda v: (_md5(v), v))[:16]
    # per-subspace codebooks = the 16 centroids' contiguous slices
    def sl(vec, m):
        return vec[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]

    codes = {}
    for vid, vec in emb.items():
        codes[vid] = [
            max(
                cent_ids,
                key=lambda c: (_dot32(sl(vec, m), sl(emb[c], m)), -c),
            )
            for m in range(PQ_M)
        ]
    queries = [v for v in emb if v < 5]
    expect = {}
    for q in queries:
        scores = {
            v: sum(_dot32(sl(emb[q], m), sl(emb[codes[v][m]], m))
                   for m in range(PQ_M))
            for v in emb
            if v != q
        }
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        expect[q] = [(v, s) for v, s in top]
    got = defaultdict(list)
    for r in ann_pq_adc_topk(spark, SF_DIR).orderBy("query_id", "rnk").collect():
        got[r.query_id].append((r.neighbor_id, r.adc))
    assert set(got) == set(expect)
    for q in expect:
        assert [v for v, _ in got[q]] == [v for v, _ in expect[q]]
        for (_, a), (_, b) in zip(got[q], expect[q]):
            assert abs(a - b) < 1e-4


def test_hits_matches_dict_power_iteration(spark):
    o = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    edges = {
        (o[r.l_orderkey], r.l_partkey)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    a1, h1, a2 = defaultdict(int), defaultdict(int), defaultdict(int)
    for c, p in edges:
        a1[p] += 1
    for c, p in edges:
        h1[c] += a1[p]
    for c, p in edges:
        a2[p] += h1[c]
    mx = max(a2.values())
    expect = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    rows = bipartite_hits_parts2(spark, SF_DIR).collect()
    assert [(r.part_key, r.authority_raw) for r in rows] == expect
    for r in rows:
        assert r.authority == r.authority_raw / mx
    # the point of the second iteration: authority ranking must differ
    # from the plain degree (first-iteration) ranking somewhere in the
    # top-50, else (A^T A) bought nothing on this corpus
    deg_top = [
        p for p, _ in sorted(a1.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    ]
    assert [r.part_key for r in rows] != deg_top


def test_neyman_allocation_mechanics(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r)
    w = {
        s: len(rs) * float(np.std([r.n_chars for r in rs], ddof=1))
        for s, rs in by_src.items()
        if len(rs) > 1
    }
    tw = sum(w.values())
    out = sample_stratified_neyman(spark, SF_DIR).collect()
    alloc = {}
    for r in out:
        alloc[r.source] = r.alloc
    # every allocation within one unit of the ideal real-valued share
    for s, a in alloc.items():
        ideal = NEYMAN_TOTAL * w[s] / tw
        assert ideal - 1 < a <= ideal
    assert sum(alloc.values()) <= NEYMAN_TOTAL
    # sampled rows per stratum == min(alloc, stratum size), drawn by
    # md5 rank (reproduce the first pick per stratum)
    got_per_src = defaultdict(list)
    for r in out:
        got_per_src[r.source].append(r)
    for s, rs in got_per_src.items():
        assert len(rs) == min(alloc[s], len(by_src[s]))
        first = min(by_src[s], key=lambda r: (_md5(r.doc_id), r.doc_id))
        assert min(rs, key=lambda r: r.rnk).doc_id == first.doc_id
    # Neyman's defining property: the N_h * sigma_h weight drives the
    # allocation MONOTONELY (floor rounding can tie, never invert)
    srcs = list(alloc)
    for s1 in srcs:
        for s2 in srcs:
            if w[s1] > w[s2]:
                assert alloc[s1] >= alloc[s2]
