"""Semantic pins: personalized PageRank against a dict-based power
iteration (and its defining locality property vs global PageRank),
and the k-anonymity audit against a pure-Python recount."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.graphalgo import (
    PPR_N_SEEDS,
    _PPR_ALPHA_OVER_S,
    _copurchase_edges,
    copurchase_ppr_seeds3,
)
from node_gedcom_graph_spark.operators.llmprep3 import (
    KANON_BAL_WIDTH,
    KANON_K,
    kanon_quasi_identifier_groups,
)
from tests.conftest import SF_DIR


def test_ppr_matches_dict_power_iteration(spark):
    adj = defaultdict(set)
    for r in _copurchase_edges(spark, SF_DIR).collect():
        adj[r.pa].add(r.pb)
        adj[r.pb].add(r.pa)
    seeds = sorted(adj)[:PPR_N_SEEDS]
    rank = {s: 1.0 / PPR_N_SEEDS for s in seeds}
    for _ in range(3):
        contrib = defaultdict(float)
        for u, ru in rank.items():
            share = ru / len(adj[u])
            for v in adj[u]:
                contrib[v] += share
        rank = {
            v: (_PPR_ALPHA_OVER_S if v in seeds else 0.0) + 0.85 * c
            for v, c in contrib.items()
        }
        for s in seeds:
            rank.setdefault(s, _PPR_ALPHA_OVER_S)
    got = {
        r.p_partkey: r.ppr for r in copurchase_ppr_seeds3(spark, SF_DIR).collect()
    }
    assert set(got) == set(rank)
    for v, x in got.items():
        assert abs(x - rank[v]) < 1e-9
    # sparse propagation: only reached nodes may appear (at sf0.001 the
    # 200-node fixture is fully reachable in 3 hops, so <=, not <)
    assert len(got) <= len(adj)
    # conservation-ish sanity: seeds retain restart mass
    for s in seeds:
        assert got[s] >= _PPR_ALPHA_OVER_S - 1e-12


def test_kanon_matches_recount_and_flags(spark):
    import math

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    groups = defaultdict(int)
    for r in cust:
        b = math.floor(float(r.c_acctbal) / KANON_BAL_WIDTH)
        groups[(r.c_nationkey, r.c_mktsegment, b)] += 1
    rows = kanon_quasi_identifier_groups(spark, SF_DIR).collect()
    got = {
        (r.c_nationkey, r.c_mktsegment, r.bal_bucket): (r.n, r.at_risk)
        for r in rows
    }
    assert set(got) == set(groups)
    for k, (n, risk) in got.items():
        assert n == groups[k]
        assert risk == (n < KANON_K)
    # totals must re-add to the table (no row lost to bucketing)
    assert sum(n for n, _ in got.values()) == len(cust)
    # the sf0.001 fixture (150 customers over ~25x5x11 cells) must
    # surface re-identifiable classes; safe classes only appear at
    # larger SFs, so only the risky side is pinned here
    assert any(r for _, r in got.values())
