"""Tests for operators/timeseries and semdedup_cluster_prune:
pure-Python differential oracles (the §5.3 strategy — no shared code
with the engine), the Misra-Gries superset guarantee exercised on an
adversarial long-tail stream the tiny fixture vocabulary cannot
produce, and SemDedup structural invariants with a float64 numpy
cross-check away from the cosine threshold."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.similarity import (
    CENTROID_K,
    SEMDEDUP_COSINE_T,
    semdedup_cluster_prune,
)
from node_gedcom_graph_spark.operators.timeseries import (
    HH_CAPACITY,
    HH_K,
    _misra_gries_partition,
    heavy_hitters_two_phase,
    hypertable_rollup_daily,
    source_token_kl_divergence,
)

SF_DIR = "/root/testdata/sf0.001"


def _load_events(spark):
    from node_gedcom_graph_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


def test_hypertable_daily_matches_pure_python(spark):
    """The hourly->daily merge must be lossless vs a from-scratch daily
    aggregate computed in pure Python with exact decimal sums."""
    rows = _load_events(spark).select("event_type", "ts", "value").collect()
    expected = {}
    for r in rows:
        day = r.ts.date()
        key = (r.event_type, day)
        st = expected.setdefault(
            key, [0, Decimal(0), float("inf"), float("-inf")]
        )
        st[0] += 1
        # mirror Spark's cast(value as decimal(28,10)): round the exact
        # binary double to 10 dp, half-up
        st[1] += Decimal(r.value).quantize(
            Decimal("1.0000000000"), rounding=ROUND_HALF_UP
        )
        st[2] = min(st[2], r.value)
        st[3] = max(st[3], r.value)
    got = {
        (r.event_type, r.bucket_day): r
        for r in hypertable_rollup_daily(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for key, (n, sdec, mn, mx) in expected.items():
        g = got[key]
        assert g.n_events == n
        assert g.min_value == mn
        assert g.max_value == mx
        assert abs(g.sum_value - float(sdec)) < 1e-9
        assert abs(g.avg_value - float(sdec) / n) < 1e-12


def test_misra_gries_superset_on_long_tail():
    """Adversarial stream with vocab >> capacity: 3 heavy items buried
    in a 5000-token unique tail. Every true phi-heavy item must survive
    the per-partition summary (the guarantee phase 2 relies on); the
    summary itself must respect the capacity bound."""
    heavy = ["h0"] * 400 + ["h1"] * 300 + ["h2"] * 200
    tail = [f"t{i}" for i in range(5000)]
    stream = []
    # interleave so heavies are spread across batches
    for i, t in enumerate(tail):
        stream.append(t)
        if i < len(heavy):
            stream.append(heavy[i])
    stream.extend(heavy[len(tail):])
    n = len(stream)
    batches = [
        pd.DataFrame({"token": stream[i : i + 500]})
        for i in range(0, n, 500)
    ]
    (out,) = list(_misra_gries_partition(iter(batches)))
    survivors = set(out["token"])
    assert len(survivors) <= HH_CAPACITY
    true_counts = Counter(stream)
    for tok, c in true_counts.items():
        if c * HH_K > n:
            assert tok in survivors, f"true heavy hitter {tok} pruned"


def test_heavy_hitters_matches_naive_groupby(spark):
    """Two-phase result == naive groupBy().having() on the fixture."""
    from node_gedcom_graph_spark.functions.scalar import tokens
    from node_gedcom_graph_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    total = toks.count()
    naive = {
        r.token: r.cnt
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * HH_K > total)
        .collect()
    }
    got = {
        r.token: r.cnt for r in heavy_hitters_two_phase(spark, SF_DIR).collect()
    }
    assert got == naive
    for r in heavy_hitters_two_phase(spark, SF_DIR).collect():
        assert r.n_total == total
        assert abs(r.share - r.cnt / total) < 1e-12


def test_kl_divergence_matches_pure_python(spark):
    import re as _re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_source = {}
    global_counts = Counter()
    for r in docs.select("source", "text").collect():
        toks = _re.findall(r"[a-z0-9]+", (r.text or "").lower())
        per_source.setdefault(r.source, Counter()).update(toks)
        global_counts.update(toks)
    g_total = sum(global_counts.values())
    got = {r.source: r for r in source_token_kl_divergence(spark, SF_DIR).collect()}
    assert set(got) == set(per_source)
    for src, counts in per_source.items():
        s_total = sum(counts.values())
        kl = sum(
            (c / s_total)
            * math.log((c / s_total) / (global_counts[t] / g_total))
            for t, c in counts.items()
        )
        ent = -sum(
            (c / s_total) * math.log(c / s_total) for c in counts.values()
        )
        r = got[src]
        assert r.n_tokens == s_total
        assert r.vocab_used == len(counts)
        assert abs(r.kl_nats - kl) < 1e-9
        assert abs(r.entropy_nats - ent) < 1e-9
        assert r.kl_nats >= -1e-12  # KL(p||q) >= 0


def test_semdedup_invariants_and_numpy_crosscheck(spark):
    res = semdedup_cluster_prune(spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert len(res) == len(emb)  # every vector gets a verdict
    clusters = {}
    for r in res:
        clusters.setdefault(r.cid, []).append(r)
    assert len(clusters) <= CENTROID_K
    for cid, members in clusters.items():
        # the smallest id in a cluster can never be pruned (no
        # smaller-id same-cluster neighbor exists)
        lead = min(members, key=lambda r: r.vec_id)
        assert lead.pruned == 0
        # numpy float64 cross-check away from the threshold boundary
        ids = sorted(m.vec_id for m in members)
        verdict = {m.vec_id: m.pruned for m in members}
        for i, vid in enumerate(ids):
            v = emb[vid]
            best = max(
                (
                    float(
                        np.dot(v, emb[o])
                        / (np.linalg.norm(v) * np.linalg.norm(emb[o]))
                    )
                    for o in ids[:i]
                ),
                default=-2.0,
            )
            if best >= SEMDEDUP_COSINE_T + 1e-5:
                assert verdict[vid] == 1
            elif best <= SEMDEDUP_COSINE_T - 1e-5:
                assert verdict[vid] == 0


def test_scd2_null_k_is_distinct_from_semantics(spark):
    """Regression (review finding): events whose props lack '$.k'
    produce NULL — a NULL run must be ONE island (NULL IS NOT DISTINCT
    FROM NULL) and a value->NULL transition IS a change, matching
    SQL's IS DISTINCT FROM on both engines."""
    import pandas as pd

    from node_gedcom_graph_spark.operators.timeseries import _scd2_islands

    rows = [
        # user 1: k = 5, 5, NULL, NULL, 5  -> versions 1,1,2,2,3
        (1, 1, "2020-01-01 00:00:00", '{"k": 5}'),
        (1, 2, "2020-01-01 01:00:00", '{"k": 5}'),
        (1, 3, "2020-01-01 02:00:00", "{}"),
        (1, 4, "2020-01-01 03:00:00", "{}"),
        (1, 5, "2020-01-01 04:00:00", '{"k": 5}'),
        # user 2: starts NULL -> version 1 from the first row
        (2, 6, "2020-01-01 00:00:00", "{}"),
        (2, 7, "2020-01-01 01:00:00", '{"k": 9}'),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    got = {
        (r.user_id, r.event_id): r.version
        for r in _scd2_islands(df).collect()
    }
    assert got == {
        (1, 1): 1,
        (1, 2): 1,
        (1, 3): 2,
        (1, 4): 2,
        (1, 5): 3,
        (2, 6): 1,
        (2, 7): 2,
    }
