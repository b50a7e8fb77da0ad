"""Heavy-hitters scale-stress artifact generator.

The fixture documents table has a 31-token vocabulary, so the gate can
only prove the two-phase operator's EXACTNESS, not that phase 1's
Misra-Gries pruning actually bounds the shuffle when the vocabulary is
large. This tool manufactures the adversarial case — a Zipf-free
long-tail stream with ~1M distinct tail tokens and 8 planted heavy
hitters — entirely ON THE EXECUTORS (spark.range + hash exprs, nothing
collected), then measures, solo, on local[32]:

- candidate-set size after phase 1 (the claimed bound: <= capacity x
  partitions, vs ~1M distinct keys a naive groupBy would shuffle);
- end-to-end two-phase wall vs the naive groupBy().having() wall;
- exact-match check of the two result sets (both must find exactly the
  planted heavies).

Writes one JSON document to stdout; commit as
PROFILE_r3_heavyhitters.json so SURVEY's claim traces to an artifact.
Hypervisor steal (col 8 of /proc/stat) is recorded per timed section —
this host shows multi-x wall swings under steal bursts (see
PROFILE_r3_hostnoise.json).

Usage: python tools/profile_heavy_hitters.py [n_tokens]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from node_gedcom_graph_spark.session import get_spark  # noqa: E402


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def synth_tokens(spark, n: int):
    """~n-token stream, executor-side: ids with id%5==0 (20% of mass)
    map to 8 planted heavy tokens; the rest hash into a ~1M-key tail
    (each tail key ~ (0.8 n)/1e6 occurrences — far below n/100)."""
    return spark.range(n).select(
        F.when(
            F.col("id") % 5 == 0, F.concat(F.lit("h"), F.col("id") % 8)
        )
        .otherwise(
            F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)))
        )
        .alias("token")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(
        app_name="hh-profile",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    from node_gedcom_graph_spark.operators.timeseries import (
        HH_CAPACITY,
        HH_K,
        _misra_gries_partition,
    )

    toks = synth_tokens(spark, n).persist()
    n_actual = toks.count()  # materialize once so both paths read cache
    n_parts = toks.rdd.getNumPartitions()

    out = {
        "n_tokens": n_actual,
        "n_partitions": n_parts,
        "capacity": HH_CAPACITY,
        "phi_k": HH_K,
        "distinct_keys": toks.select("token").distinct().count(),
    }

    # phase 1 only: candidate bound
    s0, t0 = _steal(), time.monotonic()
    cands = toks.mapInPandas(_misra_gries_partition, "token string").distinct()
    out["candidates"] = cands.count()
    out["phase1_wall_s"] = round(time.monotonic() - t0, 3)
    out["phase1_steal_jiffies"] = _steal() - s0
    out["candidate_bound"] = HH_CAPACITY * n_parts
    assert out["candidates"] <= out["candidate_bound"]

    # full two-phase
    total = F.broadcast(
        toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    )
    s0, t0 = _steal(), time.monotonic()
    two_phase = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") * HH_K > F.col("n_total"))
    )
    tp = {r.token: r.cnt for r in two_phase.collect()}
    out["two_phase_wall_s"] = round(time.monotonic() - t0, 3)
    out["two_phase_steal_jiffies"] = _steal() - s0

    # naive comparison
    s0, t0 = _steal(), time.monotonic()
    naive = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") * HH_K > F.col("n_total"))
    )
    nv = {r.token: r.cnt for r in naive.collect()}
    out["naive_wall_s"] = round(time.monotonic() - t0, 3)
    out["naive_steal_jiffies"] = _steal() - s0

    out["results_match"] = tp == nv
    out["heavy_found"] = sorted(tp)
    out["interpretation"] = (
        "single-box caveat: the naive JVM hash-agg wins wall-clock here "
        "because its map-side combine is local and pays no Python/Arrow "
        "toll; the two-phase path's win is the SHUFFLE bound "
        "(candidates <= capacity x partitions vs ~1M distinct keys), "
        "which matters when the shuffle crosses a network — the thing "
        "local[32] cannot exhibit"
    )
    assert out["results_match"], "two-phase != naive"
    assert len(tp) == 8, f"expected the 8 planted heavies, got {sorted(tp)}"
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
