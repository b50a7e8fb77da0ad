"""Round-9 pins.

1. stream_session_windows_production (watermarked append to a parquet
   sink — the production shape the sf100 tier measures) emits a sound
   and watermark-complete subset of the complete-mode gate twin's
   sessions: every emitted session is a real final session, and every
   session the final watermark closed is emitted.
2. stream_user_stats_production drains the applyInPandasWithState
   operator through foreachBatch/noop — driver sees only scalar
   counters — and still touches every user.
3. stream_dedup_substring_windows' Arrow pre-combine kernel
   (_precombine inside the op) produces the identical drained table as
   the batch oracle — covered by the registry gate; here we pin the
   within-batch combine math directly on a crafted corpus.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_session_production_sound_and_watermark_complete(spark):
    from node_gedcom_graph_spark.streaming.pipeline import (
        stream_session_windows,
        stream_session_windows_production,
    )

    final = {tuple(r) for r in stream_session_windows(spark, SF_DIR).collect()}
    emitted = {
        tuple(r)
        for r in stream_session_windows_production(spark, SF_DIR).collect()
    }
    assert emitted, "production twin emitted nothing"
    assert emitted <= final, "append path emitted a non-final session"
    # watermark completeness: the final no-data batch must flush every
    # session the watermark (max event time - 1h) closed. Stay 1 minute
    # clear of the boundary so eviction-comparison convention (< vs <=)
    # can't flake the test.
    from node_gedcom_graph_spark.sources.tables import load_table

    max_ts = (
        load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    )
    wm = max_ts - dt.timedelta(hours=1, minutes=1)
    must_emit = {t for t in final if t[2] < wm}  # t[2] = session_end
    assert must_emit, "fixture has no watermark-closed session"
    missing = must_emit - emitted
    assert not missing, f"{len(missing)} watermark-closed sessions not emitted"


def test_user_stats_production_touches_every_user(spark):
    from node_gedcom_graph_spark.sources.tables import load_table
    from node_gedcom_graph_spark.streaming.pipeline import (
        stream_user_stats_production,
    )

    row = stream_user_stats_production(spark, SF_DIR).collect()
    assert len(row) == 1
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    # update mode emits >= one row per user per touching batch
    assert row[0].rows_emitted >= n_users
    assert row[0].n_batches >= 1


def test_substring_precombine_kernel(spark):
    """The within-Arrow-batch distinct-min/count combine must equal the
    brute-force window table on a crafted duplicated corpus."""
    import hashlib

    import pandas as pd

    from node_gedcom_graph_spark.operators.dedup import SUBSTR_W

    base = "x" * 10 + "abcdefghij" * ((SUBSTR_W // 10) + 3)
    texts = {7: base[: SUBSTR_W + 5], 3: base[: SUBSTR_W + 5], 9: "short"}

    # brute-force expectation
    exp: dict[bytes, list] = {}
    for did in sorted(texts):
        t = texts[did]
        for i in range(max(0, len(t) - SUBSTR_W + 1)):
            wk = hashlib.md5(t[i : i + SUBSTR_W].encode()).digest()
            cur = exp.setdefault(wk, [did, i + 1, 0])
            cur[2] += 1

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(sorted(texts), dtype="int64"),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    # drop the too-short doc like the streaming filter does
    pdf = pdf[pdf["text"].str.len() >= SUBSTR_W]

    import node_gedcom_graph_spark.streaming.pipeline as pl

    # reach the kernel through the op's closure-free twin: rebuild it
    # the way the op does (the kernel is defined inline; exercise it by
    # running the full op on a temp sf dir would drag streaming infra —
    # instead replicate via the public mapInPandas path on a batch DF).
    sdf = spark.createDataFrame(pdf)
    out = (
        sdf.mapInPandas(
            pl._substr_precombine_batches,
            "wk binary, doc_id bigint, p bigint, cnt bigint",
        )
        .groupBy("wk")
        .agg(
            F.min(F.struct("doc_id", "p")).alias("k"),
            F.sum("cnt").alias("n"),
        )
        .collect()
    )
    got = {
        bytes(r.wk): [r.k.doc_id, r.k.p, r.n]
        for r in out
    }
    assert got == {k: v for k, v in exp.items()}
