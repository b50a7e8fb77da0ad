"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Each query is executed to completion with the noop sink (full plan runs,
nothing collected to the driver). The GEDCOM benchmark synthesizes a
large file's worth of lines directly as a DataFrame (Spark-side
generation — no driver materialization) and runs the whole
parse->extract pipeline.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from node_gedcom_graph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the reference-pipeline shape, core relational ops, and
# the scale-path LLM-pipeline operators.
HEADLINE = (
    "flagship_revenue_by_region",
    "pricing_summary",
    "window_topk_orders_per_customer",
    "sessionize_user_events",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_topk_cosine",
    "text_quality_score",
)

N_SYNTH_INDI = 50_000  # synthesized GEDCOM individuals for the ETL bench


def synth_gedcom_lines(spark):
    """Generate (line_no, level, xref, tag, value) for N_SYNTH_INDI
    individuals + families entirely Spark-side (7 lines per individual),
    mirroring a ~N*250B GEDCOM file."""
    base = spark.range(N_SYNTH_INDI).select(F.col("id"))
    lines = base.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("off"), F.lit(0).alias("level"),
                         F.concat(F.lit("I"), F.col("id")).alias("xref"),
                         F.lit("INDI").alias("tag"), F.lit("").alias("value")),
                F.struct(F.lit(1).alias("off"), F.lit(1).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("NAME").alias("tag"),
                         F.concat(F.lit("Given"), F.col("id"), F.lit(" /Fam"),
                                  (F.col("id") % 1000), F.lit("/")).alias("value")),
                F.struct(F.lit(2).alias("off"), F.lit(1).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("SEX").alias("tag"),
                         F.when(F.col("id") % 2 == 0, "M").otherwise("F").alias("value")),
                F.struct(F.lit(3).alias("off"), F.lit(1).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("BIRT").alias("tag"), F.lit("").alias("value")),
                F.struct(F.lit(4).alias("off"), F.lit(2).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("DATE").alias("tag"),
                         F.concat(F.lit("1 JAN "), F.lit(1900) + F.col("id") % 100).alias("value")),
                F.struct(F.lit(5).alias("off"), F.lit(2).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("PLAC").alias("tag"),
                         F.when(F.col("id") % 50 == 0, "SLAKE").otherwise("Springfield").alias("value")),
                F.struct(F.lit(6).alias("off"), F.lit(1).alias("level"),
                         F.lit(None).cast("string").alias("xref"),
                         F.lit("FAMS").alias("tag"),
                         F.concat(F.lit("@F"), F.col("id") % 10000, F.lit("@")).alias("value")),
            )
        ).alias("s"),
        (F.col("id") * 7).alias("base_no"),
    ).select(
        (F.col("base_no") + F.col("s.off")).alias("line_no"),
        F.col("s.level").alias("level"),
        F.col("s.xref").alias("xref"),
        F.col("s.tag").alias("tag"),
        F.col("s.value").alias("value"),
    )
    return lines.withColumn("record_seq", (F.col("line_no") / 7 + 1).cast("long"))


def bench_gedcom_pipeline(spark) -> None:
    from node_gedcom_graph_spark.gedcom.extract import extract_graph

    lines = synth_gedcom_lines(spark)
    g = extract_graph(lines, max_depth=2, persist=True)
    g.nodes_long.write.format("noop").mode("overwrite").save()
    g.edges.write.format("noop").mode("overwrite").save()
    g.unpersist()


def main() -> None:
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    import __spark_entry__ as ent

    qs = ent.queries()

    # Warm + time each query back-to-back (JMH-style steady state). The
    # warm run amortizes JVM/JIT warmup, codegen compilation, and
    # first-scan file-index costs; running the timed iteration
    # IMMEDIATELY after matters because the JVM CodeGenerator class
    # cache is a fixed 100 entries — a warm-all-then-time-all loop
    # evicts the large generated classes (the 64-min MinHash aggregate,
    # the GEDCOM window stack) before their timed runs, re-measuring
    # ~2s of janino compilation that a sustained deployment never pays.
    # Two timed iterations, min taken: a single-shot timing is exposed
    # to GC pauses and host noise (observed 2-5x swings on identical
    # plans); the min of two is the standard steady-state estimator.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        total += timings[name]

    # Two warm iterations: the GEDCOM stack's generated classes are the
    # largest in the suite and compete with the 9 preceding queries for
    # the fixed 100-entry codegen cache — after one warm run the second
    # iteration still pays partial recompilation (observed 16s -> 4.3s
    # -> 2.5s convergence), so a single warm under-reports steady state.
    bench_gedcom_pipeline(spark)
    bench_gedcom_pipeline(spark)
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        bench_gedcom_pipeline(spark)
        best = min(best, time.monotonic() - t0)
    timings["gedcom_pipeline_synth50k"] = round(best, 3)
    total += timings["gedcom_pipeline_synth50k"]

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
