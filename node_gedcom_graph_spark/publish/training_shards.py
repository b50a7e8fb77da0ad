"""Training-shard parquet sink: the LLM-pipeline counterpart of the
per-tag CSV fan-out (SURVEY op 18, reference lib/csv_writer.js:85-113).

A curated corpus is written as N deterministic hash shards
(``shard=<k>/part-*.parquet``) plus a manifest recording per-shard
row/byte totals — the layout a downstream trainer's data loader mounts
directly (one shard list per worker), and the audit trail a petabyte
writer checks before committing output (shard balance, no empty
shards).

Scale: the shard key is the same engine-agnostic md5 assignment as
``dataset_shard_assign`` (operators/llmprep2.py) — re-run-stable and
repartition-proof, so incremental re-publishes land rows in the same
shards. The write is a single ``partitionBy`` fan-out: one pass, no
driver materialization, each task streams its partition's rows to the
matching shard directories. The manifest is computed by one aggregate
over the same DataFrame (Catalyst reuses the scan) and written
alongside as parquet, NOT collected — at 100 TB the manifest is still
just n_shards rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_key(id_col: str, n_shards: int) -> F.Column:
    """Deterministic md5-based shard id in [0, n_shards)."""
    from node_gedcom_graph_spark.functions.scalar import md5_bucket

    return md5_bucket(F.col(id_col), n_shards)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Write ``df`` as ``out_dir/data/shard=K/*.parquet`` plus
    ``out_dir/_manifest/`` (parquet: shard, n_rows, total_chars).
    Returns the manifest DataFrame (read back from the published
    manifest, so callers see exactly what landed)."""
    data_dir = os.path.join(out_dir, "data")
    manifest_dir = os.path.join(out_dir, "_manifest")
    sharded = df.withColumn("shard", shard_key(id_col, n_shards))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(data_dir)
    # Manifest from the PUBLISHED data, not the input plan: counts what
    # actually landed (a write-side failure can't produce a manifest
    # that claims more than the sink holds).
    spark = df.sparkSession
    published = spark.read.parquet(data_dir)
    (
        published.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length(text_col).cast("bigint")).alias("total_chars"),
        )
        .write.mode("overwrite")
        .parquet(manifest_dir)
    )
    return spark.read.parquet(manifest_dir)


def read_training_shards(
    spark: SparkSession, out_dir: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the published corpus; ``shards`` restricts to a subset via
    partition pruning (the trainer's per-worker mount — the filter
    prunes directories, it does not scan-and-drop)."""
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
