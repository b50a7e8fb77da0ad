"""JSONL (newline-delimited JSON) documents source/sink.

Training corpora commonly arrive as JSONL drops before they are
compacted to parquet; this module is that ingestion edge. The reference
engine's analog is its line-oriented GEDCOM file source (index.js:122 —
a byte stream split on record boundaries); JSONL is the same shape with
a self-describing record format.

Scale notes:
- The reader takes an EXPLICIT schema — schema inference reads the
  whole dataset once before the real scan (2x I/O at 100 TB) and can
  silently widen types between drops. The documents schema is pinned.
- JSON scanning is line-splittable, so a 100 TB drop still parallelizes
  per-block; but parquet is ~5-10x cheaper to re-read (columnar
  pruning), so the canonical flow is jsonl -> compact_to_parquet once,
  then every query hits parquet.
- ``mode="PERMISSIVE"`` + ``columnNameOfCorruptRecord`` quarantines
  malformed lines into a side column instead of failing the job — at
  web scale there ARE malformed lines, and dropping them silently
  (DROPMALFORMED) hides feed regressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL documents drop with the pinned schema; malformed
    lines land in ``_corrupt_record`` (quarantine column) instead of
    failing or vanishing."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — clean rows drop the quarantine column.

    The quarantine side keeps ALL columns, not just the raw line: Spark
    forbids queries that reference only ``_corrupt_record`` from a raw
    JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    the parse that fills the column only runs when data fields are
    referenced), and the partially-parsed fields are useful triage
    context anyway."""
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    return clean, bad


def quarantine_counts(df: DataFrame) -> tuple[int, int]:
    """(n_clean, n_bad) in ONE pass over the drop.

    Column pruning would otherwise reduce a bare ``bad.count()`` to a
    corrupt-column-only scan, which Spark blocks (see split_quarantine);
    counting a data column alongside keeps the scan legal AND merges
    both counts into a single job — the shape you want at 100 TB anyway
    (two counts, one read)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("_corrupt_record").alias("n_bad"),
        F.count("doc_id").alias("_keep_scan_legal"),
    ).collect()[0]
    return row.n_total - row.n_bad, row.n_bad


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Write documents as partitioned JSONL (many part files — the
    splittable layout; no coalesce(1))."""
    df.write.mode("overwrite").json(path)


def compact_to_parquet(spark: SparkSession, jsonl_path: str, parquet_path: str) -> None:
    """One-pass jsonl -> parquet compaction (the canonical ingest flow);
    quarantined lines are excluded and would be published separately."""
    clean, _bad = split_quarantine(read_documents_jsonl(spark, jsonl_path))
    clean.write.mode("overwrite").parquet(parquet_path)
