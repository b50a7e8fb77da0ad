"""Loaders for the driver-generated test tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. All reads
go through :func:`load_table` so that per-table quirks are handled in one
place — notably ``events.ts`` is written as parquet TIMESTAMP(NANOS),
which Spark reads (under ``spark.sql.legacy.parquet.nanosAsLong=true``)
as a raw int64 that we convert to a microsecond TIMESTAMP_NTZ column.

Scale note: these are plain ``spark.read.parquet`` scans — predicate
pushdown, column pruning, and partition pruning all apply unchanged when
the same paths point at a 100 TB partitioned dataset instead of a single
file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.session import apply_engine_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation"})


def part_files(path: str) -> list[str]:
    """Data files of a parquet table path (single file OR directory of
    part files), skipping metadata (``_*``/``.*``) — THE path-layout
    convention for the test tables, shared by every helper that stats
    fixtures (size proxies, fingerprints)."""
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(root, f)
            for root, _d, files in os.walk(path)
            for f in files
            if not f.startswith(("_", "."))
        )
    return [path]


def dir_bytes(path: str) -> int:
    """On-disk bytes of a parquet file/directory — the
    plan-construction-time input-size proxy used to size explode
    fan-outs and gate broadcasts (no Spark job, unlike DataFrame.rdd
    introspection). Returns 0 when the path cannot be statted — treat
    0 as UNKNOWN at call sites (fail toward the safe branch), not as
    'small'."""
    import os

    try:
        return sum(os.path.getsize(f) for f in part_files(path))
    except OSError:
        return 0


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one test table, normalizing types.

    ``events.ts`` arrives as int64 nanoseconds (see module docstring) and
    is converted JVM-side to TIMESTAMP_NTZ at microsecond resolution —
    the same truncation DuckDB applies, so oracle comparisons line up.

    ``spread=True`` repartitions the scan to default parallelism. Use it
    for compute-heavy per-row pipelines (tokenize/shingle/GEMM) over
    SMALL inputs, where a single parquet file yields one split and the
    whole stage runs on one core: the shuffle moves megabytes to unlock
    every core. On a large partitioned dataset the scan already has
    splits, so the repartition is a cheap near-no-op relative to the
    compute it balances (and still irons out skewed split sizes).
    """
    apply_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # Integer division — int64 nanos exceed double's 53-bit mantissa,
        # so a float divide here would corrupt the low microseconds.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
