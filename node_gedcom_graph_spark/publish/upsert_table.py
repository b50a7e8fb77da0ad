"""Manifest-based copy-on-write upsert table: key-level MERGE (CDC
apply) on plain parquet, without a table format dependency.

The reference publishes by staging + atomic directory swap with backup
and rollback (`lib/neo4j.js:20-51,84-95` — SURVEY.md §2 ops 21-23).
That is an all-or-nothing REPLACE of the whole dataset. This module is
the incremental analog a 100 TB table needs: rows are hash-bucketed by
key, each table VERSION is a manifest mapping every bucket to the
version directory that last rewrote it, and a CDC batch rewrites ONLY
the buckets containing affected keys — copy-on-write at bucket
granularity, exactly the manifest+snapshot idea underneath
Delta/Iceberg, reduced to its queryable core.

Guarantees:
- **Atomic publish**: readers resolve the `_latest` pointer (one small
  file, swapped with ``os.replace`` — the same rename-atomicity the
  reference's directory swap relies on). A crash mid-apply leaves only
  an orphaned version directory; the pointer still names the previous
  consistent manifest.
- **Optimistic concurrency**: ``apply_cdc`` records the base version it
  read; if the pointer moved before its swap, it aborts (the
  CAS-on-pointer discipline Delta calls "optimistic transaction").
- **Deterministic in-batch resolution**: a CDC batch may carry several
  operations per key; the one with the highest ``seq`` wins (ties by
  op, delete > upsert, making replays order-independent).

Scale: the apply cost is O(affected buckets x bucket size + CDC batch),
not O(table). The affected-bucket set is discovered from the CDC keys
(bounded by ``n_buckets``, collected as a tiny set), the per-bucket
rewrite is an anti-join + union keyed on the bucket's own keys, and
unaffected buckets are never read or written — their manifest entries
simply carry forward. md5-bucketing is the same engine-agnostic
assignment as dataset_shard_assign, so bucket membership is a stable
data contract across engines and re-runs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """The `_latest` pointer moved between read and publish."""


def _bucket_expr(key_col: str, n_buckets: int):
    from node_gedcom_graph_spark.functions.scalar import md5_bucket

    return md5_bucket(F.col(key_col), n_buckets)


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_latest")


def _read_pointer(table_dir: str) -> int:
    with open(_pointer_path(table_dir)) as fh:
        return int(fh.read().strip())


def _write_pointer_atomic(table_dir: str, version: int) -> None:
    tmp = _pointer_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{version}\n")
    os.replace(tmp, _pointer_path(table_dir))  # atomic on POSIX


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest_v{version}.json")


def _read_manifest(table_dir: str, version: int) -> dict[str, str]:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def init_table(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    key_col: str,
    n_buckets: int = 16,
) -> None:
    """Create version 0: every bucket written under ``v=0``."""
    os.makedirs(table_dir, exist_ok=True)
    data = df.withColumn("_bucket", _bucket_expr(key_col, n_buckets))
    (
        data.write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(os.path.join(table_dir, "v=0"))
    )
    manifest = {str(b): "v=0" for b in range(n_buckets)}
    manifest["_n_buckets"] = str(n_buckets)
    manifest["_schema"] = df.schema.json()
    with open(_manifest_path(table_dir, 0), "w") as fh:
        json.dump(manifest, fh)
    _write_pointer_atomic(table_dir, 0)


def read_latest(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Resolve the pointer -> manifest -> per-bucket paths. Buckets are
    read only from the version directory that last rewrote them.

    ``version`` time-travels to an older snapshot: every manifest is
    immutable once written and old version directories are never
    rewritten (copy-on-write), so any published version stays readable
    until a retention sweep removes it — the Delta/Iceberg time-travel
    contract, for free, from the manifest design."""
    if version is None:
        version = _read_pointer(table_dir)
    manifest = _read_manifest(table_dir, version)
    paths = [
        os.path.join(table_dir, vdir, f"_bucket={b}")
        for b, vdir in manifest.items()
        if not b.startswith("_")
        and os.path.isdir(os.path.join(table_dir, vdir, f"_bucket={b}"))
    ]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["_schema"]))
    if not paths:
        # every row deleted: an empty frame with the recorded schema
        return spark.createDataFrame([], schema)
    # read under the MANIFEST schema, not file inference: after schema
    # evolution the per-bucket parquet footers differ (old buckets lack
    # newly added columns) — the recorded schema makes Spark fill the
    # missing columns with NULLs instead of silently dropping them
    return spark.read.schema(schema).parquet(*paths)


def _publish_manifest(
    table_dir: str,
    base: int,
    new_version: int,
    new_manifest: dict,
    vdir: str,
) -> None:
    """The commit point: CREATE the new manifest exclusively (``open``
    mode ``x`` — the first writer wins the version, any concurrent
    writer gets FileExistsError), then swap the pointer. A loser's
    already-written data directory is an unreferenced orphan that
    vacuum() sweeps. The pointer re-check narrows (but the exclusive
    create is what actually serializes same-version writers)."""
    try:
        with open(_manifest_path(table_dir, new_version), "x") as fh:
            json.dump(new_manifest, fh)
    except FileExistsError:
        shutil.rmtree(os.path.join(table_dir, vdir), ignore_errors=True)
        raise ConcurrentWriteError(
            f"version {new_version} already published by a concurrent writer"
        )
    if _read_pointer(table_dir) != base:
        # undo our own manifest + data so the version number isn't
        # permanently poisoned for the writer that actually won
        try:
            os.remove(_manifest_path(table_dir, new_version))
        except OSError:
            pass
        shutil.rmtree(os.path.join(table_dir, vdir), ignore_errors=True)
        raise ConcurrentWriteError(
            f"base version {base} superseded before publish"
        )
    _write_pointer_atomic(table_dir, new_version)


def apply_cdc(
    spark: SparkSession,
    table_dir: str,
    cdc: DataFrame,
    key_col: str,
) -> int:
    """MERGE a CDC batch (columns: ``op`` in {'upsert','delete'},
    ``seq`` bigint, key + payload columns) into the table. Returns the
    new version number. Only buckets containing affected keys are
    rewritten; everything else carries forward by manifest reference.
    """
    import uuid as _uuid

    base = _read_pointer(table_dir)
    manifest = _read_manifest(table_dir, base)
    n_buckets = int(manifest["_n_buckets"])
    new_version = base + 1
    # writer-unique data directory: two concurrent writers racing for
    # the same version can never clobber each other's files — the
    # exclusive manifest create below decides the winner, and the
    # loser's orphan directory is swept by vacuum()
    vdir = f"v={new_version}-{_uuid.uuid4().hex[:8]}"

    payload_cols = [c for c in cdc.columns if c not in ("op", "seq")]

    # last-write-wins per key inside the batch: the winner is the op
    # with the highest seq; on a seq tie a delete beats an upsert so
    # replayed mixed batches resolve deterministically. _pick carries
    # (seq, del_pri) for the verdict; _row carries the max-seq row's
    # payload (only consulted when the verdict is upsert — _pick.seq
    # always equals _row.seq since both maximize seq first).
    pick = F.struct(
        F.col("seq").alias("seq"),
        (F.col("op") == "delete").cast("int").alias("del_pri"),
    )
    row = F.struct(
        F.col("seq").alias("seq"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    winners = (
        cdc.withColumn("_bucket", _bucket_expr(key_col, n_buckets))
        .groupBy(key_col, "_bucket")
        .agg(F.max(pick).alias("_pick"), F.max(row).alias("_row"))
    )

    affected = sorted(
        r._bucket for r in winners.select("_bucket").distinct().collect()
    )
    if not affected:
        return base  # empty batch: nothing to publish

    # current rows of ONLY the affected buckets (bucket dirs are read
    # directly, so the frames carry pure data columns — the bucket id
    # is path metadata, re-derived from the key on write). A bucket may
    # have no manifest entry at all (fully deleted, then compacted
    # away) — .get() treats that like a missing directory.
    cur_paths = [
        os.path.join(table_dir, manifest[str(b)], f"_bucket={b}")
        for b in affected
        if manifest.get(str(b)) is not None
        and os.path.isdir(
            os.path.join(table_dir, manifest[str(b)], f"_bucket={b}")
        )
    ]
    touched_keys = winners.select(F.col(key_col))
    upserts = winners.filter(F.col("_pick.del_pri") == 0).select(
        *[F.col(f"_row.{c}").alias(c) for c in payload_cols]
    )
    from pyspark.sql.types import StructType

    # ALWAYS anchor on the manifest-recorded schema: (a) affected
    # buckets written before an earlier evolution lack the evolved
    # columns in their footers, and (b) a batch touching only such
    # buckets must not REGRESS the table schema — both are solved by
    # reading/unioning against the recorded shape, exactly as
    # read_latest does.
    rec_schema = StructType.fromJson(json.loads(manifest["_schema"]))
    if cur_paths:
        cur = spark.read.schema(rec_schema).parquet(*cur_paths)
    else:
        cur = spark.createDataFrame([], rec_schema)
    # schema evolution: a CDC batch may carry columns the table has
    # never seen (or omit optional ones) — allowMissingColumns fills
    # either side with NULLs, the add-column semantics every table
    # format ships
    new_rows = cur.join(
        F.broadcast(touched_keys), key_col, "left_anti"
    ).unionByName(upserts, allowMissingColumns=True)
    (
        new_rows.withColumn("_bucket", _bucket_expr(key_col, n_buckets))
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(os.path.join(table_dir, vdir))
    )

    new_manifest = dict(manifest)
    for b in affected:
        new_manifest[str(b)] = vdir
    new_manifest["_schema"] = new_rows.schema.json()
    _publish_manifest(table_dir, base, new_version, new_manifest, vdir)
    return new_version


def compact(spark: SparkSession, table_dir: str) -> int:
    """Rewrite EVERY bucket into one new version directory and point
    the manifest at it — the compaction pass that bounds read-side
    fan-in after many incremental versions (a reader of a heavily
    updated table otherwise touches one directory per distinct
    rewrite generation). Publishes with the same CAS pointer swap as
    apply_cdc. Returns the new version."""
    import uuid as _uuid

    base = _read_pointer(table_dir)
    manifest = _read_manifest(table_dir, base)
    n_buckets = int(manifest["_n_buckets"])
    new_version = base + 1
    vdir = f"v={new_version}-{_uuid.uuid4().hex[:8]}"  # writer-unique
    # bucket-by-bucket rewrite (bounded driver loop over n_buckets;
    # each iteration is a distributed read+write of one bucket) — rows
    # are preserved verbatim, the bucket assignment is path metadata
    for b in range(n_buckets):
        if manifest.get(str(b)) is None:
            continue
        src = os.path.join(table_dir, manifest[str(b)], f"_bucket={b}")
        if not os.path.isdir(src):
            continue
        spark.read.parquet(src).write.mode("overwrite").parquet(
            os.path.join(table_dir, vdir, f"_bucket={b}")
        )
    new_manifest = dict(manifest)
    for b in range(n_buckets):
        if os.path.isdir(os.path.join(table_dir, vdir, f"_bucket={b}")):
            new_manifest[str(b)] = vdir
        else:
            new_manifest.pop(str(b), None)
    _publish_manifest(table_dir, base, new_version, new_manifest, vdir)
    return new_version


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Delete version directories and manifests no longer reachable
    from the latest ``keep_versions`` manifests — the retention sweep
    that reclaims space after compaction, trading away time-travel
    depth explicitly. Never touches anything a retained manifest still
    references (old versions stay fully readable until swept).
    Returns the removed directory names."""
    import re as _re

    latest = _read_pointer(table_dir)
    keep = range(max(0, latest - keep_versions + 1), latest + 1)
    referenced: set[str] = set()
    for v in keep:
        try:
            m = _read_manifest(table_dir, v)
        except FileNotFoundError:
            continue
        referenced.update(
            vd for b, vd in m.items() if not b.startswith("_")
        )
    removed = []
    for entry in sorted(os.listdir(table_dir)):
        vm = _re.fullmatch(r"v=(\d+)(-[0-9a-f]+)?", entry)
        if vm and entry not in referenced and int(vm.group(1)) not in keep:
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
            removed.append(entry)
        mm = _re.fullmatch(r"manifest_v(\d+)\.json", entry)
        if mm and int(mm.group(1)) not in keep:
            os.remove(os.path.join(table_dir, entry))
            removed.append(entry)
    return removed
