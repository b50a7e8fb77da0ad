"""Exactly-once foreachBatch sinks.

Structured Streaming's checkpoint makes SOURCE offsets exactly-once,
but a foreachBatch SINK body re-runs on recovery (the last uncommitted
epoch is replayed), so a naive ``mode("append")`` write duplicates rows
on every crash-retry. The reference engine meets the same problem at
its publish step and solves it with staging-dir + atomic swap
(lib/neo4j.js:20-51); this module is the streaming-sink analog:
epoch-partitioned overwrite + commit markers.

Pattern (the one the Spark docs recommend building on batchId):
- each epoch writes to its OWN partition directory with
  ``mode("overwrite")`` — a replayed epoch overwrites its own partial
  output instead of appending a second copy (idempotent repair);
- a commit marker per epoch short-circuits fully-committed replays
  (skip the recompute entirely, not just the duplicate);
- readers see only marker-committed epochs via ``read_committed``.

At 100 TB the markers live on the object store next to the data (same
rename-based visibility parquet's _SUCCESS files use); the per-epoch
directory layout also gives retention/compaction a natural unit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _marker_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_committed")


def idempotent_epoch_writer(out_dir: str):
    """Returns a ``foreachBatch`` function writing each epoch to
    ``out_dir/epoch=<id>/`` exactly once across crash-replays."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(_marker_dir(out_dir), str(epoch_id))
        if os.path.exists(marker):
            return  # fully-committed epoch replayed after recovery: skip
        # overwrite, not append: a HALF-written epoch (crash mid-write,
        # no marker yet) is repaired in place by the replay.
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        os.makedirs(_marker_dir(out_dir), exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed\n")

    return _process


def read_committed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read ONLY marker-committed epochs (uncommitted partials are
    invisible, mirroring the reference's staged-then-swapped publish)."""
    committed = sorted(
        int(e) for e in os.listdir(_marker_dir(out_dir))
    ) if os.path.isdir(_marker_dir(out_dir)) else []
    paths = [os.path.join(out_dir, f"epoch={e}") for e in committed]
    if not paths:
        raise FileNotFoundError(f"no committed epochs under {out_dir}")
    return spark.read.parquet(*paths)
