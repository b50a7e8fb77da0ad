"""Exactly-once foreachBatch sink semantics (streaming/sinks.py):
replay idempotence, partial-write repair, and committed-only reads."""

import os

from pyspark.sql import functions as F

from node_gedcom_graph_spark.streaming.sinks import (
    idempotent_epoch_writer,
    read_committed,
)


def _batch(spark, ids):
    return spark.createDataFrame([(i, f"v{i}") for i in ids], "id long, v string")


def test_replayed_epoch_writes_once(spark, tmp_path):
    out = str(tmp_path / "sink")
    w = idempotent_epoch_writer(out)
    w(_batch(spark, range(10)), 0)
    w(_batch(spark, range(10)), 0)  # crash-recovery replay of epoch 0
    w(_batch(spark, range(10, 15)), 1)
    df = read_committed(spark, out)
    assert df.count() == 15  # not 25: the replay did not append a copy
    assert df.select("id").distinct().count() == 15


def test_partial_write_is_repaired_in_place(spark, tmp_path):
    out = str(tmp_path / "sink")
    # simulate a crash mid-epoch: data landed (partially) but no marker
    _batch(spark, range(3)).write.mode("overwrite").parquet(f"{out}/epoch=0")
    assert not os.path.exists(f"{out}/_committed/0")
    # the recovery replay delivers the FULL batch and must repair it
    w = idempotent_epoch_writer(out)
    w(_batch(spark, range(10)), 0)
    df = read_committed(spark, out)
    assert df.count() == 10
    assert os.path.exists(f"{out}/_committed/0")


def test_uncommitted_epochs_are_invisible_to_readers(spark, tmp_path):
    out = str(tmp_path / "sink")
    w = idempotent_epoch_writer(out)
    w(_batch(spark, range(5)), 0)
    # epoch 1 data exists but is NOT marker-committed (crash before marker)
    _batch(spark, range(100, 104)).write.parquet(f"{out}/epoch=1")
    df = read_committed(spark, out)
    assert df.agg(F.max("id")).collect()[0][0] == 4  # epoch 1 invisible


def test_end_to_end_stream_through_idempotent_sink(spark, tmp_path):
    """Drive a real availableNow stream through the sink and check the
    committed output matches the source exactly."""
    src = str(tmp_path / "src")
    _batch(spark, range(50)).write.json(src)
    out = str(tmp_path / "sink")
    stream = (
        spark.readStream.schema("id long, v string").json(src)
    )
    q = (
        stream.writeStream.foreachBatch(idempotent_epoch_writer(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert read_committed(spark, out).count() == 50
