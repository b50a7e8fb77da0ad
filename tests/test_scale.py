"""Scale-path behaviors: salted joins match plain joins; bucketed joins
run shuffle-free; multimodal resize/frame-sample plumbing."""

import pytest
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.scale import (
    plan_has_exchange,
    salted_join,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share key 0 (hot key), dims 0..9.
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("fact_val"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dim_val")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").groupBy("k", "dim_val").count()
    salted = salted_join(fact, dim, "k", n_salt=8).groupBy("k", "dim_val").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    spread = (
        fact.withColumn("_salt", F.floor(F.rand(seed=42) * 8).cast("int"))
        .filter(F.col("k") == 0)
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8  # hot key occupies all 8 sub-partitions


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the join path bucketing targets (at real scale neither
        # fact side is broadcastable anyway).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            8,
        )
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # Shuffle-free: bucket layout satisfies both the join and the agg.
        assert not plan_has_exchange(j)
        # And it still computes the right thing.
        plain = (
            orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_unbucketed_join_has_exchange(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert plan_has_exchange(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ------------------------------------------------- multimodal plumbing


def test_resize_images_deterministic(spark):
    from node_gedcom_graph_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two")], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in resize_images(docs, 128, 64).collect()}
    again = {r.doc_id: r for r in resize_images(docs, 128, 64).collect()}
    assert out[1].width == 128 and out[1].height == 64
    assert len(out[1].payload) == (128 * 64) // 64
    assert bytes(out[1].payload) == bytes(again[1].payload)
    assert bytes(out[1].payload) != bytes(out[2].payload)


def test_frame_sample_shape(spark):
    from node_gedcom_graph_spark.operators.multimodal import sample_video_frames

    docs = spark.createDataFrame(
        [(1, b"x" * 400), (2, b"y" * 10)], "doc_id long, payload binary"
    )
    rows = sample_video_frames(docs, every_n=30, max_frames=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # fake stream length = 1 + len % 300 -> doc1: 101 frames -> 4 samples
    assert [r.frame_idx for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] == [
        0,
        30,
        60,
        90,
    ]
    assert all(r.ts_ms == r.frame_idx * 33 for r in rows)
    assert len(by_doc[2]) == 1  # 11 frames -> one sample at idx 0


def test_real_resize_ppm_nearest_neighbor(spark):
    """The REAL resize path: 4x4 P6 downsampled to 2x2 must gather
    exactly rows/cols {0, 2} (nearest-neighbor index math), roundtripped
    through the native encoder. Video frame sampling stays stubbed
    (compressed codecs absent)."""
    import numpy as np

    from node_gedcom_graph_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
        sample_video_frames,
    )

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    docs = spark.createDataFrame(
        [(1, bytes(encode_ppm(img)))], "doc_id long, payload binary"
    )
    [row] = resize_images(docs, 2, 2, fake=False).collect()
    assert (decode_ppm(bytes(row.payload)) == img[[0, 2]][:, [0, 2]]).all()
    bad = spark.createDataFrame([(1, b"zz")], "doc_id long, payload binary")
    with pytest.raises(Exception, match="netpbm"):
        resize_images(bad, 2, 2, fake=False).collect()
    # a PPM payload is not a video container: the real sampler refuses.
    with pytest.raises(Exception, match="Y4M"):
        sample_video_frames(docs, fake=False).collect()


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """The 100 TB layout claim in sources/tables.py: a date-partitioned
    dataset read with a date predicate must prune at the DIRECTORY
    level (PartitionFilters), not scan-and-filter. Pin both the plan
    (non-empty PartitionFilters, empty PushedFilters for the partition
    column) and the row counts."""
    from pyspark.sql import functions as F

    from node_gedcom_graph_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("event_date") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # The partition predicate must NOT appear as a data filter — it is
    # resolved against directory names before any file opens.
    assert "PushedFilters: []" in plan
    expected = events.filter(F.to_date("ts") == "2024-01-02").count()
    assert expected > 0
    assert one_day.count() == expected


def test_y4m_codec_roundtrip_and_real_sampling(spark):
    """The REAL video parser: a 3-frame hand-built Y4M roundtrips
    through encode/decode, and fake=False sampling emits the actual
    plane rasters of every sampled frame with rate-derived timestamps."""
    import numpy as np

    from node_gedcom_graph_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_video_frames,
    )

    frames = [
        np.full((3, 2, 4), v, dtype=np.uint8) for v in (10, 20, 30)
    ]
    payload = encode_y4m(frames, fps_num=10, fps_den=1)
    back, w, h, (fn, fd) = decode_y4m(payload)
    assert (w, h, fn, fd) == (4, 2, 10, 1)
    assert all((a == b).all() for a, b in zip(back, frames))

    docs = spark.createDataFrame(
        [(1, bytes(payload))], "doc_id long, payload binary"
    )
    got = {
        r.frame_idx: (r.ts_ms, bytes(r.frame))
        for r in sample_video_frames(docs, every_n=2, fake=False).collect()
    }
    assert set(got) == {0, 2}
    assert got[0][0] == 0 and got[2][0] == 200  # 10 fps -> 100 ms/frame
    assert got[2][1] == frames[2].tobytes()
