"""Plan-shape and semantics tests for the second relational batch
(operators/relational_ext.py). Value correctness is covered by the
DuckDB oracle gate; these pin the SCALE claims each docstring makes."""

from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.relational_ext import (
    correlated_orders_above_cust_avg,
    mode_priority_by_status,
    percent_rank_cume_dist_balances,
    sample_hash_stratified,
    shipping_priority_top10,
    string_agg_nations_per_region,
    unpivot_part_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


def test_correlated_subquery_is_decorrelated(spark):
    """Catalyst must rewrite the scalar subquery into an aggregate+join —
    no per-row subquery execution survives into the physical plan."""
    plan = correlated_orders_above_cust_avg(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan  # decorrelated, not re-executed per row
    assert "HashAggregate" in plan and "Join" in plan


def test_top10_uses_take_ordered_not_global_sort(spark):
    plan = shipping_priority_top10(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unpivot_is_expand_without_exchange(spark):
    df = unpivot_part_metrics(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Exchange" not in plan  # narrow op: wide→long without a shuffle
    n_part = spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    assert df.count() == 2 * n_part


def test_sample_is_deterministic_and_stratified(spark):
    a = sorted(r.doc_id for r in sample_hash_stratified(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in sample_hash_stratified(spark, SF_DIR).collect())
    assert a == b and len(a) > 0  # same rows on every run — no RNG state
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {
        r["source"]: r["kept"] / r["total"]
        for r in docs.join(
            sample_hash_stratified(spark, SF_DIR).select("doc_id").withColumn("k", F.lit(1)),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(F.count("*").alias("total"), F.count("k").alias("kept"))
        .collect()
    }
    # 'web' targets 8/16 = 50%, others 4/16 = 25%; loose bounds for small N.
    assert 0.25 < rates.get("web", 0.5) < 0.75
    for src, rate in rates.items():
        if src != "web":
            assert rate < 0.5


def test_mode_tie_break_is_smallest_value(spark):
    rows = spark.createDataFrame(
        [("O", "2-HIGH"), ("O", "1-URGENT"), ("O", "3-LOW"), ("O", "1-URGENT"), ("O", "2-HIGH")],
        ["o_orderstatus", "o_orderpriority"],
    )
    rows.write.mode("overwrite").parquet("/tmp/_mode_tiebreak/orders.parquet")
    out = mode_priority_by_status(spark, "/tmp/_mode_tiebreak").collect()
    assert len(out) == 1 and out[0].mode_priority == "1-URGENT" and out[0].cnt == 2


def test_string_agg_is_sorted(spark):
    for r in string_agg_nations_per_region(spark, SF_DIR).collect():
        names = r.nations.split(",")
        assert names == sorted(names) and len(names) == r.n_nations


def test_rank_windows_bounds(spark):
    rows = percent_rank_cume_dist_balances(spark, SF_DIR).collect()
    assert all(0.0 <= r.pct_rank <= 1.0 and 0.0 < r.cume <= 1.0 for r in rows)
    # first_value is the segment-wide minimum-balance custkey everywhere.
    per_seg = {}
    for r in rows:
        per_seg.setdefault(r.c_mktsegment, set()).add(r.poorest_custkey)
    assert all(len(v) == 1 for v in per_seg.values())
