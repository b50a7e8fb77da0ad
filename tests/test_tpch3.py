"""Plan-shape and semantics tests for the fifth relational batch
(operators/relational_tpch3.py) and the streaming session windows.
Value correctness is covered by the DuckDB oracle gate; these pin the
SCALE claims each docstring makes and the classic semantic traps the
shapes exist to exercise."""

import datetime

from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.relational_tpch3 import (
    customer_order_count_distribution,
    disjunctive_brand_quantity_revenue,
    late_shipment_order_priority,
    returned_item_top_customers,
)

SF_DIR = "/root/testdata/sf0.001"


def test_q4_exists_is_semi_join_counting_orders_once(spark):
    """The EXISTS must plan as LEFT SEMI (one output row per order no
    matter the line fan-out), and agree with the inner-join+distinct
    spelling of the same predicate."""
    df = late_shipment_order_priority(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    expected = (
        o.join(
            lineitem,
            (lineitem.l_orderkey == o.o_orderkey)
            & (lineitem.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
    )
    got = {r.o_orderpriority: r.n_orders for r in df.collect()}
    want = {r.o_orderpriority: r["count"] for r in expected.collect()}
    assert got == want


def test_q13_outer_join_keeps_zero_order_customers(spark):
    """The priority exclusion rides the ON clause, so customers whose
    every order is excluded (or who have no orders) must still appear —
    the distribution's counts sum to ALL customers."""
    df = customer_order_count_distribution(spark, SF_DIR)
    n_customers = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert df.agg(F.sum("n_customers")).collect()[0][0] == n_customers


def test_q19_quantity_hull_pushed_to_fact_scan(spark):
    """Catalyst must derive the quantity disjunction as a scan filter on
    lineitem (pruning before the join) and broadcast the brand-filtered
    part side."""
    plan = disjunctive_brand_quantity_revenue(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the lineitem FileScan carries the OR-ed quantity bounds
    scan_lines = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "l_quantity" in ln
    ]
    assert any("l_quantity" in ln and "DataFilters" in ln for ln in scan_lines)


def test_q10_top20_is_take_ordered_not_global_sort(spark):
    plan = returned_item_top_customers(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_session_window_gap_boundary_matches_islands_oracle(spark):
    """Pin the session-merge convention the streaming oracle encodes:
    an event landing EXACTLY 30:00 after the previous one still merges
    (Spark's session windows are touch-inclusive); 30:01 breaks. The
    DuckDB islands oracle for stream_session_windows must therefore
    break strictly at > 30 min — if either side's convention shifted,
    this catches it in batch, where session_window uses the same merge
    logic as the streaming state store."""
    t0 = datetime.datetime(2020, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=30, seconds=1)),  # breaks
        (2, t0),
        (2, t0 + datetime.timedelta(minutes=30)),  # exact gap: merges
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    sessions = {r.user_id: r.n_sessions for r in got.collect()}
    assert sessions == {1: 2, 2: 1}
