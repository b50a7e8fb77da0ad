"""Plan-shape tests for the SQL-surface operators: the LATERAL+LIMIT
decorrelation claim and the recursive CTE's UnionLoop execution."""

from node_gedcom_graph_spark.operators.sql_surface import (
    copurchase_bfs_recursive_sql,
    lateral_top2_orders_per_customer,
)

SF_DIR = "/root/testdata/sf0.001"


def test_lateral_limit_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL subquery must not survive as per-row
    re-execution: Catalyst rewrites it to WindowGroupLimit + one hash
    join (same physical work as the hand-written window top-k)."""
    plan = lateral_top2_orders_per_customer(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_recursive_cte_runs_as_union_loop_and_terminates(spark):
    df = copurchase_bfs_recursive_sql(spark, SF_DIR)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "UnionLoop" in plan or "CTERelationRef" in plan
    rows = df.collect()  # dist < 3 bound => recursion terminates
    assert all(0 <= r.dist <= 3 for r in rows)
    assert any(r.dist == 0 for r in rows)  # the seed itself
