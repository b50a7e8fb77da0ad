"""Scan-level plan assertions: predicates reach the parquet reader
(PushedFilters) and projections prune the read schema. A scan that reads
all columns for a narrow projection, or filters after the scan, is wrong
at any scale — these tests pin the claims the query docstrings make.

(Assertions are substring checks on the physical-plan string: Spark
truncates long PushedFilters/ReadSchema renderings, so a structured
parse of the full lists is not reliable.)"""

from node_gedcom_graph_spark.operators.relational import (
    flagship_revenue_by_region,
    pricing_summary,
)
from node_gedcom_graph_spark.operators.relational_ext import (
    shipping_priority_top10,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_shipdate_and_prunes(spark):
    plan = _plan(pricing_summary(spark, SF_DIR))
    assert "LessThanOrEqual(l_shipdate" in plan
    # 16-column table pruned: the read schema starts at l_quantity —
    # l_orderkey/l_partkey/l_suppkey/l_linenumber never leave the file.
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double" in plan


def test_flagship_prunes_every_dimension_scan(spark):
    plan = _plan(flagship_revenue_by_region(spark, SF_DIR))
    # customer: 5 columns, only the two join keys read.
    assert "struct<c_custkey:bigint,c_nationkey:int>" in plan
    # orders: only the two join keys; no status/price/date/priority.
    assert "struct<o_orderkey:bigint,o_custkey:bigint>" in plan
    # lineitem: join key + the two revenue inputs only.
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_q3_pushes_all_three_predicates(spark):
    plan = _plan(shipping_priority_top10(spark, SF_DIR))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
