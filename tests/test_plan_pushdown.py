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


def test_tpch_deep_scans_prune_and_push(spark):
    from node_gedcom_graph_spark.operators.relational_tpch import (
        small_quantity_part_revenue,
        waiting_supplier_orders,
    )

    plan = _plan(small_quantity_part_revenue(spark, SF_DIR))
    # The brand filter must reach the part scan (no full-dim read)...
    assert "In(p_brand, [Brand#1,Brand#2])" in plan
    # ...and lineitem reads only partkey/quantity/extendedprice.
    assert (
        "struct<l_partkey:bigint,l_quantity:double,l_extendedprice:double>" in plan
    )

    plan = _plan(waiting_supplier_orders(spark, SF_DIR))
    # Supplier dim is broadcast, never shuffled.
    assert "BroadcastHashJoin" in plan
    # The EXISTS/NOT EXISTS probes plan as semi/anti joins, not
    # materialized subqueries.
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_repetition_stats_single_gram_shuffle(spark):
    """The 1/2/3-gram metrics must come from ONE pass: a single explode
    feeding a single (doc_id, k, gram) exchange — not one scan+shuffle
    per gram size."""
    from node_gedcom_graph_spark.operators.textstats import text_repetition_stats

    plan = _plan(text_repetition_stats(spark, SF_DIR))
    assert plan.count("Generate explode") == 1
    # Exchanges: gram counts, (doc_id, k) rollup, final doc_id pivot.
    assert plan.count("Exchange hashpartitioning") <= 3


def test_centroid_assign_broadcasts_centroids(spark):
    """The corpus side must stream: centroids broadcast into a nested
    loop, argmax as hash-agg (no per-vector window sort)."""
    from node_gedcom_graph_spark.operators.similarity import (
        embedding_centroid_assign,
    )

    plan = _plan(embedding_centroid_assign(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_copurchase_graph_reuses_cached_edges(spark):
    """The co-purchase edge list feeds many plan branches (degrees,
    orientation, wedge + closing joins, 3 PageRank iterations). Without
    a materialization point each branch re-derives the whole
    pair-generation subtree — the triangle plan measured 90 parquet
    scans before caching. Pin: the cache is used, the raw lineitem
    scan appears at most twice (cache-fill subtree rendering), and the
    participation/symmetrize fan-outs are single-pass explodes, not
    unionAll re-evaluations."""
    from node_gedcom_graph_spark.operators.graphalgo import (
        copurchase_pagerank_3iter,
        copurchase_triangles,
    )

    plan = _plan(copurchase_triangles(spark, SF_DIR))
    assert "InMemoryTableScan" in plan
    assert plan.count("Generate explode") >= 2  # deg + participation
    plan = _plan(copurchase_pagerank_3iter(spark, SF_DIR))
    assert "InMemoryTableScan" in plan
    assert "Generate inline" in plan  # single-pass symmetrize
