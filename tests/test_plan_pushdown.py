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
    # r10: the correlated EXISTS/NOT EXISTS probes are computed as
    # per-order counts over the (order, supplier) pair set, so the
    # fact table crosses the network ONCE: the lineitem<->orders date
    # join's l_orderkey exchanges are the only big shuffles, and the
    # pair collapse, the per-order counts, and the pair<->count join
    # all reuse that partitioning. No semi/anti re-shuffle of the
    # fact, and <= 3 hash exchanges in total (lineitem, orders, the
    # final s_name rollup).
    assert "LeftSemi" not in plan
    assert "LeftAnti" not in plan
    # NOTE: the exchange-count bound is coupled to the current Spark
    # version's plan rendering ("Exchange hashpartitioning"); a Spark
    # upgrade that renames the node would need this updated (r10
    # ADVICE — kept because the bound is the point of the rewrite).
    assert plan.count("Exchange hashpartitioning") <= 3
    # The fact scan stays pruned to the three consumed columns
    # (matched loosely: the timestamp flavor and trailing fields are
    # Spark-version / fixture-inference dependent).
    import re

    assert re.search(
        r"struct<l_orderkey:bigint,l_suppkey:bigint,l_shipdate:[^>,]*>",
        plan,
    ), "lineitem scan not pruned to (l_orderkey, l_suppkey, l_shipdate)"


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


def test_tpch2_plans(spark):
    from node_gedcom_graph_spark.operators.relational_tpch2 import (
        array_funcs_order_quantities,
        events_anomaly_zscore,
        min_cost_supplier_per_part,
        top_revenue_suppliers,
    )

    plan = _plan(min_cost_supplier_per_part(spark, SF_DIR))
    # The size filter reaches the part scan; the fact reads 3 columns;
    # the correlated MIN is agg+join-back, never a window over the fact.
    assert "EqualTo(p_size,1)" in plan
    assert (
        "struct<l_partkey:bigint,l_suppkey:bigint,l_extendedprice:double>"
        in plan
    )
    assert "Window" not in plan

    plan = _plan(top_revenue_suppliers(spark, SF_DIR))
    # The revenue view is cached: both branches (MAX probe + join-back)
    # read the materialized per-supplier rows, so the fact is scanned
    # and shuffled once at cache fill, not once per branch. (The
    # lineitem subtree may still render inside each InMemoryTableScan's
    # cached-plan block, so count cache scans, not parquet strings.)
    assert plan.count("InMemoryTableScan") == 2

    plan = _plan(events_anomaly_zscore(spark, SF_DIR))
    # One shuffle on user_id feeding one Window exec; the three frame
    # aggregates share it (CollapseWindow), and the scan reads only the
    # four needed columns.
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "struct<event_id:bigint,ts:" in plan

    plan = _plan(array_funcs_order_quantities(spark, SF_DIR))
    # One shuffle on the group key; every array probe is a codegen
    # expression over the collected array — no UDF, no extra exchange.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_unigram_and_overlap_plans(spark):
    from node_gedcom_graph_spark.operators.textstats import (
        cross_source_overlap,
        text_unigram_logprob,
    )

    plan = _plan(text_unigram_logprob(spark, SF_DIR))
    # Per-doc NLL average is map-side combined before the doc_id
    # exchange (partial_avg), and the corpus total is a one-row
    # broadcast, not a recompute-per-row subquery.
    assert "partial_avg" in plan
    assert "BroadcastNestedLoopJoin" in plan

    plan = _plan(cross_source_overlap(spark, SF_DIR))
    # Pair expansion is a per-fingerprint set comprehension — there is
    # NO self-join anywhere in the plan (the naive fp⋈fp would shuffle
    # the fingerprint table twice and explode on hot fingerprints).
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3
