"""Third batch of relational operators — the "deep TPC-H" shapes the
first two batches didn't cover: scalar-subquery threshold filters
(Q17), HAVING-gated fact self-aggregation (Q18), multi-EXISTS /
NOT-EXISTS correlated probes (Q21), and scalar-subquery + anti-join
combination (Q22), each adapted to the driver's star schema
(no l_receiptdate/l_commitdate/c_phone columns — late-ness and customer
segments are re-expressed on the columns that exist; the operator
SHAPES are the point, mirroring how the reference's pipeline composes
filter/join/aggregate stages, cf. /root/reference/lib/csv_writer.js
parse->route->aggregate composition).

Determinism policy (same as relational.py): money/quantity sums go
through DECIMAL(18,2) so every aggregate is order-independent under any
shuffle/AQE plan and bit-equal to the DuckDB oracle; derived doubles
apply the identical IEEE expression on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.sources.tables import load_table


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Q17 shape: per-group scalar-subquery threshold (avg qty per part).
# ---------------------------------------------------------------------------


@register(
    "small_quantity_part_revenue",
    oracle="""
    WITH brand_lines AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN ('Brand#1', 'Brand#2')
    ), thresholds AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*)) AS qty_cut
      FROM brand_lines GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_small_lines
    FROM brand_lines b
    JOIN thresholds t ON t.l_partkey = b.l_partkey
    WHERE b.l_quantity < t.qty_cut
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — each
    lineitem compared against a correlated scalar subquery (20% of that
    part's average quantity).

    Scale: the correlated subquery is DECORRELATED into a per-part
    aggregate joined back — the textbook rewrite. The brand filter goes
    through a broadcast semi-ish join with `part` (dimension-sized), so
    the fact table is pruned before its first shuffle; the per-part agg
    and the threshold join then share the l_partkey shuffle key, so AQE
    reuses one exchange. No window over the whole fact (a
    Window(partitionBy=part) would sort 100 TB; the agg+join does not).
    The avg is computed as exact decimal sum / count in one double
    division — order-independent, bit-equal to the oracle.
    """
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    brands = part.filter(F.col("p_brand").isin("Brand#1", "Brand#2")).select(
        "p_partkey"
    )
    brand_lines = lineitem.join(
        F.broadcast(brands), lineitem.l_partkey == brands.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = brand_lines.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(_dec("l_quantity")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_cut")
    )
    return (
        brand_lines.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-gated fact aggregation joined back to its dimensions.
# ---------------------------------------------------------------------------


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customer. (>250 ~= the p99 of per-order quantity here, as
    Q18's 300 is at SF1.)

    Scale: the HAVING aggregate runs FIRST and shrinks the fact table to
    ~1% before any join — same eager-aggregation strategy as the
    flagship query. Its shuffle key (l_orderkey) is the orders join key,
    so the exchange is reused; the surviving rows are small enough that
    AQE converts the orders/customer joins to broadcasts at runtime.
    Quantities sum in DECIMAL for order-independence.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS correlated probes (semi + anti join).
# ---------------------------------------------------------------------------


@register(
    "waiting_supplier_orders",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order. "Late" is re-expressed as shipped >365 days
    after the order date (this schema has no receipt/commit dates); the
    operator shape — correlated EXISTS (semi join) plus correlated
    NOT EXISTS (anti join) against the same fact — is Q21's exactly.

    Scale: the late set is distinct-reduced to (order, supplier) before
    probing. Both probes and the reduction shuffle on l_orderkey — one
    key, so the exchanges line up and AQE reuses them; the anti probe
    runs against the already-small late set, not the full fact. The
    `l2.l_suppkey <> l1.l_suppkey` disqualifier rides inside the join
    condition (Catalyst keeps it in the semi/anti join's on-clause —
    no post-filter materialization). Supplier dim broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    other_supplier_exists = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    only_late = other_supplier_exists.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(
            F.broadcast(supplier), F.col("l1.l_suppkey") == supplier.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: global scalar subquery + anti join.
# ---------------------------------------------------------------------------


@register(
    "idle_high_balance_customers",
    oracle="""
    WITH cutoff AS (
      SELECT MAX(o_orderdate) - INTERVAL 180 DAY AS cut FROM orders
    ), threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
            SELECT 1 FROM orders o, cutoff
            WHERE o.o_custkey = c.c_custkey AND o.o_orderdate > cutoff.cut)
    GROUP BY c.c_mktsegment
    """,
)
def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no recent orders (no order in the trailing 180 days — this
    schema has no phone column, so "recently idle" replaces the
    country-code filter; the scalar-subquery + anti-join composition is
    Q22's exactly).

    Scale: both scalar subqueries (global avg balance, max order date)
    are one-row aggregates broadcast into the plan — no recompute per
    row, no driver round-trip outside the plan. The NOT EXISTS is an
    anti join against recent orders only (date filter pushed below the
    join, pruning the probe side at the scan). The threshold is an
    exact decimal sum / count in one double division, bit-equal to the
    oracle's.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 180 DAY")).alias("cut")
    )
    threshold = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = (
        orders.join(F.broadcast(cutoff), orders.o_orderdate > F.col("cut"))
        .select("o_custkey")
    )
    return (
        customer.join(F.broadcast(threshold), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )
