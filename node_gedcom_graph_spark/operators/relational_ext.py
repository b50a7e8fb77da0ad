"""Second batch of relational operators — subquery decorrelation, exact
statistical moments, deterministic mode, ordered string aggregation,
rank-family windows, unpivot/melt, a TPC-H Q3-shaped top-k join, and
deterministic hash-based stratified sampling.

These extend the §2.1 checklist surface (SURVEY.md) the same way
`relational.py` does: every query is DuckDB-oracle-checked with matching
column aliases, and each docstring carries the 100 TB scale rationale.

Determinism policy for floating-point outputs: wherever a float is
DERIVED (stddev, variance, correlation), we aggregate exact DECIMAL
moments first (order-independent under any shuffle/AQE plan) and apply
the same IEEE double formula on both the Spark and DuckDB sides — the
results are bit-identical, not merely close.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators import persist_tracked, register
from node_gedcom_graph_spark.sources.tables import load_table


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Correlated scalar subquery — Catalyst decorrelation.
# ---------------------------------------------------------------------------


@register(
    "correlated_orders_above_cust_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice
    FROM orders o
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) >
          (SELECT AVG(CAST(o2.o_totalprice AS DECIMAL(18,2)))
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above their own customer's average (correlated
    scalar subquery).

    Expressed through the SQL API on purpose: Catalyst's subquery
    decorrelation (RewriteCorrelatedScalarSubquery) turns the per-row
    subquery into one grouped aggregate + a join on o_custkey — there is
    no per-row re-execution, so the plan is two scans of orders + one
    shuffle, identical to the hand-written groupBy+join. At 100 TB the
    aggregate side is a partial/final hash-agg on the same key the join
    shuffles on, so AQE can plan a single exchange reuse.

    Numeric note: the comparison is decimal-vs-decimal-average. The
    minimum nonzero gap between a 2-decimal price and a k-row average is
    0.01/k, while Spark's decimal AVG rounds at 1e-6 and DuckDB's double
    AVG errs at ~1e-12 — both far below the gap for any realistic k, so
    row membership matches exactly.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice
        FROM orders o
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) >
              (SELECT AVG(CAST(o2.o_totalprice AS DECIMAL(18,2)))
               FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ---------------------------------------------------------------------------
# Statistical aggregates from exact moments (bit-identical doubles).
# ---------------------------------------------------------------------------

_MOMENT_DERIVE = """
    SELECT l_returnflag,
           n,
           CAST(sx AS DOUBLE) / n AS mean_qty,
           (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS var_qty,
           SQRT((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (n - 1)) AS stddev_price,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (n - 1) AS covar_qty_price,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
               AS corr_qty_price
    FROM moments
"""

_MOMENT_AGG = """
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
"""


@register(
    "stats_moments_lineitem",
    oracle=f"WITH moments AS ({_MOMENT_AGG}) {_MOMENT_DERIVE}",
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / covariance / correlation per return flag,
    derived from EXACT decimal moments (n, Σx, Σy, Σx², Σy², Σxy).

    Spark's built-in stddev/corr stream doubles in shuffle-dependent
    order, so their low bits vary run-to-run and engine-to-engine. Here
    the aggregation layer is exact decimal arithmetic — fully
    order-independent, map-side-combinable, one shuffle on the group
    key — and only the final per-group derivation happens in IEEE
    doubles, with the identical expression on the oracle side, so the
    outputs are bit-identical. This is the moment-sketch pattern that
    also underlies distributed variance at 100 TB: the partial state is
    6 numbers per group regardless of row count.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(f"WITH moments AS ({_MOMENT_AGG}) {_MOMENT_DERIVE}")


# ---------------------------------------------------------------------------
# Deterministic mode (most frequent value with explicit tie-break).
# ---------------------------------------------------------------------------


@register(
    "mode_priority_by_status",
    oracle="""
    WITH counted AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM counted WHERE rn = 1
    """,
)
def mode_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode of o_orderpriority per o_orderstatus, ties broken by the
    lexicographically smallest value (SQL MODE() leaves ties undefined —
    we pin them so the result is reproducible across engines and runs).

    Scale: count-then-argmax — the groupBy is a partial/final hash-agg,
    and the window runs over the tiny (status, priority) count table,
    not the fact table, so the sort is trivial at any input size.
    """
    orders = load_table(spark, sf_dir, "orders")
    counted = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg).
# ---------------------------------------------------------------------------


@register(
    "string_agg_nations_per_region",
    oracle="""
    SELECT r.r_name AS region_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG-equivalent: comma-joined sorted nation names per region.

    Spark has no ordered STRING_AGG; the idiomatic spelling is
    collect_list → array_sort → array_join, which makes the
    nondeterminism explicit and then removes it (collect_list order
    depends on partitioning; the sort pins it). collect_list is only
    safe when per-group cardinality is bounded — here ≤25; for unbounded
    groups prefer a windowed concat or an iterative fold.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


# ---------------------------------------------------------------------------
# Rank-family windows: percent_rank / cume_dist / nth value.
# ---------------------------------------------------------------------------


@register(
    "percent_rank_cume_dist_balances",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS pct_rank,
           CUME_DIST() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS cume,
           FIRST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal, c_custkey) AS poorest_custkey
    FROM customer
    """,
)
def percent_rank_cume_dist_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist + first_value over customer balances
    within market segment (ties pinned by custkey so rank functions are
    reproducible).

    Scale: one shuffle on c_mktsegment + per-partition sort. Five
    segments means five coarse partitions — at 100 TB this skews, so the
    production variant pre-ranges on (segment, balance-bucket) or uses
    approx quantiles; the window form is the exact-semantics baseline.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_custkey"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide → long).
# ---------------------------------------------------------------------------


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of part's numeric columns (the inverse of the
    pivot op): (p_partkey, metric, value) rows.

    Uses the native `unpivot` (Spark 3.4+ melt) — compiled to an Expand
    node, a narrow operator: no shuffle, no UDF, output is 2× the input
    rows produced streamingly through whole-stage codegen. The oracle
    spells the same thing as UNION ALL, which DuckDB executes as two
    scans; Expand does it in one.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped top-k over a filtered 3-way join.
# ---------------------------------------------------------------------------


@register(
    "shipping_priority_top10",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-06-30 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1999-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) DESC,
             o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue unshipped orders in one
    market segment (filtered 3-way join → grouped agg → global top-k).

    Scale notes: the segment filter pushes into the customer scan
    (PushedFilters), the date predicates push into orders/lineitem —
    Catalyst places all three below the joins. The grouped agg reuses
    the l_orderkey shuffle from the join. The final top-10 is
    TakeOrderedAndProject: per-partition heaps of size 10 + a driver
    merge — no global sort at any scale. Revenue is exact decimal, so
    the ordering (and thus the LIMIT cut) is deterministic; ties are
    pinned by (o_orderdate, l_orderkey).
    """
    cutoff = "1999-06-30 00:00:00"
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).alias("rev_dec"))
        .orderBy(F.desc("rev_dec"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic hash-based stratified sampling (training-data op).
# ---------------------------------------------------------------------------


@register(
    "sample_hash_stratified",
    oracle="""
    SELECT doc_id, source, lang
    FROM documents
    WHERE SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) <
          CASE WHEN source = 'web' THEN '8' ELSE '4' END
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: keep a doc iff the first hex
    digit of md5(doc_id) clears a per-source threshold (50% for 'web',
    25% otherwise).

    This is how a 100 TB curation pipeline samples: a pure, stateless
    filter on a content-derived hash — no RNG state, no shuffle, no
    driver coordination; the same doc is kept or dropped on every run,
    on any cluster layout, and the predicate evaluates inside the scan
    stage. Contrast df.sample(), whose output depends on partitioning
    and seed plumbing. Rates are adjusted per stratum by varying the
    threshold (here via CASE on source; in production a broadcast map
    of per-source rates).
    """
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("source") == "web", F.lit("8")).otherwise(F.lit("4"))
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.filter(digit < threshold).select("doc_id", "source", "lang")


# ---------------------------------------------------------------------------
# Skew-salted join, surfaced in the correctness gate.
# ---------------------------------------------------------------------------


@register(
    "salted_join_supplier_revenue",
    oracle="""
    SELECT s.s_nationkey,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
)
def salted_join_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue through an explicitly SALTED join
    (operators/scale.salted_join): fact rows get a deterministic salt in
    [0,8), the supplier side is replicated once per salt value, and the
    join key becomes (s_suppkey, salt) — a hot supplier's rows land in 8
    shuffle partitions instead of one.

    The oracle is the PLAIN join: salting must be a pure physical
    rewrite with zero semantic effect, and this entry pins that under
    the driver's value-hash at every sf. The salt expression is
    content-derived (xxhash64 of the orderkey/linenumber), not rand() —
    identical row placement on retries and under AQE replans. At TPC-H
    uniformity salting is overhead; the entry exists to keep the scale
    path's semantics continuously verified (AQE skew-join handles the
    common case; explicit salting covers single-key hotspots AQE splits
    poorly, e.g. one key larger than an executor).
    """
    from node_gedcom_graph_spark.operators.scale import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).cast("int")
    joined = salted_join(lineitem, supplier, "l_suppkey", n_salt=8, salt_expr=salt)
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# VariantType semi-structured extraction (Spark 4).
# ---------------------------------------------------------------------------


@register(
    "variant_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema ingestion via Spark 4's VARIANT type: parse_json once
    into the binary variant encoding, then typed variant_get extraction.

    Versus get_json_object (string re-parse per extraction), VARIANT
    parses once and every subsequent path access reads the binary
    encoding — the right shape for wide semi-structured event payloads
    where a 100 TB pipeline extracts many fields: store the column as
    VARIANT in parquet and each field access skips the parse entirely.
    The oracle reads the same field with DuckDB's JSON functions.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.select(k.alias("k"), F.col("value"))
        .groupBy(F.pmod(F.col("k"), F.lit(10)).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Map functions (§2.1 array/map/JSON family).
# ---------------------------------------------------------------------------


@register(
    "map_functions_user_type_counts",
    oracle="""
    SELECT user_id, event_type, n * 2 AS n_doubled
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    WHERE n >= 2
    """,
)
def map_functions_user_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapType function family end-to-end: per user, build a
    map<event_type, count> (map_from_entries over collected structs),
    drop rare entries with map_filter, rescale values with
    transform_values, then explode back to rows so the DuckDB oracle can
    check the values. This is the §2.1 map surface the GEDCOM node
    model uses internally (nodes as map<flat_key, value>), exercised on
    the events table where an oracle exists.

    Scale: the per-user map is bounded by the event-type vocabulary
    (not event count) — safe to materialize per key; one shuffle for
    the (user, type) count, one for the per-user collect.
    """
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    cooked = as_map.select(
        "user_id",
        F.transform_values(
            F.map_filter("type_counts", lambda k, v: v >= 2),
            lambda k, v: v * 2,
        ).alias("m"),
    )
    e = F.explode("m")
    return cooked.select("user_id", e.alias("event_type", "n_doubled"))


# ---------------------------------------------------------------------------
# Mergeable sketches: two-level rollup without re-scanning.
# ---------------------------------------------------------------------------


@register("sketch_rollup_region")  # no SQL oracle: DataSketches binary state
def sketch_rollup_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch rollup: per-nation HLL (distinct customers) and
    KLL (balance quantiles) sketches, MERGED up to region level —
    estimates come from combining the partial sketches, never from
    re-scanning customers.

    This is the pattern that matters at 100 TB: sketches are mergeable
    partial aggregates (HLL register-max / KLL compaction are
    order-independent), so a daily pipeline keeps per-partition
    sketches and answers distinct/quantile rollups at any grouping
    level by union alone — same shape as Spark's own partial/final
    aggregation, but the partial state is persistable and reusable
    across jobs. Error bounds are asserted in tests (rows-only here:
    the sketch state is engine-specific binary).
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    per_nation = customer.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("hll"),
        F.kll_sketch_agg_double(F.col("c_acctbal")).alias("kll"),
    )
    return (
        per_nation.join(nation, per_nation.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_customers"),
            # KLL has no union AGGREGATE (merge is a binary scalar), so
            # fold the bounded per-nation sketch list (<= 25/region):
            # collect_list -> left fold with kll_sketch_merge_double.
            F.collect_list("kll").alias("klls"),
        )
        .select(
            "region_name",
            "approx_customers",
            F.kll_sketch_get_quantile_double(
                F.aggregate(
                    F.slice(F.col("klls"), 2, F.size("klls") - 1),
                    F.element_at(F.col("klls"), 1),
                    lambda acc, x: F.kll_sketch_merge_double(acc, x),
                ),
                F.lit(0.5),
            ).alias("approx_median_balance"),
        )
    )


# ---------------------------------------------------------------------------
# Multiset set operations (ALL variants).
# ---------------------------------------------------------------------------


@register(
    "set_ops_all_priorities",
    oracle="""
    SELECT o_orderpriority FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def set_ops_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each open-order priority row is
    cancelled by at most one finished-order row, surviving copies keep
    their multiplicity (the distinct-flavored set_ops_customer_keys
    covers INTERSECT; this completes the §2.1 set-op family with the
    ALL variants Spark implements as a left-anti-style hash join on
    counted duplicates).

    Scale: one shuffle per side on the compared column; multiplicities
    are carried as counts, not replicated rows, inside the join.
    """
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(done_p)


# ---------------------------------------------------------------------------
# RANGE window frame over a time interval (rolling 30-day totals).
# ---------------------------------------------------------------------------

_RANGE_WINDOW_SQL = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d_total
    FROM orders
"""


# The same text runs on both engines (the dialect overlap covers it),
# so the oracle IS the query string — no drift possible.
@register("window_range_30d_order_totals", oracle=_RANGE_WINDOW_SQL)
def window_range_30d_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day spend per customer — a RANGE frame over the
    event-time column, which is VALUE-based: the frame holds every row
    within the interval of the current row's date, regardless of row
    count (and peers with the same date share one frame), unlike the
    ROWS frames used by the running-total/lag/top-k queries. The exact
    decimal sum keeps the output order-independent and engine-exact.

    Scale: one shuffle on o_custkey + per-partition sort on date; the
    runtime keeps a sliding aggregate over the value window — state is
    the rows inside 30 days, not the whole partition.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RANGE_WINDOW_SQL)


# ---------------------------------------------------------------------------
# Time-series resampling: hourly spine + gap-fill + forward-fill.
# ---------------------------------------------------------------------------


@register(
    "resample_hourly_gapfill",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events WHERE user_id <= 5
    ), u AS (
      SELECT DISTINCT user_id FROM events WHERE user_id <= 5
    ), spine AS (
      SELECT u.user_id,
             unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
      FROM u, b
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv
      FROM events WHERE user_id <= 5 GROUP BY 1, 2
    )
    SELECT s.user_id, s.h AS hour,
           COALESCE(hy.n, 0) AS n_events,
           CAST(LAST_VALUE(hy.sv IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS ffill_sum
    FROM spine s
    LEFT JOIN hourly hy ON hy.user_id = s.user_id AND hy.h = s.h
    """,
)
def resample_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample sparse events onto a dense hourly grid per user: build
    the complete (user, hour) spine, left-join observed hourly
    aggregates, zero-fill counts, and FORWARD-FILL the hourly sum
    (last(ignorenulls) over the preceding frame) — the standard
    time-series densification before rolling features or charting.

    Scale: the spine is generated with `sequence()` + explode — no
    driver loop, no range table materialized outside the plan; rows =
    users x hours, produced streamingly inside codegen. One shuffle on
    (user_id, hour) for the join, one window per user for the fill.
    The hour span derives from the data via a 1-row aggregate
    broadcast-crossed onto the users — O(1) driver state.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 5)
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    users = events.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).alias("sv"),
    )
    w = (
        W.partitionBy(spine.user_id)
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("sv", ignorenulls=True).over(w).cast("double").alias("ffill_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics (rank-position percentile cutoffs).
# ---------------------------------------------------------------------------


@register(
    "winsorized_price_stats",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), cuts AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = CAST(CEIL(0.01 * n) AS BIGINT)
                      THEN l_extendedprice END) AS p01,
             MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT)
                      THEN l_extendedprice END) AS p99
      FROM ranked GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           c.p01, c.p99,
           CAST(SUM(CASE WHEN l.l_extendedprice < c.p01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN l.l_extendedprice > c.p99 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_hi,
           CAST(CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, c.p01), c.p99)
                              AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS winsor_mean
    FROM lineitem l
    JOIN cuts c ON c.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag, c.p01, c.p99
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean price per return flag: clip to the exact
    [p01, p99] rank positions, then average — the robust-statistics
    pre-step before fitting anything to heavy-tailed price data.

    Percentile semantics: the cutoff is THE VALUE AT ROW ceil(q*n) of
    the ordered group — a rank-position definition both engines compute
    identically (the value at a rank depends only on the value multiset,
    so row_number ties among equal values don't matter), unlike
    interpolating percentile_cont whose float blend differs per engine.

    Scale (r10 optimization, guide §2.5): the naive exact-percentile
    pass is a row_number window partitioned by l_returnflag — THREE
    distinct flags, so at sf100 it degenerates to 3 single-threaded
    ~200M-row sort tasks (measured 443.4 s wall at only 2983 cpu_s —
    6.7 of 32 cores busy). The value at rank ceil(q*n) depends only on
    the VALUE MULTISET, so the rank pass now runs on the per-(flag,
    price) count distribution instead of the raw rows: a map-side-
    combinable groupBy collapses the fact table ~400x (replicated
    fixtures repeat prices), then one cumulative-count window over the
    small distribution finds the least price whose running count
    reaches the rank — identical value, the per-group sort is now
    ~0.5M rows instead of ~200M. The clip pass re-reads the fact and
    joins the 3-row cutoff table as a broadcast; both aggregations are
    map-side-partial hash aggs, and the winsor mean goes through exact
    DECIMAL so any shuffle order yields the oracle's bits.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    dist = lineitem.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("l_returnflag")
    cum = dist.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    # value at rank r = least price whose running count reaches r
    cut_at = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
            F.col("l_extendedprice"),
        )
    )
    cuts = cum.groupBy("l_returnflag").agg(
        cut_at(0.01).alias("p01"), cut_at(0.99).alias("p99")
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")
    )
    return (
        lineitem.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag", "p01", "p99")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("p01"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("p99"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped_hi"),
            (F.sum(clipped.cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("winsor_mean"),
        )
        .select(
            "l_returnflag", "n_lines", "p01", "p99",
            "n_clipped_lo", "n_clipped_hi", "winsor_mean",
        )
    )


# ---------------------------------------------------------------------------
# Ordered funnel analysis (product-analytics staple).
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY ord
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose first view precedes a
    click that precedes a purchase — each stage's timestamp must be
    STRICTLY after the previous stage's first occurrence (the classic
    ordered-funnel semantics, not mere event-set membership).

    Scale: three grouped MIN aggregations, each keyed user_id — one
    shuffle key throughout, so the per-stage joins land on co-partitioned
    exchanges that AQE reuses; each stage's survivor set only shrinks.
    The event-type filters push to the scan (only 3 of the types are
    read). Timestamp MINs are exact — no float anywhere.
    """
    events = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None) -> DataFrame:
        e = events.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(
                prev.select(F.col("user_id").alias("pu"), F.col("t").alias("pt")),
                (F.col("user_id") == F.col("pu")) & (F.col("ts") > F.col("pt")),
            )
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    rows = None
    for ord_, stage, df in ((1, "view", v), (2, "view>click", c), (3, "view>click>purchase", p)):
        one = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(ord_).alias("ord"), F.lit(stage).alias("stage"), "n_users"
        )
        rows = one if rows is None else rows.unionAll(one)
    return rows.orderBy("ord").select("stage", "n_users")


# ---------------------------------------------------------------------------
# Closed-form linear regression from exact decimal partials.
# ---------------------------------------------------------------------------


@register(
    "regression_price_vs_quantity",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,4))
                 * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(19,4))
                 * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                 * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope,
           (CAST(sy AS DOUBLE)
            - CAST(sx AS DOUBLE)
              * ((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) / n
             AS intercept,
           (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((n * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_xy
    FROM s
    """,
)
def regression_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag ordinary-least-squares fit of extendedprice
    against quantity — slope, intercept, Pearson correlation — computed
    CLOSED-FORM from exact DECIMAL co-moment sums (n, Sx, Sy, Sxx,
    Sxy, Syy) instead of the engines' streaming covar/corr aggregates.

    Why not regr_slope/corr built-ins: their single-pass co-moment
    updates are numerically fine but accumulate in FLOAT with
    engine-specific merge trees, so last-ulp drift on 1e5-magnitude
    prices can leak past a fixed rounding tolerance. The decimal
    partials are EXACT and order-independent (the same reason the
    rollup/PageRank sums use decimal), so both engines derive the
    doubles from identical exact integers and the final expressions
    are bit-equal. This is also the mergeable form: the six partials
    re-aggregate to any coarser grouping without rescanning (same
    contract as hypertable_rollup_daily).

    Scale: one map-side-combined hash aggregate over the fact table —
    the shuffle carries 6 decimals per (flag, partition); everything
    after is per-group scalar arithmetic on 3 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(19,4)")
    y = F.col("l_extendedprice").cast("decimal(19,4)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - sx * slope) / n).alias("intercept"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_xy"),
    )


# ---------------------------------------------------------------------------
# 2-D Pareto front via sort + running extremum (vs the naive quadratic).
# ---------------------------------------------------------------------------


def _skyline_local_front(batches):
    """Per-partition 2-D skyline kernel for pareto_front_orders, fully
    vectorized: per price group take gmax = max day, over the
    descending-price group axis take the shifted running max d1 (best
    day among STRICTLY better-priced groups), and keep the rows whose
    day equals their group's gmax where gmax beats d1. A row-level
    Python loop over ~|distinct prices| groups took ~8 s at sf0.1; the
    three groupwise primitives (groupby-max, cummax, map) are C-speed.
    Property-tested against brute-force dominance in
    tests/test_property_algorithms.py."""
    import pandas as pd

    chunks = list(batches)
    if not chunks:  # empty scan partition: zero batches arrive
        return
    part = pd.concat(chunks, ignore_index=True)
    if part.empty:
        yield part
        return
    gmax = part.groupby("price_key")["day_key"].max().sort_index(
        ascending=False
    )
    d1 = gmax.cummax().shift(1)  # best day over strictly-better prices
    row_gmax = part["price_key"].map(gmax)
    row_d1 = part["price_key"].map(d1)
    keep = (part["day_key"] == row_gmax) & (
        row_d1.isna() | (part["day_key"] > row_d1)
    )
    yield part[keep]


@register(
    "pareto_front_orders",
    oracle="""
    WITH pergroup AS MATERIALIZED (
      SELECT o_totalprice, MAX(o_orderdate) AS gmax
      FROM orders GROUP BY 1
    ), run AS (
      SELECT o_totalprice, gmax,
             MAX(gmax) OVER (ORDER BY o_totalprice DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS d1
      FROM pergroup
    )
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN run r ON r.o_totalprice = o.o_totalprice
    WHERE (r.d1 IS NULL OR r.d1 < o.o_orderdate)
      AND o.o_orderdate = r.gmax
    """,
)
def pareto_front_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto front of orders under (maximize totalprice, maximize
    recency): an order survives iff no other order is at least as good
    on both axes and strictly better on one. The ORACLE spells the
    definition as the naive quadratic NOT EXISTS self-join; the ENGINE
    uses the classic 2-D skyline rewrite — sort by price descending
    and keep rows whose date strictly exceeds the running maximum date
    of all strictly-better-priced rows — O(n log n) instead of O(n^2).
    Hash equality proves the rewrite implements the definition,
    including both tie directions.

    Scale — the DISTRIBUTED skyline: the skyline operator is
    distributive (a globally non-dominated point is non-dominated in
    its partition), so stage 1 computes each partition's LOCAL front
    shuffle-free (``mapInPandas``: sort the partition by price desc,
    one running-max sweep) and only the candidate union — output-
    bounded, ~front-size x partitions — reaches the stage-2 global
    windows. The global stage's single-partition sort is therefore
    over candidates, not the table (the same justification as the
    one-row aggregate branches in the audit allowlist). The running
    max over the STRICTLY-better price prefix uses a RANGE frame on
    integer cents ending 1 below the current price, so equal-price
    rows never dominate each other through the window; the same-price
    tie pass RANGE-frames the day axis so exact-duplicate points all
    survive, exactly as the dominance definition requires.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        # integer cents: RANGE offset -1 below is then exactly "strictly
        # better priced" (a decimal key would make -1 a whole dollar)
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_key"),
        F.datediff(F.col("o_orderdate"), F.lit("1990-01-01")).alias("day_key"),
    )

    pts = pts.mapInPandas(_skyline_local_front, pts.schema)
    # max day among rows with STRICTLY greater price: RANGE frame on the
    # descending cent axis, ending one cent before the current price.
    w_strict = (
        W.orderBy(F.col("price_key").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    # max day among SAME-price rows with a STRICTLY later date — RANGE
    # on the descending day axis so (price, date) duplicates do not
    # dominate each other (a ROWS frame would drop one of two identical
    # points, which the dominance definition keeps).
    w_tie = (
        W.partitionBy("price_key")
        .orderBy(F.col("day_key").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    scored = pts.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.max("day_key").over(w_strict).alias("best_day_better_price"),
        F.max("day_key").over(w_tie).alias("best_day_same_price"),
        "day_key",
    )
    return scored.filter(
        (
            F.col("best_day_better_price").isNull()
            | (F.col("day_key") > F.col("best_day_better_price"))
        )
        & (
            F.col("best_day_same_price").isNull()
            | (F.col("day_key") > F.col("best_day_same_price"))
        )
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# Nested array-of-struct processing with higher-order functions.
# ---------------------------------------------------------------------------


@register(
    "orders_nested_lineitem_stats",
    oracle="""
    SELECT l_orderkey AS o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS max_price
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 5
    """,
)
def orders_nested_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data processing: rebuild each order's line items as an
    ARRAY<STRUCT> column (the layout denormalized lake tables actually
    ship), then compute per-order statistics by folding the array with
    HIGHER-ORDER functions — size, F.aggregate with a decimal
    accumulator, a filtered size, a max fold — WITHOUT re-exploding.
    The oracle computes the same stats from the flat table; hash
    equality proves the nest->fold path is lossless.

    Scale: one shuffle to nest (groupBy orderkey + collect_list of a
    pruned struct — only the 3 needed fields enter the array, not the
    16-column row), then every fold is a scan-local codegen lambda
    over an order-sized array (bounded by lines-per-order, ~7). This
    is the access pattern that makes denormalized layouts pay: stats
    over the nested children never touch a join or a second shuffle.
    Decimal accumulators keep the folds order-independent even though
    collect_list order is nondeterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
                F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
                F.col("l_returnflag").alias("flag"),
            )
        ).alias("items")
    )
    # DECIMAL(38,2) accumulator: Spark caps add-result precision at
    # 38, so acc + item stays (38,2) and the fold type-checks; any
    # narrower accumulator grows a digit per add and fails analysis
    total_qty = F.aggregate(
        F.col("items"),
        F.lit(0).cast("decimal(38,2)"),
        lambda acc, x: acc + x["qty"],
    ).cast("double")
    n_returned = F.size(
        F.filter(F.col("items"), lambda x: x["flag"] == "R")
    ).cast("bigint")
    max_price = F.array_max(
        F.transform(F.col("items"), lambda x: x["price"])
    ).cast("double")
    return (
        nested.filter(F.size("items") >= 5)
        .select(
            "o_orderkey",
            F.size("items").cast("bigint").alias("n_items"),
            total_qty.alias("total_qty"),
            n_returned.alias("n_returned"),
            max_price.alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Association rules over co-purchase pairs: support / confidence / lift.
# ---------------------------------------------------------------------------


@register(
    "association_rules_copurchase",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op
    ), item_cnt AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT pa AS antecedent, pb AS consequent, c_ab AS pair_orders,
           CAST(c_ab AS DOUBLE) / n AS support,
           CAST(c_ab AS DOUBLE) / ia.c AS confidence,
           CAST(c_ab AS DOUBLE) * n / (ia.c * ib.c) AS lift
    FROM pairs
    JOIN item_cnt ia ON ia.l_partkey = pa
    JOIN item_cnt ib ON ib.l_partkey = pb
    CROSS JOIN n_orders
    """,
)
def association_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the co-purchase pairs:
    support, confidence (antecedent -> consequent), and lift for every
    part pair appearing together in >= 3 orders — the metric layer on
    top of the pair mining the graph queries share.

    Scale (r10 optimization): the pair counts and the per-item counts
    ARE the graph family's two derived tables — the canonical weighted
    edge list keeps every pair with c_ab >= 2 (this query's >= 3 is a
    strict subset) and `_part_order_counts` is exactly item_cnt — so
    both are served from the invocation-scoped materializations
    (operators/graphalgo.py) instead of re-running the distinct
    self-join + 1.2B-row pair-count shuffle per query (measured
    269.7 s / 7.6k cpu_s at sf100 for the standalone build). Only the
    scalar order total still touches the fact table: one
    count-distinct over a single 8-byte column. The metric joins are
    keyed on single parts — Zipf-hot parts are exactly what AQE skew
    handling splits. Division order is pinned identically in both
    engines and the inputs are exact integers, so the emitted doubles
    agree bit-for-bit.
    """
    from node_gedcom_graph_spark.operators.graphalgo import (
        _copurchase_edges,
        _part_order_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    n_orders = F.broadcast(
        li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n"))
    )
    item_cnt = _part_order_counts(spark, sf_dir).select(
        "l_partkey", F.col("n_orders").cast("bigint").alias("c")
    )
    pairs = (
        _copurchase_edges(spark, sf_dir, keep_weight=True)
        .filter(F.col("w") >= 3)
        .select("pa", "pb", F.col("w").cast("bigint").alias("c_ab"))
    )
    ia = item_cnt.select(
        F.col("l_partkey").alias("pa"), F.col("c").alias("c_a")
    )
    ib = item_cnt.select(
        F.col("l_partkey").alias("pb"), F.col("c").alias("c_b")
    )
    return (
        pairs.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(n_orders)
        .select(
            F.col("pa").alias("antecedent"),
            F.col("pb").alias("consequent"),
            F.col("c_ab").alias("pair_orders"),
            (F.col("c_ab").cast("double") / F.col("n")).alias("support"),
            (F.col("c_ab").cast("double") / F.col("c_a")).alias("confidence"),
            (
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (Deequ-style, single pass).
# ---------------------------------------------------------------------------


@register(
    "data_quality_expectations",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS dup_keys,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_cust,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nonpos_price,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                  THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority
      FROM orders
    ), fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
      FROM lineitem l
      WHERE NOT EXISTS (
        SELECT 1 FROM orders x WHERE x.o_orderkey = l.l_orderkey)
    )
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS check_name, dup_keys AS n_violations
      FROM o
      UNION ALL
      SELECT 'orders_custkey_not_null', null_cust FROM o
      UNION ALL
      SELECT 'orders_totalprice_positive', nonpos_price FROM o
      UNION ALL
      SELECT 'orders_priority_in_domain', bad_priority FROM o
      UNION ALL
      SELECT 'lineitem_orderkey_fk', orphan_lineitems FROM fk
    )
    """,
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ/Great-Expectations
    shape): five constraints — primary-key uniqueness, non-null,
    positivity, domain membership, and referential integrity — each
    reported as a (check_name, n_violations) row. The first four
    evaluate in ONE aggregate pass over orders (conditional
    aggregates, not one scan per check); the FK check is a LEFT ANTI
    count against the orders key.

    Scale: the intra-table checks cost exactly one map-side-combined
    scan regardless of how many constraints are declared — the
    Deequ insight that makes hundred-check suites affordable on 100 TB.
    The FK anti-join shuffles on the key it validates (or broadcasts
    when the parent side fits). Violation counts are exact integers,
    so the gate hash never rides on floats.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_cust"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nonpos_price"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").isin(
                    "1-URGENT",
                    "2-HIGH",
                    "3-MEDIUM",
                    "4-NOT SPECIFIED",
                    "5-LOW",
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_priority"),
    )
    orphans = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    checks = [
        ("orders_pk_unique", "dup_keys", o),
        ("orders_custkey_not_null", "null_cust", o),
        ("orders_totalprice_positive", "nonpos_price", o),
        ("orders_priority_in_domain", "bad_priority", o),
        ("lineitem_orderkey_fk", "orphan_lineitems", orphans),
    ]
    out = None
    for name, colname, src in checks:
        row = src.select(
            F.lit(name).alias("check_name"),
            F.col(colname).alias("n_violations"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Column profiling summary (the profiler pass behind quality tooling).
# ---------------------------------------------------------------------------


@register(
    "orders_column_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
    FROM orders
    """,
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profiling (null count, distinct cardinality,
    min/max rendered as strings so heterogeneous column types share
    one report schema) — the discovery pass quality tooling runs
    before writing expectations. Three representative columns here;
    the construction is mechanical per column.

    Scale: one aggregate per column over the same cached scan; Spark
    plans the unioned single-row aggregates as independent branches of
    a shared exchange-free scan (each is a global aggregate; their
    one-row finals are the audited SinglePartition allowance).
    Distinct counts are the one real cost — at 100 TB swap
    COUNT(DISTINCT) for approx_count_distinct per column and the
    report stays one pass (the sketch_rollup_region mergeable-sketch
    path).
    """
    orders = load_table(spark, sf_dir, "orders")

    def profile(colname, cast_to=None):
        c = F.col(colname)
        rendered = c.cast("decimal(18,2)") if cast_to == "dec" else c
        return orders.agg(
            F.lit(colname).alias("column_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.countDistinct(c).cast("bigint").alias("n_distinct"),
            F.min(rendered).cast("string").alias("min_value"),
            F.max(rendered).cast("string").alias("max_value"),
        )

    return (
        profile("o_orderkey")
        .unionByName(profile("o_orderstatus"))
        .unionByName(profile("o_totalprice", "dec"))
    )


# ---------------------------------------------------------------------------
# Cohort lifetime-value matrix.
# ---------------------------------------------------------------------------


@register(
    "customer_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ), aged AS (
      SELECT f.cohort_month,
             (EXTRACT(YEAR FROM o.o_orderdate) * 12
              + EXTRACT(MONTH FROM o.o_orderdate))
             - (EXTRACT(YEAR FROM f.cohort_month) * 12
                + EXTRACT(MONTH FROM f.cohort_month)) AS age_months,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
             o.o_custkey
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ), cells AS (
      SELECT cohort_month, CAST(age_months AS BIGINT) AS age_months,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
             SUM(price) AS revenue
      FROM aged GROUP BY cohort_month, age_months
    )
    SELECT CAST(cohort_month AS DATE) AS cohort_month, age_months,
           n_orders, n_active,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(SUM(revenue) OVER (PARTITION BY cohort_month
                                   ORDER BY age_months
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM cells
    """,
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, each cohort's order count, active customers, revenue, and
    CUMULATIVE revenue tracked by months-since-acquisition — the
    retention-economics view behind every LTV model (read along a row:
    how a cohort monetizes as it ages; down a column: cohort quality
    drift). Complements events_retention_cohorts (activity) with the
    revenue dimension.

    Scale: first-order months are one hash agg on the customer key;
    the age join re-shuffles orders on the same key (AQE reuses the
    exchange); the cell aggregate is |cohorts| x |ages| rows and the
    cumulative window runs over that tiny matrix partitioned by
    cohort. Integer month arithmetic on both engines — no date
    subtraction ambiguity — and decimal revenue sums keep cells and
    their running totals exact.
    """
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_ts")
    )
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    aged = orders.join(firsts, "o_custkey").select(
        F.col("cohort_ts"),
        (months(F.col("o_orderdate")) - months(F.col("cohort_ts"))).alias(
            "age_months"
        ),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_custkey",
    )
    cells = aged.groupBy(
        "cohort_ts", F.col("age_months").cast("bigint").alias("age_months")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum("price").alias("revenue"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("cohort_ts")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return cells.select(
        F.to_date("cohort_ts").alias("cohort_month"),
        "age_months",
        "n_orders",
        "n_active",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("double").alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# Chi-squared independence test from exact contingency counts.
# ---------------------------------------------------------------------------


@register(
    "source_length_chi2",
    oracle="""
    WITH bucketed AS (
      SELECT source,
             CASE WHEN n_chars < 200 THEN 'short'
                  WHEN n_chars < 400 THEN 'medium'
                  ELSE 'long' END AS len_bucket
      FROM documents
    ), cells AS (
      SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS o
      FROM bucketed GROUP BY source, len_bucket
    ), rs AS (
      SELECT source, CAST(SUM(o) AS BIGINT) AS row_total
      FROM cells GROUP BY source
    ), cs AS (
      SELECT len_bucket, CAST(SUM(o) AS BIGINT) AS col_total
      FROM cells GROUP BY len_bucket
    ), margins AS (
      -- DENSE grid: every (source, bucket) pair exists, zero-observed
      -- cells included (their (0-e)^2/e = e term belongs in the sum —
      -- dropping them biases chi2 low against the reported dof)
      SELECT rs.source, cs.len_bucket, COALESCE(c.o, 0) AS o,
             rs.row_total, cs.col_total, t.grand
      FROM rs CROSS JOIN cs
      LEFT JOIN cells c
        ON c.source = rs.source AND c.len_bucket = cs.len_bucket
      CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS grand FROM cells) t
    ), nsrc AS (
      SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(DISTINCT len_bucket) AS BIGINT) AS n_buckets
      FROM cells
    )
    SELECT CAST(SUM(
             (CAST(o AS DOUBLE)
              - CAST(row_total AS DOUBLE) * col_total / grand)
             * (CAST(o AS DOUBLE)
                - CAST(row_total AS DOUBLE) * col_total / grand)
             / (CAST(row_total AS DOUBLE) * col_total / grand)
           ) AS DOUBLE) AS chi2,
           CAST((n_sources - 1) * (n_buckets - 1) AS BIGINT) AS dof,
           (SELECT grand FROM margins LIMIT 1) AS n_docs
    FROM margins CROSS JOIN nsrc
    GROUP BY n_sources, n_buckets
    """,
)
def source_length_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between document source and
    length bucket, computed closed-form from the EXACT integer
    contingency table (observed counts, row/column margins, grand
    total) — the corpus-composition diagnostic that flags a source
    whose length profile diverges from the blend (a skew that biases
    packing efficiency and curriculum sampling). Degrees of freedom
    reported alongside so the statistic is interpretable.

    Scale: one map-side-combined aggregate builds the |sources| x 3
    contingency table; margins re-aggregate THAT table; the chi2 sum
    spans the same few dozen cells. Every input to the float math is
    an exact BIGINT, and both engines evaluate the identical (o-e)^2/e
    expression per cell, so the statistic is deterministic far beyond
    the gate tolerance.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 400, "medium")
        .otherwise("long")
    )
    cells = (
        docs.select("source", bucket.alias("len_bucket"))
        .groupBy("source", "len_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rs = cells.groupBy("source").agg(
        F.sum("o").cast("bigint").alias("row_total")
    )
    cs = cells.groupBy("len_bucket").agg(
        F.sum("o").cast("bigint").alias("col_total")
    )
    t = F.broadcast(cells.agg(F.sum("o").cast("bigint").alias("grand")))
    nsrc = F.broadcast(
        cells.agg(
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("len_bucket").cast("bigint").alias("n_buckets"),
        )
    )
    e = F.col("row_total").cast("double") * F.col("col_total") / F.col("grand")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    # dense grid: zero-observed cells contribute their expected term
    dense = (
        rs.crossJoin(cs)
        .join(cells, ["source", "len_bucket"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    return (
        dense.crossJoin(t)
        .crossJoin(nsrc)
        .groupBy("n_sources", "n_buckets", "grand")
        .agg(F.sum(term).cast("double").alias("chi2"))
        .select(
            "chi2",
            ((F.col("n_sources") - 1) * (F.col("n_buckets") - 1))
            .cast("bigint")
            .alias("dof"),
            F.col("grand").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-order gap distribution and fixed-threshold RFM segmentation.
# ---------------------------------------------------------------------------


@register(
    "inter_order_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       CAST(LAG(o_orderdate)
                              OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
                            AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    )
    SELECT CASE WHEN gap_days <= 7 THEN '0-7'
                WHEN gap_days <= 30 THEN '8-30'
                WHEN gap_days <= 90 THEN '31-90'
                ELSE '90+' END AS gap_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(MIN(gap_days) AS BIGINT) AS min_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
)
def inter_order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders, bucketed into the retention bands
    marketing actually uses (week, month, quarter, dormant) — the
    empirical input behind churn-window and reorder-nudge choices.

    Scale: one LAG over a customer-keyed window (tie-broken by order
    key so same-day orders rank deterministically), then a 4-bucket
    hash agg — the shuffle out is four rows. Gaps are exact integer
    day differences on both engines.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    bucket = (
        F.when(F.col("gap_days") <= 7, "0-7")
        .when(F.col("gap_days") <= 30, "8-30")
        .when(F.col("gap_days") <= 90, "31-90")
        .otherwise("90+")
    )
    return gaps.groupBy(bucket.alias("gap_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS max_d FROM orders
    ), rfm AS (
      SELECT o.o_custkey,
             date_diff('day', CAST(MAX(o.o_orderdate) AS DATE),
                       CAST(a.max_d AS DATE)) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders o CROSS JOIN anchor a
      GROUP BY o.o_custkey, a.max_d
    ), seg AS (
      SELECT o_custkey,
             CASE WHEN recency_days <= 90 THEN 'active'
                  WHEN recency_days <= 365 THEN 'cooling'
                  ELSE 'dormant' END AS r_seg,
             CASE WHEN frequency >= 15 THEN 'frequent'
                  WHEN frequency >= 5 THEN 'regular'
                  ELSE 'rare' END AS f_seg,
             CASE WHEN monetary >= 2000000 THEN 'high'
                  WHEN monetary >= 500000 THEN 'mid'
                  ELSE 'low' END AS m_seg,
             monetary
      FROM rfm
    )
    SELECT r_seg, f_seg, m_seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_monetary
    FROM seg GROUP BY r_seg, f_seg, m_seg
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with FIXED thresholds: every customer scored on
    recency (days since last order, anchored to the corpus max date so
    the result is data-determined, not wall-clock), frequency, and
    decimal monetary total, then bucketed into the 3x3x3 segment grid
    with customer counts and segment revenue. Fixed cutoffs instead of
    quantile scoring on purpose: quintile RFM needs three global sorts
    (the ntile anti-pattern at 100 TB); threshold RFM is one scan-local
    CASE after a single per-customer aggregate, and thresholds are the
    operationally pinned contract marketing systems actually deploy.

    Scale: one hash agg on the customer key, one tiny (<=27-row)
    segment agg; the anchor date is a one-row broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = F.broadcast(orders.agg(F.max("o_orderdate").alias("max_d")))
    rfm = (
        orders.crossJoin(anchor)
        .groupBy("o_custkey", "max_d")
        .agg(
            F.datediff(F.col("max_d"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
    )
    r_seg = (
        F.when(F.col("recency_days") <= 90, "active")
        .when(F.col("recency_days") <= 365, "cooling")
        .otherwise("dormant")
    )
    f_seg = (
        F.when(F.col("frequency") >= 15, "frequent")
        .when(F.col("frequency") >= 5, "regular")
        .otherwise("rare")
    )
    m_seg = (
        F.when(F.col("monetary") >= 2000000, "high")
        .when(F.col("monetary") >= 500000, "mid")
        .otherwise("low")
    )
    return (
        rfm.select(
            r_seg.alias("r_seg"),
            f_seg.alias("f_seg"),
            m_seg.alias("m_seg"),
            "monetary",
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monetary").cast("double").alias("segment_monetary"),
        )
    )


MBIN_WIDTH = 1000  # monetary binned to $1000 cells for the tercile base


@register(
    "customer_rfm_quantile",
    oracle=f"""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS max_d FROM orders
    ), rfm AS (
      SELECT o.o_custkey,
             CAST(date_diff('day', CAST(MAX(o.o_orderdate) AS DATE),
                            CAST(a.max_d AS DATE)) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS monetary,
             CAST(FLOOR(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        / {MBIN_WIDTH}) AS BIGINT) AS mbin
      FROM orders o CROSS JOIN anchor a
      GROUP BY o.o_custkey, a.max_d
    ), dv AS (
      SELECT 'r' AS dim, recency_days AS val FROM rfm
      UNION ALL SELECT 'f', frequency FROM rfm
      UNION ALL SELECT 'm', mbin FROM rfm
    ), counts AS (
      SELECT dim, val, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM dv GROUP BY 1, 2
    ), cum AS (
      SELECT dim, val,
             SUM(cnt) OVER (PARTITION BY dim ORDER BY val
                            ROWS UNBOUNDED PRECEDING) AS c,
             SUM(cnt) OVER (PARTITION BY dim) AS tot
      FROM counts
    ), th AS (
      SELECT dim,
             MIN(CASE WHEN 3 * c >= tot THEN val END) AS t1,
             MIN(CASE WHEN 3 * c >= 2 * tot THEN val END) AS t2
      FROM cum GROUP BY dim
    ), thw AS (
      SELECT MIN(CASE WHEN dim = 'r' THEN t1 END) AS rt1,
             MIN(CASE WHEN dim = 'r' THEN t2 END) AS rt2,
             MIN(CASE WHEN dim = 'f' THEN t1 END) AS ft1,
             MIN(CASE WHEN dim = 'f' THEN t2 END) AS ft2,
             MIN(CASE WHEN dim = 'm' THEN t1 END) AS mt1,
             MIN(CASE WHEN dim = 'm' THEN t2 END) AS mt2
      FROM th
    ), scored AS (
      SELECT r.monetary,
             CAST(3 - (CASE WHEN recency_days > rt1 THEN 1 ELSE 0 END)
                    - (CASE WHEN recency_days > rt2 THEN 1 ELSE 0 END)
               AS INTEGER) AS r_score,
             CAST(1 + (CASE WHEN frequency > ft1 THEN 1 ELSE 0 END)
                    + (CASE WHEN frequency > ft2 THEN 1 ELSE 0 END)
               AS INTEGER) AS f_score,
             CAST(1 + (CASE WHEN mbin > mt1 THEN 1 ELSE 0 END)
                    + (CASE WHEN mbin > mt2 THEN 1 ELSE 0 END)
               AS INTEGER) AS m_score
      FROM rfm r CROSS JOIN thw
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_monetary
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def customer_rfm_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with EXACT data-driven tercile thresholds —
    the quantile-scored variant of ``customer_rfm_segments`` (round-3
    verdict item 7), computed WITHOUT a single global sort of customer
    rows: the rejected ntile formulation needs three rangepartitioned
    sorts over every customer; here all three cutoff pairs fall out of
    ONE distinct-value cumulative window (the
    ``doc_length_quartiles_by_source`` kernel) over an exploded
    (dimension, value) frame, partitioned by DIMENSION — an honest
    3-key partition whose row count is bounded by the VALUE DOMAIN
    (distinct recency days + distinct order counts + distinct $1000
    monetary bins), not by customers.

    Monetary is binned to $1000 cells before ranking so its distinct
    domain stays bounded at any corpus size (recency and frequency are
    intrinsically bounded integer domains); terciles are then exact
    lower-quantile statistics OF THE BINNED VALUE — deterministic and
    engine-portable, while a raw-decimal tercile would degenerate the
    kernel back into a per-customer sort.

    Scoring is the classic 3x3x3 grid: recency INVERTED (most recent
    -> 3), frequency/monetary ascending. Thresholds come back as a
    one-row broadcast; scoring is a scan-local CASE; the result is the
    27-cell segment table with customer counts and decimal-exact
    revenue.

    Scale: one hash agg on o_custkey (persisted — reused by the
    threshold branch and the scoring branch), one (dim,value) hash
    agg, one 3-partition bounded-domain window, one one-row broadcast
    crossJoin, one 27-row agg. No rangepartitioning, no
    SinglePartition, no raw-row sort anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = F.broadcast(orders.agg(F.max("o_orderdate").alias("max_d")))
    rfm = (
        orders.crossJoin(anchor)
        .groupBy("o_custkey", "max_d")
        .agg(
            F.datediff(F.col("max_d"), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .withColumn(
            "mbin",
            F.floor(F.col("monetary") / MBIN_WIDTH).cast("bigint"),
        )
        .transform(persist_tracked)
    )
    dv = rfm.select(
        F.explode(
            F.array(
                F.struct(F.lit("r").alias("dim"), F.col("recency_days").alias("val")),
                F.struct(F.lit("f").alias("dim"), F.col("frequency").alias("val")),
                F.struct(F.lit("m").alias("dim"), F.col("mbin").alias("val")),
            )
        ).alias("e")
    ).select("e.dim", "e.val")
    counts = dv.groupBy("dim", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        W.partitionBy("dim")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("dim")
    cum = counts.select(
        "dim",
        "val",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wall).alias("tot"),
    )
    th = cum.groupBy("dim").agg(
        F.min(F.when(3 * F.col("c") >= F.col("tot"), F.col("val"))).alias("t1"),
        F.min(F.when(3 * F.col("c") >= 2 * F.col("tot"), F.col("val"))).alias(
            "t2"
        ),
    )
    pick = lambda d, t: F.min(F.when(F.col("dim") == d, F.col(t)))  # noqa: E731
    thw = F.broadcast(
        th.agg(
            pick("r", "t1").alias("rt1"),
            pick("r", "t2").alias("rt2"),
            pick("f", "t1").alias("ft1"),
            pick("f", "t2").alias("ft2"),
            pick("m", "t1").alias("mt1"),
            pick("m", "t2").alias("mt2"),
        )
    )
    gt = lambda a, b: F.when(F.col(a) > F.col(b), 1).otherwise(0)  # noqa: E731
    scored = rfm.crossJoin(thw).select(
        "monetary",
        (F.lit(3) - gt("recency_days", "rt1") - gt("recency_days", "rt2"))
        .cast("int")
        .alias("r_score"),
        (F.lit(1) + gt("frequency", "ft1") + gt("frequency", "ft2"))
        .cast("int")
        .alias("f_score"),
        (F.lit(1) + gt("mbin", "mt1") + gt("mbin", "mt2"))
        .cast("int")
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary").cast("double").alias("segment_monetary"),
    )


# ---------------------------------------------------------------------------
# Supplier concentration: Herfindahl-Hirschman index per region.
# ---------------------------------------------------------------------------


@register(
    "supplier_hhi_by_region",
    oracle="""
    WITH srev AS (
      SELECT r.r_name AS region_name, s.s_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, s.s_suppkey
    )
    , shared AS (
      SELECT region_name, rev,
             CAST(rev AS DOUBLE)
               / SUM(CAST(rev AS DOUBLE)) OVER (PARTITION BY region_name)
               AS share
      FROM srev
    )
    SELECT region_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(rev) AS DOUBLE) AS region_revenue,
           SUM(share * share) AS hhi
    FROM shared
    GROUP BY region_name
    """,
)
def supplier_hhi_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: the Herfindahl-Hirschman index of
    supplier revenue shares per region (sum of squared shares; 1/n for
    perfect competition, 1.0 for monopoly) — the concentration stat
    that needs NO sorting or ranking, unlike Gini/Lorenz, which makes
    it the 100 TB-friendly choice. Discounted revenue accumulates in
    exact decimals per (region, supplier) before any division.

    Scale: one fact-table aggregate onto (region, supplier) keys (the
    dims broadcast), then the share-of-total window and the final HHI
    sum both run over the supplier-count-sized table partitioned by
    region. Share terms are identical doubles on both engines (exact
    decimal numerators/denominators) and the squared-share sum spans
    at most |suppliers-per-region| terms.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    )
    srev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), "s_suppkey")
        .agg(F.sum(rev).alias("rev"))
    )
    from pyspark.sql import Window as W

    total = F.sum(F.col("rev").cast("double")).over(
        W.partitionBy("region_name")
    )
    share = F.col("rev").cast("double") / total
    return (
        srev.withColumn("share", share)
        .groupBy("region_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("rev").cast("double").alias("region_revenue"),
            F.sum(F.col("share") * F.col("share")).alias("hhi"),
        )
    )
