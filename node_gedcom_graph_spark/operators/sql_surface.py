"""SQL-surface operators: queries exercised through ``spark.sql`` —
the engine's second user API (everything else in operators/ uses the
DataFrame API; a reference user migrating ad-hoc SQL gets this path).

Two shapes that only exist at the SQL surface:

- LATERAL correlated subquery with LIMIT — the per-row top-k spelling.
  Catalyst DECORRELATES it into WindowGroupLimit + row_number + one
  hash join (verified in tests/test_sql_surface.py), i.e. you write
  the intuitive correlated form and get the same physical plan as the
  hand-written window top-k — no per-row re-execution survives.
- WITH RECURSIVE (Spark 4.x UnionLoop) — iterative dataflow expressed
  in pure SQL, here a bounded-depth BFS. The recursion ships every
  WALK (not every node), so it is the ad-hoc/SQL-parity path; the
  scale path for deep traversals remains the frontier-dedup iterative
  operator (graphalgo.copurchase_bfs_2hop), which dedups per hop.

Both queries run the SAME SQL text shape on DuckDB as the oracle, so
the gate checks Spark's decorrelation/recursion machinery end-to-end
against an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "lateral_top2_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    """,
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's two most expensive orders, written as a LATERAL
    correlated subquery with ORDER BY + LIMIT — the spelling analysts
    reach for first.

    Scale: Catalyst decorrelates the per-row subquery into
    WindowGroupLimit (partial per-partition top-2, then final) +
    row_number + ONE hash join — identical physical work to the
    hand-written window top-k (window_topk_orders_per_customer), so
    the intuitive spelling carries no per-row re-execution penalty.
    Plan-asserted in tests: no nested-loop join, WindowGroupLimit
    present. The orderkey tiebreak makes the LIMIT cut deterministic
    on both engines.
    """
    _view(spark, sf_dir, "customer")
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        """
    )


@register(
    "copurchase_bfs_recursive_sql",
    oracle="""
    WITH RECURSIVE op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM op a
      JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), edges AS (
      SELECT pa AS src, pb AS dst FROM und
      UNION ALL
      SELECT pb AS src, pa AS dst FROM und
    ), seed AS (
      SELECT MIN(src) AS s FROM edges
    ), walk(node, dist) AS (
      SELECT s, 0 FROM seed
      UNION ALL
      SELECT e.dst, w.dist + 1
      FROM walk w
      JOIN edges e ON e.src = w.node
      WHERE w.dist < 3
    )
    SELECT node, CAST(MIN(dist) AS INT) AS dist
    FROM walk
    GROUP BY node
    """,
)
def copurchase_bfs_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS (3 hops from the smallest co-purchase part)
    written as a recursive CTE — Spark 4's UnionLoop executing the
    same iterative dataflow the unrolled operator
    (copurchase_bfs_2hop) builds by hand, checked against DuckDB's
    recursive-CTE engine on identical SQL.

    Scale: the recursion enumerates WALKS, so its per-level volume is
    sum(degree^k) — fine for bounded depth on bounded-degree graphs
    (the co-purchase graph's degree is capped by order fan-out), but
    the 100 TB path for deep/skewed traversals is the iterative
    frontier operator, which dedups nodes per hop and folds MIN(dist)
    as it goes. The final GROUP BY MIN collapses walks to distances,
    which is what makes the result (unlike the walk set) well-defined
    and engine-comparable.

    The edge list is derived ONCE and localCheckpoint-ed before the
    loop: Spark inlines CTEs, so an `edges` CTE referenced inside the
    recursive step would re-run the distinct + self-join edge
    derivation on EVERY iteration (measured: 9.1 s vs 5.8 s at sf0.1
    — the loop itself is 0.8 s once edges are materialized). DuckDB's
    oracle keeps the derivation inline; its optimizer materializes
    CTEs reachable from recursion. r10: the derivation comes from the
    graph family's shared per-fixture edge materialization
    (graphalgo._copurchase_edges — identical definition, identical
    rows) instead of a private inline SQL rebuild; at sf100 this was
    the one graph query still paying the full ~247 s pair-count build
    after the rest of the family was cache-served.
    """
    from node_gedcom_graph_spark.operators.graphalgo import (
        _copurchase_edges,
    )
    from pyspark.sql import functions as F

    und = _copurchase_edges(spark, sf_dir)
    edges = (
        und.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(
            und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
        )
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("copurchase_bfs_edges")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, dist) AS (
          SELECT s, 0 FROM (SELECT MIN(src) AS s FROM copurchase_bfs_edges)
          UNION ALL
          SELECT e.dst, w.dist + 1
          FROM walk w
          JOIN copurchase_bfs_edges e ON e.src = w.node
          WHERE w.dist < 3
        )
        SELECT node, CAST(MIN(dist) AS INT) AS dist
        FROM walk
        GROUP BY node
        """
    )


@register(
    "filtered_aggregates_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
                AS BIGINT) AS n_urgent,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o.o_orderstatus = 'F') AS DOUBLE)
             AS finished_revenue,
           CAST(COUNT(DISTINCT o.o_custkey)
                  FILTER (WHERE o.o_totalprice > 200000) AS BIGINT)
             AS big_spenders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def filtered_aggregates_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 ``FILTER (WHERE ...)`` aggregate modifier — several
    differently-predicated aggregates in ONE grouping pass (count,
    conditional count, conditional decimal sum, conditional distinct
    count), spelled identically on both engines. The idiomatic
    replacement for N separate filtered scans or nested CASE pyramids.

    Scale: one pass over orders, one hash aggregate; the three dims
    broadcast. The conditional distinct-count is the only expansion
    (distinct keys per group under the predicate) — Catalyst plans it
    as the standard expand+two-level aggregate, still map-side partial
    on the non-distinct columns.
    """
    from node_gedcom_graph_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name AS region_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
                    AS BIGINT) AS n_urgent,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o.o_orderstatus = 'F') AS DOUBLE)
                 AS finished_revenue,
               CAST(COUNT(DISTINCT o.o_custkey)
                      FILTER (WHERE o.o_totalprice > 200000) AS BIGINT)
                 AS big_spenders
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "udtf_table_arg_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def udtf_table_arg_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization implemented as a Python UDTF taking a TABLE
    ARGUMENT with ``PARTITION BY user_id ORDER BY ts`` — the Spark 4
    SQL surface where the ENGINE delivers each partition's rows to the
    UDTF in order and fences instances at partition boundaries, so
    arbitrary per-entity sequence logic (here: 30-min-gap session
    building) runs without a single window function in user code. The
    scalar-arg UDTF (udtf_split_sentences) multiplies rows; the
    table-arg form is the grouped-sequential complement. Shares the
    built-in session_window query's oracle (sessionize_user_events) —
    three spellings (session_window, SQL windows, table-arg UDTF) of
    one semantic, all hash-equal.

    Scale: partitions shuffle once on user_id; per-partition ordering
    is the engine's sort, state is O(1) per live session; output is
    session-count-sized. Arrow-batched (engine-wide UDTF eval pin).

    Two measured fixes (sf0.1: 19 s -> 2.3 s warm): (1) the TABLE arg
    projects (user_id, ts) instead of TABLE(events) — every unread
    column, notably the wide `props` map, was being Arrow-shipped and
    materialized into a Python Row per event; (2) a
    REPARTITION(32, user_id) hint inside the subquery — the pruned
    shuffle is ~1.6 MB, so AQE's coalescer fed the whole Python UDTF
    ONE partition (the small-bytes/big-COMPUTE hazard). The hint's
    HashPartitioning(user_id, 32) satisfies the TABLE arg's required
    ClusteredDistribution, so no second exchange is added and the pin
    survives AQE.
    """
    from pyspark.sql.functions import udtf

    from node_gedcom_graph_spark.sources.tables import register_views

    register_views(spark, sf_dir)

    @udtf(
        returnType=(
            "user_id bigint, session_start timestamp_ntz, "
            "session_end timestamp_ntz, n_events bigint"
        )
    )
    class Sessionize:
        GAP_S = 30 * 60

        def __init__(self):
            self._user = None
            self._start = None
            self._last = None
            self._n = 0

        def _flush(self):
            import datetime as _dt

            if self._n:
                yield (
                    self._user,
                    self._start,
                    self._last + _dt.timedelta(seconds=self.GAP_S),
                    self._n,
                )

        def eval(self, row):
            # STRICTLY greater: session_window merges an exactly-gap
            # pair (pinned by test_session_window_gap_boundary), so all
            # three sessionize spellings break only when diff > gap
            gap_hit = (
                self._last is not None
                and (row["ts"] - self._last).total_seconds() > self.GAP_S
            )
            if self._last is None or gap_hit:
                yield from self._flush()
                self._user = row["user_id"]
                self._start = row["ts"]
                self._n = 0
            self._last = row["ts"]
            self._n += 1

        def terminate(self):
            yield from self._flush()

    spark.udtf.register("sessionize_udtf", Sessionize)
    # Project to the two columns the UDTF reads BEFORE the TABLE arg:
    # TABLE(events) would Arrow-ship and materialize a Python Row for
    # every column — including the wide `props` map — per event. The
    # inner SELECT prunes at the scan (ReadSchema: user_id, ts), which
    # is most of this operator's wall time at sf0.1.
    return spark.sql(
        """
        SELECT * FROM sessionize_udtf(
          TABLE(SELECT /*+ REPARTITION(32, user_id) */ user_id, ts
                FROM events)
          PARTITION BY user_id ORDER BY ts
        )
        """
    )


@register(
    "null_aware_anti_join_semantics",
    oracle="""
    WITH refs AS (
      SELECT o_custkey FROM orders
      UNION ALL SELECT NULL
    )
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM refs))
           AS BIGINT) AS n_not_in_with_null,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM refs r
                              WHERE r.o_custkey = c.c_custkey))
           AS BIGINT) AS n_not_exists,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
           AS BIGINT) AS n_not_in_clean
    """,
)
def null_aware_anti_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned as a first-class semantics check:
    against a reference set CONTAINING a NULL, SQL's three-valued
    logic makes ``NOT IN`` return zero rows (every comparison is
    UNKNOWN), while ``NOT EXISTS`` — equality-based — still returns
    the true anti set; against the clean set both agree. All three
    counts in one row, identical by the SQL standard on both engines.

    Engine surface: Spark plans the nullable NOT IN as a NULL-AWARE
    ANTI JOIN — in the executed plan the BroadcastHashJoin LeftAnti
    node's trailing flag reads `true` (isNullAwareAntiJoin), vs
    `false` for the clean NOT EXISTS rewrite; both flags are visible
    in this query's own plan, which is the point.

    Scale: anti joins shuffle (or broadcast) on the key; the null-
    aware form requires the broadcast build side, which Spark enforces
    — at 100 TB you rewrite NOT IN to NOT EXISTS precisely to escape
    that constraint, and this query is the committed evidence of why.
    """
    from node_gedcom_graph_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH refs AS (
          SELECT o_custkey FROM orders
          UNION ALL SELECT CAST(NULL AS BIGINT)
        )
        SELECT
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM refs))
               AS BIGINT) AS n_not_in_with_null,
          CAST((SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM refs r
                                  WHERE r.o_custkey = c.c_custkey))
               AS BIGINT) AS n_not_exists,
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
               AS BIGINT) AS n_not_in_clean
        """
    )


@register(
    "join_strategy_hints_equivalence",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
    )
    SELECT strategy, n, revenue FROM base
    CROSS JOIN (
      SELECT unnest(['broadcast', 'merge', 'shuffle_hash']) AS strategy
    )
    """,
)
def join_strategy_hints_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-strategy invariance, pinned: the SAME join computed
    under three explicit strategy hints — BROADCAST, MERGE (sort-merge)
    and SHUFFLE_HASH — must produce identical aggregates. The oracle is
    one computation fanned to three labeled rows; hash equality proves
    the engine's three physical paths agree bit-for-bit (decimal sum —
    order-independent, so even the shuffle-order differences between
    strategies cannot leak into the result).

    Engine surface: this is the query-shape where Catalyst's hint
    framework is exercised end to end; each branch's plan genuinely
    differs (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin —
    visible in explain), which is the point: strategy is a COST
    decision, never a semantics decision, and the gate enforces it.

    Scale: picking among these three IS the 100 TB join-tuning
    decision (broadcast when a side fits, shuffle-hash when one side
    is much smaller but too big to broadcast, sort-merge otherwise);
    this query is the committed evidence the engine may switch freely.
    """
    from node_gedcom_graph_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    out = None
    for hint, label in (
        ("BROADCAST(c)", "broadcast"),
        ("MERGE(c)", "merge"),
        ("SHUFFLE_HASH(c)", "shuffle_hash"),
    ):
        branch = spark.sql(
            f"""
            SELECT /*+ {hint} */
                   '{label}' AS strategy,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS revenue
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            """
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@register(
    "rollup_grouping_id_regions",
    oracle="""
    SELECT COALESCE(r.r_name, '(all)') AS region_name,
           COALESCE(n.n_name, '(all)') AS nation_name,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT)
             AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def rollup_grouping_id_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING disambiguation: customer counts and
    balances at (region, nation), (region), and grand-total levels,
    with the GROUPING bits distinguishing a rolled-up NULL from a NULL
    that might exist in the data — the detail every BI layer needs to
    render subtotal rows correctly (grouping_id 0 = leaf, 1 = region
    subtotal, 3 = grand total; COALESCE labels only AFTER the bits are
    captured).

    Scale: Catalyst plans rollup as one Expand (3 grouping-set copies)
    + one hash aggregate — rows x levels on the map side with partial
    aggregation, never one job per level. Decimal balance sums keep
    every level's total order-independent.
    """
    from node_gedcom_graph_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(r.r_name, '(all)') AS region_name,
               COALESCE(n.n_name, '(all)') AS nation_name,
               CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT)
                 AS grouping_id,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_balance
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
        """
    )
