"""Time-series rollups and sketch-style exact algorithms: the
hypertable-rollup (continuous aggregate) idiom — raw events -> hourly
mergeable partials -> daily rollup MERGED FROM THE PARTIALS, never
rescanning raw — plus a two-phase exact heavy-hitters operator
(Misra-Gries candidate pass, then exact verification restricted to the
candidate set) and a per-source token-distribution divergence audit
(KL / entropy vs the corpus mixture).

All three are 100 TB shapes the reference's single-pass ETL cannot
express (the reference has no aggregation beyond two distinct sets —
SURVEY.md §2 op 17, `lib/csv_writer.js:12-13`): the rollup is what its
stage-timer observability (op 25) would feed at fleet scale; heavy
hitters is the bounded-state version of its unbounded `_unused_tags`
accumulator idea.

Determinism notes:
- rollup sums go through DECIMAL so hourly->daily merge order cannot
  change the result; MIN/MAX/COUNT are order-independent natively.
- heavy-hitter membership uses INTEGER cross-multiplication
  (``cnt * K > total``), never a float threshold, so the result SET is
  identical on both engines regardless of division rounding.
- KL/entropy sums are ~vocab-size terms of O(0.1) doubles; cross-engine
  ln() ULP drift is orders of magnitude inside the oracle's 6-dp float
  tolerance (same precedent as text_unigram_logprob).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from node_gedcom_graph_spark.functions.scalar import tokens
from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Hypertable rollup: hourly continuous-aggregate partials merged to daily.
# ---------------------------------------------------------------------------


def hourly_partials(events: DataFrame) -> DataFrame:
    """The materialized hourly layer of a hypertable continuous
    aggregate: per (event_type, hour) mergeable partial state —
    count, decimal sum, min, max. Every column is re-aggregable, so
    coarser resolutions (day/week/month) derive from THIS table
    without touching raw events again."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "hypertable_rollup_daily",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS bucket_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level hypertable rollup: daily per-event-type statistics
    computed by MERGING the hourly continuous-aggregate partials
    (``hourly_partials``), not by re-aggregating raw events — the
    TimescaleDB/Druid rollup idiom. The oracle aggregates raw events
    directly; value-hash equality proves the partial->merge path is
    lossless (the defining property of a mergeable aggregate).

    Scale: the raw table is touched exactly once (hourly groupBy with
    map-side partial aggregation — the shuffle carries one row per
    (type, hour) per partition, not events). The daily merge shuffles
    only the hourly layer: |types| x |hours| rows regardless of event
    volume — at 100 TB of events that second stage is a few thousand
    rows. Decimal sums make hourly->daily addition order-independent,
    so micro-partial merge order (which differs between engines and
    between runs under AQE) cannot move the hash. AVG is derived from
    the merged (sum, count) pair — the standard trick that keeps mean
    re-aggregable when plain AVG of AVGs is not.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = hourly_partials(events)
    return (
        hourly.groupBy(
            "event_type",
            F.to_date("bucket_hour").alias("bucket_day"),
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            "event_type",
            "bucket_day",
            "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
            (F.col("sum_dec").cast("double") / F.col("n_events"))
            .cast("double")
            .alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Two-phase exact heavy hitters: Misra-Gries candidates + exact verify.
# ---------------------------------------------------------------------------

# Phase-2 threshold: report tokens with frequency > total / HH_K.
HH_K = 100
# Phase-1 Misra-Gries capacity. Superset guarantee: an item with global
# count > N/HH_K has, in at least one partition (pigeonhole), local
# count > n_p/HH_K; Misra-Gries with capacity c undercounts by at most
# n_p/(c+1), so with c+1 > HH_K the item's local estimate stays
# positive and it survives into the candidate set. 128 > 100-1.
HH_CAPACITY = 128


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries summary over the ``token`` column.

    Batch-merge formulation (Agarwal et al., "Mergeable Summaries"):
    add each Arrow batch's exact counts into the running summary; when
    the summary exceeds capacity, subtract the (capacity+1)-th largest
    count from everything and drop the non-positives. Total subtracted
    weight is <= n_p/(capacity+1), which is exactly the classic MG
    undercount bound. Emits the surviving candidate tokens once, at
    partition end — O(capacity) rows per partition.

    Cost profile (measured, PROFILE_r3_heavyhitters.json): the summary
    itself is trivial (~0.2 s per 312k-row partition — value_counts
    dominates, the merge dict is capacity-bounded); the real phase-1
    toll is the Arrow transfer of the raw token stream into Python.
    That toll buys a shuffle bounded by capacity x partitions instead
    of vocabulary x partitions — a win exactly when shuffle (network)
    is the bottleneck, i.e. on a multi-node cluster with a web-scale
    key space, NOT on a single box where the JVM hash-agg's map-side
    combine is local anyway (the artifact records the naive plan
    winning locally, as expected)."""
    counts: dict[str, int] = {}
    for pdf in batches:
        if pdf.empty:
            continue
        for tok, c in pdf["token"].value_counts().items():
            counts[tok] = counts.get(tok, 0) + int(c)
        if len(counts) > HH_CAPACITY:
            offset = sorted(counts.values(), reverse=True)[HH_CAPACITY]
            counts = {t: c - offset for t, c in counts.items() if c > offset}
    yield pd.DataFrame({"token": list(counts.keys())})


@register(
    "heavy_hitters_two_phase",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           n_total,
           CAST(CAST(COUNT(*) AS DOUBLE) / n_total AS DOUBLE) AS share
    FROM toks CROSS JOIN tot
    GROUP BY token, n_total
    HAVING COUNT(*) * {HH_K} > n_total
    """,
)
def heavy_hitters_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-heavy-hitters (tokens with frequency > N/100) via the
    classic two-phase scheme: (1) a per-partition Misra-Gries summary
    (capacity 128, ``mapInPandas``/Arrow) whose union is a GUARANTEED
    superset of every true heavy hitter; (2) an exact count restricted
    to that candidate set, filtered with integer cross-multiplication
    (``cnt * 100 > total``) so membership never rides on float
    division. The oracle is the naive full GROUP BY ... HAVING — hash
    equality proves the pruned two-phase path is exact, not
    approximate.

    Scale: this is the operator you reach for when the key cardinality
    (web-scale vocabulary, URL hosts, user agents) dwarfs the heavy
    set. A plain groupBy must shuffle one row per distinct key per
    partition — O(vocab x partitions); phase 1 caps the per-partition
    state and emission at 128 rows, so the shuffle ceiling is
    O(capacity x partitions) no matter how long the vocabulary tail
    is, and phase 2's broadcast-semi-join count only shuffles the
    candidate keys. At THIS fixture's 31-token vocabulary the capacity
    exceeds the vocabulary, so phase 1 retains everything and the
    pruning is a no-op — the mechanism (summary, merge, verify) is
    what the gate exercises; the asymptotics bite when vocab >> 128.

    Reference parity: the bounded-state answer to the reference's
    unbounded `_unused_tags` distinct-set accumulator
    (`lib/csv_writer.js:12,134` — SURVEY.md §2 op 17).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    candidates = F.broadcast(
        toks.mapInPandas(_misra_gries_partition, "token string").distinct()
    )
    total = F.broadcast(
        toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    )
    return (
        toks.join(candidates, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") * HH_K > F.col("n_total"))
        .select(
            "token",
            "cnt",
            "n_total",
            (F.col("cnt").cast("double") / F.col("n_total"))
            .cast("double")
            .alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Source-mixture divergence: per-source KL vs the corpus token mixture.
# ---------------------------------------------------------------------------


@register(
    "source_token_kl_divergence",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ), sc AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS s_cnt
      FROM toks GROUP BY source, token
    ), st AS (
      SELECT source, CAST(SUM(s_cnt) AS BIGINT) AS s_total
      FROM sc GROUP BY source
    ), gc AS (
      SELECT token, CAST(SUM(s_cnt) AS BIGINT) AS g_cnt FROM sc GROUP BY token
    ), gt AS (
      SELECT CAST(SUM(g_cnt) AS BIGINT) AS g_total FROM gc
    )
    SELECT sc.source,
           st.s_total AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_used,
           SUM(
             (CAST(s_cnt AS DOUBLE) / s_total)
             * ln((CAST(s_cnt AS DOUBLE) / s_total)
                  / (CAST(g_cnt AS DOUBLE) / g_total))
           ) AS kl_nats,
           SUM(
             -(CAST(s_cnt AS DOUBLE) / s_total)
             * ln(CAST(s_cnt AS DOUBLE) / s_total)
           ) AS entropy_nats
    FROM sc
    JOIN st ON st.source = sc.source
    JOIN gc ON gc.token = sc.token
    CROSS JOIN gt
    GROUP BY sc.source, st.s_total
    """,
)
def source_token_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution audit: KL(source ‖ corpus mixture)
    and source entropy in nats — the drift detector run when mixing
    crawl slices (a source whose unigram distribution diverges from the
    blend is over/under-weighted or contaminated; collapsing entropy
    flags template/boilerplate sources). Complements
    ``source_mixture_weights`` (which weighs sizes, not content).

    KL(source ‖ mixture) is always finite here: every source token is
    by construction in the corpus mixture (q > 0 wherever p > 0), so
    no smoothing constant has to be agreed with the oracle.

    Scale: all reductions happen on ALREADY-AGGREGATED (source, token)
    counts — raw token instances shuffle exactly once into that first
    hash aggregate (map-side partials; state per partition is the
    distinct-pair set, not instances). The global layer re-aggregates
    the pair counts (vocab-sized), totals are one-row broadcasts, and
    the final per-source sum is |sources| rows. Float sums span ~vocab
    terms of O(0.1) magnitude — ln() ULP drift vs DuckDB is ~1e-15,
    far inside the oracle's 6-dp tolerance (text_unigram_logprob
    precedent).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    sc = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt")
    )
    st = sc.groupBy("source").agg(
        F.sum("s_cnt").cast("bigint").alias("s_total")
    )
    gc = sc.groupBy("token").agg(F.sum("s_cnt").cast("bigint").alias("g_cnt"))
    gt = F.broadcast(
        gc.agg(F.sum("g_cnt").cast("bigint").alias("g_total"))
    )
    p = F.col("s_cnt").cast("double") / F.col("s_total")
    q = F.col("g_cnt").cast("double") / F.col("g_total")
    return (
        sc.join(F.broadcast(st), "source")
        .join(gc, "token")
        .crossJoin(gt)
        .groupBy("source", F.col("s_total").alias("n_tokens"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_used"),
            F.sum(p * F.log(p / q)).alias("kl_nats"),
            F.sum(-p * F.log(p)).alias("entropy_nats"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 interval build: gaps-and-islands over a changing user property.
# ---------------------------------------------------------------------------


def _scd2_islands(events: DataFrame) -> DataFrame:
    """Shared SCD2 island builder for user_prop_scd2_intervals and
    scd2_point_in_time_join: per-user (ts, event_id)-ordered change
    detection on props.k with a NULL-SAFE comparison — the engine twin
    of SQL's IS DISTINCT FROM (a NULL k run is ONE island; a
    value->NULL transition IS a change). One definition, two
    consumers, so version boundaries cannot drift between the interval
    table and the point-in-time join."""
    from pyspark.sql import Window as W

    ev = events.select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first = F.row_number().over(w) == 1
    changed = ~F.lag("k").over(w).eqNullSafe(F.col("k"))
    chg = F.when(first | changed, 1).otherwise(0)
    return ev.withColumn("chg", chg).withColumn(
        "version", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )


@register(
    "user_prop_scd2_intervals",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ), flagged AS (
      SELECT *,
             CASE WHEN LAG(k) OVER w IS DISTINCT FROM k THEN 1 ELSE 0 END
               AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ), grp AS (
      SELECT user_id, version, MIN(k) AS k, MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM islands GROUP BY user_id, version
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           k,
           valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           CAST(n_events AS BIGINT) AS n_events
    FROM grp
    """,
)
def user_prop_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: turn the
    per-user event stream's ``props.k`` attribute into versioned
    validity intervals ``[valid_from, valid_to)`` — one row per run of
    consecutive equal values, open-ended (NULL valid_to) for the
    current version. The gaps-and-islands construction every warehouse
    uses to historize a mutable attribute from an event log.

    Scale: every window is partitioned by user_id — no global sort
    anywhere. The LAG change-flag and the running-sum island id share
    one window spec (CollapseWindow folds them into a single Window
    exec), the interval aggregate is a hash agg on (user, version),
    and the closing LEAD runs over the already-collapsed interval
    table (rows = number of attribute CHANGES, not events). One
    shuffle of the event table on user_id, then strictly shrinking
    data. JSON extraction is get_json_object — JVM-side, codegen.

    Tie-break: (ts, event_id) — event_id is unique, so island
    numbering is deterministic on both engines even for same-instant
    events.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    islands = _scd2_islands(events)
    grp = islands.groupBy("user_id", "version").agg(
        F.min("k").alias("k"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = W.partitionBy("user_id").orderBy("version")
    return grp.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "k",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution: linear credit over a trailing touch window.
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_HOURS = 2


@register(
    "attribution_linear_credit",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT event_id AS t_id, user_id, event_type, ts AS t_ts
      FROM events WHERE event_type IN ('view', 'click')
    ), attributed AS (
      SELECT p.p_id, t.t_id, t.event_type,
             COUNT(*) OVER (PARTITION BY p.p_id) AS n_touches
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts <= p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 2 HOUR
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
           SUM(1.0 / n_touches) AS total_credit
    FROM attributed
    GROUP BY event_type
    """,
)
def attribution_linear_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's credit splits
    equally across the view/click touchpoints in its trailing 2-hour
    window; report, per touch channel, the touchpoint count, purchases
    reached, and total fractional credit. The fractional-credit
    generalization of asof_last_view_before_purchase (last-touch) —
    the two models bracket what marketing pipelines run.

    Scale: the temporal join is EQUI-keyed on user_id with the time
    band as a residual predicate — both sides shuffle once on the
    user, the band prunes inside each user's partition, and fan-out is
    bounded by touches-per-user-per-2h (activity-bounded, not
    corpus-bounded). The per-purchase touch count is a window over the
    joined table partitioned by purchase id, then one hash agg by
    channel. Credit sums are ~1e3 double terms — inside the 6-dp
    oracle tolerance; counts and coverage are exact integers.
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("ts").alias("t_ts"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") <= F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_HOURS} HOURS")
        )
    )
    attributed = joined.withColumn(
        "n_touches", F.count(F.lit(1)).over(W.partitionBy("p_id"))
    )
    return attributed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touchpoints"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases_touched"),
        F.sum(F.lit(1.0) / F.col("n_touches")).alias("total_credit"),
    )


# ---------------------------------------------------------------------------
# Purged time-series split with embargo.
# ---------------------------------------------------------------------------

EMBARGO_HOURS = 24


@register(
    "events_purged_timeseries_split",
    oracle="""
    WITH cutoff AS (
      SELECT date_trunc('hour', make_timestamp(
               epoch_us(MIN(ts))
               + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 8 // 10)) AS cut
      FROM events
    )
    SELECT CASE
             WHEN ts < cut - INTERVAL 24 HOUR THEN 'train'
             WHEN ts >= cut THEN 'test'
             ELSE 'embargo'
           END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events CROSS JOIN cutoff
    GROUP BY 1
    """,
)
def events_purged_timeseries_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal split for sequence models: the last 20% of
    the time span is TEST, everything more than 24h before the cutoff
    is TRAIN, and the 24h embargo band in between is DROPPED from both
    — the purge that stops look-ahead leakage through trailing
    features/windows that straddle the boundary (the purged-CV idea
    from financial ML, applied as a single split). The cutoff is
    snapped to the hour so the boundary is a stable data contract
    rather than a microsecond artifact of the span arithmetic.

    Scale: the cutoff is a one-row global (MIN, MAX) aggregate
    broadcast back; split assignment is then a scan-local CASE — no
    shuffle of the event table at all for the labeling, one map-side-
    combined aggregate for the audit counts reported here. In a real
    pipeline the same CASE expression feeds partitionBy('split') on
    the write.
    """
    events = load_table(spark, sf_dir, "events")
    # the 80% point is computed in exact integer microseconds (the *8
    # DIV 10 spelling) — float interval arithmetic would expose Spark's
    # truncate-vs-DuckDB's-round double->int difference. unix_micros
    # needs TIMESTAMP; ts is NTZ — under the UTC session timezone the
    # casts are pure reinterpretations of the same instant.
    span = F.broadcast(
        events.agg(
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        ).select(
            F.expr(
                "CAST(date_trunc('hour', timestamp_micros("
                "unix_micros(CAST(mn AS TIMESTAMP)) + "
                "((unix_micros(CAST(mx AS TIMESTAMP)) - "
                "unix_micros(CAST(mn AS TIMESTAMP))) * 8) DIV 10)) "
                "AS TIMESTAMP_NTZ) AS cut"
            )
        )
    )
    split = (
        F.when(
            F.col("ts") < F.col("cut") - F.expr(f"INTERVAL {EMBARGO_HOURS} HOURS"),
            F.lit("train"),
        )
        .when(F.col("ts") >= F.col("cut"), F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return (
        events.crossJoin(span)
        .groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point scan over the daily rollup.
# ---------------------------------------------------------------------------


@register(
    "events_cusum_changepoints",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(28,10))) AS v
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS sv,
             SUM(v * v) AS svv
      FROM daily GROUP BY event_type
    ), scored AS (
      SELECT d.event_type, d.d,
             SUM(CAST(d.v AS DOUBLE) - CAST(s.sv AS DOUBLE) / s.n)
               OVER (PARTITION BY d.event_type ORDER BY d.d
                     ROWS UNBOUNDED PRECEDING) AS cusum,
             sqrt((CAST(s.svv AS DOUBLE)
                   - CAST(s.sv AS DOUBLE) * CAST(s.sv AS DOUBLE) / s.n)
                  / (s.n - 1)) AS sd,
             s.n
      FROM daily d JOIN stats s ON s.event_type = d.event_type
    )
    SELECT event_type, d AS bucket_day,
           cusum,
           CAST(CASE WHEN abs(cusum) > 5 * sd THEN 1 ELSE 0 END AS BIGINT)
             AS flagged
    FROM scored
    """,
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan: per event type, the running sum of
    mean-centered DAILY totals, flagging days where |CUSUM| exceeds
    5 standard deviations of the daily series — the classic drift
    detector for level shifts a point-wise z-score (events_anomaly_
    zscore) cannot see. Runs on the rollup layer, not raw events.

    Determinism: daily totals and the moment sums are exact DECIMAL
    (order-independent); mean-centering and the running sum happen in
    doubles over an ORDERED window (same order both engines, so
    identical fold); sd comes from the closed-form moment derivation
    (regression_price_vs_quantity precedent). The flag compares
    |cusum| against 5*sd — both derived from the same bit-identical
    inputs on each engine.

    Scale: raw events collapse to |types| x |days| rows in one
    map-side-combined aggregate; the window and moment join run on
    that rollup (thousands of rows at any event volume) partitioned by
    type — never a global sort.
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(28,10)")).alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sd = F.sqrt(
        (
            F.col("svv").cast("double")
            - F.col("sv").cast("double") * F.col("sv").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    cusum = F.sum(
        F.col("v").cast("double") - F.col("sv").cast("double") / F.col("n")
    ).over(w)
    return (
        daily.join(stats, "event_type")
        .select(
            "event_type",
            F.col("d").alias("bucket_day"),
            cusum.alias("cusum"),
            F.when(F.abs(cusum) > 5 * sd, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence mining: most frequent event-type trigrams.
# ---------------------------------------------------------------------------


@register(
    "top_event_trigrams",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tri AS (
      SELECT event_type AS e1, e2, e3 FROM ordered
      WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ), counted AS (
      SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tri GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, e1, e2, e3) AS BIGINT)
             AS rank
    FROM counted
    ORDER BY cnt DESC, e1, e2, e3
    LIMIT 20
    """,
)
def top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the 20 most frequent consecutive
    event-type TRIGRAMS across all user journeys (deterministic
    (count desc, lexicographic) tie-break) — the pattern layer behind
    funnel design (funnel_view_click_purchase checks ONE hypothesized
    path; this discovers which paths dominate).

    Scale: trigram construction is two LEADs over one per-user window
    (user-keyed — no global sort; the two offsets share the window
    spec so CollapseWindow plans ONE Window exec); counting is a
    map-side-combined hash agg on the (e1,e2,e3) key (cardinality <=
    |event types|^3, tiny); the global top-20 plans as
    TakeOrderedAndProject and the rank window sorts 20 rows
    (token_vocab_topk precedent).
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    wd = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(wd).alias("e2"),
            F.lead("event_type", 2).over(wd).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    )
    counted = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    top = counted.orderBy(
        F.col("cnt").desc(), "e1", "e2", "e3"
    ).limit(20)
    wr = W.orderBy(F.col("cnt").desc(), "e1", "e2", "e3")
    return top.select(
        "e1",
        "e2",
        "e3",
        "cnt",
        F.row_number().over(wr).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Point-in-time join: events against their SCD2 interval version.
# ---------------------------------------------------------------------------


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ), flagged AS (
      SELECT *,
             CASE WHEN LAG(k) OVER w IS DISTINCT FROM k THEN 1 ELSE 0 END
               AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ), dim AS (
      SELECT user_id, version, MIN(k) AS k, MIN(ts) AS valid_from,
             LEAD(MIN(ts)) OVER (PARTITION BY user_id
                                 ORDER BY version) AS valid_to
      FROM islands GROUP BY user_id, version
    ), purchases AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    ), joined AS (
      SELECT p.event_id, p.user_id, d.version, d.k
      FROM purchases p
      JOIN dim d
        ON d.user_id = p.user_id
       AND p.ts >= d.valid_from
       AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM joined
    GROUP BY version
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join: every purchase event looks up the SCD2
    version of the user's ``props.k`` attribute that was valid AT THE
    EVENT'S OWN TIMESTAMP ([valid_from, valid_to) interval match,
    open-ended current version) — the leakage-safe feature lookup a
    training pipeline must use instead of joining today's attribute
    onto yesterday's event. Aggregated per dimension version so the
    gate checks the full assignment without a 100k-row result.

    Edge semantics pinned by construction: an event AT a version
    boundary belongs to the version it opened (>= from, < to) — the
    same convention the interval build derives, so every purchase
    matches exactly one interval.

    Scale: the dimension rebuild is the user_prop_scd2_intervals
    dataflow (user-keyed windows, shrinking data); the PIT join is
    EQUI-keyed on user_id with the interval containment as a residual
    band — the standard distributed PIT shape (both sides shuffle once
    on the entity key; per-user fan-out is versions-per-user, not
    corpus-sized). At warehouse scale the dim side is the stored SCD2
    table and only the band residual remains.
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    islands = _scd2_islands(events)
    w2 = W.partitionBy("user_id").orderBy("version")
    dim = (
        islands.groupBy("user_id", "version")
        .agg(F.min("k").alias("k"), F.min("ts").alias("valid_from"))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").alias("p_ts")
    )
    joined = purchases.join(dim, "user_id").filter(
        (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to")))
    )
    return joined.groupBy(F.col("version").cast("bigint").alias("version")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast evaluation over the daily rollup.
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_naive_mape",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(28,10))) AS v
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT cur.event_type, cur.d,
             CAST(cur.v AS DOUBLE) AS actual,
             CAST(prev.v AS DOUBLE) AS forecast
      FROM daily cur
      LEFT JOIN daily prev
        ON prev.event_type = cur.event_type
       AND prev.d = cur.d - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           AVG(abs(actual - forecast) / abs(actual)) AS mape,
           MAX(abs(actual - forecast)) AS max_abs_error
    FROM lagged
    WHERE forecast IS NOT NULL AND actual <> 0
    GROUP BY event_type
    """,
)
def events_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation: the seasonal-naive model
    (today = same weekday last week) scored with MAPE and max absolute
    error per event type over the daily rollup — the sanity baseline
    every real forecasting pipeline must beat before a model earns its
    compute. The forecast is matched by CALENDAR date (a self-join on
    d - 7 days), not by row position — a positional LAG(7) silently
    stops being "same weekday last week" the moment the series has a
    gap, and nothing enforces density here. Days whose d-7 ancestor is
    missing (including the first week) score nothing, pinned by the
    NULL filter on both engines.

    Scale: raw events collapse to the |types| x |days| rollup in one
    map-side-combined aggregate; the lag and scoring run on that tiny
    frame partitioned by type. Daily totals are exact decimals cast to
    double identically on both engines, so errors and their mean drift
    only at the 1e-15 fold level — far inside the gate tolerance.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(28,10)")).alias("v"))
    prev = daily.select(
        "event_type",
        (F.col("d") + F.expr("INTERVAL 7 DAYS")).alias("d"),
        F.col("v").alias("pv"),
    )
    lagged = daily.join(prev, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.col("v").cast("double").alias("actual"),
        F.col("pv").cast("double").alias("forecast"),
    )
    return (
        lagged.filter(
            F.col("forecast").isNotNull() & (F.col("actual") != 0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
            F.avg(
                F.abs(F.col("actual") - F.col("forecast"))
                / F.abs(F.col("actual"))
            ).alias("mape"),
            F.max(F.abs(F.col("actual") - F.col("forecast"))).alias(
                "max_abs_error"
            ),
        )
    )


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness: exact rolling distinct users.
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events
    ), days AS (
      SELECT DISTINCT d FROM du
    ), dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d
    ), wau AS (
      SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
      FROM days
      JOIN du ON du.d > days.d - INTERVAL 7 DAY AND du.d <= days.d
      GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness (DAU over trailing-7-day WAU) with EXACT
    rolling distinct users — the engagement staple. Exact rolling
    distinct cannot come from a window function (distinct state is not
    re-aggregable from daily counts), so the WAU side is the canonical
    rewrite: reduce once to DISTINCT (day, user) pairs, then band-join
    each pair to the <=7 observation days it supports and count
    distinct per day.

    Scale: the only corpus-sized pass is the (day, user) DISTINCT
    reduction (map-side partial dedup; pairs = active users x days,
    not events). The band join fans each pair out at most 7x against
    the tiny day spine, and the distinct count shuffles pairs keyed by
    day. At sketch-tolerant scale the same shape swaps the exact
    distinct for mergeable HLL partials (sketch_rollup_region's path);
    this query is the exact baseline that gates such a swap.
    """
    events = load_table(spark, sf_dir, "events")
    du = (
        events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    )
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    spine = days.select(F.col("d").alias("obs_d"))
    wau = (
        du.join(
            spine,
            (F.col("d") > F.col("obs_d") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("d") <= F.col("obs_d")),
        )
        .groupBy("obs_d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.obs_d)
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# Weekday x hour activity heatmap.
# ---------------------------------------------------------------------------


@register(
    "events_weekday_hour_profile",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS iso_weekday,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekday x hour-of-day activity heatmap (the capacity-
    planning / anomaly-baseline profile): event counts, distinct
    users, and decimal value totals per (ISO weekday, hour) cell.

    Engine-agnostic calendar note: Spark's dayofweek() is
    Sunday-based (1=Sun) while DuckDB's isodow() is Monday-based
    (1=Mon) — the engine uses weekday()+1 (Mon=0 -> 1..7) to match
    isodow exactly rather than relying on either engine's default.

    Scale: one map-side-combined aggregate into a fixed 7x24-cell
    grid; the distinct-user count is the only expansion (distinct
    users per cell per partition) and swaps for an HLL partial at
    sketch-tolerant scale.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("iso_weekday"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over event types.
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS cur, next_type AS nxt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT cur, CAST(SUM(c) AS BIGINT) AS row_total FROM pairs GROUP BY cur
    )
    SELECT p.cur, p.nxt, p.c AS n_transitions,
           CAST(p.c AS DOUBLE) / t.row_total AS probability
    FROM pairs p JOIN totals t ON t.cur = p.cur
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over user journeys: the event-type
    transition matrix with maximum-likelihood probabilities
    (count(cur->next) / count(cur->*)) — the sequence-model BASELINE a
    learned next-event model (events_next_event_training_pairs feeds
    one) must beat, and the normalized complement of the raw trigram
    counts (top_event_trigrams).

    Scale: one LEAD over the user-keyed window, a |types|^2-key hash
    aggregate with map-side partials, and row totals re-aggregated
    from the tiny pair table — probabilities are exact-integer ratios
    divided identically on both engines.
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = pairs.groupBy("cur").agg(
        F.sum("c").cast("bigint").alias("row_total")
    )
    return pairs.join(totals, "cur").select(
        "cur",
        "nxt",
        F.col("c").alias("n_transitions"),
        (F.col("c").cast("double") / F.col("row_total")).alias("probability"),
    )


# ------------------------------------------------ time-weighted average


@register(
    "events_twap_daily",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, value, event_id,
             LEAD(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    seg AS (
      SELECT user_id, day,
             CAST(value AS DECIMAL(18,2)) AS v,
             epoch_us(nxt) - epoch_us(ts) AS dur_us
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(CAST(SUM(v * dur_us) AS DOUBLE)
                / CAST(SUM(dur_us) AS DOUBLE) AS DOUBLE) AS twap
    FROM seg
    GROUP BY user_id, day
    HAVING SUM(dur_us) > 0
    """,
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user per day — the
    hypertable/financial TWAP: each observation holds from its own
    timestamp until the next observation of the same (user, day), and
    is weighted by that holding duration. The last observation of a
    day has no holding interval and contributes no weight (interval
    TWAP over observed segments).

    Exactness: value has 2 decimals -> DECIMAL(18,2); the weighted sum
    SUM(value_dec * duration_us) is decimal x bigint = exact decimal,
    so the aggregate is order-independent and bit-equal across
    engines; only the final division happens in double.

    Scale: one window pass partitioned by (user_id, day) — high
    cardinality, uniformly sized partitions (a user's events within
    one day), then a hash aggregate on the same key, which reuses the
    window's partitioning (no second shuffle). No global sort.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    dur = F.expr("unix_micros(CAST(nxt AS TIMESTAMP))") - F.expr(
        "unix_micros(CAST(ts AS TIMESTAMP))"
    )
    seg = seq.select(
        "user_id",
        "day",
        F.col("value").cast("decimal(18,2)").alias("v"),
        dur.alias("dur_us"),
    )
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_us").alias("total_us"),
            (
                F.sum(F.col("v") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double")
            ).alias("twap"),
        )
        .filter(F.col("total_us") > 0)
    )
