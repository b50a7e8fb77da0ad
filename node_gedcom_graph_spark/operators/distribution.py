"""Distribution-shape and corpus-duplication analytics.

Six operators that round out the statistical-audit surface a
training-data pipeline runs before committing 100 TB to a tokenizer:

- Benford first-digit conformance over order totals (the classic
  fraud/synthetic-data smell test);
- exact weighted median via pre-aggregated cumulative weights (the
  scalable exact formulation: aggregate per distinct value FIRST, then
  one small cumulative window — never a full-row sort);
- Zipf slope fit over the token frequency spectrum (``regr_slope`` on
  the log-log rank/frequency curve — how "natural" is the corpus?);
- pairwise covariance of leading embedding dimensions (the first
  diagnostic before whitening / PCA);
- FIR-windowed EWMA smoothing residuals per event type (the bounded
  deterministic twin of recursive EWMA, which no window can express);
- duplicated-n-gram coverage per source (Lee et al. 2021,
  "Deduplicating Training Data Makes Language Models Better": the
  fraction of token 5-gram POSITIONS whose n-gram also appears in
  some other document — the substring-dedup audit metric).

Reference parity note: the reference (839-LoC GEDCOM ETL) has no
statistics surface; these extend the LLM-pipeline operator family the
build brief makes first-class. Cross-engine determinism follows the
house rules: set membership only on integer cross-multiplication or
quantized boundaries, sums that feed hashes either exact (BIGINT /
DECIMAL) or rounded well inside the oracle's 6-dp tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from node_gedcom_graph_spark.functions.scalar import tokens
from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Benford first-digit profile.
# ---------------------------------------------------------------------------


@register(
    "orders_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(COUNT(*) * 1.0 / MAX(n_total), 6) AS observed_share,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           ROUND((COUNT(*) * 1.0 / MAX(n_total) - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit), 6) AS relative_excess
    FROM d CROSS JOIN tot
    GROUP BY digit
    ORDER BY digit
    """,
)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: observed share of
    each leading digit vs the log10(1+1/d) expectation.

    Determinism: the digit is taken from the BIGINT's string form
    (``floor`` then integer-to-string — identical on both engines; a
    double-to-string route would hit formatting divergence). Shares
    are exact-integer ratios divided once, then rounded.

    Scale: one map-side-combined groupBy on a 9-value key; the total
    arrives via a broadcast one-row cross join, not a second scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    share = F.col("n_orders") / F.col("n_total")
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(share, 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round((share - benford) / benford, 6).alias("relative_excess"),
        )
    )


# ---------------------------------------------------------------------------
# Exact weighted median from pre-aggregated cumulative weights.
# ---------------------------------------------------------------------------


@register(
    "lineitem_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS BIGINT)) AS DECIMAL(38,2)) AS pw
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, price, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price
                           ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
      FROM w
    )
    SELECT c.l_returnflag,
           CAST(MIN(c.price) AS DOUBLE) AS weighted_median_price,
           CAST(MAX(c.tot) AS BIGINT) AS total_weight,
           CAST(m.wmean AS DOUBLE) AS weighted_mean_price
    FROM c
    JOIN (SELECT l_returnflag,
                 CAST(SUM(pw) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE) AS wmean
          FROM w GROUP BY 1) m USING (l_returnflag)
    WHERE 2 * c.cum >= c.tot
    GROUP BY c.l_returnflag, m.wmean
    ORDER BY c.l_returnflag
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — the
    lower weighted median (smallest price whose cumulative weight
    reaches half the total).

    This is the SCALABLE exact formulation: weights are first summed
    per DISTINCT (flag, price) — a map-side-combined hash aggregate —
    and the cumulative window then runs over distinct values only, not
    raw rows. At 100 TB the window input is |distinct prices per
    flag|, orders of magnitude below row count; the raw table is never
    globally sorted. Boundary membership is integer cross-multiplied
    (``2*cum >= tot`` over BIGINT quantities), so no float boundary
    can flip the selected row between engines. The weighted mean rides
    along exactly (DECIMAL(18,2) price x BIGINT weight, one final
    divide).
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("wt"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("bigint")
        )
        .cast("decimal(38,2)")
        .alias("pw"),
    )
    cum_w = (
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "price",
        "wt",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    mean = w.groupBy("l_returnflag").agg(
        (F.sum("pw").cast("double") / F.sum("wt").cast("double")).alias(
            "wmean"
        )
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median_price"),
            F.max("tot").cast("bigint").alias("total_weight"),
        )
        .join(F.broadcast(mean), "l_returnflag")
        .select(
            "l_returnflag",
            "weighted_median_price",
            "total_weight",
            F.col("wmean").cast("double").alias("weighted_mean_price"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf slope of the token frequency spectrum.
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 1000


@register(
    "token_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ), counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM counts
      ORDER BY cnt DESC, token
      LIMIT {ZIPF_TOP_N}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(regr_slope(ln(cnt), ln(rnk)), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(cnt), ln(rnk)), 6) AS zipf_intercept,
           ROUND(regr_r2(ln(cnt), ln(rnk)), 6) AS zipf_r2
    FROM ranked
    """,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-{N} token frequency spectrum: OLS
    slope/intercept/R^2 of ln(frequency) on ln(rank). Natural-language
    corpora sit near slope -1; synthetic or templated text drifts —
    a one-row corpus-naturalness fingerprint.

    Determinism: ranks are row_number with a (cnt desc, token asc)
    tie-break, but the REGRESSION is tie-order invariant anyway —
    within a tie block frequencies are equal, so only the multiset of
    ranks matters, and that is fixed. The regr_* aggregates sum ~1000
    O(1)-magnitude log terms; cross-engine summation-order drift is
    ~1e-12, far inside the 6-dp round.

    Scale: token counting is the map-side-combined explode/groupBy;
    the top-N is TakeOrderedAndProject (per-partition heaps, no global
    sort); the regression then aggregates {N} rows.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ranked = (
        counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(ZIPF_TOP_N)
        .select(
            "cnt",
            F.row_number()
            .over(W.orderBy(F.col("cnt").desc(), F.col("token")))
            .alias("rnk"),
        )
    )
    lc, lr = F.log(F.col("cnt")), F.log(F.col("rnk"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("zipf_r2"),
    )


# ---------------------------------------------------------------------------
# Pairwise covariance of leading embedding dimensions.
# ---------------------------------------------------------------------------

COV_DIMS = 6


@register(
    "embedding_covariance_topdims",
    oracle=f"""
    WITH pairs AS (
      SELECT i.i AS dim_i, j.j AS dim_j
      FROM generate_series(1, {COV_DIMS}) i(i)
      JOIN generate_series(1, {COV_DIMS}) j(j) ON j.j >= i.i
    )
    SELECT CAST(dim_i AS INTEGER) AS dim_i,
           CAST(dim_j AS INTEGER) AS dim_j,
           ROUND(covar_pop(CAST(embedding[dim_i] AS DOUBLE),
                           CAST(embedding[dim_j] AS DOUBLE)), 6) AS cov,
           ROUND(corr(CAST(embedding[dim_i] AS DOUBLE),
                      CAST(embedding[dim_j] AS DOUBLE)), 6) AS pearson_r
    FROM embeddings CROSS JOIN pairs
    GROUP BY dim_i, dim_j
    ORDER BY dim_i, dim_j
    """,
)
def embedding_covariance_topdims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance/correlation matrix of the first
    {COV_DIMS} embedding dimensions — the pre-whitening diagnostic
    (strongly correlated leading dims mean PCA/whitening will pay off;
    a near-diagonal matrix means the encoder already decorrelates).

    Shape: one row per scanned vector fans out to the 21 (i<=j) pairs
    via a broadcast literal pair table, then a single map-side-combined
    groupBy on the 21-value key — the raw table is scanned ONCE for the
    whole matrix, the canonical way to batch many small aggregates.
    covar_pop/corr moment sums are O(unit) magnitudes over the corpus;
    summation-order drift sits ~1e-10, inside the 6-dp round.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = [
        (i, j) for i in range(1, COV_DIMS + 1) for j in range(i, COV_DIMS + 1)
    ]
    pair_df = F.broadcast(
        emb.sparkSession.createDataFrame(pairs, "dim_i int, dim_j int")
    )
    x = F.element_at("embedding", F.col("dim_i")).cast("double")
    y = F.element_at("embedding", F.col("dim_j")).cast("double")
    return (
        emb.crossJoin(pair_df)
        .groupBy("dim_i", "dim_j")
        .agg(
            F.round(F.covar_pop(x, y), 6).alias("cov"),
            F.round(F.corr(x, y), 6).alias("pearson_r"),
        )
    )


# ---------------------------------------------------------------------------
# FIR-windowed EWMA smoothing residuals.
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_TAPS = 8
EWMA_SPIKE_TH = 100.0  # |residual| gate; events.value spans 0.01..490


@register(
    "events_ewma_fir",
    oracle=f"""
    WITH lagged AS (
      SELECT event_type, value,
             {", ".join(
                 f"lag(value, {j}) OVER w AS x{j}" for j in range(EWMA_TAPS)
             )}
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts)
    ), smoothed AS (
      SELECT event_type, value,
             ({" + ".join(
                 f"x{j} * {EWMA_ALPHA * (1 - EWMA_ALPHA) ** j!r}"
                 for j in range(EWMA_TAPS)
             )})
             / {sum(EWMA_ALPHA * (1 - EWMA_ALPHA) ** j
                    for j in range(EWMA_TAPS))!r} AS fir
      FROM lagged WHERE x{EWMA_TAPS - 1} IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_smoothed,
           ROUND(AVG(abs(value - fir)), 6) AS mean_abs_resid,
           ROUND(MAX(abs(value - fir)), 6) AS max_abs_resid,
           CAST(SUM(CASE WHEN round(abs(value - fir) - {EWMA_SPIKE_TH!r}, 9)
                              > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes
    FROM smoothed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_ewma_fir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type EWMA smoothing residual profile, using the
    FINITE-impulse-response truncation of the EWMA (8 geometric taps,
    alpha=0.3, renormalized). Recursive EWMA is inexpressible as a SQL
    window (each output feeds the next); the FIR twin is the standard
    bounded-memory stand-in, is what a streaming job keeps as state,
    and — crucially here — is expressible IDENTICALLY on both engines,
    so the whole smoothing path is hash-gated, not just row counts.

    Determinism: (event_type, ts) is unique in this dataset, so lag
    frames are fully ordered; each FIR value is the SAME left-to-right
    float expression on both engines (ULP-identical); spike membership
    is gated on a quantized boundary (round(|resid| - TH, 9) > 0, the
    events_anomaly_zscore precedent) so a boundary row cannot flip the
    set.

    Scale: one shuffle on event_type, one window sort per type, all
    eight lags fold into a single Window physical operator
    (CollapseWindow); the FIR arithmetic is whole-stage-codegen column
    math. Per-type data volume is the skew bound, as with any
    per-entity time series.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts")
    lag_cols = [
        F.lag("value", j).over(w).alias(f"x{j}") for j in range(EWMA_TAPS)
    ]
    lagged = events.select("event_type", "value", *lag_cols).filter(
        F.col(f"x{EWMA_TAPS - 1}").isNotNull()
    )
    weights = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** j for j in range(EWMA_TAPS)]
    num = None
    for j, wj in enumerate(weights):
        term = F.col(f"x{j}") * F.lit(wj)
        num = term if num is None else num + term
    fir = num / F.lit(sum(weights))
    resid = F.abs(F.col("value") - fir)
    return (
        lagged.select("event_type", resid.alias("resid"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_smoothed"),
            F.round(F.avg("resid"), 6).alias("mean_abs_resid"),
            F.round(F.max("resid"), 6).alias("max_abs_resid"),
            F.sum(
                F.when(
                    F.round(F.col("resid") - EWMA_SPIKE_TH, 9) > 0, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_spikes"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicated-n-gram coverage (Lee et al. 2021 substring-dedup audit).
# ---------------------------------------------------------------------------

DUP_NGRAM_N = 5


@register(
    "doc_dup_ngram_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, source,
             array_to_string(t[i:i+{DUP_NGRAM_N - 1}], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, len(t) - {DUP_NGRAM_N - 1})) s(i)
      WHERE len(t) >= {DUP_NGRAM_N}
    ), gram_docs AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY gram
    ), per_doc AS (
      SELECT g.doc_id, g.source,
             CAST(COUNT(*) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS dup_pos
      FROM grams g JOIN gram_docs gd USING (gram)
      GROUP BY g.doc_id, g.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_pos) AS BIGINT) AS total_positions,
           CAST(SUM(dup_pos) AS BIGINT) AS dup_positions,
           ROUND(SUM(dup_pos) * 1.0 / SUM(n_pos), 6) AS dup_fraction,
           CAST(SUM(CASE WHEN 2 * dup_pos > n_pos THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_majority_dup
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram coverage per source: for every token 5-gram
    POSITION in every document, is that 5-gram present in at least one
    OTHER document? The per-source fraction is the metric Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better")
    use to audit substring-level duplication that document-level dedup
    (exact/MinHash) cannot see.

    Scale: n-gram positions explode ~|tokens| rows, but every later
    stage is keyed on the gram hash — a map-side-combined
    COUNT(DISTINCT doc_id) per gram, then a gram-keyed shuffle join
    back to positions, then per-doc and per-source hash aggregates.
    No all-pairs anywhere; the gram-frequency skew (stopword runs) is
    exactly what AQE skew-join handles, and the distinct-doc count per
    gram could drop to a 2-cap (``n_docs >= 2`` is all we consume) via
    an early LIMIT-per-key rewrite if a production corpus made the
    full distinct too hot. Majority-dup doc membership is integer
    cross-multiplied (2*dup > total), hash-stable.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    grams = (
        toks.filter(F.size("t") >= DUP_NGRAM_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {DUP_NGRAM_N - 1}),"
                    f" i -> concat_ws(' ', slice(t, i, {DUP_NGRAM_N})))"
                )
            ).alias("gram"),
        )
    )
    gram_docs = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    per_doc = (
        grams.join(gram_docs, "gram")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pos"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_pos"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_pos").cast("bigint").alias("total_positions"),
            F.sum("dup_pos").cast("bigint").alias("dup_positions"),
            F.round(F.sum("dup_pos") / F.sum("n_pos"), 6).alias(
                "dup_fraction"
            ),
            F.sum(
                F.when(2 * F.col("dup_pos") > F.col("n_pos"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_majority_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Exact Gini coefficient per region.
# ---------------------------------------------------------------------------


@register(
    "customer_gini_by_region",
    oracle="""
    WITH bal AS (
      SELECT r.r_name AS region_name,
             CAST(c.c_acctbal AS DECIMAL(18,2)) AS x
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE c.c_acctbal > 0
    ), ranked AS (
      SELECT region_name, x,
             CAST(row_number() OVER (PARTITION BY region_name ORDER BY x)
                  AS BIGINT) AS i
      FROM bal
    )
    SELECT region_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(x) AS DOUBLE) AS total_balance,
           ROUND(2.0 * CAST(SUM(i * x) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY region_name
    """,
)
def customer_gini_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of positive account balances per region —
    the canonical inequality measure, from the rank-weighted closed
    form G = 2*sum(i*x_(i))/(n*sum(x)) - (n+1)/n over ascending-sorted
    balances.

    Determinism: both the rank-weighted sum and the total run in
    DECIMAL (rank BIGINT x DECIMAL(18,2) balance), so accumulation
    order cannot move them; ties in balance leave sum(i*x) invariant
    (equal x across a tie block, and the block's rank-sum is fixed).
    The only floats are two final divides, then the 6-dp round.

    Scale: the sort is PARTITIONED (per region) — a window sort within
    each region's shuffle partition, never a global range exchange.
    Regions are few, so region skew is the bound; for a high-skew
    grouping key the same shape works off any finer partition column
    with a merge of per-bucket (n, sum, rank-sum) triples.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
        )
    )
    w = W.partitionBy("region_name").orderBy("x")
    ranked = bal.select(
        "region_name",
        "x",
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    n = F.count(F.lit(1))
    sum_x = F.sum("x").cast("double")
    sum_ix = F.sum(F.col("i") * F.col("x")).cast("double")
    return ranked.groupBy("region_name").agg(
        n.cast("bigint").alias("n_customers"),
        sum_x.alias("total_balance"),
        F.round(
            F.lit(2.0) * sum_ix / (n * sum_x) - (n + F.lit(1.0)) / n, 6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Grouped OLS: discount elasticity of quantity per brand.
# ---------------------------------------------------------------------------


@register(
    "brand_discount_elasticity",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           ROUND(regr_slope(l.l_quantity, l.l_discount), 6) AS slope,
           ROUND(regr_intercept(l.l_quantity, l.l_discount), 6)
             AS intercept,
           ROUND(corr(l.l_quantity, l.l_discount), 6) AS pearson_r
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount — the grouped-regression
    twin of token_zipf_fit's global fit: does a deeper discount move
    quantity, brand by brand?

    Scale: regr_slope/regr_intercept/corr are mergeable moment
    aggregates (sum, sum-of-squares, cross-product), so the plan is a
    broadcast part join followed by ONE map-side-combined hash
    aggregate on the 25-value brand key — the grouped-OLS idiom that
    replaces per-group model fitting with a single pass. Moment-sum
    ordering drift across engines is ~1e-12 relative, inside the 6-dp
    round.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    q, d = F.col("l_quantity"), F.col("l_discount")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.round(F.regr_slope(q, d), 6).alias("slope"),
        F.round(F.regr_intercept(q, d), 6).alias("intercept"),
        F.round(F.corr(q, d), 6).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz-style runs audit over exact daily revenue.
# ---------------------------------------------------------------------------


@register(
    "daily_revenue_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1, 2
    ), diffs AS (
      SELECT yr, d, rev,
             rev - lag(rev) OVER (PARTITION BY yr ORDER BY d) AS diff
      FROM daily
    ), signs AS (
      SELECT yr, d,
             CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
      FROM diffs WHERE diff IS NOT NULL AND diff <> 0
    ), runs AS (
      SELECT yr, s,
             CASE WHEN lag(s) OVER (PARTITION BY yr ORDER BY d) IS NULL
                       OR lag(s) OVER (PARTITION BY yr ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    )
    SELECT yr AS year,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
           CAST(SUM(new_run) AS BIGINT) AS n_runs,
           ROUND(1.0 + 2.0 * SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                           * SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                           / COUNT(*), 6) AS expected_runs
    FROM runs
    GROUP BY yr
    """,
)
def daily_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz-style runs audit of the daily revenue series,
    per year: count maximal same-direction blocks among up/down moves
    and compare with the expected run count under randomness
    (1 + 2*n_up*n_down/n). Far fewer runs than expected means
    trending; far more means oscillation — a one-pass randomness
    smell test on a revenue series.

    Determinism: daily revenue is an exact DECIMAL sum, so move
    direction (the ONLY set-membership gate) is an exact comparison —
    no float boundary anywhere. Run starts come from a second lag over
    the same per-year order.

    Scale: the raw scan collapses to |days| rows in one aggregate;
    both windows are partitioned BY YEAR (bounded frames, no global
    sort) and collapse into two Window operators over a few hundred
    rows per partition regardless of order volume.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    wy = W.partitionBy("yr").orderBy("d")
    diffs = daily.select(
        "yr", "d", (F.col("rev") - F.lag("rev").over(wy)).alias("diff")
    )
    signs = diffs.filter(
        F.col("diff").isNotNull() & (F.col("diff") != 0)
    ).select(
        "yr", "d", F.when(F.col("diff") > 0, 1).otherwise(-1).alias("s")
    )
    prev_s = F.lag("s").over(wy)
    runs = signs.select(
        "yr",
        "s",
        F.when(prev_s.isNull() | (prev_s != F.col("s")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    n_up = F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
    n_down = F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
    n = F.count(F.lit(1))
    return runs.groupBy(F.col("yr").alias("year")).agg(
        n.cast("bigint").alias("n_moves"),
        n_up.cast("bigint").alias("n_up"),
        n_down.cast("bigint").alias("n_down"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
        F.round(
            F.lit(1.0) + F.lit(2.0) * n_up * n_down / n, 6
        ).alias("expected_runs"),
    )


# ---------------------------------------------------------------------------
# Pareto 80/20 revenue concentration per nation.
# ---------------------------------------------------------------------------


@register(
    "nation_revenue_pareto",
    oracle="""
    WITH cust_rev AS (
      SELECT n.n_name AS nation_name, o.o_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nation_name, rev,
             SUM(rev) OVER (PARTITION BY nation_name
                            ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER (PARTITION BY nation_name) AS tot,
             COUNT(*) OVER (PARTITION BY nation_name) AS n_cust
      FROM cust_rev
    )
    SELECT nation_name,
           CAST(MAX(n_cust) AS BIGINT) AS n_customers,
           CAST(MAX(tot) AS DOUBLE) AS total_revenue,
           CAST(MIN(k) AS BIGINT) AS top_customers_for_80pct,
           ROUND(CAST(MIN(k) AS DOUBLE) / MAX(n_cust), 6)
             AS pareto_share
    FROM (
      SELECT nation_name, n_cust, tot,
             row_number() OVER (PARTITION BY nation_name
                                ORDER BY cum, rev DESC) AS k,
             cum
      FROM ranked
    )
    WHERE 5 * cum >= 4 * tot
    GROUP BY nation_name
    """,
)
def nation_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per nation: the smallest number of top
    customers whose combined revenue reaches 80% of the nation's
    total, and the share of the customer base they represent (the
    "does the 80/20 rule hold?" audit).

    Determinism: per-customer revenue and every cumulative/total sum
    stay in DECIMAL end-to-end, and the 80% boundary is cross-
    multiplied in DECIMAL (5*cum >= 4*tot) — exact on both engines.
    Revenue ties at the boundary are broken by custkey in the
    cumulative order, and the inner rank orders by the exact cum
    value, so k is unique.

    Scale: per-customer revenue is one map-side-combined aggregate;
    the window sorts |customers| rows PER NATION inside each hash
    partition — no global exchange. The boundary scan then reduces
    each nation to one row.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust_rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    )
    wcum = (
        W.partitionBy("nation_name")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("nation_name")
    ranked = cust_rev.select(
        "nation_name",
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n_cust"),
    )
    wk = W.partitionBy("nation_name").orderBy("cum", F.col("rev").desc())
    return (
        ranked.select(
            "nation_name",
            "n_cust",
            "tot",
            "cum",
            F.row_number().over(wk).alias("k"),
        )
        .filter(5 * F.col("cum") >= 4 * F.col("tot"))
        .groupBy("nation_name")
        .agg(
            F.max("n_cust").cast("bigint").alias("n_customers"),
            F.max("tot").cast("double").alias("total_revenue"),
            F.min("k").cast("bigint").alias("top_customers_for_80pct"),
            F.round(
                F.min("k").cast("double") / F.max("n_cust"), 6
            ).alias("pareto_share"),
        )
    )
