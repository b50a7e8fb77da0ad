"""Training-data pipeline surface, part 4: cross-document boilerplate
removal (C4 recipe), DSIR importance weighting for data selection,
incremental snapshot deduplication (the production "new crawl vs
existing corpus" shape), and a deterministic hashed-feature quality
classifier.

Reference parity note: the reference (node-gedcom-graph, index.js +
lib/) has no text-corpus surface — these operators extend the engine
with the large-scale pretraining-data operations the build brief lists
as first-class, expressed with built-in column functions so they stay
JVM-side and codegen'd.

Published-recipe citations (public papers only):
- Boilerplate removal: Raffel et al. 2020 (C4, arXiv:1910.10683) drops
  lines that occur more than once in the corpus; RefinedWeb
  (arXiv:2306.01116) repeats the rule at span granularity. The corpus
  here has no newlines, so the unit is the module-shared
  ``PARA_WORDS``-word span (same unit as dedup_paragraph_exact).
- DSIR: Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling" (arXiv:2302.03169) — hashed n-gram features,
  per-example importance weight = log p_target(x) - log p_raw(x) under
  bag-of-feature unigram models.

Cross-engine determinism: all hashing is the md5 idiom shared with the
dedup md5 twins (DuckDB ``CAST(('0x' || substr(md5(x),1,4)) AS
INTEGER)`` == Spark ``conv(substring(md5(x),1,4),16,10)``); integer
aggregates are exact; the only doubles are int/int divisions and ln()
of identical doubles, whose ULP drift sits far inside the gate's
6-decimal rounding (the text_unigram_logprob precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.functions.scalar import md5_bucket, tokens
from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.operators.dedup import PARA_WORDS, paragraph_spans
from node_gedcom_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Boilerplate span removal (C4 rule at span granularity).
# ---------------------------------------------------------------------------

# A span is boilerplate when it occurs in >= this many DISTINCT
# documents (C4 uses "more than once in the corpus"; distinct-doc
# counting is the RefinedWeb refinement that ignores within-doc
# repetition, which the repetition filters already score).
BOILER_MIN_DOCS = 2


@register(
    "boilerplate_span_removal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE length(text) > 0
    ), para AS MATERIALIZED (
      SELECT doc_id,
             CAST(u.s / {PARA_WORDS} AS BIGINT) AS pidx,
             array_to_string(
               list_slice(w, u.s + 1, u.s + {PARA_WORDS}), ' ') AS para
      FROM toks
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, GREATEST(len(w), 1), {PARA_WORDS})) AS s
      ) u
    ), freq AS MATERIALIZED (
      SELECT para, COUNT(DISTINCT doc_id) AS n_docs
      FROM para GROUP BY para
    ), marked AS (
      SELECT p.doc_id, p.pidx, p.para,
             f.n_docs < {BOILER_MIN_DOCS} AS kept
      FROM para p JOIN freq f USING (para)
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
             AS n_boiler,
           md5(COALESCE(
             string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY pidx),
             '')) AS clean_md5,
           CAST(length(COALESCE(
             string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY pidx),
             '')) AS BIGINT) AS clean_chars
    FROM marked
    GROUP BY doc_id
    """,
)
def boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb "shared
    line" rule): every {PARA_WORDS}-word span that appears in >=
    {BOILER_MIN_DOCS} DISTINCT documents is removed from EVERY
    document that contains it — unlike dedup_paragraph_exact, which
    keeps the first occurrence, boilerplate (headers, footers,
    cookie banners) is noise in all its occurrences. Output is one
    row per document: span counts and the md5 + length of the
    reconstructed clean text, so the verdict is hash-gated without
    shipping document bodies.

    Scale shape: (1) the span explode is map-side (rows = corpus
    words / {PARA_WORDS}); (2) the distinct-doc frequency is a hash
    agg keyed by the span — count_distinct(doc_id) partials combine
    map-side to sets bounded by the span's true doc count (and at
    100 TB the exact count can drop to approx_count_distinct: the
    verdict only needs ">= {BOILER_MIN_DOCS}"); (3) the verdict join
    back on the span key reuses the frequency agg's partitioning;
    (4) reassembly aggregates per doc_id, sorting only one document's
    spans at a time — never a corpus-wide ORDER BY.
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = paragraph_spans(docs)
    freq = spans.groupBy("para").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    marked = spans.join(freq, "para").select(
        "doc_id",
        "pidx",
        "para",
        (F.col("n_docs") < BOILER_MIN_DOCS).alias("kept"),
    )
    clean = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("kept"), F.struct("pidx", "para"))
                )
            ),
            lambda x: x["para"],
        ),
        " ",
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((~F.col("kept")).cast("int")).cast("bigint").alias("n_boiler"),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("bigint").alias("clean_chars"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed unigram bag models).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 8192
DSIR_ALPHA = 0.5  # add-alpha smoothing on both feature models
DSIR_TARGET_SOURCE = "src0"  # the fixture's stand-in "target domain"

_DSIR_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % " f"{DSIR_BUCKETS}"
)


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source,
             {_DSIR_BUCKET_SQL} AS bucket
      FROM (
        SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      )
    ), raw AS MATERIALIZED (
      SELECT bucket, COUNT(*) AS r_cnt FROM tok GROUP BY bucket
    ), tgt AS (
      SELECT bucket, COUNT(*) AS t_cnt FROM tok
      WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY bucket
    ), tot AS (
      SELECT (SELECT SUM(r_cnt) FROM raw) AS r_tot,
             (SELECT COALESCE(SUM(t_cnt), 0) FROM tgt) AS t_tot
    ), wgt AS (
      SELECT r.bucket,
             ln( ((COALESCE(t.t_cnt, 0) + {DSIR_ALPHA})
                  / (tot.t_tot + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                 / ((r.r_cnt + {DSIR_ALPHA})
                    / (tot.r_tot + {DSIR_ALPHA} * {DSIR_BUCKETS})) ) AS w
      FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
    ), docbucket AS (
      SELECT doc_id, source, bucket, COUNT(*) AS c
      FROM tok GROUP BY doc_id, source, bucket
    )
    SELECT d.doc_id, d.source,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           SUM(d.c * w.w) / SUM(d.c) AS avg_logratio
    FROM docbucket d JOIN wgt w USING (bucket)
    GROUP BY d.doc_id, d.source
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document (Xie et al. 2023,
    arXiv:2302.03169): tokens hash into {DSIR_BUCKETS} buckets; the
    target model is the '{DSIR_TARGET_SOURCE}' slice and the raw model
    the whole corpus, both add-{DSIR_ALPHA} smoothed; each document
    scores the mean log importance ratio of its token occurrences.
    Selecting the top-weighted documents (or Gumbel-resampling on the
    weights) is the DSIR data-selection step.

    Scale shape: ONE pass over the token stream feeds both models and
    the per-doc features — the (doc_id, bucket) count agg combines
    map-side (bounded by distinct buckets per doc), and the two model
    aggregations reduce to <= {DSIR_BUCKETS} rows each, so the weight
    table is broadcast into the per-doc join: no shuffle keyed on
    anything wider than (doc_id, bucket). The ln() argument is built
    as one quotient with identical shape on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).select(
        "doc_id", "source", md5_bucket(F.col("tok"), DSIR_BUCKETS).alias("bucket")
    )
    raw = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("r_cnt"))
    tgt = (
        tok.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    totals = (
        raw.agg(F.sum("r_cnt").alias("r_tot"))
        .crossJoin(
            tgt.agg(F.coalesce(F.sum("t_cnt"), F.lit(0)).alias("t_tot"))
        )
    )
    ab = F.lit(float(DSIR_ALPHA) * DSIR_BUCKETS)
    wgt = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.log(
                (
                    (F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(DSIR_ALPHA))
                    / (F.col("t_tot") + ab)
                )
                / (
                    (F.col("r_cnt") + F.lit(DSIR_ALPHA))
                    / (F.col("r_tot") + ab)
                )
            ).alias("w"),
        )
    )
    docbucket = tok.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        docbucket.join(F.broadcast(wgt), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("w")) / F.sum("c")).alias(
                "avg_logratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Incremental snapshot dedup (new crawl vs existing corpus).
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_snapshot",
    oracle="""
    WITH old AS (
      SELECT md5(text) AS fp, MIN(doc_id) AS match_old_id
      FROM documents WHERE doc_id % 10 < 8
      GROUP BY md5(text)
    ), new AS (
      SELECT doc_id, source, md5(text) AS fp
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT n.doc_id, n.source,
           CAST(CASE WHEN o.match_old_id IS NULL THEN 0 ELSE 1 END
                AS INTEGER) AS is_dup,
           o.match_old_id
    FROM new n LEFT JOIN old o USING (fp)
    """,
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape where a NEW crawl
    batch is deduplicated against an EXISTING corpus rather than
    against itself (every refresh of a 100 TB corpus runs this, not a
    full self-join). The fixture splits documents by ``doc_id % 10``:
    80% "existing", 20% "new"; each new document reports whether its
    exact fingerprint already exists and the smallest matching old id.

    Scale shape: the existing side collapses to a FINGERPRINT INDEX
    (md5 -> min doc_id) — one hash agg, persisted once per corpus in
    production and only the delta recomputed; the probe is a single
    equi-join on the 32-byte fingerprint, never on document bodies.
    New-vs-new duplicates are deliberately NOT flagged (that is
    dedup_exact's job on the batch); the contract is "is this already
    in the corpus", which keeps the verdict stable as batches land in
    any order.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("match_old_id"))
    )
    new = docs.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    return new.join(old, "fp", "left").select(
        "doc_id",
        "source",
        F.when(F.col("match_old_id").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("is_dup"),
        "match_old_id",
    )


# ---------------------------------------------------------------------------
# Deterministic hashed-feature quality classifier.
# ---------------------------------------------------------------------------

QCLS_BUCKETS = 4096
# Integer weight per bucket: (bucket % 1001) - 500, i.e. uniform-ish in
# [-500, 500]. A stand-in for trained fastText-style linear weights:
# the plumbing (hash features -> integer dot product -> threshold) is
# the real thing; only the weight VALUES are synthetic, so the whole
# score is exact integer arithmetic and the gate hash cannot wobble.
QCLS_WEIGHT_MOD = 1001
QCLS_WEIGHT_SHIFT = 500

_QCLS_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % " f"{QCLS_BUCKETS}"
)


@register(
    "quality_classifier_logit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             ({_QCLS_BUCKET_SQL}) % {QCLS_WEIGHT_MOD} - {QCLS_WEIGHT_SHIFT}
               AS w
      FROM (
        SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      )
    )
    SELECT doc_id, source,
           COUNT(*) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS logit_sum,
           CAST(SUM(w) AS DOUBLE) / COUNT(*) AS mean_weight,
           CAST(CASE WHEN CAST(SUM(w) AS DOUBLE) / COUNT(*) > 0
                THEN 1 ELSE 0 END AS INTEGER) AS pred
    FROM tok
    GROUP BY doc_id, source
    """,
)
def quality_classifier_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring pass (the CCNet/fastText
    "model-based quality filter" shape, e.g. Wenzek et al. 2020,
    arXiv:1911.00359): each token hashes to one of {QCLS_BUCKETS}
    feature buckets, each bucket carries a fixed integer weight, and a
    document's score is the mean weight over its token occurrences;
    documents with positive mean are 'kept'. Weights here are derived
    from the bucket id (deterministic stand-in for a trained
    coefficient vector — see QCLS_WEIGHT_MOD above); swapping in real
    weights is a broadcast-joined lookup with the identical plan.

    Scale shape: one token explode feeding ONE map-side-combinable
    per-doc agg (the weight is a pure column expression, so no weight
    table even ships); integer sums are exact and order-independent,
    and the only double is the final int/int division.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        md5_bucket(F.col("tok"), QCLS_BUCKETS) % QCLS_WEIGHT_MOD
        - QCLS_WEIGHT_SHIFT
    )
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", "source", w.alias("w"))
    mean_w = F.sum("w").cast("double") / F.count(F.lit(1))
    return tok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w").cast("bigint").alias("logit_sum"),
        mean_w.alias("mean_weight"),
        (mean_w > 0).cast("int").alias("pred"),
    )
