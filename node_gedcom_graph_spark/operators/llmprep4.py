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

import logging
import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.functions.scalar import md5_bucket, tokens
from node_gedcom_graph_spark.operators import persist_tracked, register
from node_gedcom_graph_spark.operators.dedup import (
    DECON_BENCH_SOURCE,
    DUP_COLLAPSE_MIN_EXTRA,
    PARA_WORDS,
    minhash_md5_bands,
    paragraph_spans,
    shingled_docs,
    text_dup_extra,
)
from node_gedcom_graph_spark.sources.tables import load_table

log = logging.getLogger(__name__)

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

    Duplicate-heavy corpora (the probe): every per-doc output column
    is a function of the TEXT given the global boilerplate set, and a
    span's distinct-doc count is the gsz-sum over the distinct texts
    containing it — so spans explode once per distinct text and
    members inherit their rep's verdict row.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    if text_dup_extra(docs, sf_dir) <= DUP_COLLAPSE_MIN_EXTRA:
        spans = paragraph_spans(docs)
        freq = spans.groupBy("para").agg(
            F.countDistinct("doc_id").alias("n_docs")
        )
        expand = None
    else:
        grp = persist_tracked(
            docs.groupBy("text").agg(
                F.min("doc_id").alias("rep"),
                F.collect_list("doc_id").alias("ids"),
                F.count(F.lit(1)).alias("gsz"),
            )
        )
        spans = paragraph_spans(grp.select(F.col("rep").alias("doc_id"), "text"))
        freq = (
            spans.select("doc_id", "para")
            .distinct()
            .join(
                grp.select(F.col("rep").alias("doc_id"), "gsz"), "doc_id"
            )
            .groupBy("para")
            .agg(F.sum("gsz").alias("n_docs"))
        )
        expand = grp.select(F.col("rep").alias("doc_id"), "ids")
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
    out = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((~F.col("kept")).cast("int")).cast("bigint").alias("n_boiler"),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("bigint").alias("clean_chars"),
    )
    if expand is None:
        return out
    return out.join(expand, "doc_id").select(
        F.explode("ids").alias("doc_id"),
        "n_spans",
        "n_boiler",
        "clean_md5",
        "clean_chars",
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
    the per-doc features — the token explode + md5 run exactly once
    into the (doc_id, bucket) count agg (map-side combinable, bounded
    by distinct buckets per doc), and BOTH feature models are derived
    from that table by second-stage aggregations that reduce to <=
    {DSIR_BUCKETS} rows each, so the weight table is broadcast into
    the per-doc join: no shuffle keyed on anything wider than
    (doc_id, bucket), no re-tokenization per model (the first draft
    re-ran the 150M-row explode three times; sf10: 53.6 s -> one
    pass). The ln() argument is built as one quotient with identical
    shape on both engines.

    Duplicate-heavy corpora (the probe, text_dup_extra): a document's
    (n_tokens, avg_logratio) is a function of its TEXT, and the model
    counts are gsz-weighted sums over distinct texts (raw: c*gsz;
    target: c*g_tgt with g_tgt = the group's target-member count) —
    so the tokenizer/hash explode runs once per distinct text and
    members inherit their rep's score (the bm25_doc_scores
    gsz-weighting, applied to DSIR's two models).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    collapsed = text_dup_extra(docs, sf_dir) > DUP_COLLAPSE_MIN_EXTRA
    if not collapsed:
        feats = docs.select(
            "doc_id",
            "source",
            F.explode(tokens(F.col("text"))).alias("tok"),
        ).select(
            "doc_id",
            "source",
            md5_bucket(F.col("tok"), DSIR_BUCKETS).alias("bucket"),
        )
        docbucket = persist_tracked(
            feats.groupBy("doc_id", "source", "bucket").agg(
                F.count(F.lit(1)).alias("c")
            )
        )
        raw_w, tgt_w = F.lit(1), (
            F.col("source") == DSIR_TARGET_SOURCE
        ).cast("bigint")
        key_cols = ["doc_id", "source"]
    else:
        # mems stays OUT of the bucket aggregation (it would ship each
        # group's member array once per distinct bucket, ~290x at
        # sf10) — members rejoin the per-rep scores at the end.
        grp = persist_tracked(
            docs.groupBy("text").agg(
                F.min("doc_id").alias("rep"),
                F.collect_list(F.struct("doc_id", "source")).alias("mems"),
                F.count(F.lit(1)).alias("gsz"),
                F.sum(
                    (F.col("source") == DSIR_TARGET_SOURCE).cast("int")
                ).alias("g_tgt"),
            )
        )
        feats = grp.select(
            "rep",
            "gsz",
            "g_tgt",
            F.explode(tokens(F.col("text"))).alias("tok"),
        ).select(
            "rep",
            "gsz",
            "g_tgt",
            md5_bucket(F.col("tok"), DSIR_BUCKETS).alias("bucket"),
        )
        docbucket = persist_tracked(
            feats.groupBy("rep", "gsz", "g_tgt", "bucket").agg(
                F.count(F.lit(1)).alias("c")
            )
        )
        raw_w, tgt_w = F.col("gsz"), F.col("g_tgt")
        key_cols = ["rep"]
    raw = docbucket.groupBy("bucket").agg(
        F.sum(F.col("c") * raw_w).alias("r_cnt")
    )
    tgt = docbucket.groupBy("bucket").agg(
        F.sum(F.col("c") * tgt_w).alias("t_cnt")
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
    scored = (
        docbucket.join(F.broadcast(wgt), "bucket")
        .groupBy(*key_cols)
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("w")) / F.sum("c")).alias(
                "avg_logratio"
            ),
        )
    )
    if not collapsed:
        return scored
    return (
        scored.join(grp.select("rep", "mems"), "rep")
        .select(F.explode("mems").alias("m"), "n_tokens", "avg_logratio")
        .select(
            F.col("m.doc_id").alias("doc_id"),
            F.col("m.source").alias("source"),
            "n_tokens",
            "avg_logratio",
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
    and the only double is the final int/int division. Duplicate-heavy
    corpora (the probe): the score is a pure function of the text, so
    hashing runs once per distinct text and members inherit the row.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    collapsed = text_dup_extra(docs, sf_dir) > DUP_COLLAPSE_MIN_EXTRA
    if collapsed:
        grp = persist_tracked(
            docs.groupBy("text").agg(
                F.min("doc_id").alias("rep"),
                F.collect_list(F.struct("doc_id", "source")).alias("mems"),
            )
        )
        base = grp.select(F.col("rep").alias("doc_id"), "text")
    else:
        base = docs
    w = (
        md5_bucket(F.col("tok"), QCLS_BUCKETS) % QCLS_WEIGHT_MOD
        - QCLS_WEIGHT_SHIFT
    )
    mean_w = F.sum("w").cast("double") / F.count(F.lit(1))
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w").cast("bigint").alias("logit_sum"),
        mean_w.alias("mean_weight"),
        (mean_w > 0).cast("int").alias("pred"),
    ]
    if not collapsed:
        tok = base.select(
            "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok")
        ).select("doc_id", "source", w.alias("w"))
        return tok.groupBy("doc_id", "source").agg(*aggs)
    tok = base.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", w.alias("w"))
    scored = tok.groupBy("doc_id").agg(*aggs)
    return (
        scored.join(
            grp.select(F.col("rep").alias("doc_id"), "mems"), "doc_id"
        )
        .select(
            F.explode("mems").alias("m"),
            "n_tokens",
            "logit_sum",
            "mean_weight",
            "pred",
        )
        .select(
            F.col("m.doc_id").alias("doc_id"),
            F.col("m.source").alias("source"),
            "n_tokens",
            "logit_sum",
            "mean_weight",
            "pred",
        )
    )


MINHASH_INC_J = 0.5  # trigram-Jaccard confirmation bar (shared: the
# incremental MinHash verifier and the split-leakage report)


# ---------------------------------------------------------------------------
# Matryoshka truncated-dimension retrieval recall.
# ---------------------------------------------------------------------------

MRL_DIMS = 8  # truncated prefix dimensionality (of the fixture's 64)


def _mrl_oracle(sampled: bool) -> str:
    """Matryoshka-recall oracle, parameterized only by the query-panel
    CTE (the retrieval_recall_at_k_sampled pattern) so the full and
    md5-sampled variants share every other line."""
    from node_gedcom_graph_spark.operators.similarity import (
        _QPANEL_FULL,
        _QPANEL_SAMPLED,
    )

    qpanel = _QPANEL_SAMPLED if sampled else _QPANEL_FULL
    return f"""
    WITH qpanel AS MATERIALIZED (
      {qpanel}
    ), n AS MATERIALIZED (
      SELECT vec_id, embedding,
             sqrt(CAST(list_dot_product(embedding, embedding) AS DOUBLE))
               AS nm,
             embedding[1:{MRL_DIMS}] AS t,
             sqrt(CAST(list_dot_product(embedding[1:{MRL_DIMS}],
                                         embedding[1:{MRL_DIMS}]) AS DOUBLE))
               AS tnm
      FROM embeddings
    ), q AS (
      SELECT n.* FROM n JOIN qpanel USING (vec_id)
    ), exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY CAST(list_dot_product(q.embedding, n.embedding)
                               AS DOUBLE) / (q.nm * n.nm) DESC,
                          n.vec_id) AS rnk
        FROM q JOIN n ON n.vec_id <> q.vec_id
      ) WHERE rnk <= 10
    ), trunc AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY CAST(list_dot_product(q.t, n.t) AS DOUBLE)
                          / (q.tnm * n.tnm) DESC,
                          n.vec_id) AS rnk
        FROM q JOIN n ON n.vec_id <> q.vec_id
      ) WHERE rnk <= 10
    )
    SELECT e.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS hits,
           CAST(COUNT(t.neighbor_id) AS DOUBLE) / 10.0 AS recall_at_k
    FROM exact e
    LEFT JOIN trunc t ON t.query_id = e.query_id
                     AND t.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@register("ann_matryoshka_trunc_recall", oracle=_mrl_oracle(False))
def ann_matryoshka_trunc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka retrieval evaluation (Kusupati et al. 2022,
    arXiv:2205.13147): how much top-10 recall survives when vectors
    are TRUNCATED to their first {MRL_DIMS} of 64 dimensions — the
    coarse-to-fine serving trick (search the cheap prefix, rescore
    full-dim) needs exactly this per-query recall table to pick the
    prefix length. Both searches are exact brute force over the same
    %4 query panel the module's other recall gates use; only the
    metric differs, so the number isolates the cost of truncation.

    Scale shape: two GEMM-kernel probes (topk_cosine — query panel
    broadcast, corpus scanned once per probe, candidate band
    re-scored with the bit-exact f32 fold) and an integer pair-join;
    the truncated probe's FLOPs are {MRL_DIMS}/64 of the full one,
    which is the production motivation.

    Precondition (deliberate): every {MRL_DIMS}-dim PREFIX must have a
    nonzero norm. A vector whose first {MRL_DIMS} dims are all zero is
    un-rankable under cosine; topk_cosine's require_nonzero_norms then
    raises with the offending vec_ids, where the SQL oracle would
    silently emit NaN similarities and an arbitrary ranking. Failing
    loudly over degenerate inputs is the chosen divergence — a real
    Matryoshka-trained embedding front-loads variance into the prefix,
    so an all-zero prefix means the data is wrong, not the query.
    """
    return _mrl_report(spark, sf_dir)


@register("ann_matryoshka_trunc_recall_sampled", oracle=_mrl_oracle(True))
def ann_matryoshka_trunc_recall_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ann_matryoshka_trunc_recall on the deterministic md5-rank query
    panel (RECALL_SAMPLE_PANEL queries — the retrieval_recall_at_k_
    sampled idiom, r7 verdict item 6): both exact and truncated probes
    scan the corpus once per probe against a panel that no longer
    grows with the %4 set, bounding the eval's GEMM cost at any corpus
    size (sf100: the full panel cost 182.5 s). The sample is part of
    the oracle (ORDER BY md5(vec_id), vec_id LIMIT n), so the gate
    hash-matches at every scale; the 128-query mean-recall standard
    error is <= 0.045, inside the pinned floor margins."""
    from node_gedcom_graph_spark.operators.similarity import (
        RECALL_SAMPLE_PANEL,
    )

    return _mrl_report(spark, sf_dir, sample=RECALL_SAMPLE_PANEL)


def _mrl_report(
    spark: SparkSession, sf_dir: str, sample: int | None = None
) -> DataFrame:
    from node_gedcom_graph_spark.operators.similarity import (
        RECALL_K,
        _cap_queries,
        _md5_panel,
        topk_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    qside = emb.filter(F.col("vec_id") % 4 == 0)
    panel = _md5_panel(qside, sample) if sample else _cap_queries(qside)
    trunc = F.slice(F.col("embedding"), 1, MRL_DIMS).alias("embedding")
    emb_t = emb.select("vec_id", trunc)
    panel_t = panel.select("vec_id", trunc)
    exact = topk_cosine(emb, panel, k=RECALL_K).select(
        "query_id", "neighbor_id"
    )
    tr = topk_cosine(emb_t, panel_t, k=RECALL_K).select(
        "query_id", F.col("neighbor_id").alias("t_neighbor")
    )
    return (
        exact.join(
            tr,
            (exact.query_id == tr.query_id)
            & (exact.neighbor_id == tr.t_neighbor),
            "left",
        )
        .drop(tr.query_id)
        .groupBy("query_id")
        .agg(
            F.count("t_neighbor").cast("bigint").alias("hits"),
            (
                F.count("t_neighbor").cast("double")
                / F.lit(float(RECALL_K))
            ).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-split near-duplicate leakage report.
# ---------------------------------------------------------------------------

_SPLIT_SQL = """
      SELECT doc_id,
             CASE WHEN substr(md5(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g'))), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g'))), 1, 2) < 'e6' THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
"""

_SPLIT_FRAME = [
    ("test", "test"),
    ("test", "train"),
    ("test", "valid"),
    ("train", "train"),
    ("train", "valid"),
    ("valid", "valid"),
]


@register(
    "split_leakage_near_dup",
    min_rows=6,
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(w) - 2),
               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS shingle
      FROM toks
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT i.doc_a, i.doc_b,
             CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
               AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.2
    ), splits AS MATERIALIZED (
      {_SPLIT_SQL}
    ), lab AS (
      SELECT LEAST(sa.split, sb.split) AS split_a,
             GREATEST(sa.split, sb.split) AS split_b,
             p.jaccard
      FROM pairs p
      JOIN splits sa ON sa.doc_id = p.doc_a
      JOIN splits sb ON sb.doc_id = p.doc_b
    ), frame AS (
      SELECT * FROM (VALUES
        ('test','test'), ('test','train'), ('test','valid'),
        ('train','train'), ('train','valid'), ('valid','valid')
      ) t(split_a, split_b)
    )
    SELECT f.split_a, f.split_b,
           CAST(COUNT(l.jaccard) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(CASE WHEN l.jaccard >= {MINHASH_INC_J}
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_confirmed
    FROM frame f
    LEFT JOIN lab l ON l.split_a = f.split_a AND l.split_b = f.split_b
    GROUP BY f.split_a, f.split_b
    """,
)
def split_leakage_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split NEAR-duplicate leakage report. The engine's
    train/valid/test split (split_train_valid_test) hashes the
    NORMALIZED text, so exact duplicates can never straddle splits —
    but near-duplicates can, and a near-copy of a test document in
    the training split is eval contamination the split rule cannot
    see. This report buckets every exact word-3-gram Jaccard >= 0.2
    pair (dedup_ngram_jaccard, collapse-probed internally) by the
    UNORDERED pair of splits its endpoints land in, with a
    J >= {MINHASH_INC_J} confirmed-near-dup count — the go/no-go
    table reviewed before an eval suite is trusted.

    All six split combinations are emitted (zeros included, via the
    literal frame — the vacuity-floor lesson), so "no leakage" is a
    visible row, not an absent one.

    Scale shape — NO member pair is ever materialized (the
    minhash_recall_report arithmetic pattern; the first draft rode
    dedup_ngram_jaccard's member-expanded pairs and died at the
    sf100 tier on ~2.7 B expansion rows): a split label is a
    function of the NORMALIZED text, so every member of an exact-dup
    group shares one label, and the report is rep-level gsz
    arithmetic — a cross rep pair (A, B, j) contributes
    gszA*gszB pairs to its (split_A, split_B) cell, a shingled dup
    group contributes C(gsz, 2) within-group pairs at j = 1.0 to its
    own (s, s) cell. Dup-light corpora run the member-level pair
    table directly (identical by the same arithmetic, gsz = 1).
    """
    from node_gedcom_graph_spark.functions.scalar import normalize_text
    from node_gedcom_graph_spark.operators.dedup import (
        _ngram_jaccard_rep_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    members, rep_pairs, sizes, passthrough = _ngram_jaccard_rep_pairs(
        docs, sf_dir
    )
    b = F.substring(F.md5(normalize_text(F.col("text"))), 1, 2)
    splits = docs.select(
        "doc_id",
        F.when(b < "cc", "train")
        .when(b < "e6", "valid")
        .otherwise("test")
        .alias("split"),
    )
    if passthrough:
        lab = (
            rep_pairs.join(
                splits.select(
                    F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
                ),
                "doc_a",
            )
            .join(
                splits.select(
                    F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
                ),
                "doc_b",
            )
            .select(
                F.least("sa", "sb").alias("split_a"),
                F.greatest("sa", "sb").alias("split_b"),
                "jaccard",
                F.lit(1).cast("bigint").alias("w"),
            )
        )
    else:
        rep_splits = splits.join(
            members.select(F.col("rep").alias("doc_id"), "gsz"), "doc_id"
        )
        cross = (
            rep_pairs.join(
                rep_splits.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("split").alias("sa"),
                    F.col("gsz").alias("ga"),
                ),
                "doc_a",
            )
            .join(
                rep_splits.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("split").alias("sb"),
                    F.col("gsz").alias("gb"),
                ),
                "doc_b",
            )
            .select(
                F.least("sa", "sb").alias("split_a"),
                F.greatest("sa", "sb").alias("split_b"),
                "jaccard",
                (F.col("ga") * F.col("gb")).cast("bigint").alias("w"),
            )
        )
        within = (
            rep_splits.filter(F.col("gsz") >= 2)
            .join(sizes.select("doc_id"), "doc_id", "left_semi")
            .select(
                F.col("split").alias("split_a"),
                F.col("split").alias("split_b"),
                F.lit(1.0).alias("jaccard"),
                (F.col("gsz") * (F.col("gsz") - 1) / 2)
                .cast("bigint")
                .alias("w"),
            )
        )
        lab = cross.unionByName(within)
    frame = spark.createDataFrame(
        _SPLIT_FRAME, "split_a string, split_b string"
    )
    # no broadcast hint: the 6-row frame is the PRESERVED side of the
    # left join, which Spark cannot use as the broadcast build side
    # (the hint only produced a HintErrorLogger warning); the 6-row
    # exchange is free.
    return (
        frame
        .join(lab, ["split_a", "split_b"], "left")
        .groupBy("split_a", "split_b")
        .agg(
            F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("jaccard") >= MINHASH_INC_J, F.col("w")
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_confirmed"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental MinHash near-dedup (new crawl vs existing corpus, LSH).
# ---------------------------------------------------------------------------

@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
      FROM toks WHERE len(t) >= 3
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             array_to_string(t[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ')
               AS s
      FROM pos
    ), seeds AS (
      SELECT unnest(range(0, 16)) AS j
    ), hashed AS (
      SELECT doc_id, j,
             CAST(('0x' || substr(md5(s || '#' || CAST(j AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM sh CROSS JOIN seeds
    ), sig AS (
      SELECT doc_id, j, MIN(h) AS m FROM hashed GROUP BY doc_id, j
    ), bandkeys AS MATERIALIZED (
      SELECT doc_id, CAST(j // 4 AS BIGINT) AS band,
             string_agg(CAST(m AS VARCHAR), '_' ORDER BY j) AS key
      FROM sig GROUP BY doc_id, j // 4
    ), cand AS MATERIALIZED (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bandkeys n JOIN bandkeys o
        ON n.band = o.band AND n.key = o.key
      WHERE n.doc_id % 10 >= 8 AND o.doc_id % 10 < 8
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.new_id, c.old_id, COUNT(*) AS ic
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_id
      JOIN sh b ON b.doc_id = c.old_id AND b.s = a.s
      GROUP BY c.new_id, c.old_id
    ), verdict AS (
      SELECT c.new_id, c.old_id,
             CAST(COALESCE(i.ic, 0) AS DOUBLE)
               / (sa.nsh + sb.nsh - COALESCE(i.ic, 0)) AS jacc
      FROM cand c
      JOIN sizes sa ON sa.doc_id = c.new_id
      JOIN sizes sb ON sb.doc_id = c.old_id
      LEFT JOIN inter i ON i.new_id = c.new_id AND i.old_id = c.old_id
    ), perdoc AS (
      SELECT new_id,
             COUNT(*) AS n_candidates,
             SUM(CASE WHEN jacc >= {MINHASH_INC_J} THEN 1 ELSE 0 END)
               AS n_confirmed,
             MIN(CASE WHEN jacc >= {MINHASH_INC_J} THEN old_id END)
               AS match_old_id
      FROM verdict GROUP BY new_id
    )
    SELECT d.doc_id, d.source,
           CAST(COALESCE(p.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(p.n_confirmed, 0) AS BIGINT) AS n_confirmed,
           p.match_old_id,
           CAST(CASE WHEN COALESCE(p.n_confirmed, 0) > 0 THEN 1 ELSE 0 END
                AS INTEGER) AS is_near_dup
    FROM documents d LEFT JOIN perdoc p ON p.new_id = d.doc_id
    WHERE d.doc_id % 10 >= 8
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup: the 20% "new crawl" slice is checked
    for near-duplicates against the 80% "existing corpus" slice with
    the engine-agnostic md5 MinHash bands (shared with
    dedup_minhash_lsh_md5 via minhash_md5_bands), then every banded
    candidate pair is CONFIRMED by exact distinct-trigram Jaccard >=
    {MINHASH_INC_J}. One row per new document: candidate/confirmed
    counts, the smallest confirmed existing doc_id, and the near-dup
    verdict — dedup_incremental_snapshot's contract lifted from exact
    fingerprints to similarity.

    Scale shape: the existing side's band keys are the persistent LSH
    INDEX (built once per corpus in production; only the new batch's
    bands are computed per refresh), the band join is equi-keyed so
    candidates scale with true collisions, and the verification join
    expands only candidate pairs' shingles — never old x new. The
    final left join restores zero rows for unmatched new docs, so the
    verdict table is complete (the vacuity-floor lesson: "no
    candidates" must be visible rows, not absent ones).

    Duplicate-heavy corpora (the probe): bands, Jaccard, and therefore
    every per-pair verdict are functions of the two TEXTS, so the band
    join and verification run once per distinct-text pair and the
    per-new-doc counts are gsz arithmetic (n_candidates = sum of
    colliding groups' old-member counts; match_old_id = min over
    confirmed groups' min old id). A group containing both new and old
    members collides with itself in every band (identical keys) and
    confirms at J = 1.0, so exact copies across the boundary are
    covered by the self-pair.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    is_old = F.col("doc_id") % 10 < 8
    if text_dup_extra(docs, sf_dir) <= DUP_COLLAPSE_MIN_EXTRA:
        old = docs.filter(is_old)
        new = docs.filter(~is_old)
        nb = minhash_md5_bands(new).select(
            F.col("doc_id").alias("new_id"), "band", "key"
        )
        ob = minhash_md5_bands(old).select(
            F.col("doc_id").alias("old_id"), "band", "key"
        )
        cand = persist_tracked(
            nb.join(ob, ["band", "key"]).select("new_id", "old_id").distinct()
        )
        new_sh = (
            shingled_docs(new)
            .select(
                F.col("doc_id").alias("new_id"),
                F.explode("shingles").alias("s"),
            )
            .distinct()
        )
        old_sh = (
            shingled_docs(old)
            .select(
                F.col("doc_id").alias("old_id"),
                F.explode("shingles").alias("s"),
            )
            .distinct()
        )
        sizes_new = new_sh.groupBy("new_id").agg(
            F.count(F.lit(1)).alias("na")
        )
        sizes_old = old_sh.groupBy("old_id").agg(
            F.count(F.lit(1)).alias("nb")
        )
        inter = (
            cand.join(new_sh, "new_id")
            .join(old_sh, ["old_id", "s"])
            .groupBy("new_id", "old_id")
            .agg(F.count(F.lit(1)).alias("ic"))
        )
        jacc = F.coalesce(F.col("ic"), F.lit(0)).cast("double") / (
            F.col("na") + F.col("nb") - F.coalesce(F.col("ic"), F.lit(0))
        )
        verdict = (
            cand.join(sizes_new, "new_id")
            .join(sizes_old, "old_id")
            .join(inter, ["new_id", "old_id"], "left")
            .select("new_id", "old_id", jacc.alias("jacc"))
        )
        confirmed = F.col("jacc") >= MINHASH_INC_J
        perdoc = verdict.groupBy("new_id").agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(confirmed.cast("int")).alias("n_confirmed"),
            F.min(F.when(confirmed, F.col("old_id"))).alias("match_old_id"),
        )
        return (
            new.select("doc_id", "source")
            .join(perdoc, new.doc_id == perdoc.new_id, "left")
            .select(
                "doc_id",
                "source",
                F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                    "n_candidates"
                ),
                F.coalesce("n_confirmed", F.lit(0)).cast("bigint").alias(
                    "n_confirmed"
                ),
                "match_old_id",
                (F.coalesce("n_confirmed", F.lit(0)) > 0).cast("int").alias(
                    "is_near_dup"
                ),
            )
        )
    # --- collapsed path: one band/Jaccard evaluation per text pair ---
    grp = persist_tracked(
        docs.groupBy("text").agg(
            F.min("doc_id").alias("rep"),
            F.collect_list(
                F.when(~is_old, F.struct("doc_id", "source"))
            ).alias("new_mems"),
            F.sum(is_old.cast("int")).alias("n_old"),
            F.min(F.when(is_old, F.col("doc_id"))).alias("min_old"),
        )
    )
    reps_new = grp.filter(F.size("new_mems") > 0).select(
        F.col("rep").alias("doc_id"), "text"
    )
    reps_old = grp.filter(F.col("n_old") > 0).select(
        F.col("rep").alias("doc_id"), "text"
    )
    nb = minhash_md5_bands(reps_new).select(
        F.col("doc_id").alias("rep_a"), "band", "key"
    )
    ob = minhash_md5_bands(reps_old).select(
        F.col("doc_id").alias("rep_b"), "band", "key"
    )
    cand = persist_tracked(
        nb.join(ob, ["band", "key"]).select("rep_a", "rep_b").distinct()
    )
    rep_sh = (
        shingled_docs(grp.select(F.col("rep").alias("doc_id"), "text"))
        .select("doc_id", F.explode("shingles").alias("s"))
        .distinct()
    )
    sizes = rep_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    inter = (
        cand.join(
            rep_sh.select(F.col("doc_id").alias("rep_a"), "s"), "rep_a"
        )
        .join(
            rep_sh.select(F.col("doc_id").alias("rep_b"), "s"),
            ["rep_b", "s"],
        )
        .groupBy("rep_a", "rep_b")
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    jacc = F.coalesce(F.col("ic"), F.lit(0)).cast("double") / (
        F.col("na") + F.col("nb") - F.coalesce(F.col("ic"), F.lit(0))
    )
    verdict = (
        cand.join(
            sizes.select(F.col("doc_id").alias("rep_a"), F.col("nsh").alias("na")),
            "rep_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("rep_b"), F.col("nsh").alias("nb")),
            "rep_b",
        )
        .join(inter, ["rep_a", "rep_b"], "left")
        .select("rep_a", "rep_b", jacc.alias("jacc"))
    )
    confirmed = F.col("jacc") >= MINHASH_INC_J
    # gsz arithmetic: each colliding OLD group contributes its member
    # count to every new doc in the A group; min ids fold the same way.
    per_a = (
        verdict.join(
            grp.select(F.col("rep").alias("rep_b"), "n_old", "min_old"),
            "rep_b",
        )
        .groupBy("rep_a")
        .agg(
            F.sum("n_old").alias("n_candidates"),
            F.sum(F.when(confirmed, F.col("n_old")).otherwise(0)).alias(
                "n_confirmed"
            ),
            F.min(F.when(confirmed, F.col("min_old"))).alias(
                "match_old_id"
            ),
        )
    )
    return (
        grp.filter(F.size("new_mems") > 0)
        .select(F.col("rep").alias("rep_a"), "new_mems")
        .join(per_a, "rep_a", "left")
        .select(F.explode("new_mems").alias("m"), "n_candidates",
                "n_confirmed", "match_old_id")
        .select(
            F.col("m.doc_id").alias("doc_id"),
            F.col("m.source").alias("source"),
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce("n_confirmed", F.lit(0)).cast("bigint").alias(
                "n_confirmed"
            ),
            "match_old_id",
            (F.coalesce("n_confirmed", F.lit(0)) > 0).cast("int").alias(
                "is_near_dup"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered n-gram decontamination (the broadcast scale path).
# ---------------------------------------------------------------------------

BLOOM_FPP = 0.01
# Above this many benchmark shingles the driver-side bloom build is
# skipped (graceful degrade to the plain exact join — identical
# results, just without the shuffle reduction). An eval suite is
# fixed-size in production, so the cap exists for synthetic sweeps;
# it binding changes PERFORMANCE, never correctness, unlike
# DECON_BENCH_CAP whose binding would drop reference data.
BLOOM_MAX_ITEMS = 8_000_000
_BLOOM_MIX = 0x9E3779B97F4A7C15  # splitmix64 odd constant for h2


def _build_bloom(hashes, fpp: float):
    """(bitset uint64[], m_bits, k) classic double-hashing bloom over
    64-bit fingerprints: probe i lands at (h1 + i*h2) mod m."""
    import numpy as np

    n = max(len(hashes), 1)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m_bits = ((m_bits + 63) // 64) * 64
    k = max(1, int(round(m_bits / n * math.log(2))))
    h1 = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return bits, m_bits, k


@register(
    "decontaminate_ngram_bloom",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(len(w) - 2),
               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS shingle
      FROM toks
    )
    SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
    FROM sh t
    JOIN (SELECT DISTINCT shingle FROM sh
          WHERE source = '{DECON_BENCH_SOURCE}') b
      ON t.shingle = b.shingle
    WHERE t.source <> '{DECON_BENCH_SOURCE}'
    GROUP BY t.doc_id
    """,
)
def decontaminate_ngram_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_ngram_overlap's BROADCAST SCALE PATH made real:
    the benchmark shingle set is compiled into a driver-built bloom
    filter (double-hashed over the shingles' xxhash64 fingerprints,
    fpp={BLOOM_FPP}) broadcast to every executor, and the training
    shingle stream is prefiltered by an Arrow-vectorized membership
    probe BEFORE the exact equi-join — so the shuffle carries only
    true hits plus an fpp-sized sliver of false positives instead of
    the whole corpus's shingles. Bloom filters have no false
    negatives and the exact join removes the false positives, so the
    result — and therefore the oracle — is IDENTICAL to the exact
    operator's; what changes is the exchanged volume (~150M training
    shingle rows at sf10 drop to ~5M). This is the idiom the batch
    operator's docstring promises ("at real scale broadcast as a
    bloom/hash set"); above {BLOOM_MAX_ITEMS} benchmark shingles the
    build degrades gracefully to the plain exact join (identical
    results — the cap changes performance, never output).

    Duplicate-heavy corpora: the same probe-gated text-collapse as
    the exact twin (hit counts are a function of the text; a dup
    group may span sources, so bench shingles come from groups with
    any benchmark member and counts expand only to non-benchmark
    members) — the bloom prefilter then probes each DISTINCT text's
    shingles once (sf100: 1000-way dup groups pushed the raw-stream
    probe to 113 s; collapsed, the probe side is 1000x smaller).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    collapsed = text_dup_extra(docs, sf_dir) > DUP_COLLAPSE_MIN_EXTRA
    if collapsed:
        grp = persist_tracked(
            docs.groupBy("text").agg(
                F.min("doc_id").alias("rep"),
                F.collect_list(F.struct("doc_id", "source")).alias("mems"),
                F.max(
                    (F.col("source") == DECON_BENCH_SOURCE).cast("int")
                ).alias("has_bench"),
            )
        )
        bench_docs = grp.filter(F.col("has_bench") == 1).select(
            F.col("rep").alias("doc_id"), "text"
        )
        train_docs = grp.select(F.col("rep").alias("doc_id"), "text")
    else:
        bench_docs = docs.filter(F.col("source") == DECON_BENCH_SOURCE)
        train_docs = docs.filter(F.col("source") != DECON_BENCH_SOURCE)
    bench = persist_tracked(
        shingled_docs(bench_docs)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    train = shingled_docs(train_docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )

    # Cap BEFORE collecting: the driver pull itself is the OOM hazard
    # for a pathological benchmark set, so probe the cardinality with a
    # bounded limit+count (cheap: bench is persisted) and only then
    # bring the fingerprints over. ``limit(cap+1)`` never materializes
    # more than cap+1 rows regardless of the true count.
    n_bench = bench.limit(BLOOM_MAX_ITEMS + 1).count()
    if 0 < n_bench <= BLOOM_MAX_ITEMS:
        fps = bench.select(F.xxhash64("shingle").alias("h")).toPandas()["h"]
        bits, m_bits, k = _build_bloom(fps.to_numpy(), BLOOM_FPP)
        b_bits = spark.sparkContext.broadcast(bits.tobytes())

        @F.pandas_udf("boolean")
        def might_contain(h: pd.Series) -> pd.Series:
            import numpy as np

            bit = np.frombuffer(b_bits.value, dtype=np.uint64)
            h1 = h.to_numpy(dtype=np.int64).view(np.uint64)
            h2 = (h1 * np.uint64(_BLOOM_MIX)) | np.uint64(1)
            ok = np.ones(len(h1), dtype=bool)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                ok &= (
                    bit[(pos >> np.uint64(6)).astype(np.int64)]
                    >> (pos & np.uint64(63))
                ) & np.uint64(1) != 0
            return pd.Series(ok)

        train = train.filter(might_contain(F.xxhash64("shingle")))
    else:
        log.warning(
            "decontaminate_ngram_bloom: %s benchmark shingles exceed "
            "BLOOM_MAX_ITEMS=%d (or none exist) — running the plain "
            "exact join (identical results, no shuffle reduction)",
            f">{BLOOM_MAX_ITEMS}" if n_bench > BLOOM_MAX_ITEMS else n_bench,
            BLOOM_MAX_ITEMS,
        )
    hits = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
    )
    if not collapsed:
        return hits
    return (
        grp.join(hits.withColumnRenamed("doc_id", "rep"), "rep")
        .select(F.explode("mems").alias("m"), "n_hits")
        .filter(F.col("m.source") != DECON_BENCH_SOURCE)
        .select(F.col("m.doc_id").alias("doc_id"), "n_hits")
    )


# ---------------------------------------------------------------------------
# Curation funnel report (the pipeline's per-stage attrition dashboard).
# ---------------------------------------------------------------------------

FUNNEL_MIN_TOKENS = 10
FUNNEL_MAX_PUNCT = 0.1


@register(
    "curation_funnel_report",
    oracle=f"""
    WITH cand AS MATERIALIZED (
      SELECT doc_id, source, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             CAST(LENGTH(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
                  AS DOUBLE) / LENGTH(text) AS punct_ratio
      FROM documents
      WHERE source <> '{DECON_BENCH_SOURCE}' AND LENGTH(text) > 0
    ), scored AS MATERIALIZED (
      SELECT c.doc_id, c.source, c.text,
             len(c.toks) AS n_tokens,
             c.punct_ratio,
             (SELECT SUM(CAST(('0x' || substr(md5(t.tok), 1, 4)) AS INTEGER)
                         % {QCLS_BUCKETS} % {QCLS_WEIGHT_MOD}
                         - {QCLS_WEIGHT_SHIFT})
              FROM unnest(c.toks) AS t(tok)) AS logit_sum
      FROM cand c
    ), st AS MATERIALIZED (
      SELECT s.*,
             (s.n_tokens >= {FUNNEL_MIN_TOKENS}
              AND s.punct_ratio <= {FUNNEL_MAX_PUNCT}) AS pass_quality,
             CAST(s.logit_sum AS DOUBLE) / s.n_tokens > 0 AS pass_classifier
      FROM scored s
    ), bench AS MATERIALIZED (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2),
               i -> regexp_extract_all(lower(text), '[a-z0-9]+')[i+1] || ' '
                 || regexp_extract_all(lower(text), '[a-z0-9]+')[i+2] || ' '
                 || regexp_extract_all(lower(text), '[a-z0-9]+')[i+3])))
               AS shingle
      FROM documents WHERE source = '{DECON_BENCH_SOURCE}'
    ), contaminated AS MATERIALIZED (
      SELECT DISTINCT doc_id FROM (
        SELECT c.doc_id,
               unnest(list_distinct(list_transform(range(len(c.toks) - 2),
                 i -> c.toks[i+1] || ' ' || c.toks[i+2] || ' '
                   || c.toks[i+3]))) AS shingle
        FROM cand c
      ) t JOIN bench b ON b.shingle = t.shingle
    ), staged AS MATERIALIZED (
      SELECT st.*,
             st.pass_quality AND st.pass_classifier
               AND ct.doc_id IS NULL AS pass_decontam
      FROM st LEFT JOIN contaminated ct ON ct.doc_id = st.doc_id
    ), firsts AS (
      SELECT md5(text) AS fp, MIN(doc_id) AS keep_id
      FROM staged WHERE pass_decontam
      GROUP BY md5(text)
    ), final AS (
      SELECT g.*,
             g.pass_decontam AND f.keep_id IS NOT NULL AS kept
      FROM staged g
      LEFT JOIN firsts f ON f.keep_id = g.doc_id
    )
    SELECT source,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass_quality,
           CAST(SUM(CASE WHEN pass_quality AND pass_classifier
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_classifier,
           CAST(SUM(CASE WHEN pass_decontam THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass_decontam,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM final
    GROUP BY source
    """,
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's per-source FUNNEL: every training
    candidate (source != '{DECON_BENCH_SOURCE}') walks the sequential
    gauntlet quality gates ({FUNNEL_MIN_TOKENS}+ tokens, punct ratio
    <= {FUNNEL_MAX_PUNCT}) -> linear quality classifier (positive
    mean hashed-feature weight, quality_classifier_logit's exact
    integer arithmetic) -> n-gram decontamination (no word-3-gram
    shared with the held-out source) -> exact dedup (first occurrence
    per md5 among survivors), and the report counts each stage's
    survivors plus the final kept token budget per source — the
    attrition dashboard reviewed before every pretraining run, here
    as ONE oracle-gated query composing the session's operators.

    Scale shape: one scan computes tokens/punct/logit together (the
    classifier weight is a pure column expression inside the same
    explode), contamination is the shingle-keyed semi-join with the
    distinct-reduced bench side (the bloom prefilter slots in front
    unchanged — decontaminate_ngram_bloom), dedup is the 16-byte
    fingerprint agg over survivors only, and the output is one row
    per source.

    Duplicate-heavy corpora (the probe): every stage verdict is a
    function of the TEXT, so the token pass, shingle probe, and flag
    assembly run once per distinct text; the dedup stage's keeper is
    exactly the group's minimum candidate id (first occurrence per
    fingerprint == per text), so member rows explode with their
    group's flags plus one `doc_id == rep` comparison — counts are
    ordinary per-source sums. Both bench sides also dedupe texts
    before shingling (distinct shingle sets are text functions). At
    the 1000x tier this takes the token pass from 1.5 B to 1.5 M
    hashes.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    cand_all = docs.filter(
        (F.col("source") != DECON_BENCH_SOURCE) & (F.length("text") > 0)
    )
    collapsed = text_dup_extra(docs, sf_dir) > DUP_COLLAPSE_MIN_EXTRA
    if collapsed:
        grp = persist_tracked(
            cand_all.groupBy("text").agg(
                F.min("doc_id").alias("doc_id"),
                F.collect_list(F.struct("doc_id", "source")).alias("mems"),
            )
        )
        # rep-level candidates; member sources re-attach at the end
        cand = grp.select("doc_id", F.lit(None).cast("string").alias("source"), "text")
    else:
        cand = cand_all.select("doc_id", "source", "text")
    w = (
        md5_bucket(F.col("tok"), QCLS_BUCKETS) % QCLS_WEIGHT_MOD
        - QCLS_WEIGHT_SHIFT
    )
    tokstats = (
        cand.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").cast("bigint").alias("logit_sum"),
        )
    )
    punct = (
        F.length(F.regexp_replace(F.lower("text"), r"[a-z0-9\s]", "")).cast(
            "double"
        )
        / F.length("text")
    )
    # LEFT join + coalesce: a non-empty document with zero alphanumeric
    # tokens (punctuation-only) produces no explode rows, so an inner
    # join would drop it from the funnel entirely while the oracle's
    # len(toks)=0 and the streaming twin's F.size(toks)=0 keep it as a
    # candidate that fails pass_quality. n_tokens coalesces to 0;
    # logit_sum stays NULL (the oracle's SUM over an empty unnest),
    # making pass_classifier NULL/0 -> NULL on both sides.
    st = cand.select("doc_id", "source", "text", punct.alias("punct_ratio")).join(
        tokstats, "doc_id", "left"
    )
    st = st.withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0).cast("bigint")))
    st = st.select(
        "doc_id",
        "source",
        "text",
        "n_tokens",
        (
            (F.col("n_tokens") >= FUNNEL_MIN_TOKENS)
            & (F.col("punct_ratio") <= FUNNEL_MAX_PUNCT)
        ).alias("pass_quality"),
        (F.col("logit_sum").cast("double") / F.col("n_tokens") > 0).alias(
            "pass_classifier"
        ),
    )
    bench = (
        shingled_docs(
            docs.filter(F.col("source") == DECON_BENCH_SOURCE)
            .select("doc_id", "text")
            .dropDuplicates(["text"])
        )
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    contaminated = (
        shingled_docs(cand)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .join(bench, "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    staged = persist_tracked(
        st.join(contaminated, "doc_id", "left").select(
            "doc_id",
            "source",
            "text",
            "n_tokens",
            "pass_quality",
            "pass_classifier",
            (
                F.col("pass_quality")
                & F.col("pass_classifier")
                & F.col("is_cont").isNull()
            ).alias("pass_decontam"),
        )
    )
    if collapsed:
        final = (
            staged.withColumnRenamed("doc_id", "rep")
            .join(grp.select(F.col("doc_id").alias("rep"), "mems"), "rep")
            .select(
                F.explode("mems").alias("m"),
                "rep",
                "n_tokens",
                "pass_quality",
                "pass_classifier",
                "pass_decontam",
            )
            .select(
                F.col("m.source").alias("source"),
                "n_tokens",
                "pass_quality",
                "pass_classifier",
                "pass_decontam",
                (
                    F.col("pass_decontam")
                    & (F.col("m.doc_id") == F.col("rep"))
                ).alias("kept"),
            )
        )
        return final.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.col("pass_quality").cast("int")).cast("bigint").alias(
                "n_pass_quality"
            ),
            F.sum(
                (F.col("pass_quality") & F.col("pass_classifier")).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_pass_classifier"),
            F.sum(F.col("pass_decontam").cast("int")).cast("bigint").alias(
                "n_pass_decontam"
            ),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    firsts = (
        staged.filter("pass_decontam")
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
        .withColumn("is_first", F.lit(1))
    )
    final = staged.join(
        firsts, staged.doc_id == firsts.keep_id, "left"
    ).select(
        "source",
        "n_tokens",
        "pass_quality",
        "pass_classifier",
        "pass_decontam",
        (F.col("pass_decontam") & F.col("is_first").isNotNull()).alias("kept"),
    )
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.col("pass_quality").cast("int")).cast("bigint").alias(
            "n_pass_quality"
        ),
        F.sum(
            (F.col("pass_quality") & F.col("pass_classifier")).cast("int")
        )
        .cast("bigint")
        .alias("n_pass_classifier"),
        F.sum(F.col("pass_decontam").cast("int")).cast("bigint").alias(
            "n_pass_decontam"
        ),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# Near-dup threshold calibration (pairs + affected docs per cutoff).
# ---------------------------------------------------------------------------

CALIB_THRESHOLDS = (0.2, 0.4, 0.6, 0.8)


@register(
    "dedup_threshold_calibration",
    min_rows=len(CALIB_THRESHOLDS),
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(w) - 2),
               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS shingle
      FROM toks
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT i.doc_a, i.doc_b,
             CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
               AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
            >= {min(CALIB_THRESHOLDS)}
    ), thresholds AS (
      SELECT * FROM (VALUES {', '.join(f'({t})' for t in CALIB_THRESHOLDS)})
        tt(threshold)
    ), per AS (
      SELECT t.threshold, COUNT(p.jaccard) AS n_pairs
      FROM thresholds t LEFT JOIN pairs p ON p.jaccard >= t.threshold
      GROUP BY t.threshold
    ), affected AS (
      SELECT t.threshold, COUNT(DISTINCT d.doc_id) AS n_docs_affected
      FROM thresholds t
      LEFT JOIN (
        SELECT doc_a AS doc_id, jaccard FROM pairs
        UNION ALL
        SELECT doc_b AS doc_id, jaccard FROM pairs
      ) d ON d.jaccard >= t.threshold
      GROUP BY t.threshold
    )
    SELECT p.threshold,
           CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CAST(a.n_docs_affected AS BIGINT) AS n_docs_affected
    FROM per p JOIN affected a ON a.threshold = p.threshold
    """,
)
def dedup_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup THRESHOLD CALIBRATION: for each candidate Jaccard
    cutoff ({', '.join(str(t) for t in CALIB_THRESHOLDS)}) the table
    reports how many exact word-3-gram pairs qualify and how many
    distinct documents those pairs touch — the pairs-vs-affected-docs
    curve every dedup deployment inspects before committing to a
    cutoff (too low deletes content, too high leaves duplicates).
    Every threshold row is always emitted (min_rows pins it), so an
    empty tier is a visible zero.

    Scale shape: rides _ngram_jaccard_rep_pairs' collapse-probed
    shingle pipeline; with dup pressure, pair counts are gsz
    arithmetic over REP pairs (cross: gszA*gszB; within a shingled
    dup group: C(gsz,2), Jaccard 1.0) and affected-doc counts are
    gsz sums over the affected group set — no member pair or member
    list is ever materialized (the split_leakage_near_dup lesson,
    applied at design time instead of after an sf100 failure).
    """
    from node_gedcom_graph_spark.operators.dedup import (
        _ngram_jaccard_rep_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    members, rep_pairs, sizes, passthrough = _ngram_jaccard_rep_pairs(
        docs, sf_dir
    )
    thresholds = spark.createDataFrame(
        [(t,) for t in CALIB_THRESHOLDS], "threshold double"
    )
    if passthrough:
        pairs = rep_pairs.select(
            "doc_a", "doc_b", "jaccard", F.lit(1).cast("bigint").alias("w"),
            F.lit(1).cast("bigint").alias("ga"),
            F.lit(1).cast("bigint").alias("gb"),
        )
    else:
        g = members.select(F.col("rep").alias("doc_id"), "gsz")
        cross = (
            rep_pairs.join(
                g.select(
                    F.col("doc_id").alias("doc_a"), F.col("gsz").alias("ga")
                ),
                "doc_a",
            )
            .join(
                g.select(
                    F.col("doc_id").alias("doc_b"), F.col("gsz").alias("gb")
                ),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                "jaccard",
                (F.col("ga") * F.col("gb")).cast("bigint").alias("w"),
                F.col("ga").cast("bigint").alias("ga"),
                F.col("gb").cast("bigint").alias("gb"),
            )
        )
        within = (
            members.filter(F.col("gsz") >= 2)
            .join(
                sizes.select(F.col("doc_id")),
                members.rep == F.col("doc_id"),
                "left_semi",
            )
            .select(
                F.col("rep").alias("doc_a"),
                F.col("rep").alias("doc_b"),
                F.lit(1.0).alias("jaccard"),
                (F.col("gsz") * (F.col("gsz") - 1) / 2)
                .cast("bigint")
                .alias("w"),
                F.col("gsz").cast("bigint").alias("ga"),
                F.lit(0).cast("bigint").alias("gb"),
            )
        )
        pairs = cross.unionByName(within)
    pairs = persist_tracked(pairs)
    per = (
        thresholds.join(
            pairs, pairs.jaccard >= thresholds.threshold, "left"
        )
        .groupBy("threshold")
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("n_pairs"))
    )
    # affected docs: sum of group sizes over DISTINCT affected groups
    # (a group is affected when it appears on either side of a
    # qualifying pair; within-pairs carry the whole group in ga).
    sides = pairs.select(
        F.col("doc_a").alias("g"), "jaccard", F.col("ga").alias("gsz")
    ).unionByName(
        pairs.filter(F.col("gb") > 0).select(
            F.col("doc_b").alias("g"), "jaccard", F.col("gb").alias("gsz")
        )
    )
    affected = (
        thresholds.join(sides, sides.jaccard >= thresholds.threshold, "left")
        .groupBy("threshold", "g", "gsz")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("threshold")
        .agg(
            F.coalesce(F.sum(F.when(F.col("g").isNotNull(), F.col("gsz"))), F.lit(0))
            .cast("bigint")
            .alias("n_docs_affected")
        )
    )
    return per.join(affected, "threshold").select(
        "threshold", "n_pairs", "n_docs_affected"
    )
