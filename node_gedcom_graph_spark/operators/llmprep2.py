"""Second LLM-data-pipeline batch: corpus hygiene and embedding-space
diagnostics a training-data pipeline runs alongside dedup/split —
charset profiling (mojibake/binary-junk detection), deterministic
output sharding, cosine radius search (the dedup-threshold twin of
top-k ANN), and per-dimension embedding statistics (the diagnostic that
catches dead/exploding dimensions before PCA/quantization).

All four are pure DataFrame compositions — no UDFs — and every one is
DuckDB-oracle-gated. Determinism: ratios are computed per-row with
integral regex counts (identical on Java regex and RE2 for the pure
ASCII classes used), aggregated as exact-decimal sums where they feed
the hash; the shard assignment is md5-based (the split_train_valid_test
idiom — engine-agnostic, RNG-free, stable under repartitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.operators.dedup import dot_f32
from node_gedcom_graph_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Charset / printability profile per source.
# ---------------------------------------------------------------------------


@register(
    "text_charset_stats",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             length(text) AS n,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[^ ]', '', 'g')) AS n_space,
             length(regexp_replace(text, '[ -~]', '', 'g')) AS n_nonascii
      FROM documents
      WHERE length(text) > 0
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(n_digit AS BIGINT)) AS BIGINT) AS digit_chars,
           CAST(SUM(CAST(n_space AS BIGINT)) AS BIGINT) AS space_chars,
           CAST(SUM(CAST(n_nonascii AS BIGINT)) AS BIGINT) AS nonascii_chars,
           CAST(CAST(SUM(CAST(n_nonascii AS BIGINT)) AS DOUBLE)
                / CAST(SUM(CAST(n AS BIGINT)) AS DOUBLE) AS DOUBLE)
             AS nonascii_ratio
    FROM per_doc
    GROUP BY source
    """,
)
def text_charset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset profile per source: digit / space / non-printable-ASCII
    character totals and the non-ASCII ratio — the cheap first-pass
    filter that catches mojibake, binary junk, and wrong-language
    contamination before any tokenizer runs.

    Scale: per-doc counts are regexp_replace+length column expressions
    (whole-stage codegen, one pass over the text); the aggregate is
    integral (BIGINT sums — exact on both engines), shuffling one row
    per source per partition after map-side combine. The character
    classes are pure ASCII ranges, semantically identical under Java
    regex (Spark) and RE2 (DuckDB).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.length("text").cast("bigint")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("bigint")
    n_space = F.length(F.regexp_replace("text", "[^ ]", "")).cast("bigint")
    n_nonascii = F.length(F.regexp_replace("text", "[ -~]", "")).cast("bigint")
    return (
        docs.select(
            "source",
            n.alias("n"),
            n_digit.alias("n_digit"),
            n_space.alias("n_space"),
            n_nonascii.alias("n_nonascii"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_chars"),
            F.sum("n_digit").alias("digit_chars"),
            F.sum("n_space").alias("space_chars"),
            F.sum("n_nonascii").alias("nonascii_chars"),
            (F.sum("n_nonascii").cast("double") / F.sum("n").cast("double"))
            .cast("double")
            .alias("nonascii_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic output sharding.
# ---------------------------------------------------------------------------


@register(
    "dataset_shard_assign",
    oracle="""
    WITH sharded AS (
      SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 16 AS INTEGER) AS shard,
             source, n_chars
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM sharded
    GROUP BY shard
    """,
)
def dataset_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way output-shard assignment by md5(doc_id) with
    per-shard size accounting — the write-side partitioner for training
    shards. md5 (not Spark's xxhash/DuckDB's hash) keeps the assignment
    engine-agnostic and re-run-stable, so shard membership is part of
    the data contract, not an engine artifact; the balance check (shard
    totals within a few % of each other) is the skew audit a petabyte
    writer runs before committing output layout.

    Scale: shard assignment is a scan-local expression; one shuffle of
    16 keys after map-side combine. The same expression feeds
    DataFrameWriter.partitionBy for the real fan-out write (op 18's
    partitioned-sink pattern, publish/neo4j_csv.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    from node_gedcom_graph_spark.functions.scalar import md5_bucket

    shard = md5_bucket(F.col("doc_id"), 16)
    return (
        docs.select(shard.alias("shard"), "source", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# ---------------------------------------------------------------------------
# Cosine radius (range) search.
# ---------------------------------------------------------------------------


@register(
    "ann_range_search_cosine",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(CAST(list_dot_product(embedding, embedding) AS DOUBLE)) AS nm
      FROM embeddings
    ), q AS (
      SELECT * FROM n WHERE vec_id < 8
    )
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           CAST(list_dot_product(q.embedding, n.embedding) AS DOUBLE)
             / (q.nm * n.nm) AS cosine
    FROM q JOIN n ON n.vec_id <> q.vec_id
    WHERE CAST(list_dot_product(q.embedding, n.embedding) AS DOUBLE)
            / (q.nm * n.nm) >= 0.25
    """,
)
def ann_range_search_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search: ALL neighbors within cosine >= 0.25 of each query
    vector (vec_id < 8) — the threshold twin of top-k ANN and the exact
    primitive under embedding near-dedup (every candidate above the
    dup threshold, not just the k best).

    Scale: the bounded query set broadcasts; the corpus streams through
    one scan with no shuffle at all — the filter replaces top-k's
    per-query window, so output size is the only cost driver. The f32
    fold (dot_f32) matches DuckDB's FLOAT[] list_dot_product
    bit-for-bit, making the >= threshold well-defined on both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    nm = F.sqrt(dot_f32(F.col("embedding"), F.col("embedding")).cast("double"))
    q_nm = F.sqrt(dot_f32(F.col("q_emb"), F.col("q_emb")).cast("double"))
    cosine = dot_f32(F.col("q_emb"), F.col("embedding")).cast("double") / (q_nm * nm)
    return (
        emb.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics.
# ---------------------------------------------------------------------------


@register(
    "embedding_dim_variance_topk",
    oracle="""
    WITH e AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), stats AS (
      SELECT dim, COUNT(*) AS n,
             AVG(v) AS mean_v,
             VAR_SAMP(v) AS var_v
      FROM e GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim, n, mean_v, var_v
    FROM stats
    ORDER BY var_v DESC, dim
    LIMIT 8
    """,
)
def embedding_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8 highest-variance embedding dimensions with their means —
    the per-dimension moment pass that drives dead-dimension pruning,
    PCA preconditioning, and the int8 quantizer's scale choice
    (embedding_quantize_int8 uses exactly these moments).

    Scale: posexplode fans each vector into (dim, value) rows — dim
    cardinality is the vector width (64), so the aggregate's shuffle
    carries 64 rows per partition after map-side combine no matter the
    corpus size; the top-8 is a TakeOrderedAndProject over 64 rows.
    Mean/variance accumulate in double on both engines; values are
    O(0.1) with ~1e-12 accumulated error, far below the oracle hash's
    6-dp rounding, and the dim tiebreak pins the cut.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        F.col("dim").cast("int").alias("dim"), F.col("v").cast("double").alias("v")
    )
    return (
        e.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("mean_v"),
            F.var_samp("v").alias("var_v"),
        )
        .orderBy(F.desc("var_v"), F.asc("dim"))
        .limit(8)
    )


# ---------------------------------------------------------------------------
# Cross-modal join: text stats per embedding-space label.
# ---------------------------------------------------------------------------


@register(
    "doc_text_stats_by_label",
    oracle="""
    SELECT e.label,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(length(d.text)
                         - length(replace(d.text, ' ', '')) + 1) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_words,
           CAST(SUM(CAST(sqrt(CAST(list_dot_product(e.embedding, e.embedding)
                                   AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE)
             AS total_norm
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY e.label
    """,
)
def doc_text_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text-side statistics grouped by the
    embedding-side cluster label — the diagnostic that tells you
    whether an embedding cluster is picking up a length/source artifact
    instead of semantics (a classic curation failure mode).

    Scale: documents⋈embeddings is an equi-join of two co-keyed tables
    — at 100 TB both sides are bucketed/partitioned by id, so the join
    is co-located (operators/scale.py write_bucketed makes it
    Exchange-free); the aggregate shuffles |labels| rows per
    partition. Word counts are integral (space-counting, identical on
    both engines); vector norms fold in f32 (dot_f32 = DuckDB's
    list_dot_product bit-for-bit), then quantize to DECIMAL(18,6)
    BEFORE the sum so aggregation order cannot move the hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    words = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    ).cast("bigint")
    norm = F.sqrt(
        dot_f32(F.col("embedding"), F.col("embedding")).cast("double")
    ).cast("decimal(18,6)")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select("label", "n_chars", words.alias("words"), norm.alias("nm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("words").cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_words"),
            F.sum("nm").cast("double").alias("total_norm"),
        )
    )


# ---------------------------------------------------------------------------
# One BPE merge iteration: adjacent-pair counts over the word-frequency map.
# ---------------------------------------------------------------------------


@register(
    "bpe_first_merge_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM words GROUP BY w
    ), chars AS (
      SELECT w, freq,
             unnest(range(1, length(w))) AS i
      FROM wf WHERE length(w) >= 2
    ), pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
             substr(w, CAST(i AS INTEGER) + 1, 1) AS b,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM chars GROUP BY 1, 2
    )
    SELECT a, b, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS BIGINT)
             AS rank
    FROM pairs
    ORDER BY cnt DESC, a, b
    LIMIT 10
    """,
)
def bpe_first_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ITERATION of byte-pair-encoding training: count every
    adjacent character pair across the corpus, weighted by word
    frequency (the word-frequency map is the BPE working set — each
    distinct word is processed once, multiplied by its count), and
    rank the top merge candidates. Iterating this step with the winner
    merged into a new symbol IS the BPE trainer; one step is the
    oracle-expressible unit, and the expensive part (the corpus scan
    into the word-frequency map) happens exactly once for ALL
    iterations.

    Scale: the corpus collapses to distinct words first (vocab-sized,
    not corpus-sized — the map-side combine does the heavy lifting),
    pair explosion is then bounded by total characters IN THE
    VOCABULARY, and pair counting is a hash agg over at most
    |alphabet|^2 keys. Global top-10 plans as TakeOrderedAndProject.
    """
    from node_gedcom_graph_spark.functions.scalar import tokens
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = (
        wf.select(
            "w",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.expr("substring(w, i, 1)").alias("a"),
            F.expr("substring(w, i + 1, 1)").alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    top = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(10)
    wr = W.orderBy(F.col("cnt").desc(), "a", "b")
    return top.select(
        "a", "b", "cnt", F.row_number().over(wr).cast("bigint").alias("rank")
    )


# ---------------------------------------------------------------------------
# Multi-merge BPE trainer (r6 verdict item 7): iterate the merge step.
# ---------------------------------------------------------------------------

BPE_MERGES = 3


def _bpe_unrolled_parts(k: int) -> list[str]:
    """The k-merge BPE trainer's CTE chain, shared verbatim by the
    trainer oracle (_bpe_unrolled_sql) and the encoder oracle
    (_bpe_encode_sql). Per iteration: overlapping-inclusive adjacent
    pair counts (Sennrich's get_stats), argmax with (cnt DESC, a, b)
    ties, then the greedy left-to-right non-overlapping merge. The
    only overlap conflicts are equal-symbol runs (a pair (a,b) with
    a != b cannot match at two consecutive positions), so greedy
    selection is 'odd ranks within each run of consecutive match
    positions' — the same run/parity windows on both engines."""
    parts = [
        """wf AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
      ) GROUP BY w HAVING length(w) >= 2
    ), wt0 AS MATERIALIZED (
      SELECT w AS wid, freq,
             list_transform(range(1, length(w) + 1),
                            i -> substr(w, CAST(i AS INTEGER), 1)) AS syms
      FROM wf
    )"""
    ]
    for t in range(1, k + 1):
        prev = f"wt{t - 1}"
        parts.append(
            f"""p{t} AS MATERIALIZED (
      SELECT syms[CAST(i AS INTEGER)] AS a, syms[CAST(i AS INTEGER) + 1] AS b,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM {prev}, unnest(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2
    ), best{t} AS MATERIALIZED (
      SELECT {t} AS merge_iter, a, b, cnt FROM p{t}
      ORDER BY cnt DESC, a, b LIMIT 1
    ), m{t} AS MATERIALIZED (
      SELECT w.wid, CAST(u.i AS BIGINT) AS idx
      FROM {prev} w, unnest(range(1, len(w.syms))) AS u(i), best{t} b
      WHERE w.syms[CAST(u.i AS INTEGER)] = b.a
        AND w.syms[CAST(u.i AS INTEGER) + 1] = b.b
    ), sel{t} AS MATERIALIZED (
      SELECT wid, idx FROM (
        SELECT wid, idx,
               ROW_NUMBER() OVER (PARTITION BY wid, rk ORDER BY idx) AS j
        FROM (
          SELECT wid, idx,
                 idx - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY idx) AS rk
          FROM m{t}
        )
      ) WHERE j % 2 = 1
    ), wt{t} AS MATERIALIZED (
      SELECT wid, freq, list(sym ORDER BY idx) AS syms FROM (
        SELECT e.wid, e.freq, e.idx,
               CASE WHEN s.idx IS NOT NULL THEN e.cur || e.nxt
                    ELSE e.cur END AS sym
        FROM (
          SELECT w.wid, w.freq, CAST(u.i AS BIGINT) AS idx,
                 w.syms[CAST(u.i AS INTEGER)] AS cur,
                 w.syms[CAST(u.i AS INTEGER) + 1] AS nxt
          FROM {prev} w, unnest(range(1, len(w.syms) + 1)) AS u(i)
        ) e
        LEFT JOIN sel{t} s ON s.wid = e.wid AND s.idx = e.idx
        LEFT JOIN sel{t} sk ON sk.wid = e.wid AND sk.idx = e.idx - 1
        WHERE sk.idx IS NULL
      ) GROUP BY wid, freq
    )"""
        )
    return parts


def _bpe_unrolled_sql(k: int) -> str:
    """DuckDB oracle for the k-merge BPE trainer, unrolled (the kcore
    pattern — SQL can't iterate to a data-dependent argmax, but a fixed
    k unrolls exactly). See _bpe_unrolled_parts."""
    parts = _bpe_unrolled_parts(k)
    union = "\n    UNION ALL ".join(
        f"SELECT CAST(merge_iter AS INTEGER) AS merge_iter, a AS sym_a, "
        f"b AS sym_b, cnt FROM best{t}"
        for t in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    {union}\n    ORDER BY merge_iter"
    )


def _bpe_encode_sql(k: int) -> str:
    """DuckDB oracle for the ENCODER stats: the trainer's unrolled CTE
    chain (shared verbatim via _bpe_unrolled_parts), finished by
    joining the initial (wt0) and final (wt{k}) working sets to count
    symbols before/after the k merges, plus the single-char tokens the
    trainer's working set excludes (they encode to themselves)."""
    ctes = "WITH " + ",\n    ".join(_bpe_unrolled_parts(k))
    return f"""{ctes},
    short AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_short FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
      ) WHERE length(w) = 1
    ), enc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_word_types,
             CAST(SUM(a.freq) AS BIGINT) AS n_long,
             CAST(SUM(len(a.syms) * a.freq) AS BIGINT) AS sb,
             CAST(SUM(len(b.syms) * b.freq) AS BIGINT) AS sa
      FROM wt0 a JOIN wt{k} b USING (wid)
    )
    SELECT n_word_types,
           n_long + n_short AS n_tokens,
           sb + n_short AS symbols_before,
           sa + n_short AS symbols_after,
           sb - sa AS n_merges_applied,
           CAST(sa + n_short AS DOUBLE) / (sb + n_short)
             AS compression_ratio
    FROM enc, short
    """


def _bpe_merge_expr(a: str, b: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of adjacent pair
    (a, b) -> a||b inside the ``syms`` array, as ONE whole-stage-codegen
    expression: a sequential F.aggregate fold over the positions with a
    (out, skip) struct accumulator — BPE's merge loop is literally a
    left fold, so no explode, no window, no join, no shuffle."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )

    def step(acc, i):
        # F.get is 0-based and NULL-safe out of bounds (element_at
        # raises under Spark 4 ANSI mode at the final position's i+1).
        cur = F.get(F.col("syms"), (i - 1).cast("int"))
        nxt = F.get(F.col("syms"), i.cast("int"))  # NULL at the end
        is_merge = F.coalesce(
            (cur == F.lit(a)) & (nxt == F.lit(b)), F.lit(False)
        )
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_merge,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.size("syms")), init, step, lambda acc: acc["out"]
    )


@register("bpe_multi_merge_table", oracle=_bpe_unrolled_sql(BPE_MERGES))
def bpe_multi_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINER, k = {BPE_MERGES} merges (r6 verdict item 7 —
    the completion of bpe_first_merge_pairs): each iteration counts
    adjacent symbol pairs over the word-frequency working set
    (overlapping occurrences included, Sennrich's get_stats), merges
    the argmax pair greedily left-to-right (non-overlapping) into a
    new symbol, and records the merge-table row. The merge table —
    (merge_iter, sym_a, sym_b, cnt) — is the trained artifact a
    tokenizer consumes.

    Spark shape per iteration: ONE vocab-sized hash aggregate for the
    pair counts (corpus text is scanned once total, into the initial
    word-frequency map), a 1-row collect for the argmax (the
    data-dependent merge decision — same bounded driver scalar as the
    k-core convergence probe), and the merge itself as a PURE
    EXPRESSION — a sequential F.aggregate fold with an (out, skip)
    struct accumulator, because BPE's greedy merge IS a left fold. No
    explode/window/join in the merge step; localCheckpoint bounds the
    k-step lineage (the fixpoint-loop rule).

    Oracle: the same trainer unrolled k times in SQL (_bpe_unrolled_sql;
    the kcore-unroll pattern). The greedy non-overlap selection is
    expressed run/parity-wise there — conflicts only arise in
    equal-symbol runs, where greedy keeps odd ranks within each run of
    consecutive match positions; a differential test additionally pins
    the trainer against a pure-Python Sennrich implementation."""
    rows, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        rows, "merge_iter int, sym_a string, sym_b string, cnt bigint"
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple], DataFrame]:
    """Run the k-merge trainer; return (merge_rows, final working set).

    The working set is one row per word TYPE of length >= 2:
    (syms array after all k merges, corpus freq). Shared by the trainer
    query (which emits the merge table) and the encoder stats query
    (which aggregates the encoded symbol counts)."""
    from node_gedcom_graph_spark.functions.scalar import tokens

    docs = load_table(spark, sf_dir, "documents", spread=True)
    wt = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.length("w") >= 2)
        .select(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    rows = []
    for t in range(1, BPE_MERGES + 1):
        pairs = (
            wt.filter(F.size("syms") >= 2)
            .select(
                F.explode(F.expr("sequence(1, size(syms) - 1)")).alias("i"),
                "syms",
                "freq",
            )
            .select(
                F.expr("element_at(syms, i)").alias("a"),
                F.expr("element_at(syms, i + 1)").alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()[0]
        rows.append((t, best["a"], best["b"], int(best["cnt"])))
        wt = wt.select(
            _bpe_merge_expr(best["a"], best["b"]).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return rows, wt


@register("bpe_encode_corpus_stats", oracle=_bpe_encode_sql(BPE_MERGES))
def bpe_encode_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE ENCODER applied corpus-wide — the consumption side of
    bpe_multi_merge_table's trained artifact: every token is encoded
    with the k trained merges (single-char tokens encode to
    themselves), and the query reports the corpus token/symbol budget
    that encoding achieves: (n_word_types, n_tokens, symbols_before,
    symbols_after, n_merges_applied, compression_ratio). This is the
    number a tokenizer-ablation pipeline actually reads off a BPE run.

    Scale shape: encoding happens on word TYPES (the trainer's
    deduplicated working set — vocabulary-sized, not corpus-sized) and
    re-weights by corpus frequency, so the merge fold cost is
    O(|vocab| * k), never O(corpus); the corpus itself is scanned once
    for the token counts (one map-side-combinable aggregate). The
    trainer's k bounded argmax collects are the only driver scalars.

    Oracle: the trainer's unrolled CTE chain finished by a wt0-to-wtk
    join (_bpe_encode_sql) — the merge decisions AND the encoded
    working set are recomputed independently by DuckDB, so a trainer
    divergence would fail this gate too.
    """
    from node_gedcom_graph_spark.functions.scalar import tokens

    _, wt = _bpe_train(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    short = tok.filter(F.length("w") == 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_short")
    )
    before = tok.filter(F.length("w") >= 2).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_long"),
        F.sum(F.length("w")).cast("bigint").alias("sb"),
    )
    after = wt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum(F.size("syms") * F.col("freq")).cast("bigint").alias("sa"),
    )
    return (
        after.crossJoin(before)
        .crossJoin(short)
        .select(
            "n_word_types",
            (F.col("n_long") + F.col("n_short")).alias("n_tokens"),
            (F.col("sb") + F.col("n_short")).alias("symbols_before"),
            (F.col("sa") + F.col("n_short")).alias("symbols_after"),
            (F.col("sb") - F.col("sa")).alias("n_merges_applied"),
            (
                (F.col("sa") + F.col("n_short")).cast("double")
                / (F.col("sb") + F.col("n_short"))
            ).alias("compression_ratio"),
        )
    )
