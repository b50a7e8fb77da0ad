"""Differential tests for operators/llmprep2: the Spark column
expressions vs independent pure-Python reimplementations on the same
rows (the §5.3 strategy — an oracle that shares no code with the
engine), plus shard-balance and broadcast-bound checks."""

import hashlib

from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.llmprep2 import (
    ann_range_search_cosine,
    dataset_shard_assign,
    text_charset_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_charset(text: str):
    n = len(text)
    n_digit = sum(c.isdigit() and c.isascii() for c in text)
    n_space = text.count(" ")
    n_nonascii = sum(not (" " <= c <= "~") for c in text)
    return n, n_digit, n_space, n_nonascii


def test_charset_stats_match_pure_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.select("source", "text").collect()
    expected = {}
    for r in rows:
        if not r.text:
            continue
        n, d, s, na = _py_charset(r.text)
        agg = expected.setdefault(r.source, [0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += n
        agg[2] += d
        agg[3] += s
        agg[4] += na
    got = {
        r.source: [r.n_docs, r.total_chars, r.digit_chars, r.space_chars, r.nonascii_chars]
        for r in text_charset_stats(spark, SF_DIR).collect()
    }
    assert got == expected


def _py_shard(doc_id: int, n_shards: int = 16) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % n_shards


def test_shard_assign_matches_pure_python_md5(spark):
    res = {r.shard: r.n_docs for r in dataset_shard_assign(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = {}
    for r in docs.select("doc_id").collect():
        s = _py_shard(r.doc_id)
        expected[s] = expected.get(s, 0) + 1
    assert res == expected
    # balance audit: md5 sharding should spread within a loose factor
    assert max(res.values()) <= 4 * max(1, min(res.values()))


def test_range_search_broadcast_side_is_bounded(spark):
    """The broadcast side must be the fixed query set (vec_id < 8), not
    anything corpus-linear."""
    plan = ann_range_search_cosine(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "broadcast" in plan.lower()
    # symmetric guarantee: every returned pair's cosine clears the bound
    rows = ann_range_search_cosine(spark, SF_DIR).collect()
    assert all(r.cosine >= 0.25 for r in rows)
    assert all(r.query_id < 8 for r in rows)


def test_bpe_multi_merge_matches_pure_python_sennrich(spark):
    """Differential gate for the k-merge BPE trainer: a from-scratch
    pure-Python Sennrich trainer (get_stats counts every adjacent
    position incl. overlaps; merges apply greedily left-to-right
    non-overlapping; ties break on (cnt DESC, a, b)) over the same
    parquet must produce the identical merge table."""
    import re
    from collections import Counter

    import pandas as pd

    from node_gedcom_graph_spark.operators.llmprep2 import (
        BPE_MERGES,
        bpe_multi_merge_table,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wf = Counter()
    for text in docs["text"]:
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            if len(w) >= 2:
                wf[w] += 1
    vocab = {w: (list(w), f) for w, f in wf.items()}

    expected = []
    for t in range(1, BPE_MERGES + 1):
        stats = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        (a, b), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((t, a, b, cnt))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)

    got = [
        (r.merge_iter, r.sym_a, r.sym_b, r.cnt)
        for r in bpe_multi_merge_table.__wrapped__(spark, SF_DIR)
        .orderBy("merge_iter")
        .collect()
    ]
    assert got == expected


def test_bpe_encode_stats_matches_pure_python(spark):
    """Differential for the encoder stats: replay train + encode in
    pure Python (the trainer test's replay, plus single-char tokens
    that encode to themselves) and compare every output column."""
    import re
    from collections import Counter

    import pandas as pd

    from node_gedcom_graph_spark.operators.llmprep2 import (
        BPE_MERGES,
        bpe_encode_corpus_stats,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wf = Counter()
    n_short = 0
    for text in docs["text"]:
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            if len(w) >= 2:
                wf[w] += 1
            else:
                n_short += 1
    vocab = {w: (list(w), f) for w, f in wf.items()}
    for _ in range(BPE_MERGES):
        stats = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        (a, b), _cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)
    n_long = sum(f for _, f in vocab.values())
    sb = sum(len(w) * f for w, (_, f) in vocab.items())
    sa = sum(len(syms) * f for syms, f in vocab.values())
    [r] = bpe_encode_corpus_stats.__wrapped__(spark, SF_DIR).collect()
    assert r.n_word_types == len(vocab)
    assert r.n_tokens == n_long + n_short
    assert r.symbols_before == sb + n_short
    assert r.symbols_after == sa + n_short
    assert r.n_merges_applied == sb - sa
    assert abs(r.compression_ratio - (sa + n_short) / (sb + n_short)) < 1e-9
    assert r.n_merges_applied > 0  # the merges actually encode something


def test_dataset_mix_resample_matches_pure_python(spark):
    """Differential for the budget water-filling resample: replay the
    level computation and the 32-bit md5 acceptance in pure Python;
    also pin the contract (small sources keep everything, kept totals
    track the budget, selection is real on the balanced fixture)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from node_gedcom_graph_spark.operators.distribution import (
        MIX_BUDGET_FRAC,
        dataset_mix_resample,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = Counter(docs["source"])
    k, total = len(n), sum(n.values())
    budget = math.floor(total * MIX_BUDGET_FRAC)
    ranked = sorted(n.items(), key=lambda kv: (kv[1], kv[0]))
    bi, pbi, p = 0, 0, 0
    for i, (_, nd) in enumerate(ranked, start=1):
        p += nd
        if p + (k - i) * nd <= budget:
            bi, pbi = i, p
    level = max(nd for _, nd in ranked) if bi >= k else (budget - pbi) // (k - bi)
    exp = defaultdict(lambda: [0, 0, 0])  # n_docs, n_kept, kept_chars
    for _, row in docs.iterrows():
        s = row["source"]
        quota = min(n[s], level)
        h = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8], 16)
        kept = n[s] <= level or h * n[s] < quota * (1 << 32)
        exp[s][0] += 1
        if kept:
            exp[s][1] += 1
            exp[s][2] += int(row["n_chars"])
    got = {
        r.source: (r.n_docs, r.quota, r.n_kept, r.kept_chars)
        for r in dataset_mix_resample.__wrapped__(spark, SF_DIR).collect()
    }
    assert set(got) == set(exp)
    for s, (nd, nk, kc) in exp.items():
        assert got[s] == (nd, min(n[s], level), nk, kc), s
    # contract: the balanced fixture must actually downsample, small
    # sources keep everything, and the kept total tracks the budget
    assert any(nk < nd for nd, nk, _ in exp.values())
    for s, (nd, nk, _) in exp.items():
        if n[s] <= level:
            assert nk == nd
    kept_total = sum(nk for _, nk, _ in exp.values())
    assert kept_total <= total
    assert abs(kept_total - budget) <= max(10, int(0.25 * budget))
