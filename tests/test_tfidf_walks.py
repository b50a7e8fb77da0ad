"""Semantic pins for the sparse TF-IDF cosine pair join (differential
against a pure-Python bag-of-words cosine) and the deterministic
hash-seeded random walks (edge validity + hash-argmin choice)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from node_gedcom_graph_spark.operators.dedup import (
    SHINGLE_K,
    TFIDF_COS_T,
    TFIDF_DF_CAP,
    doc_tfidf_cosine_pairs,
)
from node_gedcom_graph_spark.operators.graphalgo import (
    WALK_STEPS,
    _copurchase_edges,
    copurchase_hash_walks4,
)
from tests.conftest import SF_DIR


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _grams(text: str) -> Counter:
    """Word 3-gram shingle terms, mirroring tokens() + the `grams`
    expression in doc_tfidf_cosine_pairs (space-joined sliding windows
    of SHINGLE_K consecutive alphanumeric tokens)."""
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return Counter(
        " ".join(toks[i : i + SHINGLE_K])
        for i in range(len(toks) - SHINGLE_K + 1)
    )


def test_tfidf_pairs_match_pure_python(spark):
    docs = {
        r.doc_id: _grams(r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    df = Counter()
    for tf in docs.values():
        df.update(tf.keys())
    vecs = {}
    for d, tf in docs.items():
        v = {
            t: c / df[t] for t, c in tf.items() if df[t] <= TFIDF_DF_CAP
        }
        nm = math.sqrt(sum(w * w for w in v.values()))
        if nm:
            vecs[d] = {t: w / nm for t, w in v.items()}
    expect = {}
    ids = sorted(vecs)
    post = defaultdict(list)
    for d, v in vecs.items():
        for t in v:
            post[t].append(d)
    cand = {
        (a, b)
        for ds in post.values()
        for a in ds
        for b in ds
        if a < b
    }
    for a, b in cand:
        cos = sum(
            vecs[a][t] * vecs[b][t] for t in vecs[a] if t in vecs[b]
        )
        if cos >= TFIDF_COS_T:
            expect[(a, b)] = cos
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in doc_tfidf_cosine_pairs(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for k, c in got.items():
        assert abs(c - expect[k]) < 1e-9
    assert got, "fixture must exercise the threshold"


def test_hash_walks_follow_edges_and_argmin(spark):
    edges = _copurchase_edges(spark, SF_DIR).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r.pa].add(r.pb)
        adj[r.pb].add(r.pa)
    rows = copurchase_hash_walks4(spark, SF_DIR).collect()
    walks = defaultdict(dict)
    for r in rows:
        walks[r.walk_id][r.step] = r.node
    assert set(walks) == set(adj)
    for wid, steps in walks.items():
        assert sorted(steps) == list(range(WALK_STEPS + 1))
        assert steps[0] == wid
        for t in range(WALK_STEPS):
            cur, nxt = steps[t], steps[t + 1]
            assert nxt in adj[cur]
            # the hash-argmin choice, recomputed
            want = min(adj[cur], key=lambda d: (_md5(f"{cur}-{t}-{d}"), d))
            assert nxt == want
