"""Pure-Python differential tests (§5.3 strategy) for the PQ encoder,
hash-ring negative mining, and k-core peeling — independent
reimplementations sharing no code with the engine."""

import hashlib
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.graphalgo import (
    KCORE_FIX_K,
    KCORE_FIX_UNROLL,
    KCORE_K,
    copurchase_cc_converged,
    copurchase_kcore_fixpoint,
    copurchase_kcore_peel2,
)
from node_gedcom_graph_spark.operators.similarity import (
    NEG_BUCKETS,
    NEG_PER_QUERY,
    PQ_M,
    PQ_SUBDIM,
    contrastive_negative_pairs,
    embedding_pq_assign,
)

SF_DIR = "/root/testdata/sf0.001"


def _centroids(emb_rows, k=16):
    ranked = sorted(
        emb_rows,
        key=lambda r: (hashlib.md5(str(r.vec_id).encode()).hexdigest(), r.vec_id),
    )
    return ranked[:k]


def test_pq_assign_matches_numpy(spark):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    cents = _centroids(rows)
    got = {
        (r.vec_id, r.subspace): (r.code, r.best_dot)
        for r in embedding_pq_assign(spark, SF_DIR).collect()
    }
    assert len(got) == len(rows) * PQ_M
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        for m in range(PQ_M):
            sl = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
            dots = []
            for c in cents:
                cv = np.asarray(c.embedding, dtype=np.float64)
                dots.append((float(np.dot(v[sl], cv[sl])), c.vec_id))
            # argmax by (dot desc, cid asc); skip boundary-close pairs
            # (float32 engine fold vs float64 here)
            dots.sort(key=lambda t: (-t[0], t[1]))
            code, dot = got[(r.vec_id, m)]
            if dots[0][0] - dots[1][0] > 1e-4:
                assert code == dots[0][1]
                assert abs(dot - dots[0][0]) < 1e-4


def _b(x: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:4], 16) % NEG_BUCKETS


def test_contrastive_negatives_match_pure_python(spark):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    labels = {r.vec_id: r.label for r in rows}
    buckets = defaultdict(list)
    for r in rows:
        buckets[_b(r.vec_id)].append(r.vec_id)
    expected = {}
    for r in rows:
        if r.vec_id % 4 != 0:
            continue
        for j in range(NEG_PER_QUERY):
            cand = [
                v
                for v in buckets[_b(r.vec_id * NEG_PER_QUERY + j)]
                if labels[v] != r.label and v != r.vec_id
            ]
            if not cand:
                continue
            best = min(
                cand,
                key=lambda v: (
                    hashlib.md5(f"{r.vec_id}/{v}".encode()).hexdigest(),
                    v,
                ),
            )
            expected[(r.vec_id, j)] = (best, labels[best])
    got = {
        (r.query_id, r.slot): (r.neg_id, r.neg_label)
        for r in contrastive_negative_pairs(spark, SF_DIR).collect()
    }
    assert got == expected


def test_kcore_peel_matches_pure_python(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_w = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_w[(a, b)] += 1
    edges = {p for p, w in pair_w.items() if w >= 2}

    def peel(es):
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        return {(a, b) for a, b in es if a in keep and b in keep}

    e2 = peel(peel(edges))
    deg = Counter()
    for a, b in e2:
        deg[a] += 1
        deg[b] += 1
    got = {
        r.part_key: r.residual_degree
        for r in copurchase_kcore_peel2(spark, SF_DIR).collect()
    }
    assert got == dict(deg)


def _copurchase_pairs(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_w = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_w[(a, b)] += 1
    return {p for p, w in pair_w.items() if w >= 2}


def test_kcore_fixpoint_matches_pure_python(spark):
    edges = _copurchase_pairs(spark)

    def peel(es, k):
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        return {(a, b) for a, b in es if a in keep and b in keep}

    es, rounds = edges, 0
    while True:
        nxt = peel(es, KCORE_FIX_K)
        rounds += 1
        if nxt == es:
            break
        es = nxt
    assert rounds <= KCORE_FIX_UNROLL, "oracle unroll depth too shallow"
    deg = Counter()
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    result = copurchase_kcore_fixpoint(spark, SF_DIR)
    got = {r.part_key: r.residual_degree for r in result.collect()}
    assert got == dict(deg)
    # Lineage is truncated: the returned plan reads the last
    # checkpoint, not a 2*rounds-deep join tree over the parquet scan.
    plan = result._jdf.queryExecution().optimizedPlan().toString()
    assert "lineitem" not in plan and len(plan.splitlines()) < 30


def test_cc_converged_matches_union_find(spark):
    edges = _copurchase_pairs(spark)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # normalize: every node -> min id in its component
    comp_min = defaultdict(lambda: None)
    for n in parent:
        r = find(n)
        comp_min[r] = n if comp_min[r] is None else min(comp_min[r], n)
    expected = {n: comp_min[find(n)] for n in parent}
    result = copurchase_cc_converged(spark, SF_DIR)
    got = {r.part_key: r.component for r in result.collect()}
    assert got == expected
    plan = result._jdf.queryExecution().optimizedPlan().toString()
    assert "lineitem" not in plan and len(plan.splitlines()) < 30


def test_bfs_converged_matches_pure_python(spark):
    """The frontier-to-fixpoint BFS must produce exactly the textbook
    BFS distance map of the seed's component, and its returned lineage
    must be checkpoint-truncated (no lineitem scan in the plan)."""
    from collections import deque

    from node_gedcom_graph_spark.operators.graphalgo import (
        copurchase_bfs_converged,
    )

    edges = _copurchase_pairs(spark)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seed = min(a for a, _ in edges)
    expected = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in expected:
                expected[v] = expected[u] + 1
                dq.append(v)
    result = copurchase_bfs_converged(spark, SF_DIR)
    got = {r.node: r.dist for r in result.collect()}
    assert got == expected
    plan = result._jdf.queryExecution().optimizedPlan().toString()
    assert "lineitem" not in plan and len(plan.splitlines()) < 30


def test_ivf_pq_adc_matches_numpy(spark):
    """Differential for ann_ivf_pq_adc_topk at the SCALED geometry:
    rebuild the sqrt(n) IVF cells, the query's top-IVF_ADC_NPROBE
    probe set, the fixed-16 PQ codes, ADC table, and per-query top-10
    in float64 numpy and check the engine's (neighbor set, adc
    values, ranking) — skipping float32-vs-float64 boundary ties the
    same way the PQ differential does."""
    from node_gedcom_graph_spark.operators.similarity import (
        IVF_ADC_NPROBE,
        ann_ivf_pq_adc_topk,
        scaled_ivf_geometry,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    nlist, _ = scaled_ivf_geometry(len(rows))
    nprobe = min(IVF_ADC_NPROBE, nlist)
    cents = _centroids(rows, nlist)
    cents16 = _centroids(rows, 16)  # the PQ codebook stays 16-entry

    def cell_ranking(v):
        nv = np.asarray(v, dtype=np.float64)
        nm = float(np.linalg.norm(nv))
        return sorted(
            (
                (
                    -float(
                        np.dot(nv, np.asarray(c.embedding, np.float64))
                    )
                    / (nm * float(np.linalg.norm(np.asarray(c.embedding, np.float64)))),
                    c.vec_id,
                )
                for c in cents
            ),
        )

    def cell_of(v):
        """(cid, margin): argmax cosine cell + distance to runner-up."""
        scored = cell_ranking(v)
        return scored[0][1], scored[1][0] - scored[0][0]

    def probes_of(v):
        """(probe cid set, margin at the nprobe boundary)."""
        scored = cell_ranking(v)
        boundary = (
            scored[nprobe][0] - scored[nprobe - 1][0]
            if len(scored) > nprobe
            else float("inf")
        )
        return {cid for _, cid in scored[:nprobe]}, boundary

    def codes_of(v):
        nv = np.asarray(v, dtype=np.float64)
        out = []
        for m in range(PQ_M):
            sl = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
            best = sorted(
                (
                    (-float(np.dot(nv[sl], np.asarray(c.embedding, np.float64)[sl])), c.vec_id)
                    for c in cents16
                )
            )
            out.append((best[0][1], best[0][0] - best[1][0]))
        return out

    cell = {r.vec_id: cell_of(r.embedding) for r in rows}
    probes = {
        r.vec_id: probes_of(r.embedding) for r in rows if r.vec_id % 4 == 0
    }
    codes = {r.vec_id: codes_of(r.embedding) for r in rows}
    emb = {r.vec_id: np.asarray(r.embedding, np.float64) for r in rows}
    cent_emb = {c.vec_id: np.asarray(c.embedding, np.float64) for c in cents16}

    got = ann_ivf_pq_adc_topk(spark, SF_DIR).collect()
    assert got, "IVF-PQ top-k must be non-empty at sf0.001"
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)

    SAFE = 1e-4  # ambiguous-under-f32 boundary
    for qid, lst in by_q.items():
        assert qid % 4 == 0
        lst.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in lst] == list(range(1, len(lst) + 1))
        # ranking is (adc desc, neighbor_id asc)
        pairs = [(-r.adc, r.neighbor_id) for r in lst]
        assert pairs == sorted(pairs)
        qprobes, qmargin = probes[qid]
        for r in lst:
            ncid, nmargin = cell[r.neighbor_id]
            if qmargin > SAFE and nmargin > SAFE:
                assert ncid in qprobes, (qid, r.neighbor_id)
            # ADC value: sum over subspaces of dot(q_sub, codeword),
            # skipped when any subspace code is boundary-ambiguous
            expect = 0.0
            skip = False
            for m, (code, marg) in enumerate(codes[r.neighbor_id]):
                if abs(marg) < SAFE:
                    skip = True
                    break
                sl = slice(m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM)
                expect += float(np.dot(emb[qid][sl], cent_emb[code][sl]))
            if not skip:
                assert abs(r.adc - expect) < 1e-3, (qid, r.neighbor_id)
