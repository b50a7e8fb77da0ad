"""Round-10 pins: the per-fixture co-purchase edge materialization and
the sweep's error root-cause capture.

The edge cache is a CORRECTNESS-sensitive optimization (a stale or
corrupt materialization would silently change ~17 graph queries), so
the invariants pinned here are the ones that keep it safe:
cache-vs-build row equality, fingerprint invalidation on fixture
rewrite, and the kill switch.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from node_gedcom_graph_spark.operators import graphalgo

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def edge_cache_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "edge_cache")
    monkeypatch.setattr(graphalgo, "_EDGE_CACHE_ROOT", d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_edge_cache_matches_in_session_build(spark, edge_cache_dir, monkeypatch):
    monkeypatch.delenv("NGG_EDGE_CACHE", raising=False)
    cached = _rows(graphalgo._copurchase_edges(spark, SF_DIR, keep_weight=True))
    # A materialization must exist after the first call...
    entries = [
        e
        for e in os.listdir(edge_cache_dir)
        if ".build" not in e
        and os.path.isdir(os.path.join(edge_cache_dir, e))
    ]
    assert len(entries) == 1
    # ...and byte-equal the uncached build (same deterministic integers).
    monkeypatch.setenv("NGG_EDGE_CACHE", "0")
    built = _rows(graphalgo._copurchase_edges(spark, SF_DIR, keep_weight=True))
    assert cached == built and len(cached) > 0


def test_edge_cache_projection_without_weight(spark, edge_cache_dir, monkeypatch):
    monkeypatch.delenv("NGG_EDGE_CACHE", raising=False)
    with_w = graphalgo._copurchase_edges(spark, SF_DIR, keep_weight=True)
    without = graphalgo._copurchase_edges(spark, SF_DIR)
    assert without.columns == ["pa", "pb"]
    assert with_w.columns == ["pa", "pb", "w"]
    assert without.count() == with_w.count()


def test_edge_cache_invalidates_on_fixture_rewrite(
    spark, edge_cache_dir, tmp_path, monkeypatch
):
    monkeypatch.delenv("NGG_EDGE_CACHE", raising=False)
    # Private fixture copy so we can rewrite it.
    fix = tmp_path / "fixture"
    fix.mkdir()
    shutil.copy(f"{SF_DIR}/lineitem.parquet", fix / "lineitem.parquet")
    fp1 = graphalgo._lineitem_fingerprint(str(fix))
    graphalgo._copurchase_edges(spark, str(fix), keep_weight=True).count()
    assert fp1 in os.listdir(edge_cache_dir)
    # Rewrite-in-place: same bytes, new mtime -> new fingerprint.
    time.sleep(0.01)
    os.utime(fix / "lineitem.parquet")
    fp2 = graphalgo._lineitem_fingerprint(str(fix))
    assert fp2 != fp1
    graphalgo._copurchase_edges(spark, str(fix), keep_weight=True).count()
    assert fp2 in os.listdir(edge_cache_dir)


def test_root_cause_extracts_deepest_caused_by():
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from sweep_sf10 import _root_cause

    exc = Exception(
        "An error occurred while calling o144.save.\n"
        ": org.apache.spark.SparkException: Job aborted.\n"
        "\tat org.apache.spark.Foo.bar(Foo.scala:1)\n"
        "Caused by: java.io.IOException: intermediate\n"
        "\tat org.apache.spark.Baz.qux(Baz.scala:2)\n"
        "Caused by: org.apache.spark.memory.SparkOutOfMemoryError: "
        "[SPILL_OUT_OF_MEMORY] No space left on device\n"
    )
    msg = _root_cause(exc)
    assert msg.startswith("An error occurred while calling o144.save.")
    assert "No space left on device" in msg
    # Single-line exceptions pass through unchanged.
    assert _root_cause(Exception("plain failure")) == "plain failure"


# ------------------------- publish/evict semantics (pure filesystem)


def _mk_entry(root, name, mtime=None, success=True):
    p = os.path.join(root, name)
    os.makedirs(p, exist_ok=True)
    if success:
        open(os.path.join(p, "_SUCCESS"), "w").close()
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


def test_publish_loser_discards_never_deletes_live_cache(tmp_path, monkeypatch):
    root = str(tmp_path)
    monkeypatch.setattr(graphalgo, "_EDGE_CACHE_ROOT", root)
    cache = _mk_entry(root, "aaaa", success=True)  # winner already live
    marker = os.path.join(cache, "winner_marker")
    open(marker, "w").close()
    tmp = _mk_entry(root, "aaaa.build.999", success=True)
    graphalgo._publish_and_evict(tmp, cache)
    # Loser's build discarded; the live cache untouched.
    assert not os.path.exists(tmp)
    assert os.path.exists(marker)


def test_publish_replaces_incomplete_garbage(tmp_path, monkeypatch):
    root = str(tmp_path)
    monkeypatch.setattr(graphalgo, "_EDGE_CACHE_ROOT", root)
    cache = _mk_entry(root, "bbbb", success=False)  # crashed earlier build
    tmp = _mk_entry(root, "bbbb.build.999", success=True)
    graphalgo._publish_and_evict(tmp, cache)
    assert os.path.exists(os.path.join(cache, "_SUCCESS"))
    assert not os.path.exists(tmp)


def test_evict_oldest_by_use_and_orphans(tmp_path, monkeypatch):
    root = str(tmp_path)
    monkeypatch.setattr(graphalgo, "_EDGE_CACHE_ROOT", root)
    now = time.time()
    for i in range(18):  # 18 old entries + the new one > cap of 16
        _mk_entry(root, f"e{i:02d}", mtime=now - 10_000 + i)
    _mk_entry(root, "stale.build.123", mtime=now - 7200)   # orphan, old
    _mk_entry(root, "fresh.build.456", mtime=now)          # in-flight
    tmp = _mk_entry(root, "new.build.999", success=True)
    cache = os.path.join(root, "new")
    graphalgo._publish_and_evict(tmp, cache)
    kept = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )
    # Oldest-by-use evicted down to 16 entries; hour-old orphan swept,
    # in-flight build preserved.
    assert "new" in kept and "e17" in kept and "e00" not in kept
    assert "stale.build.123" not in kept and "fresh.build.456" in kept
    n_entries = sum(1 for d in kept if ".build" not in d)
    assert n_entries == 16


# ------------------------- incremental maintenance: split invariance


def test_incremental_split_invariance(spark, monkeypatch):
    """increment-then-merge must equal rebuild for ANY append split —
    pair counts are additive over disjoint order sets, so the output
    cannot depend on where the base/delta boundary falls."""
    from node_gedcom_graph_spark.operators.graphalgo import (
        copurchase_edges_incremental,
    )

    results = []
    for mod in (2, 5, 10):
        monkeypatch.setattr(graphalgo, "INCR_DELTA_MOD", mod)
        results.append(
            _rows(copurchase_edges_incremental(spark, SF_DIR))
        )
    assert results[0] == results[1] == results[2] and len(results[0]) > 0


# --- r10 optimization-round scoping: nothing precomputed survives a run ---


def test_default_cache_root_is_process_scoped():
    """Optimization-round contract: without the explicit
    NGG_EDGE_CACHE_DIR opt-in, the materialization root is keyed to
    THIS interpreter (and atexit-removed), so a fresh bench/oracle
    invocation can never be served intermediates persisted by a
    previous run."""
    if os.environ.get("NGG_EDGE_CACHE_DIR"):
        pytest.skip("persistent cache dir explicitly opted in")
    assert f".pid{os.getpid()}" in graphalgo._EDGE_CACHE_ROOT


def test_sweep_removes_dead_pid_roots_keeps_live(tmp_path, monkeypatch):
    base = str(tmp_path)
    live = os.path.join(base, f"ngg_copurchase_edges.pid{os.getpid()}")
    dead = os.path.join(base, "ngg_copurchase_edges.pid999999999")
    junk = os.path.join(base, "ngg_copurchase_edges.pidXYZ")
    for d in (live, dead, junk):
        os.makedirs(d)
    monkeypatch.setattr(graphalgo, "_EDGE_CACHE_ROOT", live)
    graphalgo._sweep_stale_process_roots()
    assert os.path.exists(live)            # own root untouched
    assert not os.path.exists(dead)        # dead pid swept
    assert os.path.exists(junk)            # unparseable name left alone


def test_association_rules_served_equals_unserved(spark, edge_cache_dir, monkeypatch):
    """r10 rewrite pin: association_rules_copurchase served from the
    two materializations (edge list w>=3 subset + part order counts)
    is row- and bit-identical to the self-contained build path."""
    from node_gedcom_graph_spark.operators.relational_ext import (
        association_rules_copurchase,
    )

    monkeypatch.delenv("NGG_EDGE_CACHE", raising=False)
    served = _rows(association_rules_copurchase(spark, SF_DIR))
    monkeypatch.setenv("NGG_EDGE_CACHE", "0")
    unserved = _rows(association_rules_copurchase(spark, SF_DIR))
    assert served == unserved and len(served) > 0


def test_substring_family_served_equals_unserved(
    spark, edge_cache_dir, monkeypatch
):
    """r10 pin: the ExactSubstr family served from the per-invocation
    span materialization is row- and bit-identical to the
    self-contained build path, for all three batch members; the
    materialization is keyed on the DOCUMENTS fixture (not lineitem)
    and appears after the first call."""
    from node_gedcom_graph_spark.operators.dedup import (
        SUBSTR_W,
        dedup_substring_clean,
        dedup_substring_spans,
        dedup_substring_stats_by_source,
    )

    monkeypatch.delenv("NGG_EDGE_CACHE", raising=False)
    served = {
        q.__name__: _rows(q(spark, SF_DIR))
        for q in (
            dedup_substring_spans,
            dedup_substring_stats_by_source,
            dedup_substring_clean,
        )
    }
    entries = [
        e
        for e in os.listdir(edge_cache_dir)
        if ".build" not in e
        and os.path.isdir(os.path.join(edge_cache_dir, e))
    ]
    docs_fp = graphalgo._fixture_fingerprint(SF_DIR, "documents")
    assert entries == [f"{docs_fp}-substr-w{SUBSTR_W}"]
    monkeypatch.setenv("NGG_EDGE_CACHE", "0")
    for q in (
        dedup_substring_spans,
        dedup_substring_stats_by_source,
        dedup_substring_clean,
    ):
        assert _rows(q(spark, SF_DIR)) == served[q.__name__]
        assert len(served[q.__name__]) > 0


def test_winsorized_cuts_equal_naive_window(spark):
    """r10 rewrite pin: the distribution-based rank-position cutoffs
    equal the naive row_number-window formula on the same fixture."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from node_gedcom_graph_spark.operators.relational_ext import (
        winsorized_price_stats,
    )
    from node_gedcom_graph_spark.sources.tables import load_table

    got = {
        r["l_returnflag"]: (r["p01"], r["p99"])
        for r in winsorized_price_stats(spark, SF_DIR)
        .select("l_returnflag", "p01", "p99")
        .collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wc = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    cut = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
            F.col("l_extendedprice"),
        )
    )
    want = {
        r["l_returnflag"]: (r["p01"], r["p99"])
        for r in ranked.groupBy("l_returnflag")
        .agg(cut(0.01).alias("p01"), cut(0.99).alias("p99"))
        .collect()
    }
    assert got == want and len(got) == 3


def test_arrival_fixture_file_groups_preserve_batches(spark):
    """The multi-file arrival fixtures (r10: parallel slice writes
    instead of coalesce(1)) must keep micro-batch composition: every
    slice has exactly files_per_batch files, file mtimes are strictly
    increasing in slice-major name order, so a FileStreamSource with
    maxFilesPerTrigger=files_per_batch replays slice i as batch i."""
    import glob

    from node_gedcom_graph_spark.streaming.pipeline import (
        DEDUPWM_RANKS,
        _write_dedupwm_fixture,
    )

    data_dir, per_batch = _write_dedupwm_fixture(spark, SF_DIR)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    assert per_batch >= 1
    assert len(files) == DEDUPWM_RANKS * per_batch
    # mtimes: distinct (total replay order) and slice-major
    mtimes = [os.stat(f).st_mtime for f in files]
    assert len(set(mtimes)) == len(mtimes)
    assert mtimes == sorted(mtimes)
    # each rank's file group holds exactly the rank's rows: one row per
    # (user_id, event_type) key, keys of rank k+1 a subset of rank k
    prev_keys = None
    for k in range(1, DEDUPWM_RANKS + 1):
        group = sorted(glob.glob(os.path.join(data_dir, f"f{k}_*.parquet")))
        assert len(group) == per_batch
        df = spark.read.parquet(*group)
        keys = {
            (r["user_id"], r["event_type"])
            for r in df.select("user_id", "event_type").collect()
        }
        assert df.count() == len(keys)  # one row per key per batch
        if prev_keys is not None:
            assert keys <= prev_keys
        prev_keys = keys


def test_waiting_suppliers_counts_equal_semi_anti(spark):
    """r10 rewrite pin: the per-order count formulation (n_supp >= 2,
    n_late == 1) equals the correlated EXISTS/NOT EXISTS semi+anti
    join plan it replaced."""
    from pyspark.sql import functions as F

    from node_gedcom_graph_spark.operators.relational_tpch import (
        waiting_supplier_orders,
    )
    from node_gedcom_graph_spark.sources.tables import load_table

    got = _rows(waiting_supplier_orders(spark, SF_DIR))

    orders = load_table(spark, SF_DIR, "orders")
    supplier = load_table(spark, SF_DIR, "supplier")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    late = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    want = _rows(
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supplier), F.col("l1.l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    assert got == want and len(got) > 0


def test_large_volume_cents_equal_decimal_sum(spark):
    """r10 rewrite pin: the long-cents quantity rollup equals the
    decimal(28,2) accumulator it replaced, threshold included."""
    from pyspark.sql import functions as F

    from node_gedcom_graph_spark.operators.relational_tpch import (
        _dec,
        large_volume_orders,
    )
    from node_gedcom_graph_spark.sources.tables import load_table

    got = _rows(large_volume_orders(spark, SF_DIR))

    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select(
            "l_orderkey", F.col("qty_dec").cast("double").alias("total_qty")
        )
    )
    want = _rows(
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
    )
    assert got == want and len(got) > 0
