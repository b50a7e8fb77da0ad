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
