"""Tests for the manifest-based copy-on-write upsert table: CDC replay
vs a pure-Python dict oracle, bucket-pruned rewrites, crash-safety of
the pointer swap, and optimistic-concurrency abort."""

import hashlib
import json
import os

import pytest

from node_gedcom_graph_spark.publish.upsert_table import (
    ConcurrentWriteError,
    _read_pointer,
    apply_cdc,
    init_table,
    read_latest,
)

N_BUCKETS = 8


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, val string")


def _mk_cdc(spark, ops):
    # ops: list of (op, seq, k, val)
    return spark.createDataFrame(ops, "op string, seq bigint, k bigint, val string")


def _state(spark, d):
    return {r.k: r.val for r in read_latest(spark, d).collect()}


def test_cdc_replay_matches_dict_oracle(spark, tmp_path):
    d = str(tmp_path / "t")
    base = [(i, f"v{i}") for i in range(20)]
    init_table(spark, d, _mk(spark, base), "k", N_BUCKETS)
    oracle = {k: v for k, v in base}

    batches = [
        [("upsert", 1, 3, "a"), ("upsert", 2, 3, "b"), ("delete", 3, 4, None)],
        [("upsert", 10, 100, "new"), ("delete", 11, 3, None)],
        [("upsert", 20, 4, "back"), ("upsert", 21, 100, "upd")],
    ]
    for ops in batches:
        apply_cdc(spark, d, _mk_cdc(spark, ops), "k")
        for op, seq, k, v in sorted(ops, key=lambda t: t[1]):
            if op == "delete":
                oracle.pop(k, None)
            else:
                oracle[k] = v
        assert _state(spark, d) == oracle


def test_seq_tie_delete_wins(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "x")]), "k", N_BUCKETS)
    apply_cdc(
        spark,
        d,
        _mk_cdc(spark, [("upsert", 5, 1, "y"), ("delete", 5, 1, None)]),
        "k",
    )
    assert _state(spark, d) == {}


def test_only_affected_buckets_rewritten(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(i, f"v{i}") for i in range(64)]), "k", N_BUCKETS)
    v = apply_cdc(
        spark, d, _mk_cdc(spark, [("upsert", 1, 7, "seven")]), "k"
    )
    bucket7 = int(hashlib.md5(b"7").hexdigest()[:4], 16) % N_BUCKETS
    with open(os.path.join(d, f"manifest_v{v}.json")) as fh:
        manifest = json.load(fh)
    moved = [
        b
        for b in map(str, range(N_BUCKETS))
        if manifest[b].startswith(f"v={v}-")
    ]
    assert moved == [str(bucket7)]
    # unaffected buckets still resolve to v=0 and remain readable
    assert _state(spark, d)[13] == "v13"


def test_crash_before_pointer_swap_leaves_old_state(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "x")]), "k", N_BUCKETS)
    # simulate a crashed apply: a version dir + manifest exist but the
    # pointer was never swapped
    os.makedirs(os.path.join(d, "v=99"), exist_ok=True)
    with open(os.path.join(d, "manifest_v99.json"), "w") as fh:
        json.dump({"_n_buckets": str(N_BUCKETS)}, fh)
    assert _read_pointer(d) == 0
    assert _state(spark, d) == {1: "x"}


def test_concurrent_writer_aborts(spark, tmp_path, monkeypatch):
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "x"), (2, "y")]), "k", N_BUCKETS)

    import node_gedcom_graph_spark.publish.upsert_table as ut

    real_read = ut._read_pointer
    calls = {"n": 0}

    def racy_read(table_dir):
        calls["n"] += 1
        v = real_read(table_dir)
        # second read (the CAS check) sees a moved pointer
        return v + 1 if calls["n"] == 2 else v

    monkeypatch.setattr(ut, "_read_pointer", racy_read)
    with pytest.raises(ConcurrentWriteError):
        ut.apply_cdc(
            spark, d, _mk_cdc(spark, [("upsert", 1, 1, "z")]), "k"
        )
    monkeypatch.setattr(ut, "_read_pointer", real_read)
    # pointer untouched -> readers still see the pre-abort state
    assert _state(spark, d) == {1: "x", 2: "y"}


def test_time_travel_reads_old_versions(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "a"), (2, "b")]), "k", N_BUCKETS)
    apply_cdc(spark, d, _mk_cdc(spark, [("upsert", 1, 1, "a2")]), "k")
    apply_cdc(spark, d, _mk_cdc(spark, [("delete", 2, 2, None)]), "k")
    assert _state(spark, d) == {1: "a2"}
    v0 = {r.k: r.val for r in read_latest(spark, d, version=0).collect()}
    v1 = {r.k: r.val for r in read_latest(spark, d, version=1).collect()}
    assert v0 == {1: "a", 2: "b"}
    assert v1 == {1: "a2", 2: "b"}


def test_streaming_cdc_foreachbatch_apply(spark, tmp_path):
    """Integration: a CDC stream drained availableNow applies each
    micro-batch through apply_cdc — epoch seq offsets keep replayed
    rows deterministic, and the final table equals the dict replay."""
    d = str(tmp_path / "t")
    src = str(tmp_path / "cdc_src")
    init_table(spark, d, _mk(spark, [(i, f"v{i}") for i in range(10)]), "k", N_BUCKETS)
    ops = [
        ("upsert", 1, 3, "x"),
        ("delete", 2, 4, None),
        ("upsert", 3, 42, "new"),
    ]
    _mk_cdc(spark, ops).write.mode("overwrite").parquet(src)

    cdc_schema = "op string, seq bigint, k bigint, val string"
    stream = spark.readStream.schema(cdc_schema).parquet(src)

    def _apply(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        apply_cdc(spark, d, batch_df, "k")

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    expected = {i: f"v{i}" for i in range(10)}
    expected[3] = "x"
    expected.pop(4)
    expected[42] = "new"
    assert _state(spark, d) == expected


def test_randomized_cdc_replay_matches_dict_oracle(spark, tmp_path):
    """Seeded random mixed workload: 5 batches x 12 ops over a 30-key
    space with colliding seqs — the dict oracle applies ops in (seq,
    delete-wins) order, which is exactly the table's contract."""
    import random

    rng = random.Random(1234)
    d = str(tmp_path / "t")
    base = [(i, f"v{i}") for i in range(15)]
    init_table(spark, d, _mk(spark, base), "k", N_BUCKETS)
    oracle = {k: v for k, v in base}
    seq = 0
    for _ in range(5):
        ops = []
        for _ in range(12):
            k = rng.randrange(30)
            seq += rng.choice([0, 1])  # occasional seq collisions
            if rng.random() < 0.3:
                ops.append(("delete", seq, k, None))
            else:
                ops.append(("upsert", seq, k, f"s{seq}k{k}"))
        apply_cdc(spark, d, _mk_cdc(spark, ops), "k")
        # oracle: per key, winner = max (seq, delete-beats-upsert)
        byk = {}
        for op, sq, k, v in ops:
            cur = byk.get(k)
            cand = (sq, 1 if op == "delete" else 0, op, v)
            if cur is None or cand[:2] > cur[:2]:
                byk[k] = cand
        for k, (_, _, op, v) in byk.items():
            if op == "delete":
                oracle.pop(k, None)
            else:
                oracle[k] = v
        assert _state(spark, d) == oracle


def test_schema_evolution_adds_column(spark, tmp_path):
    """A CDC batch carrying a brand-new column evolves the table: new
    rows carry it, pre-existing rows read back as NULL, and the
    manifest schema records the widened shape."""
    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "a"), (2, "b")]), "k", N_BUCKETS)
    cdc = spark.createDataFrame(
        [("upsert", 1, 1, "a2", "extra!")],
        "op string, seq bigint, k bigint, val string, note string",
    )
    apply_cdc(spark, d, cdc, "k")
    rows = {r.k: (r.val, r.note) for r in read_latest(spark, d).collect()}
    assert rows[1] == ("a2", "extra!")
    assert rows[2] == ("b", None)


def test_compact_and_vacuum(spark, tmp_path):
    import os as _os

    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(i, f"v{i}") for i in range(20)]), "k", N_BUCKETS)
    apply_cdc(spark, d, _mk_cdc(spark, [("upsert", 1, 3, "x")]), "k")
    apply_cdc(spark, d, _mk_cdc(spark, [("delete", 2, 7, None)]), "k")
    before = _state(spark, d)
    from node_gedcom_graph_spark.publish.upsert_table import compact, vacuum

    v = compact(spark, d)
    assert _state(spark, d) == before  # compaction is a no-op on content
    # every live bucket now resolves to the compacted version
    import json as _json

    manifest = _json.load(open(_os.path.join(d, f"manifest_v{v}.json")))
    assert all(
        vd.startswith(f"v={v}-")
        for b, vd in manifest.items()
        if not b.startswith("_")
    )
    removed = vacuum(d, keep_versions=1)
    assert removed  # old versions + manifests swept
    assert _state(spark, d) == before  # latest still fully readable
    # time travel beyond retention is genuinely gone
    assert not _os.path.exists(_os.path.join(d, "manifest_v0.json"))


def test_apply_into_bucket_dropped_by_compaction(spark, tmp_path):
    """Regression (review finding): deleting every row of a bucket,
    compacting (which drops the bucket's manifest entry), then
    upserting a key that hashes back into that bucket must succeed —
    a missing manifest ENTRY is the same as a missing directory."""
    from node_gedcom_graph_spark.publish.upsert_table import compact

    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(7, "seven")]), "k", N_BUCKETS)
    apply_cdc(spark, d, _mk_cdc(spark, [("delete", 1, 7, None)]), "k")
    compact(spark, d)
    assert _state(spark, d) == {}
    apply_cdc(spark, d, _mk_cdc(spark, [("upsert", 2, 7, "back")]), "k")
    assert _state(spark, d) == {7: "back"}


def test_schema_never_regresses_on_unrelated_bucket(spark, tmp_path):
    """Regression (review finding): after an evolution touching bucket
    A, a later batch touching only bucket B (and NOT carrying the new
    column) must keep the evolved column in the table schema and
    preserve bucket A's values."""
    d = str(tmp_path / "t")
    # keys 7 and 13 land in different buckets (verified by md5 below)
    import hashlib as _h

    b7 = int(_h.md5(b"7").hexdigest()[:4], 16) % N_BUCKETS
    b13 = int(_h.md5(b"8").hexdigest()[:4], 16) % N_BUCKETS
    assert b7 != b13
    init_table(spark, d, _mk(spark, [(7, "a"), (8, "b")]), "k", N_BUCKETS)
    evolved = spark.createDataFrame(
        [("upsert", 1, 7, "a2", "NOTE")],
        "op string, seq bigint, k bigint, val string, note string",
    )
    apply_cdc(spark, d, evolved, "k")
    # second batch: old shape, different bucket
    apply_cdc(spark, d, _mk_cdc(spark, [("upsert", 2, 8, "b2")]), "k")
    rows = {r.k: (r.val, r.note) for r in read_latest(spark, d).collect()}
    assert rows == {7: ("a2", "NOTE"), 8: ("b2", None)}


def test_manifest_collision_is_the_commit_point(spark, tmp_path):
    """Two writers racing for the same version are serialized by the
    EXCLUSIVE manifest create: if the target manifest already exists
    (the other writer won), apply_cdc raises ConcurrentWriteError, its
    orphan data directory is cleaned up, and the table still reads as
    the winner left it."""
    import json as _json
    import os as _os

    d = str(tmp_path / "t")
    init_table(spark, d, _mk(spark, [(1, "x")]), "k", N_BUCKETS)
    # simulate the other writer having already published version 1
    with open(_os.path.join(d, "manifest_v1.json"), "w") as fh:
        _json.dump(
            {
                **_json.load(open(_os.path.join(d, "manifest_v0.json"))),
            },
            fh,
        )
    with pytest.raises(ConcurrentWriteError):
        apply_cdc(spark, d, _mk_cdc(spark, [("upsert", 1, 1, "y")]), "k")
    # loser's data directory cleaned; v0 state intact
    orphans = [
        e
        for e in _os.listdir(d)
        if e.startswith("v=1-")
    ]
    assert orphans == []
    assert _state(spark, d) == {1: "x"}
