"""The pluggable `format("gedcom")` Python data source: split alignment,
parity with the JVM text-scan path, extract_graph integration, and the
file-discovery stream reader."""

import os

import pytest
from pyspark.sql import functions as F

from node_gedcom_graph_spark.gedcom.fixtures import DEMO_GEDCOM
from node_gedcom_graph_spark.gedcom.parser import (
    _LINE_RE,
    assign_records,
    read_gedcom_lines,
)
from node_gedcom_graph_spark.sources.gedcom_datasource import (
    LINE_RE,
    GedcomDataSource,
    _RangePartition,
    _read_range,
)


@pytest.fixture(scope="module")
def ged_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ged")
    (d / "demo.ged").write_text(DEMO_GEDCOM)
    return str(d)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(GedcomDataSource)
    return spark


def test_regex_lockstep():
    assert LINE_RE.pattern == _LINE_RE


def test_on_disk_fixture_matches_embedded():
    """tests/fixtures/demo.ged (FIXTURES.md §2) must stay in sync with
    the embedded DEMO_GEDCOM the oracles are hand-computed against."""
    here = os.path.dirname(os.path.abspath(__file__))
    on_disk = open(os.path.join(here, "fixtures", "demo.ged")).read()
    assert on_disk == DEMO_GEDCOM


def test_bom_header_survives(tmp_path):
    """UTF-8 BOM before '0 HEAD' must not drop the header record."""
    f = tmp_path / "bom.ged"
    f.write_bytes("\ufeff0 HEAD\n1 CHAR UTF-8\n0 TRLR\n".encode("utf-8"))
    rows = list(_read_range(_RangePartition(str(f), 0, 0, os.path.getsize(f))))
    assert [(r[3], r[5]) for r in rows] == [(0, "HEAD"), (1, "CHAR"), (0, "TRLR")]


def test_unicode_separators_rejected_like_jvm(registered, tmp_path):
    """re.ASCII parity: NBSP separators / non-ASCII digits must be
    rejected by the Python source exactly as the JVM regexp path
    rejects them (Java \\s and \\d are ASCII-only)."""
    f = tmp_path / "nbsp.ged"
    f.write_bytes("0\u00a0@I1@\u00a0INDI\n0 @I2@ INDI\n".encode("utf-8"))
    rows = list(_read_range(_RangePartition(str(f), 0, 0, os.path.getsize(f))))
    assert [r[5] for r in rows] == ["INDI"] and rows[0][4] == "I2"
    via_jvm = read_gedcom_lines(registered, str(f)).collect()
    assert [(r.xref, r.tag) for r in via_jvm] == [("I2", "INDI")]


def test_split_invariance(tmp_path):
    """Any split size yields the identical row set — records never lose,
    duplicate, or misattribute lines across split boundaries."""
    text = "".join(
        f"0 @I{i}@ INDI\n1 NAME N{i} /S{i}/\n1 BIRT\n2 DATE 1 JAN {1900 + i % 100}\n"
        for i in range(200)
    )
    f = tmp_path / "big.ged"
    f.write_text(text)
    size = os.path.getsize(f)

    def rows(split_size):
        out = []
        for start in range(0, size, split_size):
            out.extend(
                _read_range(
                    _RangePartition(str(f), 0, start, min(start + split_size, size))
                )
            )
        return out

    whole = rows(1 << 30)
    assert len(whole) == 200 * 4
    for split_size in (64, 97, 256, 1024):
        assert sorted(rows(split_size)) == sorted(whole), f"split_size={split_size}"


def test_inline_option_matches_file_read(registered, ged_dir):
    """.option('inline', text) must yield the same rows as reading the
    same content from a file (modulo the file column), including under
    many tiny byte-range splits — no filesystem assumption on executors."""
    from_file = (
        registered.read.format("gedcom")
        .option("split_size", "64")
        .load(os.path.join(ged_dir, "demo.ged"))
        .drop("file")
        .collect()
    )
    inline = (
        registered.read.format("gedcom")
        .option("split_size", "64")
        .option("inline", DEMO_GEDCOM)
        .load()
        .drop("file")
        .collect()
    )
    assert sorted(map(tuple, inline)) == sorted(map(tuple, from_file))
    [f] = (
        registered.read.format("gedcom")
        .option("inline", DEMO_GEDCOM)
        .load()
        .select("file")
        .distinct()
        .collect()
    )
    assert f.file == "<inline>"


def test_inline_empty_content_yields_no_rows(registered):
    df = registered.read.format("gedcom").option("inline", "").load()
    assert df.count() == 0


def test_split_invariance_property(tmp_path):
    """Hypothesis: for ARBITRARY line content (unicode values, CRLF,
    blank/garbage lines, records of any shape) and arbitrary split
    sizes, range-reading a file in pieces equals reading it whole.
    Pure-Python check — no Spark session, so hypothesis can run many
    examples cheaply."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    value = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=12
    )
    line = st.one_of(
        st.builds(
            lambda lvl, tag, v: f"{lvl} {tag}{' ' + v if v else ''}",
            st.integers(0, 3),
            st.sampled_from(["INDI", "FAM", "NAME", "DATE", "X"]),
            value,
        ),
        st.just(""),  # blank
        st.just("garbage line without level"),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(line, min_size=1, max_size=40), st.integers(8, 200))
    def check(lines_list, split_size):
        f = tmp_path / "prop.ged"
        f.write_bytes(("\n".join(lines_list) + "\n").encode("utf-8"))
        size = os.path.getsize(f)
        whole = sorted(_read_range(_RangePartition(str(f), 0, 0, size)))
        pieces = []
        for start in range(0, size, split_size):
            pieces.extend(
                _read_range(
                    _RangePartition(str(f), 0, start, min(start + split_size, size))
                )
            )
        assert sorted(pieces) == whole

    check()


def test_matches_jvm_text_path(registered, ged_dir):
    """Same per-record line content as read_gedcom_lines+assign_records."""
    via_source = registered.read.format("gedcom").load(ged_dir).collect()
    via_text = assign_records(
        read_gedcom_lines(registered, f"{ged_dir}/demo.ged")
    ).collect()

    def record_multiset(rows):
        by_rec = {}
        for r in rows:
            by_rec.setdefault(r.record_seq, []).append(
                (r.level, r.xref or "", r.tag, r.value)
            )
        return sorted(sorted(lines) for lines in by_rec.values())

    assert record_multiset(via_source) == record_multiset(via_text)


def test_filter_pushdown_into_python_source(registered, ged_dir):
    """tag/level filters evaluate inside the Python reader (pushFilters)
    and must not disturb record identity: a pushed tag filter that
    drops level-0 lines still advances record_seq past the skipped
    records."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from node_gedcom_graph_spark.sources.gedcom_datasource import GedcomBatchReader

    # Unit: supported filters are absorbed, others returned by reference.
    r = GedcomBatchReader({"path": ged_dir})
    gt = GreaterThan(("level",), 1)
    residual = list(r.pushFilters([EqualTo(("tag",), "NAME"), In(("level",), (1, 2)), gt]))
    assert residual == [gt] and len(r.pushed) == 2

    # End-to-end: pushed results equal post-scan filtering.
    base = registered.read.format("gedcom").load(ged_dir)
    want = sorted(
        (r.record_seq, r.value) for r in base.collect() if r.tag == "NAME"
    )
    got = sorted(
        (r.record_seq, r.value)
        for r in base.filter(F.col("tag") == "NAME").collect()
    )
    assert got == want and len(got) > 0
    # Distinct record_seq values survive even though level-0 INDI lines
    # were filtered out by the pushed predicate.
    assert len({s for s, _ in got}) >= 3


def test_extract_graph_integration(registered, ged_dir):
    from node_gedcom_graph_spark.gedcom.extract import extract_graph

    lines = registered.read.format("gedcom").load(ged_dir).drop("file")
    g = extract_graph(lines)
    edges = {(r.rel_type) for r in g.edges.collect()}
    assert {"Husband", "Wife", "Child"} <= edges
    assert g.nodes_long.filter("label = 'Individual'").count() > 0


def test_stream_same_batch_files_get_distinct_ids(registered, tmp_path):
    """Two files discovered in ONE microbatch (both present at stream
    start) must not collide on record_seq — their records all start at
    byte offset 0, so the file tag in the high bits is what separates
    them."""
    src = tmp_path / "inbox0"
    src.mkdir()
    (src / "a.ged").write_text("0 @A1@ INDI\n1 NAME A //\n")
    (src / "b.ged").write_text("0 @B1@ INDI\n1 NAME B //\n")
    q = (
        registered.readStream.format("gedcom")
        .load(str(src))
        .writeStream.format("memory")
        .queryName("ged_samebatch")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = registered.sql("SELECT * FROM ged_samebatch").collect()
        seqs = {r.record_seq for r in rows}
        assert len(seqs) == 2  # one distinct id per file's record
        by_seq = {}
        for r in rows:
            by_seq.setdefault(r.record_seq, set()).add(r.file)
        assert all(len(files) == 1 for files in by_seq.values())
    finally:
        q.stop()


def test_stream_discovers_new_files_once(registered, tmp_path):
    src = tmp_path / "inbox"
    src.mkdir()
    (src / "a.ged").write_text("0 @I1@ INDI\n1 NAME A //\n")

    q = (
        registered.readStream.format("gedcom")
        .load(str(src))
        .writeStream.format("memory")
        .queryName("ged_stream_sink")
        .start()
    )
    try:
        def sink_rows():
            return [
                (r.file, r.xref)
                for r in registered.sql("SELECT * FROM ged_stream_sink").collect()
                if r.level == 0
            ]

        q.processAllAvailable()
        assert sorted(sink_rows()) == [(str(src / "a.ged"), "I1")]
        (src / "b.ged").write_text("0 @I2@ INDI\n1 NAME B //\n")
        q.processAllAvailable()
        # The second microbatch appends only b.ged's record — a.ged is
        # not re-read (exactly-once per file; no duplicates in the sink).
        assert sorted(sink_rows()) == [
            (str(src / "a.ged"), "I1"),
            (str(src / "b.ged"), "I2"),
        ]
    finally:
        q.stop()


def test_stream_offsets_stay_compact_over_many_batches(tmp_path):
    """VERDICT r2 item: checkpointed offsets must NOT carry the full
    processed-file list forever. With a bounded max_file_age, after N
    microbatches of steadily arriving (and steadily aging) files the
    offset's recent-set holds only files inside the age horizon — its
    size is bounded by arrival-rate x age, independent of N — while
    every file is still processed exactly once, with per-batch-unique
    file indexes."""
    import os as _os

    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        GedcomStreamReader,
    )

    src = tmp_path / "inbox_compact"
    src.mkdir()
    reader = GedcomStreamReader(
        {"path": str(src), "max_file_age_s": "100"}
    )
    start = reader.initialOffset()
    now = 1_700_000_000.0
    processed: list[str] = []
    offset_sizes: list[int] = []
    for batch in range(30):
        # two new files per batch, each stamped 50s after the previous
        # batch's — so files age out of the horizon after ~2 batches.
        for j in range(2):
            p = src / f"f{batch:03d}_{j}.ged"
            p.write_text(f"0 @I{batch}_{j}@ INDI\n")
            t = now + batch * 50 + j
            _os.utime(p, (t, t))
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        batch_files = [p.file for p in parts]
        assert len(set(p.file_index for p in parts)) == len(parts)
        processed.extend(batch_files)
        offset_sizes.append(len(end["recent"]))
        start = end
    # exactly once, nothing dropped
    assert sorted(processed) == sorted(
        str(src / f"f{b:03d}_{j}.ged") for b in range(30) for j in range(2)
    )
    assert len(processed) == len(set(processed))
    # compaction: the recent set stays bounded by the age horizon
    # (100s / 50s-per-batch -> ~2 batches x 2 files + the new pair),
    # NOT by the 60 files processed.
    assert max(offset_sizes[5:]) <= 8
    assert offset_sizes[-1] < 60


def test_stream_offsets_v1_migration(tmp_path):
    """A legacy v1 offset ({"files": [...]}) from a pre-compaction
    checkpoint must be accepted as a batch start: already-listed files
    are not reprocessed, new ones are."""
    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        GedcomStreamReader,
    )

    src = tmp_path / "inbox_v1"
    src.mkdir()
    a, b = src / "a.ged", src / "b.ged"
    a.write_text("0 @A@ INDI\n")
    b.write_text("0 @B@ INDI\n")
    reader = GedcomStreamReader({"path": str(src)})
    v1_start = {"files": [str(a)]}
    end = reader.latestOffset()
    parts = reader.partitions(v1_start, end)
    assert [p.file for p in parts] == [str(b)]


def test_gedcom_write_roundtrip(spark, tmp_path):
    """parse -> write_gedcom -> parse: the re-read corpus contains
    exactly the same records (as ordered line-tuples) as the original,
    and the extracted graph is identical — record atomicity across the
    distributed write is what makes each part file standalone-valid."""
    from node_gedcom_graph_spark.gedcom.fixtures import DEMO_GEDCOM
    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        register_gedcom_source,
        write_gedcom,
    )

    register_gedcom_source(spark)
    src = tmp_path / "in"
    src.mkdir()
    (src / "demo.ged").write_text(DEMO_GEDCOM)
    lines1 = spark.read.format("gedcom").load(str(src))

    out = str(tmp_path / "out")
    write_gedcom(lines1, out)
    import json as _json
    import os as _os

    manifest = _json.load(open(_os.path.join(out, "_manifest.json")))
    assert sum(f["lines"] for f in manifest["files"]) == lines1.count()

    lines2 = spark.read.format("gedcom").load(out)

    def record_multiset(df):
        rows = df.orderBy("file", "record_seq", "line_no").collect()
        recs = {}
        for r in rows:
            # normalize absent xref/value: the writer emits nothing
            # for None OR empty, so both re-read identically
            recs.setdefault((r.file, r.record_seq), []).append(
                (r.level, r.xref or "", r.tag, r.value or "")
            )
        return sorted(tuple(v) for v in recs.values())

    assert record_multiset(lines2) == record_multiset(lines1)


def test_gedcom_writer_rejects_unordered_partitions(spark, tmp_path):
    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        register_gedcom_source,
    )

    register_gedcom_source(spark)
    df = spark.createDataFrame(
        [
            ("f", 2, 10, 0, "I2", "INDI", ""),
            ("f", 1, 5, 0, "I1", "INDI", ""),  # out of order on purpose
        ],
        "file string, record_seq bigint, line_no bigint, "
        "level int, xref string, tag string, value string",
    ).coalesce(1)
    import pytest as _pytest

    with _pytest.raises(Exception):
        df.write.format("gedcom").mode("append").save(str(tmp_path / "o"))


def test_stream_offset_watermark_regression_no_reemission(tmp_path):
    """Regression (review finding): after a driver restart the fresh
    reader's local watermark floor is 0; if the newest files were
    deleted, latestOffset computes a LOWER watermark and an aged-out,
    long-processed file can re-enter the recent set. partitions() must
    not re-emit it — v3 offsets carry mtimes so the age contract is
    re-applied against the CHECKPOINTED start watermark."""
    import os as _os
    import time as _time

    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        GedcomStreamReader,
    )

    d = str(tmp_path)
    now = _time.time()
    age = 100.0  # tight horizon for the test

    old = _os.path.join(d, "old.ged")
    new = _os.path.join(d, "new.ged")
    for f in (old, new):
        with open(f, "w") as fh:
            fh.write("0 @I1@ INDI\n")
    # old processed long ago; new is fresh
    _os.utime(old, (now - 300, now - 300))
    _os.utime(new, (now, now))

    r1 = GedcomStreamReader({"path": d, "max_file_age_s": str(age)})
    start = r1.initialOffset()
    end1 = r1.latestOffset()
    # first batch: only 'new' is within the horizon; 'old' is ignored
    # as older-than-horizon (the documented max_file_age contract)
    batch1 = {p.file for p in r1.partitions(start, end1)}
    assert batch1 == {new}

    # restart: newest file deleted, FRESH reader (floor resets)
    _os.remove(new)
    r2 = GedcomStreamReader({"path": d, "max_file_age_s": str(age)})
    end2 = r2.latestOffset()
    assert end2["wm"] < end1["wm"]  # the regression scenario is real
    # 'old' re-enters end2's recent set (wm regressed to old's mtime)…
    assert old in end2["recent"]
    # …but partitions() against the checkpointed offset re-emits nothing
    assert r2.partitions(end1, end2) == []
