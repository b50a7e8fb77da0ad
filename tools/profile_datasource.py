"""GEDCOM DataSource scale-proof artifact generator (round-5 verdict
item 8).

The extraction scaling sweep (PROFILE_r4_gedcom.json) measures the
declarative pipeline over SYNTHETIC IN-MEMORY lines; the byte-range
splitter of the pluggable ``format("gedcom")`` Python DataSource had
never been profiled on a multi-GB on-disk file. This tool, solo on
local[32]:

1. writes ~N_INDI synthetic individuals through the DISTRIBUTED writer
   path (``write_gedcom`` -> record-atomic part-*.ged files),
2. concatenates the parts into ONE multi-GB .ged (records are
   independent, so concatenation of valid parts is a valid file),
3. reads the single big file back through ``format("gedcom")`` and
   records split parallelism (ceil(size / 32 MB) byte-range splits),
   raw scan throughput, and full parse->extract throughput, with
   /proc/stat steal accounting like bench.py.

Writes one JSON document to stdout; commit as
PROFILE_r5_datasource.json. The pass bar from the verdict: >= 8-way
split parallelism and extract throughput within 2x of the in-memory
sweep (153.8 krec/s at 500k, 193.9 at 5M).

Usage: python tools/profile_datasource.py [n_indi]   (default 8M)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from node_gedcom_graph_spark.session import get_spark  # noqa: E402

TMP = os.path.join(_REPO, "tmp_profile_ged")


def _steal_jiffies() -> int:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def _timed(fn):
    s0, t0 = _steal_jiffies(), time.monotonic()
    out = fn()
    wall = time.monotonic() - t0
    steal = (_steal_jiffies() - s0) / os.sysconf("SC_CLK_TCK")
    return out, round(wall, 3), round(steal, 1)


def main() -> None:
    n_indi = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark(
        app_name="profile-datasource",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    from node_gedcom_graph_spark.gedcom.extract import extract_graph
    from node_gedcom_graph_spark.gedcom.fixtures import synth_gedcom_lines
    from node_gedcom_graph_spark.sources.gedcom_datasource import (
        DEFAULT_SPLIT_SIZE,
        register_gedcom_source,
        write_gedcom,
    )

    register_gedcom_source(spark)
    shutil.rmtree(TMP, ignore_errors=True)
    parts_dir = os.path.join(TMP, "parts")
    result: dict = {"n_indi": n_indi, "split_size": DEFAULT_SPLIT_SIZE}
    try:
        # -- 0. write-path BREAKDOWN (r5 verdict item 6: is the writer
        # wall record-atomicity overhead or a missing spread?). Three
        # nested phases, each a superset of the previous:
        #   synth  = generate the lines IR, noop sink (no shuffle)
        #   layout = + the record-atomic repartition(file, record_seq)
        #            and within-partition sort, still noop sink
        #   write  = + the Python DataSource writer (text serialization)
        # layout-synth = shuffle+sort cost; write-layout = writer cost.
        lines = synth_gedcom_lines(spark, n_indi).withColumn(
            "file", F.lit("synth.ged")
        )
        _, p_synth, st_synth = _timed(
            lambda: lines.write.format("noop").mode("overwrite").save()
        )
        _, p_layout, st_layout = _timed(
            lambda: lines.repartition("file", "record_seq")
            .sortWithinPartitions("file", "record_seq", "line_no")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        result["write_breakdown"] = {
            "synth_only_s": p_synth,
            "synth_steal_s": st_synth,
            "plus_layout_s": p_layout,
            "layout_steal_s": st_layout,
        }

        # -- 1. distributed writer path ---------------------------------
        _, w_wall, w_steal = _timed(lambda: write_gedcom(lines, parts_dir))
        with open(os.path.join(parts_dir, "_manifest.json")) as fh:
            manifest = json.load(fh)
        result["write"] = {
            "wall_s": w_wall,
            "steal_s": w_steal,
            "part_files": len(manifest["files"]),
            "lines": sum(f["lines"] for f in manifest["files"]),
            "records": sum(f["records"] for f in manifest["files"]),
            "krec_per_s": round(n_indi / w_wall / 1e3, 1),
        }
        assert result["write"]["records"] == n_indi

        # -- 2. one multi-GB file --------------------------------------
        big = os.path.join(TMP, "big.ged")
        with open(big, "wb") as out:
            for p in sorted(glob.glob(os.path.join(parts_dir, "part-*.ged"))):
                with open(p, "rb") as src:
                    shutil.copyfileobj(src, out, 16 * 1024 * 1024)
        shutil.rmtree(parts_dir)
        size = os.path.getsize(big)
        result["file_bytes"] = size

        # -- 3a. raw datasource scan (filter pushed to the reader) ------
        df = spark.read.format("gedcom").load(big)
        n_splits = df.rdd.getNumPartitions()
        result["n_splits"] = n_splits
        n_rec, s_wall, s_steal = _timed(
            lambda: spark.read.format("gedcom")
            .load(big)
            .filter("level = 0")
            .count()
        )
        assert n_rec == n_indi, (n_rec, n_indi)
        result["scan"] = {
            "wall_s": s_wall,
            "steal_s": s_steal,
            "krec_per_s": round(n_rec / s_wall / 1e3, 1),
        }

        # -- 3b. full parse -> extract through the datasource -----------
        def run_extract():
            g = extract_graph(
                spark.read.format("gedcom").load(big), max_depth=2,
                persist=True,
            )
            g.nodes_long.write.format("noop").mode("overwrite").save()
            g.edges.write.format("noop").mode("overwrite").save()
            g.unpersist()

        from bench import _tree_cpu_s  # steal-invariant CPU column (r8)

        walls = []

        def one_run():
            c0 = _tree_cpu_s()
            _, e_wall, e_steal = _timed(run_extract)
            walls.append(
                {
                    "wall_s": e_wall,
                    "steal_s": e_steal,
                    "cpu_s": round(_tree_cpu_s() - c0, 1),
                }
            )

        for _ in range(2):  # cold, then warm
            one_run()
        # bench.py's steal rule (tightened r8 to match the bench's
        # retry-until-quiet bar): a hypervisor burst during the
        # measured pass makes the path read slower than it is.
        # Re-measure (bounded) while the best pass was itself
        # polluted; the per-run cpu_s column keeps even an
        # all-polluted artifact comparable across rounds.
        while (
            len(walls) < 6
            and min(walls, key=lambda w: w["wall_s"])["steal_s"] > 2
        ):
            one_run()
        # Pair the published cpu_s with the SAME run that won on wall
        # (r8's min-over-warm cpu could come from a different run than
        # best_wall_s, making the pair internally inconsistent); the
        # full per-run pairs stay in "runs".
        best_run = min(walls, key=lambda w: w["wall_s"])
        best = best_run["wall_s"]
        result["extract"] = {
            "runs": walls,
            "best_wall_s": best,
            "krec_per_s": round(n_indi / best / 1e3, 1),
            "best_cpu_s": best_run["cpu_s"],
            "in_memory_sweep_krec_per_s": {"500k": 153.8, "5M": 193.9},
        }
        print(json.dumps(result, indent=1))
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
