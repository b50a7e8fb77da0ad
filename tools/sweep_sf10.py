"""Engine-only sf10 (100x) sweep: run registered queries against the
synthesized sf10 tables (tools/make_sf_scale.py, 100 key-offset copies
of sf0.1 — 500k documents in 100-way dup groups, 200k embeddings, 60M
lineitem, 100M events) and record wall time + row count per query.

Round-5's 28-query tier caught five real scale hazards (a 38 GB
shuffle spill that filled the disk, two never-binding probe caps);
this widens the tier to the rest of the registry (round-6 verdict
item 1). Two guards the sf1 sweep didn't need, both lessons from
that round:

- WATCHDOG: a per-query wall ceiling (default 900 s) enforced by a
  timer thread calling ``cancelJobGroup`` — at 100x a quadratic plan
  is hours, not minutes, and the sweep must survive to measure the
  rest.
- DISK GUARD: free-space check before each query; below the floor the
  sweep STOPS (recording why) instead of filling the disk like the r5
  dedup_cluster_canonical spill did.

Usage:
  python tools/sweep_sf10.py [sf10_dir] [out.json] [name ...]
Default names: every registered query not already covered by
SWEEP_SF10_r5.json, i.e. the never-swept-at-100x tail.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

QUERY_TIMEOUT_S = int(os.environ.get("SWEEP_SF10_TIMEOUT_S", "900"))
DISK_FLOOR_GB = 12


def _root_cause(exc: Exception) -> str:
    """First line of the exception PLUS the deepest Java ``Caused by:``
    frame. The r9 artifact recorded bare ``An error occurred while
    calling o144.save.`` for the sweep's only unexplained failure — the
    py4j first line names the proxy object, never the cause, so the
    artifact was undiagnosable (r9 verdict item 1). The full py4j text
    carries the whole Java stack; keep the root."""
    text = str(exc)
    first = text.split("\n")[0][:200]
    caused = [
        ln.strip()
        for ln in text.split("\n")
        if ln.strip().startswith("Caused by:")
    ]
    if caused:
        return f"{first} | root: {caused[-1][:300]}"
    # No Caused-by chain: fall back to the first line that looks like a
    # Java exception class with a message (the driver-side error).
    for ln in text.split("\n")[1:]:
        ln = ln.strip()
        if ln and ("Exception" in ln or "Error" in ln) and ":" in ln:
            return f"{first} | root: {ln[:300]}"
    return first


def _fresh_session(master: str):
    from node_gedcom_graph_spark.session import get_spark

    return get_spark(
        app_name="sweep_sf10",
        master=master,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = args[0] if args else os.path.join(_REPO, ".benchdata", "sf10")
    out_path = args[1] if len(args) > 1 else None
    names = args[2:]

    import __spark_entry__ as ent

    qs = ent.queries()
    done: dict = {}
    carried: dict = {}
    if out_path and os.path.exists(out_path):
        try:  # resume: keep prior entries, sweep only the remainder
            prev_doc = json.load(open(out_path))
            done = prev_doc.get("queries", {})
            # Carry forward hand-written annotation keys (what/notes/…):
            # a resume run must never silently drop the committed
            # structural notes (it did once, r8).
            carried = {
                k: v
                for k, v in prev_doc.items()
                if k
                not in ("sf_dir", "timeout_s", "queries", "over_60s",
                        "timeouts", "errors", "stopped")
            }
        except Exception:
            done = {}
    if not names:
        prior: set[str] = set(done)
        r5 = os.path.join(_REPO, "SWEEP_SF10_r5.json")
        if os.path.exists(r5):
            d = json.load(open(r5))
            prior |= set(d.get("pre_fix", {})) | set(d.get("post_fix", {}))
        names = [n for n in qs if n not in prior]

    # Explicit master: get_spark's no-master fallback boots a 1g-heap
    # JVM (round-5 lesson).
    master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    spark = _fresh_session(master)

    out = {
        "sf_dir": sf_dir,
        "timeout_s": QUERY_TIMEOUT_S,
        **carried,
        "queries": dict(done),
        "over_60s": [n for n, v in done.items() if v.get("wall_s", 0) > 60],
        "timeouts": [n for n, v in done.items() if v.get("timeout")],
        "errors": [n for n, v in done.items() if v.get("error")],
    }
    for name in names:
        free_gb = shutil.disk_usage("/").free / 1e9
        if free_gb < DISK_FLOOR_GB:
            out["stopped"] = f"disk floor: {free_gb:.1f} GB free < {DISK_FLOOR_GB} GB"
            print(out["stopped"], flush=True)
            break
        group = f"sweep:{name}"
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
        timed_out = threading.Event()

        def _kill(sp=spark, g=group, ev=timed_out):
            ev.set()
            try:
                sp.sparkContext.cancelJobGroup(g)
            except Exception:
                pass

        watchdog = threading.Timer(QUERY_TIMEOUT_S, _kill)
        watchdog.start()
        # Per-query steal + process-tree CPU columns (r9): the sweep is
        # a one-pass measurement on a steal-bursty VM, so every wall
        # needs its weather attribution next to it (bench.py got these
        # in r8; sweep walls were the remaining unattributed numbers).
        from bench import _steal_jiffies, _tree_cpu_s

        steal0 = _steal_jiffies()
        cpu0 = _tree_cpu_s()
        t0 = time.monotonic()
        try:
            # NOT .count(): Catalyst prunes plan branches that cannot
            # change the row count (e.g. a left-outer join whose right
            # side has provably-unique keys gets ELIMINATED), so count()
            # under-measures any query with such a shape — observed 3.4 s
            # vs 262 s real wall on dedup_substring_stats_by_source. The
            # noop sink materializes every column of every row; the
            # observation carries the row count out without a second run.
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation(f"sweep_{name}_{int(t0)}")
            (
                qs[name](spark, sf_dir)
                .observe(obs, F.count(F.lit(1)).alias("rows"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            rows = obs.get["rows"]
            wall = round(time.monotonic() - t0, 1)
            steal = round(
                (_steal_jiffies() - steal0) / os.sysconf("SC_CLK_TCK"), 1
            )
            # If a pyspark.daemon died mid-query (streaming teardown),
            # its accumulated children's CPU leaves the process tree
            # and the delta can go NEGATIVE (observed -10528s on
            # stream_dedup_substring_windows at sf100). Record null +
            # an explicit flag, NOT a clamped 0.0 — downstream CPU
            # comparisons must not read "attribution lost" as a real
            # zero-CPU query (r9 ADVICE).
            cpu_raw = _tree_cpu_s() - cpu0
            entry = {
                "rows": rows,
                "wall_s": wall,
                "steal_s": steal,
                "cpu_s": round(cpu_raw, 1) if cpu_raw >= 0 else None,
            }
            if cpu_raw < 0:
                entry["cpu_attribution_lost"] = True
            out["queries"][name] = entry
            cpu = entry["cpu_s"]
            if wall > 60:
                out["over_60s"].append(name)
            print(
                f"OK    {name}: {rows} rows [{wall}s, steal {steal}s, "
                f"cpu {cpu}s]",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — sweep must survive
            wall = round(time.monotonic() - t0, 1)
            msg = _root_cause(exc)
            if timed_out.is_set():
                out["queries"][name] = {"timeout": True, "wall_s": wall}
                out["timeouts"].append(name)
                print(f"TIMEOUT {name} [{wall}s]", flush=True)
            else:
                out["queries"][name] = {"error": msg, "wall_s": wall}
                out["errors"].append(name)
                print(f"ERR   {name}: {msg}", flush=True)
            try:
                spark.sql("SELECT 1").collect()
            except Exception:
                print("      session dead — rebuilding JVM", flush=True)
                try:
                    spark.stop()
                except Exception:
                    pass
                from pyspark import SparkContext
                from pyspark.sql import SparkSession

                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
                with SparkContext._lock:
                    SparkContext._active_spark_context = None
                    SparkContext._gateway = None
                    SparkContext._jvm = None
                spark = _fresh_session(master)
        finally:
            watchdog.cancel()
            try:
                spark.sparkContext.setJobGroup("", "")
            except Exception:
                pass
            # The format-roundtrip queries leave a table copy per
            # format in scratch (33 GB at sf100) — clean between
            # queries so leftovers can't starve a later query's
            # shuffle spill (tripped the disk floor mid-sweep, r9).
            try:
                from node_gedcom_graph_spark.operators.llmprep3 import (
                    clear_roundtrip_scratch,
                )

                clear_roundtrip_scratch()
            except Exception:
                pass
        if out_path:  # checkpoint after every query — a crash keeps data
            with open(out_path, "w") as fh:
                json.dump(out, fh, indent=1)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(
        f"{len(out['queries']) - len(out['errors']) - len(out['timeouts'])} ok, "
        f"{len(out['errors'])} err, {len(out['timeouts'])} timeout, "
        f"over-60s: {out['over_60s']}"
    )


if __name__ == "__main__":
    main()
