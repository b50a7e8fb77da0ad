"""Neo4j bulk-import CSV export with atomic staging-dir publish.

Re-expresses the reference's sink + publish machinery:
- per-(family, tag) CSV fan-out (csv_writer.js:85-113 / SURVEY op 18)
  -> one header'd CSV dataset per nodes-<TAG> / relationships-<TAG>,
  with the Neo4j bulk header columns ('Gedcom Id:ID', ':LABEL',
  ':START_ID', ':END_ID', ':TYPE' — csv_writer.js:126,140-144,183).
  Spark writes headers from the schema, fixing the reference's
  first-record-wins header quirk (documented divergence, SURVEY §7.3).
- neo4j-import argv construction (index.js:80-84, neo4j.js:79).
- atomic publish: stage -> swap live to backup -> staging to live,
  rollback on failure (neo4j.js:20-51,84-95 / ops 21-23).
- optional full lifecycle (`run_import_publish` / CLI --run-import):
  spawn `neo4j-admin database import` + DB stop/start, with the
  swap/restore driven by real exit codes — the reference's
  import->stop->swap->start state machine (neo4j.js:84-109 / op 20).

Scale: each per-tag dataset is written partitioned (many part files) —
that IS the scalable layout; neo4j-admin import accepts multiple files
per group. No coalesce(1) anywhere.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from node_gedcom_graph_spark.gedcom.extract import GedcomGraph


def export_neo4j_csvs(graph: GedcomGraph, out_dir: str) -> dict[str, str]:
    """Write nodes-<TAG>/ and relationships-<TAG>/ CSV datasets under
    ``out_dir``; returns {group_name: path}. Deterministic layout, one
    directory per (family, tag) — the reference's fan-out, lifted to
    partitioned datasets."""
    os.makedirs(out_dir, exist_ok=True)
    outputs: dict[str, str] = {}

    root_tags = [r[0] for r in graph.nodes_long.select("root_tag").distinct().collect()]
    for tag in sorted(root_tags):
        wide = graph.nodes_wide(tag)
        # 'Gedcom Id:ID' is already a flat key in the pivot (extract.py
        # id_props); order it first like the reference's header.
        prop_cols = [
            c for c in wide.columns if c not in ("record_seq", "record_id", "label")
        ]
        prop_cols.sort(key=lambda c: (c != "Gedcom Id:ID", c))
        ordered = wide.select(
            *[F.col(f"`{c}`") for c in prop_cols],
            F.col("label").alias(":LABEL"),
        )
        path = os.path.join(out_dir, f"nodes-{tag}")
        ordered.write.mode("overwrite").option("header", True).csv(path)
        outputs[f"nodes-{tag}"] = path

    edge_tags = [r[0] for r in graph.edges.select("edge_tag").distinct().collect()]
    for tag in sorted(edge_tags):
        rels = graph.edges.filter(F.col("edge_tag") == tag).select(
            F.col("src").alias(":START_ID"),
            F.col("dst").alias(":END_ID"),
            F.col("rel_type").alias(":TYPE"),
        )
        path = os.path.join(out_dir, f"relationships-{tag}")
        rels.write.mode("overwrite").option("header", True).csv(path)
        outputs[f"relationships-{tag}"] = path
    return outputs


def build_import_args(outputs: dict[str, str], into: str) -> list[str]:
    """neo4j-import argv (index.js:80-84 + neo4j.js:79): --into first,
    then one --nodes/--relationships per generated group."""
    args = ["--into", into]
    for group in sorted(outputs):
        flag = "--nodes" if group.startswith("nodes-") else "--relationships"
        args.extend([flag, outputs[group]])
    return args


def atomic_publish(staging_dir: str, live_dir: str) -> str:
    """Swap ``staging_dir`` into place at ``live_dir`` atomically:
    live -> live.bak, staging -> live; on a failed swap the backup is
    restored (neo4j.js:31-51). Returns the backup path (caller may
    delete it after verifying the new live dir)."""
    backup = live_dir + ".bak-" + uuid.uuid4().hex[:8]
    had_live = os.path.exists(live_dir)
    if had_live:
        os.rename(live_dir, backup)
    try:
        os.rename(staging_dir, live_dir)
    except Exception:
        if had_live:
            # restore: remove any partial live dir, put the backup back
            if os.path.exists(live_dir):
                shutil.rmtree(live_dir)
            os.rename(backup, live_dir)
        raise
    return backup if had_live else ""


def run_import_publish(
    outputs: dict[str, str],
    db_path: str,
    bindir: str = "/usr/bin",
    runner=None,
) -> str:
    """Execute the reference's full import lifecycle (ops 20-23,
    neo4j.js:84-109): bulk-import into ``db_path + '.tmp'``; on import
    success stop the DB, swap (live -> .bak, .tmp -> live), start the
    DB; a failed start restores the backup and aborts; a failed import
    aborts with the live DB untouched. Returns the backup path ('' if
    there was no live dir — first publish, which the reference assumes
    never happens; handled gracefully here).

    ``runner``: callable(argv: list[str]) -> int exit code. Defaults to
    a real subprocess call; injectable so tests drive every exit-code
    branch without Neo4j installed. The stop exit code is ignored, as
    in the reference (its stopProcess handler never checks ``code``).
    """
    import subprocess

    if runner is None:
        runner = lambda argv: subprocess.call(argv)  # noqa: E731

    temp = db_path + ".tmp"
    backup = db_path + ".bak"
    neo4j_bin = os.path.join(bindir, "neo4j")
    import_bin = os.path.join(bindir, "neo4j-admin")

    # _setupTempDir (neo4j.js:20-29): fresh temp target for the import.
    if os.path.exists(temp):
        shutil.rmtree(temp)
    os.makedirs(temp)

    import_argv = (
        [import_bin, "database", "import", "full"]
        + build_import_args(outputs, into=temp)
    )
    code = runner(import_argv)
    if code != 0:
        # neo4j.js:103-106 — abort; live dir untouched.
        raise RuntimeError(f"Import failed. Exited {code}. Abort.")

    runner([neo4j_bin, "stop"])

    # _swapDirs (neo4j.js:31-44): drop the previous backup, then
    # real -> backup, temp -> real.
    if os.path.exists(backup):
        shutil.rmtree(backup)
    had_live = os.path.exists(db_path)
    if had_live:
        os.rename(db_path, backup)
    os.rename(temp, db_path)

    code = runner([neo4j_bin, "start"])
    if code != 0:
        # _restoreDirs (neo4j.js:46-51): drop the new live dir, put the
        # backup back, then abort.
        if had_live:
            shutil.rmtree(db_path)
            os.rename(backup, db_path)
        raise RuntimeError("Starting neo4j failed.  Abort.")
    return backup if had_live else ""


def observed_counts(graph: GedcomGraph) -> dict[str, int]:
    """Row-level pipeline metrics via ``df.observe`` (SURVEY op 26: the
    reference's read/write/skip event counters, re-expressed as
    accumulator-backed observations riding the job that materializes the
    data — no second scan, unlike a separate ``count()``).
    """
    from pyspark.sql import Observation

    node_obs = Observation("node_metrics")
    edge_obs = Observation("edge_metrics")
    nodes = graph.nodes_long.observe(
        node_obs,
        F.count(F.lit(1)).alias("n_property_rows"),
        F.approx_count_distinct("record_id").alias("n_records_approx"),
    )
    edges = graph.edges.observe(edge_obs, F.count(F.lit(1)).alias("n_edges"))
    nodes.write.format("noop").mode("overwrite").save()
    edges.write.format("noop").mode("overwrite").save()
    return {**node_obs.get, **edge_obs.get}
