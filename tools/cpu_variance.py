"""Per-query CPU-estimator variance bound (r9 verdict item 3).

Round 9 left an ambiguity: the builder's min-of-passes table showed two
UNCHANGED operators (`decontaminate_ngram_overlap` +17.8%,
`dsir_importance_weights` +13.3% CPU) regressing on the quiet host,
while the round's common-set delta disagreed with the driver artifact
by 40 points. Either the session-level changes leaked real interference
into untouched code, or the per-query CPU estimator's noise floor is of
the same order as the reported deltas. This tool decides that by
MEASUREMENT: run each target query N times back-to-back in one session
(same JVM, same cache discipline the bench uses), record wall / steal /
process-tree CPU per pass, and publish min / median / max / relative
spread per query. If median-vs-min spread on a quiet host is ~the size
of the reported regressions, the deltas are estimator noise and the
round table must carry the bound; a spread far below them would instead
confirm real interference worth bisecting.

Usage:
  python tools/cpu_variance.py [N] [query ...] [--json=OUT]

Defaults: N=7; queries = the two r9-regressed operators plus two
stable anchors (one shuffle-heavy, one scan-heavy) for reference.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import SF_DIR, CPUS, _steal_jiffies, _tree_cpu_s  # noqa: E402

DEFAULT_QUERIES = [
    "decontaminate_ngram_overlap",
    "dsir_importance_weights",
    "dedup_minhash_lsh",
    "pricing_summary",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")),
        None,
    )
    n = int(args[0]) if args and args[0].isdigit() else 7
    names = (args[1:] if args and args[0].isdigit() else args) or DEFAULT_QUERIES

    from node_gedcom_graph_spark.session import get_spark

    spark = get_spark(
        app_name="cpu_variance",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    import __spark_entry__ as ent
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    qs = ent.queries()
    doc: dict = {"sf_dir": SF_DIR, "passes": n, "queries": {}}
    for name in names:
        if name not in qs:
            print(f"skip unknown query {name}")
            continue
        rows = []
        for i in range(n):
            obs = Observation(f"var_{name}_{i}_{int(time.monotonic()*1e3)}")
            steal0, cpu0, t0 = _steal_jiffies(), _tree_cpu_s(), time.monotonic()
            (
                qs[name](spark, SF_DIR)
                .observe(obs, F.count(F.lit(1)).alias("rows"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            _ = obs.get["rows"]
            rows.append(
                {
                    "wall_s": round(time.monotonic() - t0, 3),
                    "cpu_s": round(_tree_cpu_s() - cpu0, 3),
                    "steal_s": round(
                        (_steal_jiffies() - steal0) / os.sysconf("SC_CLK_TCK"),
                        2,
                    ),
                }
            )
        cpus = [r["cpu_s"] for r in rows]
        mn, md, mx = min(cpus), statistics.median(cpus), max(cpus)
        doc["queries"][name] = {
            "passes": rows,
            "cpu_min_s": round(mn, 3),
            "cpu_median_s": round(md, 3),
            "cpu_max_s": round(mx, 3),
            # How far an unlucky single pass (or a short min-of-3) can
            # sit above the true uncontended floor, in the units the
            # round-over-round delta table uses.
            "median_over_min_pct": round(100.0 * (md - mn) / mn, 1) if mn else None,
            "max_over_min_pct": round(100.0 * (mx - mn) / mn, 1) if mn else None,
            "total_steal_s": round(sum(r["steal_s"] for r in rows), 1),
        }
        print(f"{name}: min {mn} median {md} max {mx} cpu_s "
              f"(+{doc['queries'][name]['median_over_min_pct']}% median, "
              f"+{doc['queries'][name]['max_over_min_pct']}% max)",
              flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
