"""Dump `.explain("formatted")` per query into individual files —
the optimization-round evidence format (`plans/r10/<q>_before.txt` /
`_after.txt`).

Usage:
  python tools/dump_plans_dir.py OUT_DIR SUFFIX QUERY [QUERY ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query; a query not
present in the registry (e.g. net-new when dumping the "before" side
from an older commit) is skipped with a note on stderr.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    from node_gedcom_graph_spark.operators import all_queries
    from node_gedcom_graph_spark.session import get_spark

    spark = get_spark(
        app_name="dump-plans-dir",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"skip (not registered here): {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') @ {sf_dir} ({suffix})\n\n")
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
