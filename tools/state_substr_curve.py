"""Measure stream_dedup_substring_windows' state-store size curve
(round-7 verdict item 2): state rows must equal the corpus's distinct
W-char window count (one row per distinct window — the op's documented
bound, pinned at sf0.001 by tests/test_r8_fixes.py) and the per-row
store cost stays flat, so state bytes scale linearly with distinct
windows and nothing else. The drained table IS the product (the
ExactSubstr first-occurrence index); this artifact is the committed
evidence that the sf10 wall is the state-store commit of that
product-sized table, not an unbounded leak.

Usage: python tools/state_substr_curve.py [out.json] [sf_dir ...]
Default tiers: /root/testdata/sf{0.001,0.01,0.1} and
.benchdata/sf10 if present.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    tiers = sys.argv[2:]
    if not tiers:
        tiers = [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ]
        sf10 = os.path.join(_REPO, ".benchdata", "sf10")
        if os.path.isdir(sf10):
            tiers.append(sf10)

    from node_gedcom_graph_spark.session import get_spark
    from node_gedcom_graph_spark.streaming.pipeline import (
        stream_dedup_substring_windows,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="state_substr_curve",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    curve = []
    for sf_dir in tiers:
        t0 = time.monotonic()
        rows_out = stream_dedup_substring_windows(spark, sf_dir).count()
        wall = round(time.monotonic() - t0, 1)
        m = dict(stream_dedup_substring_windows.last_state_metrics)
        m.update(
            sf_dir=sf_dir,
            dup_window_rows_out=rows_out,
            wall_s=wall,
            bytes_per_row=(
                round(m["state_bytes"] / m["state_rows"], 1)
                if m.get("state_rows")
                else None
            ),
        )
        curve.append(m)
        print(json.dumps(m), flush=True)
    doc = {
        "what": (
            "stream_dedup_substring_windows state-size curve: state rows "
            "== distinct W-char windows (the product-sized first-"
            "occurrence index), flat bytes/row => linear state growth; "
            "walls measured on this host (see host_steal caveats in "
            "BENCH artifacts)"
        ),
        "curve": curve,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
