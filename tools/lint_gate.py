"""Recount committed gate artifacts: the summary block must equal the
census of the per-query rows (r7 shipped 279/289 against 282/292 rows
after a partial-run merge skipped the summary). ``--fix`` rewrites the
summary in place from the rows.

Usage: python tools/lint_gate.py [--fix] GATE_*.json ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_local import lint_artifact, summarize_rows  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    fix = "--fix" in args
    paths = [a for a in args if a != "--fix"]
    bad = 0
    for p in paths:
        with open(p) as fh:
            art = json.load(fh)
        errs = lint_artifact(art)
        if not errs:
            print(f"OK    {p}")
            continue
        if fix:
            reg = max(
                art.get("summary", {}).get("registered", 0),
                len(art.get("queries", {})),
            )
            art["summary"] = summarize_rows(art.get("queries", {}), registered=reg)
            with open(p, "w") as fh:
                json.dump(art, fh, indent=1)
                fh.write("\n")
            print(f"FIXED {p}: " + "; ".join(errs))
        else:
            bad += 1
            print(f"STALE {p}: " + "; ".join(errs))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
