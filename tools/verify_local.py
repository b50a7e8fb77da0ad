"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares:
- row count
- column names (sorted)
- order-insensitive value hash (rows sorted by all columns; floats
  rounded to 6 decimals; timestamps normalized to microseconds)

Usage: python tools/verify_local.py [sf_dir] [query ...] [--json=OUT]

``--json=OUT`` additionally writes the committed gate-artifact shape
(the GATE_SF01_r{N}.json format): per-query status/rows/wall plus a
summary block.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted(
        "\x01".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for r in normed:
        h.update(r.encode("utf-8"))
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    import json

    args = sys.argv[1:]
    json_out = None
    for a in list(args):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    art: dict = {
        "what": f"complete oracle gate (tools/verify_local.py) run at {sf_dir}",
        "queries": {},
    }

    import __spark_entry__ as ent
    from node_gedcom_graph_spark.session import get_spark

    # local[16]/16: the two heaviest gate entries (fuzzy's 2M-row
    # levenshtein join, the 1M-event Python UDTF) are compute-bound and
    # scale near-linearly with cores; 8 cores left half the host idle
    # while those walls dominated GATE_SF01 (r5: 22.4 s / 20.5 s).
    spark = get_spark(
        app_name="verify_local", master="local[16]", shuffle_partitions=16
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = ent.queries(), ent.oracle_sql()
    floors = ent.expected_rows()
    empty_reasons = ent.empty_reasons()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            art["queries"][name] = {"status": "FAIL", "err": str(e)[:300]}
            n_fail += 1
            continue
        # Vacuity floor: agree-on-empty (or agree-on-too-few) is a
        # FAILURE unless the registry declared a reasoned 0 floor.
        floor = floors.get(name, 1)
        if len(srows) < floor:
            print(
                f"FAIL  {name}: VACUOUS — {len(srows)} rows < declared "
                f"floor {floor} (agree-on-empty is not a pass)"
            )
            art["queries"][name] = {
                "status": "FAIL", "rows": len(srows),
                "wall_s": round(time.monotonic() - t0, 1),
                "problems": [f"vacuous: rows={len(srows)} < floor={floor}"],
            }
            n_fail += 1
            continue
        if floor == 0 and len(srows) == 0:
            # Legitimate declared-empty result: record the reason so
            # the artifact shows it was deliberate.
            art.setdefault("declared_empty", {})[name] = empty_reasons.get(
                name, "?"
            )
        elif srows and all(
            v is None or v == "" for row in srows for v in row
        ):
            # Degenerate-but-nonempty: every cell NULL/empty. Not an
            # automatic failure (a query OF nulls could be legitimate)
            # but it is surfaced loudly for the audit.
            print(f"WARN  {name}: all {len(srows)} rows are entirely NULL/empty")
            art.setdefault("degenerate_warn", []).append(name)
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            art["queries"][name] = {
                "status": "ROWS", "rows": len(srows),
                "wall_s": round(time.monotonic() - t0, 1),
            }
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            art["queries"][name] = {"status": "FAIL", "err": str(e)[:300]}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            hs, ho = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            if hs != ho:
                problems.append("value hash mismatch")
                # print first differing normalized rows to debug
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ns = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in srows)
                no = sorted("|".join(_norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ns, no):
                    if a != b:
                        problems.append(f"  spark: {a}")
                        problems.append(f"  duck : {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            art["queries"][name] = {
                "status": "FAIL", "rows": len(srows),
                "wall_s": round(time.monotonic() - t0, 1),
                "problems": problems[:3],
            }
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.monotonic()-t0:.1f}s]")
            art["queries"][name] = {
                "status": "PASS", "rows": len(srows),
                "wall_s": round(time.monotonic() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        # The summary is RECOMPUTED from the per-query rows just
        # written — never from the loop counters — so the artifact can
        # never carry a summary that disagrees with its own rows
        # (GATE_SF01_r7.json shipped 279/289 against 282/292 rows after
        # rows were merged in without touching the summary). Merging
        # partial runs therefore stays safe: rerun with --json and the
        # census always reflects the final row set.
        art["summary"] = summarize_rows(art["queries"], registered=len(qs))
        with open(json_out, "w") as fh:
            json.dump(art, fh, indent=1)
            fh.write("\n")
        errs = lint_artifact(json.load(open(json_out)))
        if errs:  # pragma: no cover - summarize_rows makes this unreachable
            raise AssertionError(f"gate artifact self-check failed: {errs}")
    spark.stop()
    return 1 if n_fail else 0


def summarize_rows(rows: dict, registered: int | None = None) -> dict:
    """Census of a gate artifact's per-query rows (the only source of
    truth for the summary block)."""
    census = {"pass": 0, "fail": 0, "rows_only": 0}
    for r in rows.values():
        st = r.get("status")
        if st == "PASS":
            census["pass"] += 1
        elif st == "ROWS":
            census["rows_only"] += 1
        else:
            census["fail"] += 1
    census["registered"] = len(rows) if registered is None else registered
    return census


def lint_artifact(art: dict) -> list[str]:
    """Errors iff a gate artifact's summary disagrees with its rows.

    Only keys the summary actually carries are compared (the synth-sf1
    gate writes a slimmer pass/fail block), so the lint catches real
    drift — a count that contradicts the rows — not shape differences.
    """
    rows = art.get("queries", {})
    want = summarize_rows(rows, registered=art.get("summary", {}).get("registered"))
    got = art.get("summary", {})
    errs = []
    for k in ("pass", "fail", "rows_only"):
        if k in got and got[k] != want[k]:
            errs.append(f"summary.{k}={got[k]} but rows say {want[k]}")
    if "registered" in got and got["registered"] < len(rows):
        errs.append(
            f"summary.registered={got['registered']} < {len(rows)} rows present"
        )
    return errs


if __name__ == "__main__":
    raise SystemExit(main())
