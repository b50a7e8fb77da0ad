"""Synthesize a larger scale factor by replicating an existing fixture
K times with key offsets (round-3 verdict item 2: prove the engine at
10x the largest driver fixture).

Every copy shifts its surrogate keys by copy_index * (max key) so
referential integrity holds across copies; dims (region/nation) and
event timestamps are shared, so per-key densities grow 10x in the same
time window — deliberately HARSHER than true TPC-H sf1 for skew and
state-size hazards (duplicate documents create genuine 10-way dup
groups; identical embeddings stress the count-guard fallbacks).

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [K] [tables]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1 with K=10,
all tables. ``tables``: optional comma-separated subset (the sf100
tier synthesizes documents,embeddings only — the dedup/GEMM family's
inputs — to keep the 1000x fixture's disk cost at ~0.5 GB instead of
~17 GB).
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPY_RULES = {
    # table -> {column: offset_source_table_for_max}
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".benchdata", "sf1"
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    if only:
        unknown = only - set(COPY_RULES)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # Bound the buffer pool: the default (80% of RAM) let the sf100
    # lineitem COPY (600M-row cross join) buffer the whole result and
    # get OOM-killed when other JVMs held memory. With a limit duckdb
    # spills to disk; dropping insertion-order preservation lets the
    # COPY stream instead of materializing (row order is meaningless
    # in these fixtures — every consumer is a declarative query).
    mem_gb = os.environ.get("MAKE_SF_MEM_GB", "24")
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET temp_directory='{dst}/.duckdb_tmp'")
    # Offset by the key-range SIZE (max - min + 1), not max: 0-based key
    # spaces (doc_id, vec_id, event_id) would otherwise duplicate their
    # boundary id across adjacent copies (caught by the sf1 gate run:
    # spark=5000 vs duck=4999 group counts on documents).
    maxes: dict[str, int] = {}
    for table, rules in COPY_RULES.items():
        if only and table not in only:
            continue
        for ref in rules.values():
            t, c = ref.split(".")
            if ref not in maxes:
                lo, hi = con.execute(
                    f"SELECT MIN({c}), MAX({c}) FROM '{src}/{t}.parquet'"
                ).fetchone()
                maxes[ref] = hi - lo + 1
    for table, rules in COPY_RULES.items():
        if only and table not in only:
            continue
        src_path = f"{src}/{table}.parquet"
        dst_path = f"{dst}/{table}.parquet"
        if not rules:  # shared dimension: copy verbatim
            con.execute(
                f"COPY (SELECT * FROM '{src_path}') TO '{dst_path}' "
                f"(FORMAT PARQUET)"
            )
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src_path}'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i.i * {maxes[rules[c]]} AS {c}" if c in rules else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src_path}', "
            f"generate_series(0, {k - 1}) AS i(i)) "
            f"TO '{dst_path}' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
    for table in COPY_RULES:
        if only and table not in only:
            continue
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n}")


if __name__ == "__main__":
    main()
