"""Lint: no DuckDB oracle may produce a HUGEINT column.

DuckDB promotes SUM over integer columns to HUGEINT (int128); Spark
returns BIGINT for the same aggregate. The driver's hasher serializes
the two differently, so an uncast SUM passes every local check and then
fails the driver's hash gate (round-2 `split_train_valid_test` /
`text_pii_redact` failures). This test DESCRIBEs every registered
oracle through DuckDB and asserts the result schema contains no
HUGEINT/UHUGEINT column, making that divergence class impossible.
"""

from __future__ import annotations

import duckdb
import pytest

from node_gedcom_graph_spark.operators import all_oracles

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BANNED_TYPES = {"HUGEINT", "UHUGEINT"}


def test_no_oracle_yields_hugeint():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders: list[str] = []
    for name, sql in sorted(all_oracles().items()):
        try:
            rows = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        except duckdb.Error as e:  # pragma: no cover - oracle must at least parse
            pytest.fail(f"oracle {name!r} failed to DESCRIBE: {e}")
        for col, coltype, *_ in rows:
            base = coltype.upper()
            if any(b in base for b in BANNED_TYPES):
                offenders.append(f"{name}.{col}: {coltype}")
    assert not offenders, (
        "oracles returning HUGEINT (cast the SUM to BIGINT): "
        + ", ".join(offenders)
    )
