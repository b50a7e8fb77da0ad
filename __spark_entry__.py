"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``node_gedcom_graph_spark`` package; this
module only adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from node_gedcom_graph_spark.operators import (  # noqa: E402
    all_empty_reasons,
    all_min_rows,
    all_oracles,
    all_queries,
)
from node_gedcom_graph_spark.session import apply_engine_confs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_confs(spark)
    return all_queries()["flagship_revenue_by_region"](spark, _SMOKE_SF_DIR)


def _coverage_rotation(names: list[str]) -> list[str]:
    """Order queries so the least-driver-covered ones run first.

    The driver's correctness gate checks the first N entries of this
    dict (rounds 1-2 gated exactly the first 50). Tiers:
    1. never gated, ordered by registration seniority (earliest
       registry snapshot in tools/registry_r*.json that contains the
       name) — the longest-starved queries lead, and queries newly
       registered this round can NEVER displace an older never-gated
       query from the gate window;
    2. gated in some prior round but not the latest one (stalest next);
    3. gated in the latest run.
    Deterministic: depends only on committed artifacts (CORRECTNESS
    files + the registry snapshots); within each tier the registry
    order is preserved."""
    import glob
    import json
    import re

    runs = sorted(
        glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    ever: set[str] = set()
    latest: set[str] = set()
    for i, path in enumerate(runs):
        try:
            with open(path) as fh:
                covered = set(json.load(fh))
        except (OSError, ValueError):
            continue
        ever |= covered
        if i == len(runs) - 1:
            latest = covered
    # Seniority: the round of the first registry snapshot listing the
    # name (unsnapshotted names = newest = lowest priority).
    seniority: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(_REPO_DIR, "tools", "registry_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    ):
        try:
            with open(path) as fh:
                snap = json.load(fh)
            rnd = int(snap["round"])
            for n in snap["queries"]:
                seniority.setdefault(n, rnd)
        except (OSError, ValueError, KeyError, TypeError):
            continue
    newest = max(seniority.values(), default=0) + 1
    never = [n for n in names if n not in ever]
    never.sort(key=lambda n: seniority.get(n, newest))  # stable: registry order kept
    return (
        never
        + [n for n in names if n in ever and n not in latest]
        + [n for n in names if n in latest]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extension operators). Each callable takes
    (spark, sf_dir) and returns a DataFrame with aliased columns that
    match the oracle SQL exactly. Dict order rotates least-recently
    driver-gated queries first (see _coverage_rotation)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_confs(spark)
            return fn(spark, sf_dir)

        return run

    registry = all_queries()
    return {name: _wrap(registry[name]) for name in _coverage_rotation(list(registry))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible
    operators -> driver falls back to a rows-only check)."""
    return all_oracles()


def expected_rows() -> dict[str, int]:
    """Vacuity floor per query: the minimum row count the query must
    return at a gated scale (sf0.01 / sf0.1). Default 1 — a gate run
    where engine and oracle agree on an EMPTY result is a FAILURE
    unless the floor is an explicit, reasoned 0 (see
    ``empty_reasons()``). Added after ``decontaminate_ngram_overlap``
    passed vacuously for five rounds by filtering on a source value
    absent from the fixtures."""
    return all_min_rows()


def empty_reasons() -> dict[str, str]:
    """Stated justification for every query whose floor is 0."""
    return all_empty_reasons()
