"""Operator registry.

Each operator module registers named queries (``(spark, sf_dir) ->
DataFrame``) and, where SQL-expressible, a DuckDB oracle SQL string with
matching column aliases. ``all_queries()`` / ``all_oracles()`` aggregate
them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def _load_all() -> None:
    # Import for registration side effects.
    from node_gedcom_graph_spark.operators import (  # noqa: F401
        dedup,
        distribution,
        graphalgo,
        llmprep,
        llmprep2,
        llmprep3,
        multimodal,
        relational,
        relational_ext,
        relational_tpch,
        relational_tpch2,
        relational_tpch3,
        similarity,
        sql_surface,
        textstats,
        timeseries,
    )
    from node_gedcom_graph_spark import gedcom as _gedcom  # noqa: F401
    from node_gedcom_graph_spark import graph as _graph  # noqa: F401
    from node_gedcom_graph_spark.streaming import pipeline as _streaming  # noqa: F401
