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

# Suite-scope cache-leak control (r5 advice): operators that persist()
# multi-consumer intermediates register them here instead of leaking
# them for the session's lifetime. The NEXT top-level registered-query
# build releases them — by then the previous query's action has run,
# so across a 268-query suite at most one query's blocks are cached at
# a time instead of all of them accumulating until LRU/disk pressure.
_TRACKED_CACHES: list[DataFrame] = []
_BUILD_DEPTH = 0


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() whose lifetime ends at the next top-level query build."""
    _TRACKED_CACHES.append(df.persist())
    return df


def release_tracked_caches() -> None:
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL).

    The registered callable releases the previous query's tracked
    caches before building — only at the TOP level (operators that
    compose other registered operators, e.g. dedup_cluster_canonical
    -> dedup_ngram_jaccard, must not free their own intermediates
    mid-build, hence the depth guard)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _BUILD_DEPTH
            if _BUILD_DEPTH == 0:
                release_tracked_caches()
            _BUILD_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _BUILD_DEPTH -= 1

        build.__name__ = fn.__name__
        build.__qualname__ = fn.__qualname__
        build.__doc__ = fn.__doc__
        build.__module__ = fn.__module__
        build.__wrapped__ = fn
        _QUERIES[name] = build
        if oracle is not None:
            _ORACLES[name] = oracle
        return build

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
