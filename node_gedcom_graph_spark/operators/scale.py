"""Scale utilities: skew-salted joins and bucketed (co-located) joins.

These are the two knobs the engine reaches for when AQE's automatic
handling isn't enough at the 100 TB tier:

- ``salted_join``: for a shuffle join whose key distribution is heavily
  skewed (a handful of hot keys holding most rows), salt the fact side
  into ``n_salt`` sub-keys and replicate the dimension side once per
  salt. The hot key's rows then land on ``n_salt`` reducers instead of
  one. AQE's skew-join split handles sort-merge cases adaptively;
  explicit salting remains the portable fix for aggregate-after-join
  pipelines and for engines/plans AQE can't rewrite.

- ``write_bucketed`` / bucketed reads: pre-shuffle both sides of a
  recurring join into the same bucket layout (`bucketBy(n, key)` +
  ``saveAsTable``). Joins and aggregations on the bucket key then run
  with ZERO exchanges — the test asserts the physical plan is
  Exchange-free. At 100 TB this converts every repeated fact-fact join
  from a full shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a salt in [0, n_salt);
    the (small) dim side is replicated once per salt value, so each
    (key, salt) shuffle partition holds ~1/n_salt of a hot key.

    ``salt_expr`` defaults to a seeded uniform salt; pass a
    deterministic expression (e.g. pmod(xxhash64(<unique col>), n))
    when retry-stability of individual row placement matters.
    Result columns = fact columns + dim columns (minus the joined key
    duplicate), exactly like ``fact.join(dim, key, how)``.
    """
    if salt_expr is None:
        salt_expr = F.floor(F.rand(seed=42) * n_salt).cast("int")
    salted_fact = fact.withColumn("_salt", salt_expr)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as a managed table.

    Both sides of a recurring join written this way join with no
    Exchange and no per-query Sort (bucket pruning + sorted merge).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange.

    BroadcastExchange doesn't count: a broadcast moves a small build
    side once, it is not a repartitioning of the data.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(
        re.search(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )
