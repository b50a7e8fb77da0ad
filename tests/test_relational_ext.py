"""Plan-shape and semantics tests for the second relational batch
(operators/relational_ext.py). Value correctness is covered by the
DuckDB oracle gate; these pin the SCALE claims each docstring makes."""

import pytest
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators.relational_ext import (
    correlated_orders_above_cust_avg,
    mode_priority_by_status,
    percent_rank_cume_dist_balances,
    sample_hash_stratified,
    shipping_priority_top10,
    string_agg_nations_per_region,
    unpivot_part_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


def test_correlated_subquery_is_decorrelated(spark):
    """Catalyst must rewrite the scalar subquery into an aggregate+join —
    no per-row subquery execution survives into the physical plan."""
    plan = correlated_orders_above_cust_avg(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan  # decorrelated, not re-executed per row
    assert "HashAggregate" in plan and "Join" in plan


def test_top10_uses_take_ordered_not_global_sort(spark):
    plan = shipping_priority_top10(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unpivot_is_expand_without_exchange(spark):
    df = unpivot_part_metrics(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Exchange" not in plan  # narrow op: wide→long without a shuffle
    n_part = spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    assert df.count() == 2 * n_part


def test_sample_is_deterministic_and_stratified(spark):
    a = sorted(r.doc_id for r in sample_hash_stratified(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in sample_hash_stratified(spark, SF_DIR).collect())
    assert a == b and len(a) > 0  # same rows on every run — no RNG state
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {
        r["source"]: r["kept"] / r["total"]
        for r in docs.join(
            sample_hash_stratified(spark, SF_DIR).select("doc_id").withColumn("k", F.lit(1)),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(F.count("*").alias("total"), F.count("k").alias("kept"))
        .collect()
    }
    # 'web' targets 8/16 = 50%, others 4/16 = 25%; loose bounds for small N.
    assert 0.25 < rates.get("web", 0.5) < 0.75
    for src, rate in rates.items():
        if src != "web":
            assert rate < 0.5


def test_sketch_rollup_error_bounds(spark):
    """Merged-sketch estimates must sit near the exact answers: HLL is
    exact-ish at this cardinality (sparse mode), KLL median within the
    sketch's rank error of the true quantile."""
    from node_gedcom_graph_spark.operators.relational_ext import sketch_rollup_region

    got = {r.region_name: r for r in sketch_rollup_region(spark, SF_DIR).collect()}
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    exact = {
        r.r_name: r
        for r in customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("c_custkey").alias("n"),
            F.expr("percentile(c_acctbal, 0.5)").alias("med"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for name, e in exact.items():
        g = got[name]
        assert abs(g.approx_customers - e.n) <= max(2, 0.03 * e.n)
        # KLL default k: rank error ~1.7%; accept the estimate anywhere
        # in the 40th-60th percentile band of the true distribution.
        band = (
            customer.join(nation, customer.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .filter(F.col("r_name") == name)
            .selectExpr(
                "percentile(c_acctbal, 0.40) AS lo",
                "percentile(c_acctbal, 0.60) AS hi",
            )
            .collect()[0]
        )
        assert band.lo <= g.approx_median_balance <= band.hi, name


def test_mode_tie_break_is_smallest_value(spark):
    rows = spark.createDataFrame(
        [("O", "2-HIGH"), ("O", "1-URGENT"), ("O", "3-LOW"), ("O", "1-URGENT"), ("O", "2-HIGH")],
        ["o_orderstatus", "o_orderpriority"],
    )
    rows.write.mode("overwrite").parquet("/tmp/_mode_tiebreak/orders.parquet")
    out = mode_priority_by_status(spark, "/tmp/_mode_tiebreak").collect()
    assert len(out) == 1 and out[0].mode_priority == "1-URGENT" and out[0].cnt == 2


def test_string_agg_is_sorted(spark):
    for r in string_agg_nations_per_region(spark, SF_DIR).collect():
        names = r.nations.split(",")
        assert names == sorted(names) and len(names) == r.n_nations


def test_rank_windows_bounds(spark):
    rows = percent_rank_cume_dist_balances(spark, SF_DIR).collect()
    assert all(0.0 <= r.pct_rank <= 1.0 and 0.0 < r.cume <= 1.0 for r in rows)
    # first_value is the segment-wide minimum-balance custkey everywhere.
    per_seg = {}
    for r in rows:
        per_seg.setdefault(r.c_mktsegment, set()).add(r.poorest_custkey)
    assert all(len(v) == 1 for v in per_seg.values())


def test_cross_source_overlap_counts_shared_prefix_fingerprints(spark, tmp_path):
    """Semantic pin on synthetic data: the fingerprint is the first 8
    alnum tokens (round-7 de-vacuization), so shared-opening texts with
    DIFFERENT tails still count, sub-8-token texts are excluded, and
    within-source duplicates produce no pair. A∩B share two prefixes
    (one via case/punctuation variants), A∩C share one, B∩C none."""
    import pandas as pd

    from node_gedcom_graph_spark.operators.textstats import cross_source_overlap

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta tail one", "en", "A", 10),
        # same 8-token prefix as 1 via case/punct noise, different tail
        (2, "Alpha,  BETA! gamma; delta epsilon zeta eta theta other", "en", "B", 13),
        (3, "one two three four five six seven eight nine", "en", "A", 11),
        (4, "one two three four five six seven eight ten", "en", "B", 11),
        (5, "p1 q2 r3 s4 t5 u6 v7 w8 x9", "en", "A", 12),
        (6, "P1-Q2 r3 s4 t5 u6 v7 w8 y0", "en", "C", 12),  # same prefix as 5
        (7, "only in b spans eight whole tokens here", "en", "B", 9),
        (8, "only in c spans eight whole tokens here", "en", "C", 9),  # differs at tok 3
        (9, "alpha beta gamma delta epsilon zeta eta theta tail one", "en", "A", 10),  # dup in A
        (10, "too short", "en", "A", 9),       # < 8 tokens: excluded
        (11, "too short", "en", "B", 9),       # would pair with 10 if not excluded
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in cross_source_overlap(spark, str(tmp_path)).collect()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1}


def test_runtime_bloom_filter_injection_preserves_results(spark):
    """Spark's runtime bloom-filter injection — the 100 TB path for a
    shuffle join whose build side carries a selective non-key filter
    (Catalyst plants a bloom_filter_agg on the build side and a
    BloomFilterMightContain probe on the stream side's scan, cutting
    shuffle volume before the join). Default thresholds
    (applicationSideScanSizeThreshold=10GB) are sized for clusters and
    never fire at test SF, so this pins the mechanism on an isolated
    newSession() with the thresholds floored: the filter must inject AND
    must not change the join result. Engine sessions are untouched —
    ENGINE_CONFS stays at Spark defaults for runtime filters."""
    iso = spark.newSession()
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    iso.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    # broadcast would bypass the shuffle join the bloom filter serves
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.adaptive.enabled", "true")

    sf = "/root/testdata/sf0.01"

    def q(sess):
        li = sess.read.parquet(f"{sf}/lineitem.parquet")
        orders = sess.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("qty"),
            )
        )

    plan = q(iso)._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan.replace(
        "mightcontain", "BloomFilterMightContain"
    ), f"runtime bloom filter did not inject:\n{plan[:2000]}"

    got = {tuple(r) for r in q(iso).collect()}
    want = {tuple(r) for r in q(spark).collect()}
    assert got == want


class TestFuzzyScaleContract:
    """Round-7: rep-level fuzzy contract + bounded member expansion."""

    def test_replevel_member_counts_sum_to_member_rows(self, spark):
        """sum(n_member_pairs) over the rep-level contract must equal
        the member-level expansion's row count exactly — the arithmetic
        IS the contract."""
        from pyspark.sql import functions as F

        from node_gedcom_graph_spark.operators import all_queries

        qs = all_queries()
        rep = qs["fuzzy_match_parts_replevel"](spark, SF_DIR)
        total = rep.agg(F.sum("n_member_pairs")).first()[0] or 0
        members = qs["fuzzy_match_parts_blocked"](spark, SF_DIR).count()
        assert int(total) == members

    def test_member_expansion_refuses_past_cap(self, spark, monkeypatch):
        import node_gedcom_graph_spark.operators.relational as rel

        monkeypatch.setattr(rel, "FUZZY_MEMBER_PAIR_CAP", 1)
        with pytest.raises(RuntimeError, match="refused.*replevel"):
            rel.fuzzy_match_parts_blocked.__wrapped__(spark, SF_DIR)

    def test_salted_fallback_matches_broadcast_path(self, spark, monkeypatch):
        """Force the no-broadcast path: identical pair set."""
        import node_gedcom_graph_spark.operators.relational as rel

        fn = rel.fuzzy_match_parts_blocked.__wrapped__
        base = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        monkeypatch.setattr(rel, "FUZZY_BROADCAST_CAP_ROWS", 1)
        salted = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        assert salted == base and len(base) > 0
