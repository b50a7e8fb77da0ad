"""Differential tests for operators/distribution: every operator is
recomputed from the raw parquet in pure Python/numpy (no shared code
with the engine — the SURVEY §5.3 strategy) and compared to the Spark
result. Determinism mechanics (integer cross-multiplied medians,
quantized spike boundaries) get targeted assertions of their own."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from node_gedcom_graph_spark.operators.distribution import (
    DUP_NGRAM_N,
    EWMA_ALPHA,
    EWMA_SPIKE_TH,
    EWMA_TAPS,
    ZIPF_TOP_N,
    doc_dup_ngram_coverage,
    embedding_covariance_topdims,
    events_ewma_fir,
    lineitem_weighted_median,
    orders_benford_first_digit,
    token_zipf_fit,
)

SF_DIR = "/root/testdata/sf0.001"


def _pq(name):
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_benford_matches_pure_python(spark):
    rows = {
        r["digit"]: r
        for r in orders_benford_first_digit(spark, SF_DIR).collect()
    }
    prices = _pq("orders")["o_totalprice"]
    digits = Counter(int(str(int(math.floor(p)))[0]) for p in prices)
    assert sum(r["n_orders"] for r in rows.values()) == len(prices)
    for d, n in digits.items():
        r = rows[d]
        assert r["n_orders"] == n
        assert abs(r["observed_share"] - n / len(prices)) < 1e-6
        assert abs(r["benford_share"] - math.log10(1 + 1 / d)) < 1e-6


def test_weighted_median_matches_pure_python(spark):
    got = {
        r["l_returnflag"]: r
        for r in lineitem_weighted_median(spark, SF_DIR).collect()
    }
    li = _pq("lineitem")
    for flag, g in li.groupby("l_returnflag"):
        # Lower weighted median, straight from the definition: smallest
        # price whose cumulative integer weight reaches half the total.
        g = g.sort_values("l_extendedprice")
        wt = g["l_quantity"].astype("int64").to_numpy()
        cum = np.cumsum(wt)
        tot = int(cum[-1])
        idx = int(np.argmax(2 * cum >= tot))
        want_median = float(g["l_extendedprice"].to_numpy()[idx])
        r = got[flag]
        assert r["weighted_median_price"] == want_median
        assert r["total_weight"] == tot
        want_mean = float(
            (g["l_extendedprice"] * g["l_quantity"]).sum()
            / g["l_quantity"].sum()
        )
        assert abs(r["weighted_mean_price"] - want_mean) < 1e-6


def test_zipf_fit_matches_numpy_lstsq(spark):
    row = token_zipf_fit(spark, SF_DIR).collect()[0]
    counts = Counter()
    for t in _pq("documents")["text"]:
        counts.update(_tokens(t))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_N]
    y = np.log([c for _, c in top])
    x = np.log(np.arange(1, len(top) + 1))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_tokens"] == len(top)
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["zipf_intercept"] - intercept) < 1e-5
    ss_res = np.sum((y - (slope * x + intercept)) ** 2)
    ss_tot = np.sum((y - y.mean()) ** 2)
    assert abs(row["zipf_r2"] - (1 - ss_res / ss_tot)) < 1e-5


def test_covariance_matches_numpy(spark):
    got = {
        (r["dim_i"], r["dim_j"]): r
        for r in embedding_covariance_topdims(spark, SF_DIR).collect()
    }
    mat = np.array(
        [np.asarray(v, dtype=np.float64) for v in _pq("embeddings")["embedding"]]
    )
    for (i, j), r in got.items():
        xi, xj = mat[:, i - 1], mat[:, j - 1]
        cov = float(np.mean((xi - xi.mean()) * (xj - xj.mean())))
        assert abs(r["cov"] - cov) < 1e-5
        denom = xi.std() * xj.std()
        assert abs(r["pearson_r"] - cov / denom) < 1e-5
    # Diagonal correlation is exactly 1 after rounding.
    for i in range(1, 7):
        assert got[(i, i)]["pearson_r"] == 1.0


def test_ewma_fir_matches_pure_python(spark):
    got = {
        r["event_type"]: r for r in events_ewma_fir(spark, SF_DIR).collect()
    }
    ev = _pq("events")
    # Parquet carries int64 nanos in some SFs; normalize like the engine.
    if not str(ev["ts"].dtype).startswith("datetime"):
        ev["ts"] = pd.to_datetime(ev["ts"], unit="ns")
    weights = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** j for j in range(EWMA_TAPS)]
    wsum = sum(weights)
    for etype, g in ev.groupby("event_type"):
        vals = g.sort_values("ts")["value"].to_numpy()
        resids = []
        for t in range(EWMA_TAPS - 1, len(vals)):
            fir = (
                sum(vals[t - j] * weights[j] for j in range(EWMA_TAPS)) / wsum
            )
            resids.append(abs(vals[t] - fir))
        r = got[etype]
        assert r["n_smoothed"] == len(resids)
        assert abs(r["mean_abs_resid"] - np.mean(resids)) < 1e-5
        assert abs(r["max_abs_resid"] - max(resids)) < 1e-5
        assert r["n_spikes"] == sum(
            1 for x in resids if round(x - EWMA_SPIKE_TH, 9) > 0
        )


def test_dup_ngram_coverage_matches_pure_python(spark):
    got = {
        r["source"]: r for r in doc_dup_ngram_coverage(spark, SF_DIR).collect()
    }
    docs = _pq("documents")
    gram_docs = Counter()
    per_doc_grams = {}
    for _, row in docs.iterrows():
        t = _tokens(row["text"])
        grams = [
            " ".join(t[i : i + DUP_NGRAM_N])
            for i in range(len(t) - DUP_NGRAM_N + 1)
        ]
        if grams:
            per_doc_grams[row["doc_id"]] = (row["source"], grams)
    for _, (_, grams) in per_doc_grams.items():
        for g in set(grams):
            gram_docs[g] += 1
    agg = {}
    for _doc, (src, grams) in per_doc_grams.items():
        n_pos = len(grams)
        dup = sum(1 for g in grams if gram_docs[g] >= 2)
        a = agg.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += n_pos
        a[2] += dup
        a[3] += 1 if 2 * dup > n_pos else 0
    assert set(got) == set(agg)
    for src, (n_docs, tot, dup, majority) in agg.items():
        r = got[src]
        assert r["n_docs"] == n_docs
        assert r["total_positions"] == tot
        assert r["dup_positions"] == dup
        assert abs(r["dup_fraction"] - dup / tot) < 1e-6
        assert r["docs_majority_dup"] == majority


def test_gini_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        customer_gini_by_region,
    )

    got = {
        r["region_name"]: r
        for r in customer_gini_by_region(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust[cust["c_acctbal"] > 0].copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    for rname, g in cust.groupby("region_name"):
        # 2-dp balances as exact integer cents, straight from the
        # rank-weighted closed form.
        x = np.sort(np.round(g["c_acctbal"].to_numpy() * 100).astype("int64"))
        n = len(x)
        i = np.arange(1, n + 1, dtype="int64")
        gini = 2.0 * float((i * x).sum()) / (n * float(x.sum())) - (n + 1) / n
        r = got[rname]
        assert r["n_customers"] == n
        assert abs(r["total_balance"] - x.sum() / 100.0) < 1e-6
        assert abs(r["gini"] - gini) < 1e-6


def test_elasticity_matches_numpy_polyfit(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        brand_discount_elasticity,
    )

    got = {
        r["p_brand"]: r
        for r in brand_discount_elasticity(spark, SF_DIR).collect()
    }
    li = _pq("lineitem")
    part = _pq("part").set_index("p_partkey")
    li = li.copy()
    li["p_brand"] = li["l_partkey"].map(part["p_brand"].to_dict())
    for brand, g in li.groupby("p_brand"):
        slope, intercept = np.polyfit(g["l_discount"], g["l_quantity"], 1)
        r = got[brand]
        assert r["n_lineitems"] == len(g)
        assert abs(r["slope"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-5
        assert (
            abs(r["pearson_r"] - np.corrcoef(g["l_discount"], g["l_quantity"])[0, 1])
            < 1e-6
        )


def test_runs_test_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        daily_revenue_runs_test,
    )

    got = {
        r["year"]: r for r in daily_revenue_runs_test(spark, SF_DIR).collect()
    }
    orders = _pq("orders").copy()
    orders["d"] = orders["o_orderdate"].dt.date
    # Exact integer cents so the direction of every move is exact.
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    daily = orders.groupby("d")["cents"].sum().sort_index()
    by_year = {}
    for d, rev in daily.items():
        by_year.setdefault(d.year, []).append(rev)
    for yr, revs in by_year.items():
        signs = []
        for prev, cur in zip(revs, revs[1:]):
            if cur != prev:
                signs.append(1 if cur > prev else -1)
        n_runs = sum(
            1 for k, s in enumerate(signs) if k == 0 or signs[k - 1] != s
        )
        r = got[yr]
        assert r["n_moves"] == len(signs)
        assert r["n_up"] == signs.count(1)
        assert r["n_down"] == signs.count(-1)
        assert r["n_runs"] == n_runs
        expect = 1.0 + 2.0 * signs.count(1) * signs.count(-1) / len(signs)
        assert abs(r["expected_runs"] - expect) < 1e-6


def test_pareto_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        nation_revenue_pareto,
    )

    got = {
        r["nation_name"]: r
        for r in nation_revenue_pareto(spark, SF_DIR).collect()
    }
    orders = _pq("orders").copy()
    cust = _pq("customer").set_index("c_custkey")
    nation = _pq("nation").set_index("n_nationkey")
    orders["nation_name"] = orders["o_custkey"].map(
        cust["c_nationkey"].to_dict()
    ).map(nation["n_name"].to_dict())
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    for nname, g in orders.groupby("nation_name"):
        rev = g.groupby("o_custkey")["cents"].sum()
        # Descending revenue, custkey tie-break — mirror the window order.
        rev = rev.sort_index().sort_values(ascending=False, kind="stable")
        vals = rev.to_numpy()
        tot = int(vals.sum())
        cum = np.cumsum(vals)
        k = int(np.argmax(5 * cum >= 4 * tot)) + 1
        r = got[nname]
        assert r["n_customers"] == len(vals)
        assert abs(r["total_revenue"] - tot / 100.0) < 1e-6
        assert r["top_customers_for_80pct"] == k
        assert abs(r["pareto_share"] - k / len(vals)) < 1e-6


def test_lorenz_deciles_match_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        segment_lorenz_deciles,
    )

    got = {
        (r["c_mktsegment"], r["decile"]): r
        for r in segment_lorenz_deciles(spark, SF_DIR).collect()
    }
    orders = _pq("orders").copy()
    cust = _pq("customer").set_index("c_custkey")
    orders["seg"] = orders["o_custkey"].map(cust["c_mktsegment"].to_dict())
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    for seg, g in orders.groupby("seg"):
        rev = g.groupby("o_custkey")["cents"].sum().reset_index()
        rev = rev.sort_values(["cents", "o_custkey"]).reset_index(drop=True)
        n = len(rev)
        # SQL ntile: first (n % 10) buckets get ceil(n/10) rows.
        base, extra = divmod(n, 10)
        sizes = [base + (1 if b < extra else 0) for b in range(10)]
        tot = rev["cents"].sum()
        start = 0
        for b, size in enumerate(sizes, start=1):
            chunk = rev.iloc[start : start + size]
            start += size
            r = got[(seg, b)]
            assert r["n_customers"] == size
            assert abs(r["decile_revenue"] - chunk["cents"].sum() / 100) < 1e-6
            assert abs(r["revenue_share"] - chunk["cents"].sum() / tot) < 1e-6


def test_ttr_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        text_ttr_by_source,
    )

    got = {
        r["source"]: r for r in text_ttr_by_source(spark, SF_DIR).collect()
    }
    docs = _pq("documents")
    for src, g in docs.groupby("source"):
        toks = [t for txt in g["text"] for t in _tokens(txt)]
        n, v = len(toks), len(set(toks))
        r = got[src]
        assert r["n_tokens"] == n
        assert r["n_types"] == v
        assert abs(r["ttr"] - v / n) < 1e-6
        assert abs(r["herdan_c"] - math.log(v) / math.log(n)) < 1e-6


def test_autocorr_matches_numpy(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        events_autocorr_lag1,
    )

    got = {
        r["event_type"]: r
        for r in events_autocorr_lag1(spark, SF_DIR).collect()
    }
    ev = _pq("events")
    if not str(ev["ts"].dtype).startswith("datetime"):
        ev["ts"] = pd.to_datetime(ev["ts"], unit="ns")
    for etype, g in ev.groupby("event_type"):
        vals = g.sort_values("ts")["value"].to_numpy()
        cur, prev = vals[1:], vals[:-1]
        r = got[etype]
        assert r["n_pairs"] == len(cur)
        assert abs(r["autocorr_lag1"] - np.corrcoef(cur, prev)[0, 1]) < 1e-6
        slope, intercept = np.polyfit(prev, cur, 1)
        assert abs(r["ar1_coef"] - slope) < 1e-5
        assert abs(r["ar1_intercept"] - intercept) < 1e-4


def test_anova_matches_scipy_formula(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        part_size_price_anova,
    )

    row = part_size_price_anova(spark, SF_DIR).collect()[0]
    part = _pq("part")
    groups = [
        g["p_retailprice"].to_numpy() for _, g in part.groupby("p_size")
    ]
    allv = np.concatenate(groups)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k_groups"] == k
    assert row["n_total"] == n
    assert abs(row["f_stat"] - f) < 1e-4
    assert abs(row["eta_squared"] - ssb / (ssb + ssw)) < 1e-5


def test_ks_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        KS_SEGMENT,
        customer_balance_ks_region,
    )

    got = {
        r["region_name"]: r
        for r in customer_balance_ks_region(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust.copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    cust["cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")
    for rname, g in cust.groupby("region_name"):
        a = np.sort(g.loc[g["c_mktsegment"] == KS_SEGMENT, "cents"].to_numpy())
        b = np.sort(g.loc[g["c_mktsegment"] != KS_SEGMENT, "cents"].to_numpy())
        na, nb = len(a), len(b)
        best = 0
        for v in np.unique(g["cents"].to_numpy()):
            ca = int((a <= v).sum())
            cb = int((b <= v).sum())
            best = max(best, abs(ca * nb - cb * na))
        r = got[rname]
        assert r["n_segment"] == na
        assert r["n_rest"] == nb
        assert r["ks_numerator"] == best
        assert abs(r["ks_stat"] - best / (na * nb)) < 1e-6


def test_mad_outliers_match_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        MAD_K,
        customer_balance_mad_outliers,
    )

    got = {
        r["region_name"]: r
        for r in customer_balance_mad_outliers(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust.copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    cust["cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")

    def lower_median(vals):
        vals = np.sort(vals)
        # Smallest value whose cumulative count reaches half the total.
        return int(vals[(2 * (np.arange(len(vals)) + 1) >= len(vals)).argmax()])

    for rname, g in cust.groupby("region_name"):
        cents = g["cents"].to_numpy()
        med = lower_median(cents)
        adev = np.abs(cents - med)
        mad = lower_median(adev)
        r = got[rname]
        assert r["n_customers"] == len(cents)
        assert abs(r["median_bal"] - med / 100) < 1e-9
        assert abs(r["mad"] - mad / 100) < 1e-9
        assert r["n_outliers"] == int((adev > MAD_K * mad).sum())


def test_pmi_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        PMI_MIN_COUNT,
        part_name_bigram_pmi,
    )

    got = {
        (r["w1"], r["w2"]): r
        for r in part_name_bigram_pmi(spark, SF_DIR).collect()
    }
    part = _pq("part")
    pairs = []
    for name in part["p_name"]:
        t = _tokens(name)
        if len(t) >= 2:
            pairs.append((t[0], t[1]))
    joint = Counter(pairs)
    left = Counter(p[0] for p in pairs)
    right = Counter(p[1] for p in pairs)
    n = len(pairs)
    want = {
        (w1, w2): c
        for (w1, w2), c in joint.items()
        if c >= PMI_MIN_COUNT
    }
    assert set(got) == set(want)
    for (w1, w2), c in want.items():
        r = got[(w1, w2)]
        pmi = math.log(c * n / (left[w1] * right[w2]))
        assert r["c_xy"] == c
        assert abs(r["pmi"] - pmi) < 1e-6
        assert abs(r["npmi"] - pmi / (-math.log(c / n))) < 1e-6


def test_mannwhitney_matches_scipy_style(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        KS_SEGMENT,
        customer_balance_mannwhitney,
    )

    got = {
        r["region_name"]: r
        for r in customer_balance_mannwhitney(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust.copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    cust["cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")
    for rname, g in cust.groupby("region_name"):
        a = g.loc[g["c_mktsegment"] == KS_SEGMENT, "cents"].to_numpy()
        b = g.loc[g["c_mktsegment"] != KS_SEGMENT, "cents"].to_numpy()
        pooled = np.concatenate([a, b])
        # Midranks via scipy-free rankdata: average rank over ties.
        order = np.argsort(pooled, kind="stable")
        ranks = np.empty(len(pooled))
        sorted_v = pooled[order]
        i = 0
        while i < len(sorted_v):
            j = i
            while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        r_a = ranks[: len(a)].sum()
        u = r_a - len(a) * (len(a) + 1) / 2
        r = got[rname]
        assert r["n_segment"] == len(a)
        assert r["n_rest"] == len(b)
        assert r["u2"] == int(round(2 * u))
        assert abs(r["rank_biserial"] - (2 * u / (len(a) * len(b)) - 1)) < 1e-6


def test_burstiness_matches_numpy(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        event_interarrival_burstiness,
    )

    got = {
        r["event_type"]: r
        for r in event_interarrival_burstiness(spark, SF_DIR).collect()
    }
    ev = _pq("events")
    if not str(ev["ts"].dtype).startswith("datetime"):
        ev["ts"] = pd.to_datetime(ev["ts"], unit="ns")
    for etype, g in ev.groupby("event_type"):
        # Truncate to whole microseconds exactly as both engines store
        # (normalize pandas' datetime64 unit to ns first).
        micros = (
            g.sort_values("ts")["ts"]
            .to_numpy()
            .astype("datetime64[ns]")
            .astype("int64")
            // 1000
        )
        gaps = np.diff(micros) / 1e6
        mu, sd = gaps.mean(), gaps.std()
        r = got[etype]
        assert r["n_gaps"] == len(gaps)
        assert abs(r["mean_gap_s"] - mu) < 1e-5
        assert abs(r["sd_gap_s"] - sd) < 1e-5
        assert abs(r["cv"] - sd / mu) < 1e-6
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-6


def test_seasonality_index_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        month_seasonality_index,
    )

    got = {
        r["month"]: r
        for r in month_seasonality_index(spark, SF_DIR).collect()
    }
    orders = _pq("orders").copy()
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    orders["month"] = orders["o_orderdate"].dt.month
    monthly = orders.groupby("month")["cents"].agg(["sum", "count"])
    total = monthly["sum"].sum()
    for month, row in monthly.iterrows():
        r = got[month]
        assert r["n_orders"] == row["count"]
        assert abs(r["month_revenue"] - row["sum"] / 100) < 1e-6
        assert (
            abs(r["seasonal_index"] - row["sum"] * len(monthly) / total)
            < 1e-6
        )


def test_fertility_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        lang_token_fertility,
    )

    got = {
        r["lang"]: r for r in lang_token_fertility(spark, SF_DIR).collect()
    }
    docs = _pq("documents")
    for lang, g in docs.groupby("lang"):
        toks = sum(len(_tokens(t)) for t in g["text"])
        chars = int(g["n_chars"].sum())
        r = got[lang]
        assert r["n_docs"] == len(g)
        assert r["total_chars"] == chars
        assert r["total_tokens"] == toks
        assert abs(r["chars_per_token"] - chars / toks) < 1e-6
        assert abs(r["tokens_per_doc"] - toks / len(g)) < 1e-6


def test_quartiles_match_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        doc_length_quartiles_by_source,
    )

    got = {
        r["source"]: r
        for r in doc_length_quartiles_by_source(spark, SF_DIR).collect()
    }

    def lower_q(vals, num, den):
        # Smallest v with den*cum >= num*total.
        vals = sorted(vals)
        tot = len(vals)
        for i, v in enumerate(vals, start=1):
            if den * i >= num * tot:
                return v

    docs = _pq("documents")
    for src, g in docs.groupby("source"):
        lens = g["n_chars"].tolist()
        p25 = lower_q(lens, 1, 4)
        p50 = lower_q(lens, 1, 2)
        p75 = lower_q(lens, 3, 4)
        r = got[src]
        assert r["n_docs"] == len(lens)
        assert (r["p25"], r["p50"], r["p75"]) == (p25, p50, p75)
        assert r["iqr"] == p75 - p25


def test_temperature_weights_match_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        MIX_ALPHA,
        source_sampling_temperature,
    )

    got = {
        r["source"]: r
        for r in source_sampling_temperature(spark, SF_DIR).collect()
    }
    docs = _pq("documents")
    tok = {
        src: sum(len(_tokens(t)) for t in g["text"])
        for src, g in docs.groupby("source")
    }
    n = sum(tok.values())
    pw = {s: (c / n) ** MIX_ALPHA for s, c in tok.items()}
    z = sum(pw.values())
    for src, c in tok.items():
        r = got[src]
        assert r["n_tok"] == c
        assert abs(r["sample_weight"] - pw[src] / z) < 1e-6
        assert abs(r["upweight"] - (pw[src] / z) / (c / n)) < 1e-6
    # Alpha < 1 flattens: weight order still tracks token share, but
    # the smallest source keeps a LARGER weight ratio to the largest
    # than its proportional token-share ratio.
    ordered = sorted(tok, key=tok.get)
    weights = [got[s]["sample_weight"] for s in ordered]
    assert weights == sorted(weights)
    lo, hi = ordered[0], ordered[-1]
    assert (
        got[lo]["sample_weight"] / got[hi]["sample_weight"]
        > tok[lo] / tok[hi]
    )


def test_hourly_entropy_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        events_hourly_entropy,
    )

    got = {
        r["hour_of_day"]: r
        for r in events_hourly_entropy(spark, SF_DIR).collect()
    }
    ev = _pq("events")
    if not str(ev["ts"].dtype).startswith("datetime"):
        ev["ts"] = pd.to_datetime(ev["ts"], unit="ns")
    ev = ev.copy()
    ev["hour"] = ev["ts"].dt.hour
    for hour, g in ev.groupby("hour"):
        counts = g["event_type"].value_counts()
        n = counts.sum()
        ent = -sum((c / n) * math.log(c / n) for c in counts)
        r = got[hour]
        assert r["n_events"] == n
        assert r["n_types"] == len(counts)
        assert abs(r["entropy_nats"] - ent) < 1e-6
        assert abs(r["evenness"] - ent / math.log(len(counts))) < 1e-6


def test_simpson_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        segment_nation_simpson,
    )

    got = {
        r["c_mktsegment"]: r
        for r in segment_nation_simpson(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    for seg, g in cust.groupby("c_mktsegment"):
        counts = g["c_nationkey"].value_counts()
        n = int(counts.sum())
        inv = n * n / int((counts**2).sum())
        r = got[seg]
        assert r["n_customers"] == n
        assert r["n_nations"] == len(counts)
        assert abs(r["inverse_simpson"] - inv) < 1e-6
        assert abs(r["simpson_evenness"] - inv / len(counts)) < 1e-6


def test_cramers_v_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        part_type_brand_cramers_v,
    )

    row = part_type_brand_cramers_v(spark, SF_DIR).collect()[0]
    part = _pq("part")
    obs = part.groupby(["p_type", "p_brand"]).size()
    rt = part.groupby("p_type").size()
    ct = part.groupby("p_brand").size()
    n = len(part)
    chi2 = 0.0
    for t in rt.index:
        for b in ct.index:
            e = rt[t] * ct[b] / n
            o = obs.get((t, b), 0)
            chi2 += (o - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(rt), len(ct)) - 1)))
    assert row["n_parts"] == n
    assert row["n_types"] == len(rt)
    assert row["n_brands"] == len(ct)
    assert abs(row["chi2"] - chi2) < 1e-4
    assert abs(row["cramers_v"] - v) < 1e-6


def test_weekday_effect_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        orders_weekday_effect,
    )

    got = {
        r["iso_weekday"]: r
        for r in orders_weekday_effect(spark, SF_DIR).collect()
    }
    orders = _pq("orders").copy()
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    orders["iso"] = orders["o_orderdate"].dt.dayofweek + 1  # pandas: Mon=0
    overall = orders["cents"].sum() / len(orders)
    for iso, g in orders.groupby("iso"):
        avg = g["cents"].sum() / len(g)
        r = got[iso]
        assert r["n_orders"] == len(g)
        assert abs(r["avg_order_value"] - avg / 100) < 1e-6
        assert abs(r["vs_overall_avg"] - (avg / overall - 1)) < 1e-6


def test_hapax_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        doc_hapax_by_source,
    )

    got = {
        r["source"]: r for r in doc_hapax_by_source(spark, SF_DIR).collect()
    }
    docs = _pq("documents")
    for src, g in docs.groupby("source"):
        counts = Counter(t for txt in g["text"] for t in _tokens(txt))
        hapax = sum(1 for c in counts.values() if c == 1)
        r = got[src]
        assert r["n_types"] == len(counts)
        assert r["n_tokens"] == sum(counts.values())
        assert r["n_hapax"] == hapax
        assert abs(r["hapax_type_rate"] - hapax / len(counts)) < 1e-6
        assert (
            abs(r["hapax_token_rate"] - hapax / sum(counts.values())) < 1e-6
        )


def test_spearman_matches_scipy_style(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        customer_spearman_balance_revenue,
    )

    got = {
        r["region_name"]: r
        for r in customer_spearman_balance_revenue(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    orders = _pq("orders")
    cust = cust.copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    rev = (
        orders.assign(
            cents=np.round(orders["o_totalprice"] * 100).astype("int64")
        )
        .groupby("o_custkey")["cents"]
        .sum()
    )
    cust["rev_cents"] = cust["c_custkey"].map(rev).fillna(0).astype("int64")
    cust["bal_cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")

    def midrank(vals):
        order = np.argsort(vals, kind="stable")
        ranks = np.empty(len(vals))
        sv = vals[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    for rname, g in cust.groupby("region_name"):
        rx = midrank(g["bal_cents"].to_numpy())
        ry = midrank(g["rev_cents"].to_numpy())
        rho = np.corrcoef(rx, ry)[0, 1]
        r = got[rname]
        assert r["n_customers"] == len(g)
        assert abs(r["spearman_rho"] - rho) < 1e-6


def test_theil_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        customer_theil_by_region,
    )

    got = {
        r["region_name"]: r
        for r in customer_theil_by_region(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust[cust["c_acctbal"] > 0].copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    cust["cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")
    for rname, g in cust.groupby("region_name"):
        x = g["cents"].to_numpy().astype("float64")
        n, sx = len(x), x.sum()
        theil = float(np.sum((x / sx) * np.log(n * x / sx)))
        r = got[rname]
        assert r["n_customers"] == n
        assert abs(r["theil_t"] - theil) < 1e-6
        assert abs(r["atkinson_equiv"] - (1 - math.exp(-theil))) < 1e-6
        # Theil bounds: 0 <= T <= ln n.
        assert -1e-9 <= r["theil_t"] <= math.log(n)


def test_trimmed_mean_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.distribution import (
        customer_balance_trimmed_mean,
    )

    got = {
        r["region_name"]: r
        for r in customer_balance_trimmed_mean(spark, SF_DIR).collect()
    }
    cust = _pq("customer")
    nation = _pq("nation").set_index("n_nationkey")
    region = _pq("region").set_index("r_regionkey")
    cust = cust.copy()
    cust["region_name"] = cust["c_nationkey"].map(
        nation["n_regionkey"].to_dict()
    ).map(region["r_name"].to_dict())
    cust["cents"] = np.round(cust["c_acctbal"] * 100).astype("int64")
    for rname, g in cust.groupby("region_name"):
        x = np.sort(g["cents"].to_numpy())
        n = len(x)
        lo = n // 10
        kept = x[lo : n - lo]
        r = got[rname]
        assert r["n_customers"] == n
        assert r["n_kept"] == len(kept)
        assert abs(r["trimmed_mean"] - kept.mean() / 100) < 1e-6
        assert (
            abs(r["vs_plain_mean"] - (kept.mean() - x.mean()) / 100) < 1e-6
        )


def test_mannwhitney_bucketed_equals_plain(spark):
    """The bucketed prefix-sum escape hatch must be bit-identical to
    the plain low-cardinality-window kernel (round-3 verdict item 10)."""
    from node_gedcom_graph_spark.operators.distribution import (
        customer_balance_mannwhitney,
        customer_balance_mannwhitney_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    plain = {
        r.region_name: (r.n_segment, r.n_rest, r.u2, r.rank_biserial)
        for r in customer_balance_mannwhitney(spark, sf).collect()
    }
    bucketed = {
        r.region_name: (r.n_segment, r.n_rest, r.u2, r.rank_biserial)
        for r in customer_balance_mannwhitney_bucketed(spark, sf).collect()
    }
    assert plain == bucketed


def test_mahalanobis_catches_joint_only_outliers(spark):
    """The multivariate detector must flag at least one customer that
    BOTH univariate 3-sigma z-scores miss (|z| < 3 on balance AND on
    revenue) — the correlation-ridge case that justifies the operator
    over the MAD/z-score family — and every flagged row must satisfy
    its own d2 > 9 contract."""
    from node_gedcom_graph_spark.operators.distribution import (
        customer_mahalanobis_outliers,
    )

    sf = "/root/testdata/sf0.01"
    rows = customer_mahalanobis_outliers(spark, sf).collect()
    assert rows and all(r.d2 > 9 for r in rows)
    import statistics

    cust = {
        r.c_custkey: r.c_acctbal
        for r in spark.read.parquet(f"{sf}/customer.parquet").collect()
    }
    rev = {}
    for r in (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey")
        .sum("o_totalprice")
        .collect()
    ):
        rev[r[0]] = r[1]
    xs = list(cust.values())
    ys = [rev.get(k, 0.0) for k in cust]
    mx, sdx = statistics.fmean(xs), statistics.pstdev(xs)
    my, sdy = statistics.fmean(ys), statistics.pstdev(ys)
    joint_only = [
        r
        for r in rows
        if abs(r.acctbal - mx) / sdx < 3 and abs(r.revenue - my) / sdy < 3
    ]
    assert joint_only, "no outlier was exclusive to the joint distribution"
