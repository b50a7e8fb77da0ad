"""Pure-Python differential tests for the CUSUM change-point scan and
event-trigram mining (§5.3 strategy)."""

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from node_gedcom_graph_spark.operators.timeseries import (
    events_cusum_changepoints,
    top_event_trigrams,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    from node_gedcom_graph_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


def test_cusum_matches_pure_python(spark):
    rows = _events(spark).select("event_type", "ts", "value").collect()
    daily = defaultdict(Decimal)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += Decimal(r.value).quantize(
            Decimal("1.0000000000"), rounding=ROUND_HALF_UP
        )
    by_type = defaultdict(dict)
    for (et, d), v in daily.items():
        by_type[et][d] = v
    got = {
        (r.event_type, r.bucket_day): r
        for r in events_cusum_changepoints(spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for et, series in by_type.items():
        vals = [float(v) for v in series.values()]
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(
            (sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1)
        )
        cusum = 0.0
        for d in sorted(series):
            cusum += float(series[d]) - mean
            r = got[(et, d)]
            assert abs(r.cusum - cusum) < 1e-6
            # flags must agree away from the threshold boundary
            if abs(abs(cusum) - 5 * sd) > 1e-6:
                assert r.flagged == (1 if abs(cusum) > 5 * sd else 0)


def test_trigrams_match_pure_python(spark):
    rows = _events(spark).select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[tuple(types[i : i + 3])] += 1
    expected = sorted(
        ((-c, *tri) for tri, c in counts.items())
    )[:20]
    got = [
        (-r.cnt, r.e1, r.e2, r.e3)
        for r in sorted(
            top_event_trigrams(spark, SF_DIR).collect(), key=lambda r: r.rank
        )
    ]
    assert got == expected


def test_dau_wau_matches_pure_python(spark):
    from node_gedcom_graph_spark.operators.timeseries import (
        events_dau_wau_stickiness,
    )

    rows = _events(spark).select("ts", "user_id").collect()
    by_day = defaultdict(set)
    for r in rows:
        by_day[r.ts.date()].add(r.user_id)
    got = {
        r.day: (r.dau, r.wau)
        for r in events_dau_wau_stickiness(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_day)
    import datetime as dt

    for d, users in by_day.items():
        week = set()
        for back in range(7):
            week |= by_day.get(d - dt.timedelta(days=back), set())
        assert got[d] == (len(users), len(week))


def test_cohort_ltv_matches_pure_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from node_gedcom_graph_spark.operators.relational_ext import (
        customer_cohort_ltv,
    )

    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    firsts = {}
    for r in orders:
        m = (r.o_orderdate.year, r.o_orderdate.month)
        if r.o_custkey not in firsts or m < firsts[r.o_custkey]:
            firsts[r.o_custkey] = m
    cells = defaultdict(lambda: [0, set(), Decimal(0)])
    for r in orders:
        cy, cm = firsts[r.o_custkey]
        age = (r.o_orderdate.year * 12 + r.o_orderdate.month) - (cy * 12 + cm)
        key = ((cy, cm), age)
        st = cells[key]
        st[0] += 1
        st[1].add(r.o_custkey)
        st[2] += Decimal(r.o_totalprice).quantize(
            Decimal("1.00"), rounding=ROUND_HALF_UP
        )
    got = {
        ((r.cohort_month.year, r.cohort_month.month), r.age_months): r
        for r in customer_cohort_ltv(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(got) == set(cells)
    for key, (n, users, rev) in cells.items():
        r = got[key]
        assert r.n_orders == n
        assert r.n_active == len(users)
        assert abs(r.revenue - float(rev)) < 1e-6
    # cumulative consistency per cohort
    coh = defaultdict(list)
    for (cmonth, age), r in got.items():
        coh[cmonth].append((age, r.revenue, r.cum_revenue))
    for cmonth, rows_ in coh.items():
        rows_.sort()
        run = 0.0
        for age, rev, cum in rows_:
            run += rev
            assert abs(cum - run) < 1e-4
