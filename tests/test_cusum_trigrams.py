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
