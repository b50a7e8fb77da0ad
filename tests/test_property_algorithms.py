"""Hypothesis property tests for the pure-Python algorithm kernels —
no SparkSession needed, so these run wide (many random cases) cheaply:
the Misra-Gries superset guarantee over arbitrary streams/batchings,
and the skyline local-front kernel vs a brute-force dominance check."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from node_gedcom_graph_spark.operators.timeseries import (
    HH_CAPACITY,
    HH_K,
    _misra_gries_partition,
)


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=3000
    ),
    batch=st.integers(min_value=1, max_value=400),
)
def test_misra_gries_superset_guarantee_any_stream(stream, batch):
    """For EVERY stream and EVERY batching, any item with global count
    > n/HH_K survives the per-partition summary, and the summary never
    exceeds capacity."""
    toks = [f"t{v}" for v in stream]
    batches = [
        pd.DataFrame({"token": toks[i : i + batch]})
        for i in range(0, len(toks), batch)
    ]
    (out,) = list(_misra_gries_partition(iter(batches)))
    survivors = set(out["token"])
    assert len(survivors) <= HH_CAPACITY
    n = len(toks)
    from collections import Counter

    for tok, c in Counter(toks).items():
        if c * HH_K > n:
            assert tok in survivors


def _brute_front(points):
    out = []
    for i, (p, d) in enumerate(points):
        dominated = any(
            (p2 > p and d2 >= d) or (p2 >= p and d2 > d)
            for j, (p2, d2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return sorted(out)


@settings(max_examples=200, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_local_front_kernel_equals_brute_force(pts):
    """The ACTUAL per-partition skyline kernel must keep exactly the
    non-dominated points — including duplicates, which never dominate
    each other — for arbitrary integer point sets and batchings."""
    from node_gedcom_graph_spark.operators.relational_ext import (
        _skyline_local_front,
    )

    df = pd.DataFrame(
        {
            "idx": range(len(pts)),
            "price_key": [p for p, _ in pts],
            "day_key": [d for _, d in pts],
        }
    )
    batches = [df.iloc[i : i + 7] for i in range(0, len(df), 7)]
    out = list(_skyline_local_front(iter(batches)))
    got = sorted(int(i) for o in out for i in o["idx"]) if out else []
    assert got == _brute_front(pts)
