"""Adversarial fixtures for the Pareto-front rewrite and the purged
time-series split — cases the TPC-H fixture's value distribution can't
be relied on to produce (exact duplicates, sub-dollar price gaps,
embargo boundary rows)."""

import os

import pandas as pd

from node_gedcom_graph_spark.operators.relational_ext import pareto_front_orders


def _write_orders(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).dt.date
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    return str(tmp_path)


def _py_front(rows):
    out = []
    for k, p, d in rows:
        dominated = any(
            (p2 > p and d2 >= d) or (p2 >= p and d2 > d)
            for k2, p2, d2 in rows
            if k2 != k
        )
        if not dominated:
            out.append(k)
    return sorted(out)


def test_pareto_ties_and_subdollar_gaps(spark, tmp_path):
    rows = [
        (1, 100.00, "1995-01-10"),
        (2, 100.00, "1995-01-10"),  # duplicate point of 1
        (3, 100.01, "1995-01-09"),  # one-cent-better price
        (4, 99.99, "1995-01-10"),
        (5, 100.00, "1995-01-11"),
        (6, 100.02, "1995-01-08"),
    ]
    d = _write_orders(spark, tmp_path, rows)
    got = sorted(r.o_orderkey for r in pareto_front_orders(spark, d).collect())
    assert got == _py_front(rows) == [3, 5, 6]


def test_pareto_duplicate_front_point_both_survive(spark, tmp_path):
    rows = [
        (1, 100.00, "1995-01-10"),
        (2, 100.00, "1995-01-10"),  # same point, nothing dominates
        (3, 99.00, "1995-01-09"),
    ]
    d = _write_orders(spark, tmp_path, rows)
    got = sorted(r.o_orderkey for r in pareto_front_orders(spark, d).collect())
    assert got == _py_front(rows) == [1, 2]
