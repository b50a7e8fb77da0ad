"""Tests for the neo4jcsv Python DataSource writer: committed output +
manifest contract, schema-first headers, and the abort path (a failing
task publishes nothing)."""

import csv
import json
import os

import pytest
from pyspark.sql import functions as F

from node_gedcom_graph_spark.sources.neo4jcsv_sink import Neo4jCsvDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(Neo4jCsvDataSource)
    return spark


def test_write_commit_manifest(registered, tmp_path):
    spark = registered
    dest = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("I1", "Ann", "Individual"), ("I2", "Bob", "Individual")],
        "`Gedcom Id:ID` string, Name string, `:LABEL` string",
    ).repartition(2)
    (
        df.write.format("neo4jcsv")
        .option("family", "nodes")
        .option("tag", "INDI")
        .mode("append")
        .save(dest)
    )
    manifest = json.load(open(os.path.join(dest, "_manifest.json")))
    assert manifest["family"] == "nodes"
    assert manifest["total_rows"] == 2
    assert manifest["import_args"][0] == "--nodes"
    rows = []
    header = None
    for f in manifest["files"]:
        with open(os.path.join(dest, f["file"])) as fh:
            r = list(csv.reader(fh))
        # schema-first header on EVERY part file, even empty ones
        assert r[0] == ["Gedcom Id:ID", "Name", ":LABEL"]
        header = r[0]
        rows.extend(r[1:])
    assert sorted(rows) == [
        ["I1", "Ann", "Individual"],
        ["I2", "Bob", "Individual"],
    ]
    assert header is not None
    # no staging residue
    assert not [d for d in os.listdir(dest) if d.startswith("_staging")]


def test_failed_task_publishes_nothing(registered, tmp_path):
    spark = registered
    dest = str(tmp_path / "out")

    @F.udf("string")
    def boom(v):
        raise RuntimeError("poisoned row")

    df = spark.createDataFrame([("I1",)], "id string").select(boom("id").alias("id"))
    with pytest.raises(Exception):
        (
            df.write.format("neo4jcsv")
            .option("family", "nodes")
            .mode("append")
            .save(dest)
        )
    # abort contract: no manifest => nothing published
    assert not os.path.exists(os.path.join(dest, "_manifest.json"))
    if os.path.isdir(dest):
        assert not [f for f in os.listdir(dest) if f.endswith(".csv")]


def test_bad_family_rejected(registered, tmp_path):
    spark = registered
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(Exception):
        (
            df.write.format("neo4jcsv")
            .option("family", "edges")  # invalid: must be nodes|relationships
            .mode("append")
            .save(str(tmp_path / "o"))
        )
