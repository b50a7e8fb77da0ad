"""Tests for the training-shard parquet sink (publish/training_shards)
and the JSONL documents source (sources/jsonl): roundtrip fidelity,
manifest accounting, partition pruning on shard reads, and malformed-
line quarantine."""

import os

from pyspark.sql import functions as F

from node_gedcom_graph_spark.publish.training_shards import (
    read_training_shards,
    write_training_shards,
)
from node_gedcom_graph_spark.sources.jsonl import (
    compact_to_parquet,
    quarantine_counts,
    read_documents_jsonl,
    split_quarantine,
    write_documents_jsonl,
)

SF_DIR = "/root/testdata/sf0.001"


def test_shard_write_roundtrip_and_manifest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, n_shards=8)

    rows = manifest.collect()
    assert len(rows) == 8  # no empty shards at this corpus size
    assert sum(r.n_rows for r in rows) == docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r.total_chars for r in rows) == total_chars

    # roundtrip: every row lands, nothing duplicated
    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_shard_assignment_is_rerun_stable(spark, tmp_path):
    """Same rows -> same shards on a second publish (md5, no RNG)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, out1, n_shards=8)
    write_training_shards(docs.repartition(7), out2, n_shards=8)
    a = {(r.doc_id, r.shard) for r in read_training_shards(spark, out1).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in read_training_shards(spark, out2).select("doc_id", "shard").collect()}
    assert a == b


def test_shard_subset_read_prunes_partitions(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8)
    sub = read_training_shards(spark, out, shards=[0, 3])
    assert set(r.shard for r in sub.select("shard").distinct().collect()) == {0, 3}
    # the shard filter must reach the scan as a partition filter, not a
    # post-scan drop
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:200]


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jdir = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, jdir)
    parsed = read_documents_jsonl(spark, jdir)
    n_clean, n_bad = quarantine_counts(parsed)
    assert n_bad == 0
    assert n_clean == docs.count()
    # value fidelity (join on doc_id); the join also re-counts the clean
    # side — a bare clean.count() would prune the scan down to the
    # corrupt column alone, which Spark forbids on raw JSON scans.
    clean, _bad = split_quarantine(parsed)
    j = clean.select("doc_id", F.col("text").alias("j_text"))
    joined = docs.join(j, "doc_id")
    assert joined.count() == docs.count()
    assert joined.filter(F.col("text") != F.col("j_text")).count() == 0


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    jdir = tmp_path / "drop"
    jdir.mkdir()
    good = '{"doc_id": 1, "text": "hello", "lang": "en", "source": "web", "n_chars": 5}'
    torn = '{"doc_id": 2, "text": "tr'  # truncated mid-record
    (jdir / "part-0.json").write_text(good + "\n" + torn + "\n")
    df = read_documents_jsonl(spark, str(jdir))
    n_clean, n_bad = quarantine_counts(df)
    assert (n_clean, n_bad) == (1, 1)  # quarantined, not dropped, not fatal
    clean, bad = split_quarantine(df)
    assert clean.collect()[0].doc_id == 1
    raw = [r["_corrupt_record"] for r in bad.select("doc_id", "_corrupt_record").collect()]
    assert raw and raw[0].startswith('{"doc_id": 2')


def test_compact_to_parquet_excludes_quarantine(spark, tmp_path):
    jdir = tmp_path / "drop"
    jdir.mkdir()
    good = '{"doc_id": 7, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}'
    (jdir / "part-0.json").write_text(good + "\nnot json at all\n")
    pq = str(tmp_path / "compacted")
    compact_to_parquet(spark, str(jdir), pq)
    out = spark.read.parquet(pq)
    assert out.count() == 1
    assert "_corrupt_record" not in out.columns
