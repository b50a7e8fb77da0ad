"""Duplicate-heavy synthetic-sf1 correctness gate (committed generator
for the GATE_SYNTH_SF1_r{N}.json artifacts).

Runs the dedup/similarity/streaming family of REGISTERED queries
against the synthesized sf1 (tools/make_sf_scale.py: 10 key-offset
copies of sf0.1 — 50k documents in genuine 10-way dup groups, 20k
embeddings with 10 identical copies each) under the full DuckDB-oracle
hash compare, PLUS the stateful streaming MinHash drain the round-4
verdict asked for (item 9): stream_dedup_minhash over the sf1
documents stream must emit exactly the batch minhash_lsh_pairs pair
set with identical jaccard values — the stateful path proven at 10x
the fixture its pytest pin uses.

Usage: python tools/gate_synth_sf1.py [sf1_dir] [out.json]
Defaults: <repo>/.benchdata/sf1 (built via make_sf_scale.py if
missing) -> stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from verify_local import TABLES, _hash_rows  # noqa: E402

# The registered dedup/similarity/streaming family (same set as
# GATE_SYNTH_SF1_r4 — the queries whose semantics face duplicate
# pressure), to rerun at HEAD.
GATE_QUERIES = [
    "semdedup_cluster_prune",
    "heavy_hitters_two_phase",
    "doc_chunk_overlap",
    "embedding_kmeans_lloyd2",
    "stream_dedup_within_watermark",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "dedup_containment_ngram",
    "dedup_cluster_canonical",
    "decontaminate_ngram_overlap",
    "flagship_revenue_by_region",
    "pricing_summary",
    "embedding_centroid_assign",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "dedup_savings_report",
    "doc_fingerprint",
    # round-5 additions under the same duplicate pressure
    "dedup_jaccard_prefix_filter",
    "doc_tfidf_cosine_pairs",
    "retrieval_recall_at_k",
    "ann_ivf_pq_adc_topk",
    "dedup_paragraph_exact",
    # round-6 additions: the collapse rewrites and the 13th streaming
    # gate, where the ORACLE is sf1-tractable in DuckDB. (The fuzzy /
    # knn / decontaminate / embedding-cosine rewrites are oracle-pinned
    # at sf0.01+sf0.1 — their DuckDB twins are brute-force quadratic
    # and would dominate this gate's wall at sf1; and
    # minhash_recall_report's oracle — the UNCOLLAPSED shingle
    # self-join — spilled DuckDB itself to disk-full at sf1, the very
    # hazard the engine-side collapse fix removed. Their engine-side
    # scale behavior is proven by SWEEP_SF10_r6 instead.)
    "doc_dup_ngram_coverage",
    "stream_dedup_paragraph_spans",
    # round-7 additions under dup pressure: the collapsed MinHash twin
    # is already above; the rep-level fuzzy contract (2M-row part table
    # with 10-way duplicated names — the arithmetic member counts face
    # real group sizes), the k-merge BPE trainer (its word-frequency
    # working set sees 10x counts, same vocab), and the re-keyed
    # prefix-fingerprint source-overlap matrix. (fuzzy_match_parts_
    # blocked stays excluded like the other member-level twins: its
    # DuckDB oracle is the quadratic within-block levenshtein, which
    # dominates the gate wall at sf1 — the engine side's sf1 behavior
    # is proven via SWEEP artifacts instead.)
    "fuzzy_match_parts_replevel",
    "bpe_multi_merge_table",
    "cross_source_overlap",
    "anti_join_customers_no_urgent_orders",
    # round-7 additions (second half) under dup pressure: the
    # ExactSubstr family (10-way duplicated documents make every
    # window a real dup — spans/stats/clean and the streaming window
    # table all face full-coverage spans), the semdedup collapse
    # rewrite (this gate's oracle is what pins the duplicate-heavy
    # member-verdict arithmetic), the BPE encoder, and the
    # water-filling resampler.
    "dedup_substring_spans",
    "dedup_substring_stats_by_source",
    "dedup_substring_clean",
    "stream_dedup_substring_windows",
    "bpe_encode_corpus_stats",
    "dataset_mix_resample",
    # late-r7 collapse rewrites (each hand-verified MATCH at sf1 when
    # they landed; listed so every future regeneration re-pins them)
    "doc_winnowing_fingerprints",
    "bm25_doc_scores",
    # r7 second-session additions (llmprep4): boilerplate removal and
    # the two snapshot-dedup contracts face genuine 10-way dup groups
    # here (and the dsir/minhash collapse branches only ENGAGE under
    # dup pressure — this gate is what oracle-pins them); the bloom
    # decontamination shares the exact operator's oracle.
    "boilerplate_span_removal",
    "dsir_importance_weights",
    "dedup_incremental_snapshot",
    "dedup_minhash_incremental",
    "quality_classifier_logit",
    "decontaminate_ngram_bloom",
    "stream_dedup_incremental",  # 16th streaming gate
    "sample_weighted_priority",  # E-S float twin of the lottery sampler
    # r8: the md5-SAMPLED eval twins replace the full-panel matryoshka
    # eval at this tier — the full variant's exact-ground-truth oracle
    # is O(panel x corpus) in DuckDB (r7: 1694.5 s and a ~60 GB spill
    # at sf1, which now exceeds the disk headroom); the 128-query
    # md5-rank panel is the bounded-eval contract built for exactly
    # this, and the full variant stays oracle-gated at sf0.01/sf0.1.
    "ann_matryoshka_trunc_recall_sampled",
    "retrieval_recall_at_k_sampled",
    "split_leakage_near_dup",  # cross-split near-dup contamination
    "curation_funnel_report",  # the end-to-end per-stage attrition table
    "stream_curation_funnel",  # 17th streaming gate (stateless scoring)
    "dedup_threshold_calibration",  # cutoff tuning table (gsz arithmetic)
]


def _gate_registered(spark, con, sf_dir: str, out: dict) -> None:
    import __spark_entry__ as ent

    qs, oracles = ent.queries(), ent.oracle_sql()
    for name in GATE_QUERIES:
        t0 = time.monotonic()
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        )
        out["queries"][name] = {
            "status": "PASS" if ok else "FAIL",
            "rows": len(srows),
            "wall_s": round(time.monotonic() - t0, 1),
        }
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {len(srows)} rows", flush=True)


def _gate_stream_minhash(spark, sf_dir: str, out: dict) -> None:
    """Drain stream_dedup_minhash over the sf1 documents and compare
    the emitted (doc_a, doc_b, jaccard) SET with the batch
    minhash_lsh_pairs on the same corpus (both xxhash64-based, so
    equality is exact, not approximate)."""
    from node_gedcom_graph_spark.operators.dedup import minhash_lsh_pairs
    from node_gedcom_graph_spark.streaming.pipeline import (
        read_documents_stream,
        stream_dedup_minhash,
    )

    t0 = time.monotonic()
    q = (
        stream_dedup_minhash(read_documents_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("sf1_sdm_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in spark.sql("SELECT * FROM sf1_sdm_pairs").collect()
    }
    stream_wall = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in minhash_lsh_pairs(docs).collect()
    }
    batch_wall = round(time.monotonic() - t0, 1)
    ok = got == want and len(want) > 0
    out["queries"]["stream_dedup_minhash_sf1_drain"] = {
        "status": "PASS" if ok else "FAIL",
        "rows": len(got),
        "batch_rows": len(want),
        "wall_s": stream_wall,
        "batch_wall_s": batch_wall,
        "note": (
            "stateful applyInPandasWithState MinHash drain over the sf1 "
            "documents stream; pair set + jaccard values compared EQUAL "
            "to batch minhash_lsh_pairs on the same corpus"
        ),
    }
    print(
        f"{'PASS' if ok else 'FAIL'}  stream_dedup_minhash_sf1_drain: "
        f"{len(got)} stream pairs vs {len(want)} batch",
        flush=True,
    )


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(_REPO, ".benchdata", "sf1")
    )
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "make_sf_scale.py")],
            check=True,
        )
    from node_gedcom_graph_spark.session import get_spark

    spark = get_spark(
        app_name="gate-synth-sf1", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = {
        "what": (
            "correctness gate for the dedup/similarity/streaming-dedup "
            "family at the synthesized duplicate-heavy sf1 "
            "(tools/make_sf_scale.py), regenerated at HEAD by "
            "tools/gate_synth_sf1.py; per-query wall includes BOTH "
            "engine and DuckDB oracle"
        ),
        "queries": {},
    }
    _gate_registered(spark, con, sf_dir, out)
    _gate_stream_minhash(spark, sf_dir, out)
    # Recomputed from the rows just written (shared census with
    # verify_local) — a merged/partial run can never ship a summary
    # that disagrees with its own rows.
    from verify_local import summarize_rows

    out["summary"] = summarize_rows(out["queries"])
    doc = json.dumps(out, indent=1)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            fh.write(doc + "\n")
    else:
        print(doc)
    spark.stop()
    return 1 if out["summary"]["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
