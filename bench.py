"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {name: sec}, "sf"}.

The extraction headline (extract_bench) generates the deterministic
synthetic transcripts table distributed (no disk IO) and runs the full
per-turn pipeline; its throughput in turns/sec is reported alongside.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q_region_revenue",
    "w4_sessionize",
    "j6_missing_words",
    "j8_best_event",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "cosine_topk",
    "f14_quality_scores",
    "f10_token_counts",
    "asof_view_to_purchase",
    "corpus_keep_drop",
    "funnel_conversion",
    "tfidf_top_terms",
    # round 3: Gopher repetition filter (single-scan, shuffle-free) —
    # NOTE for cross-round total comparisons: this entry adds ~1-2 s to
    # headline_queries_total vs BENCH_r02; compare per-query
    "quality_repetition",
    # round 3: duplicate-span detection + corpus-trained bigram LM —
    # both corpus-wide token-frame shuffles, the heaviest new family;
    # adds ~2-4 s to headline_queries_total vs earlier rounds
    "dedup_substring_spans",
    "ngram_lm_score",
    # round 3 (late): C4/CCNet line-level dedup — the corpus REWRITE op
    # (combinable MIN winner table + inverted-index join + reassembly);
    # adds ~1-2 s to headline_queries_total vs earlier r3 records
    "line_dedup",
    # round 3 (late): Lee-et-al duplicate-span REMOVAL (keep-first-copy
    # window dedup + reassembly); adds ~1-2 s to headline_queries_total
    # vs earlier r3 records — compare per-query across rounds
    "span_dedup_rewrite",
    # round 4 (continuation): the new monitor/eval families'
    # representatives — BM25 retrieval eval (postings plan + exact
    # integer metrics, ~4 s: stage-count-bound, flat in corpus size)
    # and the single-scan correlation matrix (~0.5 s); adds ~4-5 s to
    # headline_queries_total vs the r3 set — compare per-query across
    # rounds
    "bm25_eval",
    "corr_doc_stats",
    # round 4 (third session): representatives of the new families —
    # the Catalyst DP-fold alignment metric (fixed 250-pair set, ~1 s,
    # corpus-size-flat by construction), the bucket-table KS drift
    # monitor (~0.5 s, flat), and k-core peeling (~1-2 s, sub-linear:
    # per-round cost shrinks with the surviving edge list); adds
    # ~2-4 s to headline_queries_total vs earlier r4 records —
    # compare per-query across rounds
    "qa_wer_exact",
    "ks_split_drift",
    "host_kcore",
    # round 5: the megagroup-safe per-language percentile rank (now the
    # two-phase range-partitioned production path, ~1 s) and the
    # re-founded per-document spatial best-match join (doc_id-bounded
    # line-block IoU argmax, ~1 s); adds ~2 s to headline_queries_total
    # vs r4 — compare per-query across rounds
    "quality_percentiles",
    "j7_layout_preservation",
]

BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "8000"))


def force(df) -> int:
    """Force full computation of every row (count() alone could prune)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n"),
        *[
            # decimal(38,0) sum: overflow-proof under ANSI mode
            F.sum(F.xxhash64(c).cast("decimal(38,0)")).alias(f"h_{c}")
            for c in df.columns[: min(4, len(df.columns))]
        ],
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from medical_ocr_pipeline_spark.pipeline import extract_transcripts
    from medical_ocr_pipeline_spark.queries import REGISTRY
    from medical_ocr_pipeline_spark.session import get_spark
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    spark = get_spark(app="bench", master=f"local[{cpus}]")

    # steady-state warmup: JVM JIT, codegen cache, parquet footers — the
    # per-query numbers should measure the query, not session cold-start
    force(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
    )
    force(spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"))

    # best-of-3 per query: the shared host shows large run-to-run CPU
    # steal; minimum wall clock estimates unloaded capacity (same policy
    # as bench_scaling.py — BENCH_r03 was a loaded-host capture at
    # best-of-2, reading +13% on unchanged queries; VERDICT r03 #2)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            force(REGISTRY[name].fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # extraction throughput over a materialized transcripts table (input
    # generation is not part of the measured job, matching the
    # "same job, same input, two parallelism levels" contract).  The path
    # is versioned by a sample payload hash so generator changes rebuild it.
    import zlib

    from medical_ocr_pipeline_spark.synth import make_payload

    # sample spans several convs x turns so ALL payload-variant builders
    # contribute to the cache version (one payload would miss edits to
    # the other three variants)
    gen_ver = zlib.crc32(
        "".join(
            make_payload(f"conv_{c:06d}", t) for c in range(3) for t in range(8)
        ).encode()
    ) % 100000
    input_path = f"/tmp/spark_graft_bench_transcripts_{BENCH_CONVS}_{gen_ver}"
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        spark_transcripts(spark, BENCH_CONVS, partitions=int(cpus) * 4).write.mode(
            "overwrite"
        ).parquet(input_path)
    # the table is a few tens of MB -> a default 128 MB scan split gives
    # ~1 partition and strands the other slots.  Sizing the read splits
    # (no shuffle) beats an explicit repartition: measured 58.1k turns/s
    # vs 53.5k (repartition(cpus), shuffle inside the timed run) vs
    # 38.6k (repartition(cpus*4), shuffle + 4x per-task overhead) — the
    # same spill-aware split-sizing decision a 100 TB run makes, at the
    # other end of the scale.  Runtime-mutable conf: set for the
    # extraction reads only, restored after.
    orig_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    orig_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "524288")
    spark.conf.set("spark.sql.files.openCostInBytes", "131072")
    transcripts = spark.read.parquet(input_path)
    force(extract_transcripts(transcripts.limit(2000)))  # warm python workers
    extract_sec = float("inf")
    for _ in range(3):
        t0 = time.time()
        n_turns = force(extract_transcripts(transcripts))
        extract_sec = min(extract_sec, time.time() - t0)
    timings["extract_bench"] = round(extract_sec, 3)
    spark.conf.set("spark.sql.files.maxPartitionBytes", orig_mpb)
    spark.conf.set("spark.sql.files.openCostInBytes", orig_ocb)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extract_turns": n_turns,
                "extract_turns_per_sec": round(n_turns / extract_sec, 1),
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
