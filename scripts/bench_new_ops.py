"""Input-scaling probe for the round-4 late-wave operators: run each
query at two corpus sizes (R and 4R suffix-replicas of the sf0.1
documents table — the collision-free replication scheme from
bench_scaling_corpus.py) and report the wall-time growth ratio.

A linear-shaped operator grows ~4x when the input grows 4x; a plan that
hides a quadratic pair blowup or an unpartitioned global window grows
~16x (or falls over).  This is the cheap smoke that catches a
wrong-at-scale plan the sf0.1 gate can't see.

Usage: python scripts/bench_new_ops.py [R] [queries...]
Defaults: R=10 (50k / 200k docs), queries = the round-4 wave's
document-table heavyweights.  Appends a section to BENCH.md when run
with SPARK_GRAFT_APPEND_BENCH=1.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/bench_new_ops"
# crawl_diff and qa_rouge_overlap are NOT probed: both bound their
# input by doc_id by design (snapshot windows / the 250-pair set), so
# replica growth never reaches them.
DEFAULT_QUERIES = [
    "ngram_novelty",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "length_quantile_sketch",
    "sketch_kmv_distinct",
    "sketch_hll_union",
]


def build_input(replicas: int) -> str:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{WORK}/docs_r{replicas}/documents.parquet"
    if os.path.exists(path):
        return os.path.dirname(path)
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n_base = len(rows)
    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for r in range(replicas):
        for doc_id, text, lang, source, n_chars in rows:
            t = (
                text
                if r == 0
                else " ".join(w + str(r) for w in text.split())
            )
            out["doc_id"].append(doc_id + r * n_base)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(out), path, row_group_size=4096)
    return os.path.dirname(path)


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    from medical_ocr_pipeline_spark.queries import REGISTRY
    from medical_ocr_pipeline_spark.session import get_spark

    spark = get_spark(master="local[28]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    sizes = {replicas: build_input(replicas),
             4 * replicas: build_input(4 * replicas)}
    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for trial in range(2):  # best-of-2, interleaved across sizes
        for r, d in sizes.items():
            for n in names:
                # isolation: queries that persist() shared sub-plans
                # (the dedup tiers' shingle index) would otherwise hand
                # a warm cache to whoever runs second and make per-query
                # times incomparable (measured: the same tier reads
                # 3.7 s cached vs 17.2 s cold at R=10)
                spark.catalog.clearCache()
                t0 = time.time()
                REGISTRY[n].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                cur = results[n].get(r)
                results[n][r] = dt if cur is None else min(cur, dt)
                print(f"trial{trial} {n} R={r}: {dt:.1f}s", flush=True)
    lines = [
        f"\n## Round-4 wave input-scaling probe ({replicas * 5000} -> "
        f"{4 * replicas * 5000} docs, local[28], best-of-2)\n",
        "| query | secs @R | secs @4R | growth (linear=4) |",
        "|---|---|---|---|",
    ]
    for n in names:
        a, b = results[n][replicas], results[n][4 * replicas]
        lines.append(f"| {n} | {a:.1f} | {b:.1f} | {b / a:.2f}x |")
    report = "\n".join(lines) + "\n"
    print(report)
    if os.environ.get("SPARK_GRAFT_APPEND_BENCH") == "1":
        with open(f"{REPO}/BENCH.md", "a") as f:
            f.write(report)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
