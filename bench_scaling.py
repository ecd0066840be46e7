"""Two-cluster-size scaling evidence (north rule: same outputs at N and
4N executors, throughput scaling efficiency >= 0.8).

This sandbox has one machine, so the two "cluster sizes" are local[8]
and local[32] (same box, same deterministic input).  For each size we:

  1. generate the identical synthetic transcripts table distributed,
  2. run the full per-turn extraction pipeline,
  3. compute an order-insensitive checksum of every output row
     (sum of xxhash64 over the concatenated row) — proving turn-level
     output equality across cluster sizes,
  4. report turns/sec.

Efficiency = (throughput@32 / throughput@8) / 4.  Results are printed as
JSON and appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "8000"))
SIZES = (8, 32)
INPUT_PATH = f"/tmp/spark_graft_scaling_input_{N_CONVS}"


def materialize_input() -> None:
    """Generate the deterministic input table once; both cluster sizes
    read the identical parquet."""
    from medical_ocr_pipeline_spark.session import get_spark
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    if os.path.exists(os.path.join(INPUT_PATH, "_SUCCESS")):
        return
    spark = get_spark(app="scaling_gen", master="local[32]")
    spark_transcripts(spark, N_CONVS, partitions=128).write.mode(
        "overwrite"
    ).parquet(INPUT_PATH)
    spark.stop()


def run_at(cores: int) -> dict:
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.pipeline import extract_transcripts
    from medical_ocr_pipeline_spark.session import get_spark

    spark = get_spark(app=f"scaling_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(8, cores))
    transcripts = spark.read.parquet(INPUT_PATH)
    # warm the JVM + python workers so measured time is the pipeline, not
    # process spin-up
    extract_transcripts(transcripts.limit(2000)).count()

    t0 = time.time()
    df = extract_transcripts(transcripts)
    row = (
        df.select(
            F.xxhash64(
                "conv_id", "turn_idx", "text_final", "n_blocks",
                "bytes_stripped", "parse_failures",
            ).alias("h")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    spark.stop()
    return {
        "cores": cores,
        "turns": row["n"],
        "sec": round(dt, 2),
        "turns_per_sec": round(row["n"] / dt, 1),
        "checksum": int(row["checksum"]),
    }


def main() -> None:
    materialize_input()
    results = [run_at(c) for c in SIZES]
    lo, hi = results[0], results[-1]
    speedup = hi["turns_per_sec"] / lo["turns_per_sec"]
    efficiency = speedup / (hi["cores"] / lo["cores"])
    same_output = len({r["checksum"] for r in results}) == 1 and len(
        {r["turns"] for r in results}
    ) == 1
    out = {
        "metric": "extraction_scaling",
        "n_convs": N_CONVS,
        "runs": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "efficiency_target": 0.8,
        "same_output_at_both_sizes": same_output,
    }
    print(json.dumps(out))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"),
              "a") as f:
        f.write(
            f"\n## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"| cores | turns | sec | turns/sec |\n|---|---|---|---|\n"
            + "".join(
                f"| {r['cores']} | {r['turns']} | {r['sec']} | {r['turns_per_sec']} |\n"
                for r in results
            )
            + f"\nspeedup {lo['cores']}->{hi['cores']}: **{speedup:.2f}x**, "
            f"scaling efficiency: **{efficiency:.3f}** (target >= 0.8); "
            f"identical output checksum at both sizes: **{same_output}**\n"
        )

    if not same_output:
        sys.exit(2)
    if efficiency < 0.8:
        sys.exit(3)


if __name__ == "__main__":
    main()
