"""Empirical skew evidence: megaconversation assembly, two-phase vs
single-phase.

Input: synthetic transcripts where ONE conversation holds a large
fraction of all turns (the megaconversation tail of the power-law).
Compares the engine's two-phase ordered assembly (bucket partial
aggregation, then per-conversation merge — pipeline.conversation_text)
against the naive single-phase groupBy(conv_id) collect_list, which
funnels the megaconversation through one reduce task.

Usage: python scripts/bench_skew.py  [prints one JSON line, appends to
BENCH.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MEGA_TURNS = int(os.environ.get("SPARK_GRAFT_SKEW_MEGA", "120000"))
SMALL_CONVS = int(os.environ.get("SPARK_GRAFT_SKEW_SMALL", "4000"))
# per-turn payload width multiplier: the skew hazard is single-reduce-task
# STATE (collect_list bytes), which scales with turns x text size
TEXT_REPEAT = int(os.environ.get("SPARK_GRAFT_SKEW_TEXT_REPEAT", "1"))


def single_phase(extracted):
    """The naive assembly comparator: one shuffle on conv_id, one reduce
    task gets the whole megaconversation."""
    from medical_ocr_pipeline_spark.pipeline import _assemble_single_phase

    return _assemble_single_phase(extracted)


def main() -> None:
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.pipeline import (
        conversation_text,
        extract_transcripts,
    )
    from medical_ocr_pipeline_spark.session import get_spark
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    spark = get_spark(app="skew_bench", master="local[32]")

    # small conversations + one megaconversation
    small = spark_transcripts(spark, SMALL_CONVS, partitions=64)
    mega = (
        spark.range(MEGA_TURNS)
        .select(
            F.lit("conv_mega").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("turn payload "), F.col("id").cast("string"),
                     F.repeat(
                         F.lit(" lorem ipsum dolor sit amet consectetur"),
                         TEXT_REPEAT,
                     ))
            .alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(1767225600) + F.col("id")).alias("ts"),
        )
    )
    tr = small.unionByName(mega).repartition(128).cache()
    n = tr.count()
    extracted = extract_transcripts(tr).cache()
    extracted.count()  # materialize: assembly timing excludes extraction

    def timed(fn, runs=3):
        """First run warms codegen/JIT and is discarded; best of `runs`
        after that (the host shows 2-3x first-run and +-40% load noise)."""
        best = float("inf")
        out = None
        for i in range(runs + 1):
            t0 = time.time()
            df = fn(extracted)
            row = df.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("conv_id", "conv_text", "n_turns").cast(
                    "decimal(38,0)")).alias("h"),
            ).collect()[0]
            if i > 0:
                best = min(best, time.time() - t0)
            out = (row["n"], int(row["h"]))
        return best, out

    from medical_ocr_pipeline_spark.pipeline import assembly_regime

    # the adaptive probe — the ENGINE'S OWN decision function, timed once
    # on its own: ONE combinable sum-of-lengths scan.  At production
    # scale it is noise next to shuffling the text itself, at micro-bench
    # scale it is visible, so it is reported separately from the chosen
    # plan's time.
    t0 = time.time()
    chosen_bucket, mx = assembly_regime(extracted)
    t_probe = time.time() - t0
    regime = "two_phase" if chosen_bucket else "single_phase"

    # the plan the adaptive path selects, without re-probing per run;
    # when it selects single_phase the two plans are IDENTICAL, so one
    # timing pass serves both (timing the same plan twice only measures
    # host noise)
    t1, out1 = timed(single_phase)
    if chosen_bucket:
        t2, out2 = timed(
            lambda ex: conversation_text(ex, bucket_size=chosen_bucket)
        )
    else:
        t2, out2 = t1, out1
    same = out1 == out2

    result = {
        "metric": "skew_assembly",
        "turns": n,
        "mega_turns": MEGA_TURNS,
        "small_convs": SMALL_CONVS,
        "max_conv_state_bytes": int(mx),
        "adaptive_regime": regime,
        "probe_sec": round(t_probe, 2),
        "adaptive_sec": round(t2, 2),
        "single_phase_sec": round(t1, 2),
        "speedup": round(t1 / t2, 2),
        "identical_output": same,
    }
    print(json.dumps(result))

    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Skew run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"{n} turns, one megaconversation of {MEGA_TURNS} turns among "
            f"{SMALL_CONVS} small conversations; assembly only (extraction "
            f"pre-materialized). Adaptive assembly chose **{regime}** (max "
            f"conv state {mx / 2**20:.0f} MiB, probe {t_probe:.2f}s "
            f"reported separately): chosen plan **{t2:.2f}s** vs naive "
            f"single-phase groupBy **{t1:.2f}s** -> **{t1 / t2:.2f}x**; "
            f"identical output: **{same}**. (warm best-of-3 per plan)\n"
        )

    spark.stop()
    if not same:
        sys.exit(2)


if __name__ == "__main__":
    main()
