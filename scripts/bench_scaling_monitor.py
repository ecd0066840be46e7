"""Two-cluster-size scaling evidence for job_monitor.py — the second
runtime surface with its own N -> 4N record (VERDICT r04 item #6;
bench_scaling.py covers the extraction job).

Protocol mirrors bench_scaling.py: each "cluster size" is a
taskset-pinned fresh spark-submit of the REAL job over the SAME
pre-materialized deterministic input (sf0.1 documents replicated
REPLICAS times with offset doc_ids — ~1.3M docs, enough that the
monitors' combinable aggregations dominate the fixed per-stage setup),
best-of-TRIALS interleaved fresh-JVM legs per size, slots = cores -
cores/8 (the production executor layout), and an order-insensitive
checksum over every monitor output dir (metrics/ excluded — it carries
run_id + wall-clock ts by design) proving identical outputs across
sizes AND trials.  Efficiency is reported raw and normalized to the
host's own spin ceiling (shared-VM cycle delivery at 4N vs N), the
same honesty discipline as the extraction record.

Run:  python scripts/bench_scaling_monitor.py        (~6-10 min)
Env:  SPARK_GRAFT_SCALING_SIZES=8,32  SPARK_GRAFT_SCALING_TRIALS=3
      SPARK_GRAFT_MONITOR_REPLICAS=16
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import _package_zip, calibrate, slots_for  # noqa: E402

SIZES = tuple(
    int(c)
    for c in os.environ.get("SPARK_GRAFT_SCALING_SIZES", "8,32").split(",")
)
TRIALS = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "3"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_MONITOR_REPLICAS", "256"))
SRC = os.environ.get(
    "SPARK_GRAFT_MONITOR_SRC", "/root/testdata/sf0.1/documents.parquet"
)
INPUT_PATH = f"/tmp/spark_graft_monitor_input_x{REPLICAS}"

# metrics/ is excluded: it appends one row per run with run_id and a
# current_timestamp column — version/run provenance, not monitor output
CHECK_STAGES = (
    "monitor_corr", "monitor_chi2", "monitor_gini", "monitor_diversity",
    "monitor_drift", "monitor_oov", "monitor_quantiles",
    "monitor_head_coverage", "monitor_ks", "monitor_mw", "eval_sample",
)


def materialize_input() -> None:
    """REPLICAS deterministic copies of the sf0.1 documents table with
    offset doc_ids (doc_id + rep * 1e7) — same text/lang/source mix, so
    the monitors do REPLICAS x the aggregation work over an input whose
    statistics are a pure function of the source table."""
    if os.path.exists(os.path.join(INPUT_PATH, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.session import get_spark

    spark = get_spark(app="monitor_scaling_gen", master="local[32]")
    docs = spark.read.parquet(SRC)
    out = (
        docs.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
            .alias("_rep")
        )
        .withColumn(
            "doc_id",
            (F.col("doc_id") + F.col("_rep").cast("long") * 10_000_000),
        )
        .drop("_rep")
        .repartition(256, "doc_id")
    )
    out.write.mode("overwrite").parquet(INPUT_PATH)
    spark.stop()


def checksum_outputs(out_dir: str) -> str:
    """Order-insensitive digest of every monitor frame: rows sorted by
    all columns, md5 over the concatenated per-stage csv bytes."""
    import duckdb

    h = hashlib.md5()
    for stage in CHECK_STAGES:
        df = duckdb.sql(
            f"SELECT * FROM '{out_dir}/{stage}/*.parquet'"
        ).df()
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        h.update(stage.encode())
        h.update(df.to_csv(index=False).encode())
    return h.hexdigest()


def run_once(cores: int, tag: str) -> dict:
    slots = slots_for(cores)
    out_dir = f"/tmp/monitor_scaling_{cores}_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    submit = shutil.which("spark-submit")
    job = os.path.join(REPO, "medical_ocr_pipeline_spark", "job_monitor.py")
    if submit:
        cmd = [
            submit,
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
            "--conf", "spark.driver.extraJavaOptions=-XX:+UseG1GC",
            "--conf", f"spark.sql.shuffle.partitions={slots}",
            # the replicated input is a few hundred MB compressed: the
            # default 128 MB maxPartitionBytes would scan (and CACHE)
            # it as <10 partitions, capping every downstream stage's
            # map parallelism at that count regardless of slots — the
            # same spill-aware read sizing bench_scaling.py applies
            "--conf", "spark.sql.files.maxPartitionBytes=4m",
            "--conf", "spark.sql.files.openCostInBytes=262144",
            "--py-files", _package_zip(),
            job,
        ]
    else:
        cmd = [sys.executable, job]
    cmd += [
        "--input", INPUT_PATH, "--out", out_dir,
        "--master", f"local[{slots}]", "--run-id", f"scal_{cores}_{tag}",
        # same rule both sizes: 4 concurrent monitor stages (measured
        # best at both sizes — 11 oversubscribes shuffle memory)
        "--parallel-stages", "4",
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"monitor child (cores={cores}) failed")
    result = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    )
    kv = dict(p.split("=") for p in result.split()[1:])
    docs, secs = int(kv["docs"]), float(kv["secs"])
    digest = checksum_outputs(out_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "cores": cores,
        "slots": slots,
        "docs": docs,
        "sec": secs,
        "docs_per_sec": round(docs / secs, 1),
        "checksum": digest,
    }


def main() -> None:
    materialize_input()
    trials: dict[int, list[dict]] = {c: [] for c in SIZES}
    for t in range(TRIALS):
        for c in SIZES:  # interleaved: host phases hit both sizes
            trials[c].append(run_once(c, f"t{t}"))
    results = []
    for c in SIZES:
        sums = {r["checksum"] for r in trials[c]}
        if len(sums) != 1:
            raise RuntimeError(
                f"nondeterministic monitor output at {c} cores: {sums}"
            )
        best = max(trials[c], key=lambda r: r["docs_per_sec"])
        best["all_dps"] = [r["docs_per_sec"] for r in trials[c]]
        results.append(best)

    lo, hi = results[0], results[-1]
    same_output = len({r["checksum"] for r in results}) == 1
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    efficiency = speedup / (hi["cores"] / lo["cores"])
    cal = {c: calibrate(c) for c in (lo["cores"], hi["cores"])}
    ceiling = (cal[hi["cores"]] / cal[lo["cores"]]) / (
        hi["cores"] / lo["cores"]
    )
    normalized = efficiency / ceiling if ceiling > 0 else 0.0
    out = {
        "metric": "monitor_scaling",
        "replicas": REPLICAS,
        "runs": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency_raw": round(efficiency, 3),
        "hw_ceiling_efficiency_spin": round(ceiling, 3),
        "scaling_efficiency_normalized": round(normalized, 3),
        "efficiency_target": 0.8,
        "same_output_at_both_sizes": same_output,
    }
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## job_monitor scaling run "
            f"({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"input: sf0.1 documents x{REPLICAS} = {hi['docs']} docs "
            f"(deterministic replication, identical parquet for both "
            f"sizes); pinned via taskset, slots = cores - cores/8; "
            f"checksum spans all 11 monitor frames (metrics/ excluded: "
            f"run_id + wall-clock ts by design).\n\n"
            f"| cores | slots | docs | sec | docs/sec | all trials |\n"
            f"|---|---|---|---|---|---|\n"
            + "".join(
                f"| {r['cores']} | {r['slots']} | {r['docs']} | {r['sec']} "
                f"| {r['docs_per_sec']} | {r['all_dps']} |\n"
                for r in results
            )
            + f"\nspeedup {lo['cores']}->{hi['cores']}: **{speedup:.2f}x**; "
            f"raw scaling efficiency: **{efficiency:.3f}**; host spin "
            f"ceiling at 4N vs N: **{ceiling:.3f}**; spin-normalized: "
            f"**{normalized:.3f}** (target >= 0.8); identical output "
            f"checksum across sizes and trials: **{same_output}**\n"
        )
    if not same_output:
        sys.exit(2)


if __name__ == "__main__":
    main()
