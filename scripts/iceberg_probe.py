"""Iceberg runtime probe (VERDICT r04 item #8): try every mechanism to
obtain an iceberg-spark-runtime jar in this environment, write the
attempt log to ICEBERG_PROBE.md, and — when a jar IS found — drive the
real snapshot semantics end-to-end via spark-submit --jars so the two
skip-marked tests in tests/test_iceberg_seam.py convert to green.

Mechanisms, in order:
  1. SPARK_GRAFT_ICEBERG_JAR env var pointing at a jar;
  2. any iceberg-spark-runtime*.jar already on disk (pyspark jars dir,
     /opt, /usr/share/java, ~/.ivy2, ~/.m2);
  3. fetch from Maven Central (fails closed in an offline sandbox).

Run: python scripts/iceberg_probe.py
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAVEN_URL = (
    "https://repo1.maven.org/maven2/org/apache/iceberg/"
    "iceberg-spark-runtime-4.0_2.13/1.10.0/"
    "iceberg-spark-runtime-4.0_2.13-1.10.0.jar"
)

SEARCH_GLOBS = [
    os.path.expanduser("~/.ivy2/**/iceberg-spark-runtime*.jar"),
    os.path.expanduser("~/.m2/**/iceberg-spark-runtime*.jar"),
    "/opt/**/iceberg-spark-runtime*.jar",
    "/usr/share/java/**/iceberg-spark-runtime*.jar",
]


def find_jar(log: list[str]) -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR", "")
    if env:
        if os.path.isfile(env):
            log.append(f"- env SPARK_GRAFT_ICEBERG_JAR -> `{env}` (found)")
            return env
        log.append(
            f"- env SPARK_GRAFT_ICEBERG_JAR set to `{env}` but no such file"
        )
    else:
        log.append("- env SPARK_GRAFT_ICEBERG_JAR: unset")
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "*iceberg*"))
        log.append(
            f"- pyspark jars dir ({len(os.listdir(jars_dir))} jars): "
            + (f"found {hits}" if hits else "no iceberg jar")
        )
        if hits:
            return hits[0]
    except Exception as exc:  # pragma: no cover
        log.append(f"- pyspark jars dir: probe error {exc!r}")
    for pat in SEARCH_GLOBS:
        hits = glob.glob(pat, recursive=True)
        log.append(f"- glob `{pat}`: {hits if hits else 'none'}")
        if hits:
            return hits[0]
    return None


def try_fetch(log: list[str]) -> str | None:
    dest = os.path.join(REPO, "dist", os.path.basename(MAVEN_URL))
    cmd = ["curl", "-fsSL", "--max-time", "60", "-o", dest, MAVEN_URL]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode == 0 and os.path.getsize(dest) > 1_000_000:
        log.append(
            f"- maven central fetch: OK ({os.path.getsize(dest)} bytes)"
        )
        return dest
    log.append(
        f"- maven central fetch: FAILED exit={proc.returncode} after "
        f"{time.time() - t0:.1f}s (`{' '.join(cmd)}`; stderr: "
        f"{proc.stderr.strip()[:200] or 'none'}) — no outbound network "
        "in this sandbox"
    )
    if os.path.exists(dest):
        os.remove(dest)
    return None


def validate(jar: str, log: list[str]) -> bool:
    """Real snapshot semantics via spark-submit --jars: create a
    bucket-partitioned table, append a second snapshot, time-travel."""
    script = os.path.join(REPO, "dist", "_iceberg_validate.py")
    wh = "/tmp/iceberg_probe_wh"
    with open(script, "w") as f:
        f.write(
            "import sys\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "from pyspark.sql import SparkSession\n"
            "from medical_ocr_pipeline_spark.pipeline import ("
            "iceberg_available, write_stage_iceberg)\n"
            "spark = SparkSession.builder.getOrCreate()\n"
            "assert iceberg_available(spark), 'catalog still missing'\n"
            "df = spark.range(10).selectExpr("
            "'cast(id as string) AS conv_id', 'id AS v')\n"
            "write_stage_iceberg(df, 'local.db.stage')\n"
            "write_stage_iceberg(df, 'local.db.stage', mode='append')\n"
            "snaps = spark.sql("
            "'SELECT snapshot_id FROM local.db.stage.snapshots "
            "ORDER BY committed_at').collect()\n"
            "first = spark.read.option('snapshot-id', "
            "snaps[0].snapshot_id).table('local.db.stage').count()\n"
            "print(f'PROBE snapshots={len(snaps)} "
            "rows={spark.read.table(\"local.db.stage\").count()} "
            "travel={first}')\n"
        )
    cmd = [
        "spark-submit", "--jars", jar,
        "--conf", "spark.sql.catalog.local="
                  "org.apache.iceberg.spark.SparkCatalog",
        "--conf", "spark.sql.catalog.local.type=hadoop",
        "--conf", f"spark.sql.catalog.local.warehouse={wh}",
        script,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=420)
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("PROBE ")),
        None,
    )
    log.append(f"- validation spark-submit: `{line or 'no PROBE line'}` "
               f"(exit {proc.returncode})")
    return line == "PROBE snapshots=2 rows=20 travel=10"


def main() -> None:
    log: list[str] = [
        f"# Iceberg runtime probe — {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        "Goal: convert the two skip-marked Iceberg tests "
        "(tests/test_iceberg_seam.py) into live snapshot tests.",
        "",
    ]
    jar = find_jar(log)
    if jar is None:
        jar = try_fetch(log)
    if jar is None:
        log += [
            "",
            "**Outcome: no jar obtainable in this environment** — no "
            "iceberg artifact on disk and no outbound network.  The "
            "conditional gate stands ready: set "
            "`SPARK_GRAFT_ICEBERG_JAR=/path/to/iceberg-spark-runtime-"
            "*.jar` and (a) `pytest tests/test_iceberg_seam.py` "
            "auto-runs the live snapshot test via spark-submit, (b) "
            "this probe's validation step performs the same "
            "create/append/time-travel cycle.",
        ]
        ok = False
    else:
        ok = validate(jar, log)
        log.append(
            f"\n**Outcome: jar `{jar}` — live snapshot validation "
            f"{'PASSED' if ok else 'FAILED'}**"
        )
    with open(os.path.join(REPO, "ICEBERG_PROBE.md"), "w") as f:
        f.write("\n".join(log) + "\n")
    print("\n".join(log))
    sys.exit(0 if (jar is None or ok) else 1)


if __name__ == "__main__":
    main()
