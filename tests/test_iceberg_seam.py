"""The Iceberg DataFrameWriterV2 code path (VERDICT r01 #9).

The iceberg-spark runtime jar is not in this container
(scripts/iceberg_probe.py documents the attempted mechanisms:
ICEBERG_PROBE.md — no artifact on disk, no outbound network), so the V2
write is CONDITIONALLY skipped: set SPARK_GRAFT_ICEBERG_JAR to a real
iceberg-spark-runtime jar and the snapshot test auto-runs the full
create / bucket-partition / append / time-travel cycle via a dedicated
spark-submit (a second SparkContext cannot coexist in this JVM, so the
live test is a subprocess).  The fallback contract (write_stage with an
iceberg_table still lands parquet when the jar is absent) IS runnable
here and pinned.
"""

import os
import subprocess

import pytest

_JAR = os.environ.get("SPARK_GRAFT_ICEBERG_JAR", "")
HAVE_JAR = os.path.isfile(_JAR)

from medical_ocr_pipeline_spark.pipeline import (
    iceberg_available,
    write_stage,
    write_stage_iceberg,
)


@pytest.mark.skipif(HAVE_JAR, reason="a real Iceberg jar is configured")
def test_iceberg_not_available_in_sandbox(spark):
    assert iceberg_available(spark) is False


def test_write_stage_falls_back_to_parquet(spark, tmp_path):
    df = spark.range(5).selectExpr("cast(id as string) AS conv_id", "id AS v")
    out = str(tmp_path / "stage")
    write_stage(df, out, iceberg_table="local.db.stage")
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert set(got.columns) == {"conv_id", "v"}


def test_write_stage_iceberg_raises_without_runtime(spark):
    df = spark.range(1).selectExpr("cast(id as string) AS conv_id")
    with pytest.raises(RuntimeError, match="iceberg-spark runtime"):
        write_stage_iceberg(df, "local.db.t")


@pytest.mark.skipif(not HAVE_JAR, reason=(
    "iceberg-spark runtime jar absent from this container and "
    "unfetchable offline (ICEBERG_PROBE.md).  Set "
    "SPARK_GRAFT_ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar to "
    "auto-run the live snapshot cycle: create local.db.stage "
    "partitioned by bucket(64, conv_id), append a second snapshot, "
    "assert two snapshots exist and time-travel reads the first."
))
def test_write_stage_iceberg_snapshots(tmp_path):
    """Live snapshot semantics via spark-submit --jars (subprocess:
    one JVM cannot host a second SparkContext next to the fixture
    session)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "probe.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from pyspark.sql import SparkSession\n"
        "from medical_ocr_pipeline_spark.pipeline import ("
        "iceberg_available, write_stage_iceberg)\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "assert iceberg_available(spark)\n"
        "df = spark.range(10).selectExpr("
        "'cast(id as string) AS conv_id', 'id AS v')\n"
        "write_stage_iceberg(df, 'local.db.stage')\n"
        "write_stage_iceberg(df, 'local.db.stage', mode='append')\n"
        "snaps = spark.sql('SELECT snapshot_id FROM "
        "local.db.stage.snapshots ORDER BY committed_at').collect()\n"
        "first = spark.read.option('snapshot-id', "
        "snaps[0].snapshot_id).table('local.db.stage').count()\n"
        "print(f'PROBE snapshots={len(snaps)} "
        "rows={spark.read.table(\"local.db.stage\").count()} "
        "travel={first}')\n"
    )
    proc = subprocess.run(
        [
            "spark-submit", "--jars", _JAR,
            "--conf", "spark.sql.catalog.local="
                      "org.apache.iceberg.spark.SparkCatalog",
            "--conf", "spark.sql.catalog.local.type=hadoop",
            "--conf",
            f"spark.sql.catalog.local.warehouse={tmp_path}/wh",
            str(script),
        ],
        capture_output=True, text=True, timeout=420,
    )
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("PROBE ")
    ]
    assert lines == ["PROBE snapshots=2 rows=20 travel=10"], proc.stderr[-2000:]


def test_write_stage_iceberg_rejects_foreign_modes(spark):
    """ADVICE r02 #3: DataFrameWriterV2 has no error/ignore semantics —
    mapping them to createOrReplace would silently overwrite a table the
    caller asked to protect.  Validation precedes the runtime check so
    the contract is pinned even without the jar."""
    df = spark.range(1).selectExpr("cast(id as string) AS conv_id")
    for bad in ("error", "ignore", "errorifexists", ""):
        with pytest.raises(ValueError, match="overwrite.*append"):
            write_stage_iceberg(df, "local.db.t", mode=bad)
