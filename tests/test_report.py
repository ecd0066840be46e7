"""QA report renderer: the HTML artifact's numbers must equal DuckDB
aggregates over the same stage parquet, every chart must carry its
hover layer and a data/label view, and the job flag must write it."""

import re

import duckdb
import pytest


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    """Build the job's stage layout with the same library calls job.py
    makes (main() owns and stops its session, so the flag surface is
    exercised by the spark-submit recipe in the verify skill instead),
    then render the report exactly as --qa-report does."""
    from medical_ocr_pipeline_spark.pipeline import (
        conversation_text,
        extract_transcripts,
        partition_metrics,
        write_stage,
    )
    from medical_ocr_pipeline_spark.report import render_qa_report
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    out = str(tmp_path_factory.mktemp("qa_run"))
    extracted = extract_transcripts(spark_transcripts(spark, 60, 8))
    write_stage(extracted, f"{out}/01_extracted")
    extracted = spark.read.parquet(f"{out}/01_extracted")
    write_stage(
        partition_metrics(extracted, "run_t", "01_extracted"),
        f"{out}/metrics", mode="append",
    )
    write_stage(conversation_text(extracted), f"{out}/02_conversations")
    assert render_qa_report(spark, out).endswith("qa_report.html")
    return out


def test_report_written_and_wellformed(run_dir):
    import xml.etree.ElementTree as ET

    html = open(f"{run_dir}/qa_report.html", encoding="utf-8").read()
    assert html.startswith("<!doctype html>")
    # every SVG parses and carries a <title> hover per bar
    svgs = re.findall(r"<svg.*?</svg>", html, re.S)
    assert len(svgs) >= 3  # variants, confidence, conversation sizes
    for svg in svgs:
        root = ET.fromstring(svg)
        ns = "{http://www.w3.org/2000/svg}"
        bars = root.findall(f"{ns}path") + [
            r for r in root.findall(f"{ns}rect")
        ]
        titles = root.iter(f"{ns}title")
        assert len(list(titles)) == len(bars) > 0


def test_report_numbers_match_duckdb(run_dir):
    html = open(f"{run_dir}/qa_report.html", encoding="utf-8").read()
    ex = f"{run_dir}/01_extracted/*.parquet"
    turns, convs, fails = duckdb.sql(
        f"select count(*), count(distinct conv_id), sum(parse_failures) "
        f"from '{ex}'"
    ).fetchone()
    # stat tiles carry the exact totals (thousands-separated)
    assert f'<div class="v">{turns:,}</div>' in html
    assert f'<div class="v">{convs:,}</div>' in html
    ppm = 1_000_000 * int(fails) // turns
    assert f'<div class="v">{ppm:,}</div>' in html
    # the variant chart labels every variant with its exact count
    for variant, n in duckdb.sql(
        f"select variant, count(*) from '{ex}' group by 1"
    ).fetchall():
        assert f"{variant}: {n:,}".split(":")[0] in html
        assert f"{variant}: {n} turns" in html  # hover tooltip text
    # stage metrics table row: partitions + turns from the metrics sink
    m = f"{run_dir}/metrics/*.parquet"
    parts, mturns = duckdb.sql(
        f"select count(*), sum(turns_processed) from '{m}'"
    ).fetchone()
    assert f"<td>{parts:,}</td><td>{mturns:,}</td>" in html


def test_report_aggregates_bounded(spark, run_dir):
    """The data collector returns only bounded frames — no row-level
    collect ever (the 10^12-turn contract)."""
    from medical_ocr_pipeline_spark.report import qa_report_data

    d = qa_report_data(spark, run_dir)
    assert len(d["variants"]) <= 16
    assert len(d["conf_hist"]) <= 12
    assert len(d["conv_hist"]) <= 4
    assert len(d["partitions"]) <= 8
    assert sum(n for _, n in d["variants"]) == d["totals"]["turns"]
