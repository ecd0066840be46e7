"""04/05 Catalyst structured extraction: from_json + corrupt capture +
typed merge, checked against the single-process deep-merge semantics."""

import json

import pytest
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.core.merge import merge_pieces
from medical_ocr_pipeline_spark.core.parse import light_repair, strip_fences
from medical_ocr_pipeline_spark.plans.structured import (
    extraction_failures,
    merge_documents,
    structured_extract,
)
from medical_ocr_pipeline_spark.synth import iter_turns, spark_transcripts

N_CONVS = 60


@pytest.fixture(scope="module")
def transcripts_pq(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("structured") / "transcripts")
    spark_transcripts(spark, N_CONVS, partitions=4).write.parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def structured(spark, transcripts_pq):
    s = structured_extract(transcripts_pq).cache()
    s.count()
    yield s
    s.unpersist()


def test_parse_failure_capture(structured):
    pdf = structured.toPandas()
    assert len(pdf) > 0
    # the generator breaks ~20% of fenced payloads beyond repair
    assert 0 < pdf["parse_failed"].sum() < len(pdf)
    # successful rows carry content
    ok = pdf[~pdf["parse_failed"]]
    assert ok["summary"].notna().all()


def test_merge_matches_single_process(spark, structured):
    got = merge_documents(structured).orderBy("conv_id").toPandas()

    # single-process reference: same parse chain + merge_pieces
    pieces_by_conv: dict[str, list[dict]] = {}
    for conv_id, turn_idx, _r, text, _t, _ts in sorted(
        iter_turns(N_CONVS), key=lambda r: (r[0], r[1])
    ):
        if not text.startswith("```"):
            continue
        try:
            doc = json.loads(light_repair(strip_fences(text)))
        except (json.JSONDecodeError, ValueError):
            continue
        pieces_by_conv.setdefault(conv_id, []).append(
            {k: doc.get(k) for k in ("summary", "items", "dose")}
        )

    want = {
        conv: merge_pieces([{k: v for k, v in p.items() if v} for p in ps])
        for conv, ps in pieces_by_conv.items()
    }
    assert set(got["conv_id"]) == set(want)
    for _, row in got.iterrows():
        w = want[row["conv_id"]]
        assert row["summary"] == w.get("summary")
        assert row["dose"] == w.get("dose")
        assert list(row["items"]) == w.get("items", [])


def test_failure_metrics(structured):
    m = extraction_failures(structured).toPandas()
    pdf = structured.toPandas()
    assert m["n_turns"].sum() == len(pdf)
    assert m["parse_failures"].sum() == pdf["parse_failed"].sum()


def test_whole_stage_codegen(spark, transcripts_pq):
    """The structured path must stay JVM-side: no python evals in the
    plan, and whole-stage codegen present."""
    df = merge_documents(structured_extract(transcripts_pq))
    df.collect()  # let AQE finalize the physical plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan and "MapInArrow" not in plan
    # the fenced-turn predicate reaches the parquet scan (pushdown)
    assert "StringStartsWith(text,```)" in plan
