"""Catalyst lag/cumsum regrouping == in-batch core regrouping, on the
same synthetic layout blocks."""

import pandas as pd

from medical_ocr_pipeline_spark.core.lineify import regroup_lines
from medical_ocr_pipeline_spark.core.parse import parse_layout
from medical_ocr_pipeline_spark.operators.sessionize import regroup_lines_catalyst
from medical_ocr_pipeline_spark.synth import iter_turns


def _layout_blocks(n_convs=25):
    """(turn rows, exploded block rows) for every layout-variant turn."""
    per_turn = {}
    exploded = []
    for conv_id, turn_idx, _r, text, _t, _ts in iter_turns(n_convs):
        first = text.split("\n", 1)[0]
        if "|" not in first or "," not in first:
            continue
        blocks, fails = parse_layout(text)
        if fails or not blocks:
            continue
        per_turn[(conv_id, turn_idx)] = blocks
        for b in blocks:
            exploded.append({
                "conv_id": conv_id, "turn_idx": turn_idx,
                "text": b["text"], "confidence": b["confidence"],
                "x0": b["bbox"][0], "y0": b["bbox"][1],
                "x1": b["bbox"][2], "y1": b["bbox"][3],
                "source": b["source"],
            })
    return per_turn, exploded


def test_catalyst_equals_core(spark):
    per_turn, exploded = _layout_blocks()
    assert per_turn, "need layout turns in fixture"
    df = spark.createDataFrame(pd.DataFrame(exploded)).repartition(8)
    got = regroup_lines_catalyst(df).toPandas()

    for (conv_id, turn_idx), blocks in per_turn.items():
        want = regroup_lines(blocks)
        sub = got[(got["conv_id"] == conv_id) & (got["turn_idx"] == turn_idx)]
        assert len(sub) == len(want), (conv_id, turn_idx)
        for row, wb in zip(sub.itertuples(index=False), want):
            assert row.text == wb["text"], (conv_id, turn_idx)
            assert abs(row.confidence - wb["confidence"]) < 1e-9
            assert [row.x0, row.y0, row.x1, row.y1] == wb["bbox"]
            assert row.source == wb["source"]
