"""Spatial-cell-scoped rescue (P5 + J9 literal form) against hand-built
layout fixtures.

Reference semantics pinned here (01_extract_blocks cell 2:26-55, knobs
cell 1:40-42): 3x3 grid with remainder absorbed by the last row/column;
open-interval overlap predicate (touching edges do NOT overlap); sparse
cell = overlapping blocks carry < 60 chars; heavy pass scoped to the
cell sees CELL-LOCAL coordinates and results are translated back by the
cell origin with a source suffix.
"""

import pandas as pd

from medical_ocr_pipeline_spark.core.extract import extract_turn_blocks
from medical_ocr_pipeline_spark.core.parse import (
    CELL_MIN_CHARS,
    blocks_in_cell,
    grid_rescue,
    parse_layout,
    parse_layout_relaxed,
    split_grid,
    translate_blocks,
)

# page 1000x1400, grid cells 333/466 wide/tall.  Dense text top-left
# (cell 0), a strict-unparseable line bottom-right (cell 8), plus one
# malformed line inside the DENSE cell that must NOT be rescued.
DENSE = (
    "10,10,300,30,0.95,native|"
    + "dense top left content with plenty of characters to pass the gate"
)
MALFORMED_DENSE = "15 35 250 55 0.9 ocr_a|more dense cell text never rescued"
MALFORMED_SPARSE = "700;1000;950;1020;0.88;ocr_b|bottom right rescued line"
MALFORMED_NOCONF = "700,1050,950,1070|rescued with default conf"
GARBAGE = "not a layout line at all"
PAYLOAD = "\n".join(
    [DENSE, MALFORMED_DENSE, MALFORMED_SPARSE, MALFORMED_NOCONF, GARBAGE]
)


def test_split_grid_remainder_cells():
    cells = split_grid(1000.0, 1400.0, 3)
    assert len(cells) == 9
    assert cells[0] == (0.0, 0.0, 333.0, 466.0)
    # last column/row absorb the remainder
    assert cells[2] == (666.0, 0.0, 1000.0, 466.0)
    assert cells[8] == (666.0, 932.0, 1000.0, 1400.0)


def test_blocks_in_cell_open_interval():
    b = {"bbox": [100.0, 100.0, 333.0, 200.0], "text": "t"}
    # touching the cell's left edge exactly -> disjoint (bx0 >= x1 false,
    # bx1 <= x0 case): block ends at 333 == next cell's x0 -> excluded
    assert blocks_in_cell([b], 333.0, 0.0, 666.0, 466.0) == []
    assert blocks_in_cell([b], 0.0, 0.0, 333.0, 466.0) == [b]


def test_translate_blocks_arithmetic_and_suffix():
    out = translate_blocks(
        [{"bbox": [1.0, 2.0, 3.0, 4.0], "source": "ocr"}], 10.0, 20.0, "+r"
    )
    assert out[0]["bbox"] == [11.0, 22.0, 13.0, 24.0]
    assert out[0]["source"] == "ocr+r"


def test_relaxed_parser_only_sees_strict_failures():
    strict, failures = parse_layout(PAYLOAD)
    assert [b["text"].split()[0] for b in strict] == ["dense"]
    assert failures == 4  # three malformed + one garbage
    relaxed = parse_layout_relaxed(PAYLOAD)
    texts = {b["text"] for b in relaxed}
    assert "more dense cell text never rescued" in texts
    assert "bottom right rescued line" in texts
    assert "rescued with default conf" in texts
    assert len(relaxed) == 3  # garbage line stays unparsed
    byt = {b["text"]: b for b in relaxed}
    assert byt["rescued with default conf"]["confidence"] == 0.60
    assert byt["rescued with default conf"]["source"] == "rescue"
    assert byt["bottom right rescued line"]["confidence"] == 0.88
    assert byt["bottom right rescued line"]["source"] == "ocr_b"


def test_grid_rescue_scoped_to_sparse_cells():
    strict, _ = parse_layout(PAYLOAD)
    assert sum(len(b["text"]) for b in strict) >= CELL_MIN_CHARS
    rescued = grid_rescue(PAYLOAD, strict)
    texts = sorted(b["text"] for b in rescued)
    # the dense top-left cell is NOT rescued; both bottom-right
    # malformed lines are
    assert texts == [
        "bottom right rescued line",
        "rescued with default conf",
    ]
    byt = {b["text"]: b for b in rescued}
    # cell 8 origin is (666, 932): 700-666=34 cell-local, translated back
    assert byt["bottom right rescued line"]["bbox"] == [
        700.0, 1000.0, 950.0, 1020.0
    ]
    assert byt["bottom right rescued line"]["source"] == "ocr_b+rescue"
    assert byt["rescued with default conf"]["source"] == "rescue+rescue"


def test_grid_rescue_noop_on_fully_parsed_payload():
    payload = "\n".join(
        f"10,{10 + 20 * i},300,{25 + 20 * i},0.95,native|clean line {i}"
        for i in range(5)
    )
    strict, failures = parse_layout(payload)
    assert failures == 0
    assert grid_rescue(payload, strict) == []


def test_rescued_text_reaches_text_final():
    r, _, final_blocks = extract_turn_blocks(PAYLOAD)
    assert r.variant == "layout+rescue"
    assert "bottom right rescued line" in r.text_final
    assert "rescued with default conf" in r.text_final
    assert "never rescued" not in r.text_final  # dense-cell malformed line
    sources = {s for b in final_blocks for s in b["source"].split("+")}
    assert "rescue" in sources


def test_spark_parity_with_core(spark):
    """The same rescue runs inside the Arrow-batch extraction UDF: Spark
    per-turn output equals the single-process core on a frame containing
    rescue-triggering payloads."""
    from medical_ocr_pipeline_spark.pipeline import extract_transcripts

    rows = [
        ("c0", 0, "user", PAYLOAD, None, None),
        ("c0", 1, "user", "plain text turn with no layout at all", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    got = (
        extract_transcripts(df)
        .orderBy("turn_idx")
        .select("turn_idx", "text_final", "variant", "n_blocks")
        .toPandas()
    )
    want = []
    for _, turn_idx, _, payload, _, _ in rows:
        res, _, _ = extract_turn_blocks(payload)
        want.append((turn_idx, res.text_final, res.variant, res.n_blocks))
    want = pd.DataFrame(want, columns=["turn_idx", "text_final", "variant",
                                       "n_blocks"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_spanning_block_rescued_exactly_once():
    """A malformed line whose bbox crosses a cell boundary (both cells
    sparse) must be rescued ONCE — owned by its center cell — not once
    per overlapped cell (full-text duplication J1 cannot catch)."""
    payload = "200;1000;500;1020;0.9;ocr|spanning malformed line"
    rescued = grid_rescue(payload, [])
    assert len(rescued) == 1
    b = rescued[0]
    assert b["text"] == "spanning malformed line"
    # center x=350 -> middle cell (333..666); clipped to it
    assert b["bbox"] == [333.0, 1000.0, 500.0, 1020.0]
