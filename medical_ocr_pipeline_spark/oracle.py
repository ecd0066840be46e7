"""Single-process golden reference: the oracle the Spark pipeline's output
must equal row-for-row (per-turn text equality under stable turn ordering).

Deterministic by construction: same pure per-turn core
(medical_ocr_pipeline_spark.core.extract.extract_turn) over the same
deterministic synthetic transcripts, ordered by (conv_id, turn_idx).
"""

from __future__ import annotations

from medical_ocr_pipeline_spark.core.extract import extract_turn
from medical_ocr_pipeline_spark.synth import iter_turns

GOLDEN_COLUMNS = [
    "conv_id", "turn_idx", "text_final", "n_blocks", "n_segments",
    "mean_conf", "bytes_stripped", "parse_failures", "n_header",
    "n_footer", "two_col",
]


def golden_rows(n_convs: int) -> list[tuple]:
    """Golden extraction table for the first n_convs conversations."""
    rows = []
    for conv_id, turn_idx, _role, text, _tool, _ts in iter_turns(n_convs):
        r = extract_turn(text)
        rows.append((conv_id, turn_idx, r.text_final, r.n_blocks,
                     r.n_segments, r.mean_conf, r.bytes_stripped,
                     r.parse_failures, r.n_header, r.n_footer, r.two_col))
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def golden_pandas(n_convs: int):
    import pandas as pd

    return pd.DataFrame(golden_rows(n_convs), columns=GOLDEN_COLUMNS)
