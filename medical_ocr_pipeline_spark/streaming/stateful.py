"""Custom stateful streaming operator: incremental per-conversation
rollup via applyInPandasWithState.

As transcript turns stream in (append-only table), per-conversation state
(turns seen, extracted chars, max turn_idx, parse failures) accumulates
across micro-batches and survives restarts through the checkpoint — the
streaming counterpart of the batch conversation_text assembly, and the
analogue of the reference's per-run accumulating metrics
(notebooks/03_llm_cleanup.ipynb cell 7 run_stats).  State is bounded per
conversation (a few counters, never the turn texts), so a 10^12-turn
stream holds state proportional to the number of LIVE conversations only;
a production deployment adds a GroupStateTimeout to age out finished
conversations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from medical_ocr_pipeline_spark.pipeline import extract_transcripts
from medical_ocr_pipeline_spark.streaming.extraction import TRANSCRIPT_SCHEMA

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("chars", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
    T.StructField("parse_failures", T.LongType()),
])

ROLLUP_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("chars", T.LongType()),
    T.StructField("max_turn_idx", T.IntegerType()),
    T.StructField("parse_failures", T.LongType()),
])


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n = chars = fails = 0
    max_idx = -1
    for pdf in pdfs:
        n += len(pdf)
        chars += int(pdf["text_final"].str.len().sum())
        fails += int(pdf["parse_failures"].sum())
        max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    if state.exists:
        pn, pchars, pmax, pfails = state.get
        n += pn
        chars += pchars
        fails += pfails
        max_idx = max(max_idx, pmax)
    state.update((n, chars, max_idx, fails))
    yield pd.DataFrame({
        "conv_id": [key[0]],
        "n_turns": [n],
        "chars": [chars],
        "max_turn_idx": [max_idx],
        "parse_failures": [fails],
    })


def conversation_rollup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
):
    """Run one AvailableNow pass: extract new turns, update per-conv
    state, append current rollups to the output table."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    extracted = extract_transcripts(src)
    rollups = extracted.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=ROLLUP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        rollups.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
