"""Canonical schemas (SURVEY.md §1): the BLOCK struct and the transcript
row — declared once, used by the block-table pipeline and streaming."""

from pyspark.sql import types as T

# §1.1 — the fundamental abstraction (mcp/mcp_ocr_tesseract.py:56-77 and
# every sibling engine): {"text", "confidence", "bbox", "source", "section"}
BLOCK = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("bbox", T.ArrayType(T.DoubleType())),   # [x0,y0,x1,y1]
    T.StructField("source", T.StringType()),
    T.StructField("section", T.StringType()),
])

TRANSCRIPT = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

# per-turn blocks table: a page file (list of block dicts) ≙ one row with
# blocks ArrayType(BLOCK) (§1.2)
TURN_BLOCKS = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("blocks", T.ArrayType(BLOCK)),
])
