"""04/05-stage structured extraction, Catalyst-native.

The reference's stage 04 prompts an LLM with a JSON schema and repairs
the response (F3: strip fences, drop trailing commas,
notebooks/04_json_extraction.ipynb cell 2:84-108); stage 05 deep-merges
the per-chunk pieces (A7).  Without an LLM, the deterministic equivalent
is: fence-strip + light-repair as regexp chains, `from_json` with
PERMISSIVE corrupt-record capture (parse failures become a metric, never
an exception), and a typed per-conversation merge that reproduces
merge_dict's semantics in pure Catalyst:

  * scalar fields: first non-empty in turn order  (merge_dict line 16)
  * array fields:  ordered concat + exact dedup   (merge_dict lines 18-24)

Everything here is JVM-side (whole-stage codegen) — no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the synthetic model-output template (FIXTURES.md §1 variant 4); real
# deployments swap in config-driven schemas (reference
# config/schema_prescription.json)
EXTRACT_JSON_SCHEMA = T.StructType([
    T.StructField("summary", T.StringType()),
    T.StructField("items", T.ArrayType(T.StringType())),
    T.StructField("dose", T.StringType()),
    T.StructField("_corrupt", T.StringType()),
])


def repair_json(col):
    """F3 as a Catalyst regexp chain, mirroring the single-process chain
    (core/parse.py strip_fences + light_repair): strip ``` fences, drop
    trailing commas, cut to the first '{' or '[' (leading prose before
    the JSON body is dropped, not a parse failure), trim."""
    c = F.regexp_replace(col, "```(?:json|JSON)?", "")
    c = F.regexp_replace(c, ",\\s*([}\\]])", "$1")
    # (?s): the JSON body spans lines; empty match -> '' -> NULL doc
    c = F.regexp_extract(c, "(?s)[\\[{].*", 0)
    return F.trim(c)


def structured_extract(transcripts: DataFrame) -> DataFrame:
    """JSON-fenced turns -> typed rows + corrupt-record capture.

    Output: (conv_id, turn_idx, summary, items, dose, parse_failed).
    """
    fenced = transcripts.where(F.col("text").startswith("```"))
    parsed = fenced.select(
        "conv_id",
        "turn_idx",
        F.from_json(
            repair_json(F.col("text")),
            EXTRACT_JSON_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("doc"),
    )
    return parsed.select(
        "conv_id",
        "turn_idx",
        F.col("doc.summary").alias("summary"),
        F.col("doc.items").alias("items"),
        F.col("doc.dose").alias("dose"),
        # failure = corrupt text or nothing to parse (NULL doc: empty /
        # whitespace-only input).  A VALID but empty object ({}) is a
        # successfully parsed piece with null fields — exactly how the
        # single-process golden path counts it (json.loads succeeds);
        # the all-fields-null test used here before misclassified it.
        (
            F.col("doc").isNull() | F.col("doc._corrupt").isNotNull()
        ).alias("parse_failed"),
    )


def merge_documents(structured: DataFrame) -> DataFrame:
    """05 deep merge per conversation, typed and Catalyst-only.

    Sort pieces by turn_idx inside the aggregation (array_sort of
    (turn_idx, piece) structs) so "first non-empty wins" is deterministic
    under any physical row order — the distributed restatement of the
    reference's sorted(glob) iteration order (05 cell 2:8,27-31).
    """
    ok = structured.where(~F.col("parse_failed"))
    collected = ok.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "summary", "items", "dose"))
        ).alias("pieces"),
        F.count("*").alias("n_pieces"),
    )

    def first_non_empty(field):
        vals = F.filter(
            F.transform("pieces", lambda p: p[field]),
            lambda v: v.isNotNull() & (F.length(v) > 0),
        )
        return F.element_at(vals, 1)

    merged_items = F.array_distinct(
        F.flatten(
            F.filter(
                F.transform("pieces", lambda p: p["items"]),
                lambda v: v.isNotNull(),
            )
        )
    )
    return collected.select(
        "conv_id",
        first_non_empty("summary").alias("summary"),
        merged_items.alias("items"),
        first_non_empty("dose").alias("dose"),
        "n_pieces",
    )


def extraction_failures(structured: DataFrame) -> DataFrame:
    """parse_failures metric per conversation (S7 analogue)."""
    return (
        structured.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.col("parse_failed").cast("int")).alias("parse_failures"),
        )
        .orderBy("conv_id")
    )
