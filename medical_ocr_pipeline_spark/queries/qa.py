"""QA / verifier operators as queries (SURVEY.md §2 M5): coverage
histogram (A9), budget depletion (W8), positional baseline join (J4),
content-drop trend (A13), CER/WER (F15), deep merge (A7).
"""

from __future__ import annotations

import json

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medical_ocr_pipeline_spark.queries.base import (
    ROUND_DIGITS,
    fanout,
    load,
    register,
)

R = ROUND_DIGITS


@register(
    "a9_coverage_histogram",
    sql=f"""
    SELECT event_type,
           CAST(FLOOR(value / 10) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_value_e6
    FROM events
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def a9_coverage_histogram(spark, sf_dir):
    """A9 binned coverage counts (02_ocr_verifier.py:91-106), 10-unit bins.

    The per-bin value total is carried as an exact micro-unit BIGINT sum
    (floor(value*1e6) per row, then integer summation) instead of
    AVG/ROUND of doubles: double summation is order-dependent across
    engines, and Spark's round() rounds the double's SHORTEST DECIMAL
    REPRESENTATION (HALF_UP on e.g. "87.72625") while DuckDB rounds the
    binary value (87.72624999...) — at sf0.1 a bin landed exactly on
    that boundary.  floor of the identical double is identical in both
    engines and integer sums are exact, so this form is hash-stable at
    every scale."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 10).cast("long").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 1000000).cast("long")
            ).cast("long").alias("sum_value_e6"),
        )
        .orderBy("event_type", "bin")
    )


BUDGET_PER_USER = 5


@register(
    "w8_budget_cap",
    sql=f"""
    SELECT user_id, COUNT(*) AS n_cleaned,
           ROUND(SUM(value), {R}) AS cleaned_value
    FROM (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= {BUDGET_PER_USER}
    GROUP BY user_id ORDER BY user_id
    """,
)
def w8_budget_cap(spark, sf_dir):
    """W8 deterministic budget (03_llm_cleanup cell 7:3-31 reformulated):
    rank in deterministic order, cap by rank — the parallel-safe version
    of the reference's sequential budget decrement."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BUDGET_PER_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_cleaned"),
            F.round(F.sum("value"), R).alias("cleaned_value"),
        )
        .orderBy("user_id")
    )


@register(
    "j4_positional_baseline",
    sql=f"""
    WITH r AS (
      SELECT user_id, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.rn AS pos,
           ROUND(a.value, {R}) AS value_a,
           ROUND(b.value, {R}) AS value_b,
           ROUND(b.value - a.value, {R}) AS delta
    FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn + 1
    WHERE a.user_id < 20
    ORDER BY a.user_id, pos
    """,
)
def j4_positional_baseline(spark, sf_dir):
    """J4 positional alignment (03a_llm_cleanup_qa cell 0:123-155): pair
    element i with element i+1 by index, compute change metrics."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .select("user_id", "rn", "value")
    )
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.rn") == F.col("a.rn") + 1),
        )
        .where(F.col("a.user_id") < 20)
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.rn").alias("pos"),
            F.round(F.col("a.value"), R).alias("value_a"),
            F.round(F.col("b.value"), R).alias("value_b"),
            F.round(F.col("b.value") - F.col("a.value"), R).alias("delta"),
        )
        .orderBy("user_id", "pos")
    )


@register(
    "a13_content_trend",
    sql=f"""
    SELECT user_id,
           ROUND(FIRST(value ORDER BY ts, event_id), {R}) AS initial_value,
           ROUND(LAST(value ORDER BY ts, event_id), {R}) AS final_value,
           ROUND(LAST(value ORDER BY ts, event_id)
                 - FIRST(value ORDER BY ts, event_id), {R}) AS drop
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def a13_content_trend(spark, sf_dir):
    """A13 initial-vs-final trend (qa_pipeline_evaluator.py:717-775):
    windowed first/last over the ordered series."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("iv", F.first("value").over(w))
        .withColumn("fv", F.last("value").over(w))
        .groupBy("user_id")
        .agg(
            F.round(F.first("iv"), R).alias("initial_value"),
            F.round(F.first("fv"), R).alias("final_value"),
            F.round(F.first("fv") - F.first("iv"), R).alias("drop"),
        )
        .orderBy("user_id")
    )


_CERWER_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType()),
    T.StructField("doc_b", T.LongType()),
    T.StructField("cer", T.DoubleType()),
    T.StructField("wer", T.DoubleType()),
    T.StructField("unigram_overlap", T.DoubleType()),
])


def f15_cer_wer(spark, sf_dir):
    """F15 CER/WER/unigram overlap (qa_pipeline_evaluator.py:490-509)
    between deterministically paired documents (i, i+250), via a grouped
    Arrow batch.

    RETIRED from the registry in round 5 (VERDICT r04 item #5): the
    difflib-ratio semantics are not SQL-expressible, and every metric
    here now has an exact-oracle twin over the SAME pairing —
    qa_edit_distance (true Levenshtein CER), qa_wer_exact (word-level
    WER via the Catalyst DP fold), qa_rouge_overlap (unigram overlap).
    The difflib parity itself stays unit-tested (tests/test_core.py)
    and this function remains importable as a diagnostic."""
    import pandas as pd

    from medical_ocr_pipeline_spark.core.merge import cer, unigram_overlap, wer

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    a = docs.where(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    b = docs.where(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
    )
    pairs = a.join(b, "doc_a")

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_a": pdf["doc_a"],
                "doc_b": pdf["doc_b"],
                "cer": [
                    round(cer(x, y), 6)
                    for x, y in zip(pdf["text_a"], pdf["text_b"])
                ],
                "wer": [
                    round(wer(x, y), 6)
                    for x, y in zip(pdf["text_a"], pdf["text_b"])
                ],
                "unigram_overlap": [
                    round(unigram_overlap(x, y), 6)
                    for x, y in zip(pdf["text_a"], pdf["text_b"])
                ],
            })

    return pairs.mapInPandas(run, schema=_CERWER_SCHEMA).orderBy("doc_a")


_MERGE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_pieces", T.IntegerType()),
    T.StructField("n_keys", T.IntegerType()),
    T.StructField("summary", T.StringType()),
    T.StructField("dose", T.StringType()),
    T.StructField("items_joined", T.StringType()),
    T.StructField("detail_engine", T.StringType()),
    T.StructField("detail_source", T.StringType()),
])


@register(
    "a7_deep_merge",
    sql="""
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
             regexp_extract(text, '[A-Za-z]+', 0) AS w1
      FROM documents
    )
    SELECT doc_id, 3 AS n_pieces, 4 AS n_keys,
           CASE WHEN w1 = '' THEN 'fallback' ELSE w1 END AS summary,
           CAST(n_chars AS VARCHAR) || ' mg' AS dose,
           CASE WHEN source = lang THEN lang || '|zz'
                ELSE lang || '|' || source || '|zz' END AS items_joined,
           source AS detail_engine,
           source AS detail_source
    FROM d ORDER BY doc_id
    """,
)
def a7_deep_merge(spark, sf_dir):
    """A7 deep dict merge (05_merge_and_validate cell 2:13-33), now
    with a FULL cross-engine oracle (VERDICT r04 item #5): three
    JSON-fenced pieces are derived deterministically from each
    documents row (one carries a trailing comma so light_repair runs),
    pushed through the REAL strip_fences -> light_repair -> json.loads
    -> merge_pieces chain in an Arrow batch, and the merged struct is
    flattened to scalars whose values the oracle replays from the
    merge semantics in closed form: first-non-empty wins for scalars
    (summary: '' -> w1 -> 'fallback'; dose: first non-empty sticks),
    recursion into dicts (detail.engine: '' -> source, then a
    non-empty value resists 'zz'), list concatenation with exact
    first-occurrence dedup (items: [lang] + [lang, source] +
    ['zz', source]), and the 'metadata' key skipped (n_keys = 4, not
    5).  A wrong merge rule anywhere flips a concrete column value, so
    the driver's value-hash check pins the python core end-to-end.

    100 TB shape: one Arrow batch pass over the corpus, zero shuffle
    before the map (the groupBy of the conversation-shaped original is
    unnecessary here because the pieces of a unit ride in one row);
    the flatten is projection-only."""
    import pandas as pd

    from medical_ocr_pipeline_spark.core.merge import merge_pieces
    from medical_ocr_pipeline_spark.core.parse import light_repair, strip_fences

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.regexp_extract("text", "[A-Za-z]+", 0).alias("w1"),
    )

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_pieces", "n_keys", "summary", "dose",
                "items_joined", "detail_engine", "detail_source",
            )}
            for doc_id, lang, source, n_chars, w1 in zip(
                pdf["doc_id"], pdf["lang"], pdf["source"],
                pdf["n_chars"], pdf["w1"],
            ):
                payloads = [
                    # trailing comma before } -> exercises light_repair
                    '```json\n{"summary": "", "dose": "%d mg",'
                    ' "items": ["%s"], "detail": {"engine": "",'
                    ' "source": "%s"}, "metadata": {"run": 1},}\n```'
                    % (n_chars, lang, source),
                    '```json\n{"summary": "%s", "dose": "",'
                    ' "items": ["%s", "%s"], "detail": {"engine": "%s",'
                    ' "source": ""}}\n```' % (w1, lang, source, source),
                    '```json\n{"summary": "fallback",'
                    ' "items": ["zz", "%s"], "detail":'
                    ' {"engine": "zz"}}\n```' % source,
                ]
                pieces = []
                for payload in payloads:
                    try:
                        pieces.append(
                            json.loads(light_repair(strip_fences(payload)))
                        )
                    except (json.JSONDecodeError, ValueError):
                        continue
                merged = merge_pieces(
                    [p for p in pieces if isinstance(p, dict)]
                )
                detail = merged.get("detail", {})
                out["doc_id"].append(int(doc_id))
                out["n_pieces"].append(len(pieces))
                out["n_keys"].append(len(merged))
                out["summary"].append(merged.get("summary", ""))
                out["dose"].append(merged.get("dose", ""))
                out["items_joined"].append(
                    "|".join(merged.get("items", []))
                )
                out["detail_engine"].append(detail.get("engine", ""))
                out["detail_source"].append(detail.get("source", ""))
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=_MERGE_SCHEMA).orderBy("doc_id")


@register(
    "j7_layout_preservation",
    sql="""
    WITH ln AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
             CAST(generate_subscripts(string_split(text, chr(10)), 1)
                  AS BIGINT) AS ord
      FROM documents
    ),
    pre AS (
      SELECT doc_id, ord,
             CAST(length(line) - length(ltrim(line)) AS BIGINT) AS l,
             CAST(length(line) AS BIGINT) AS r
      FROM ln WHERE length(trim(line)) > 0
    ),
    fin AS (
      SELECT doc_id,
             CAST(length(line) - length(ltrim(line)) AS BIGINT) AS l,
             CAST(length(rtrim(line)) AS BIGINT) AS r
      FROM ln WHERE length(trim(line)) >= 4
    ),
    best AS (
      SELECT p.doc_id, p.ord,
             COALESCE(MAX(
               GREATEST(0, LEAST(p.r, f.r) - GREATEST(p.l, f.l))
               * 1000000
               // (GREATEST(p.r, f.r) - LEAST(p.l, f.l))
             ), 1000000) AS b
      FROM pre p LEFT JOIN fin f ON p.doc_id = f.doc_id
      GROUP BY p.doc_id, p.ord
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(b) // COUNT(*) AS BIGINT) AS mean_best_iou_ppm,
           (SUM(b) // COUNT(*)) > 300000 AS preserved
    FROM best GROUP BY doc_id ORDER BY doc_id
    """,
)
def j7_layout_preservation(spark, sf_dir):
    """J7 layout-preservation join (qa_pipeline_evaluator.py:400-419):
    every pre-pipeline block matched to its best-IoU surviving block;
    mean best IoU > 0.3 == layout preserved.  Upgraded from rows-only
    to a FULL oracle (VERDICT r04 item #5) by re-founding the registry
    query on deterministic line blocks of the documents table: each
    non-blank line is a pre-block with x-interval [indent, indent +
    raw_len]; lines with >= 4 non-space chars survive as final blocks
    with the right-trimmed interval.  IoU is the o6-style exact
    integer form (inter * 1e6 div union over BIGINT interval bounds —
    never floor(double), which is 1-ulp-unstable at values like 0.3),
    the per-block argmax is a plain MAX of that integer key, a block
    with no surviving partner scores 1.0 (the reference's
    nothing-to-match rule), and the per-document mean is an exact
    BIGINT sum div count.  The extraction-coupled original
    (extract_turn_blocks + layout_preservation over real turn payloads)
    stays pinned by the golden/unit suites (core/extract.py,
    tests/test_core.py).

    100 TB shape: the block pair join is an equi-join ON doc_id, so
    pairs stay bounded by lines-per-document squared — a per-document
    spatial best-match, never a cluster-wide theta join; both
    aggregations are combinable."""
    docs = load(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("ord0", "line"),
    ).select(
        "doc_id",
        (F.col("ord0") + 1).cast("long").alias("ord"),
        "line",
    )
    indent = (F.length("line") - F.length(F.ltrim(F.col("line")))).cast(
        "long"
    )
    pre = lines.where(F.length(F.trim(F.col("line"))) > 0).select(
        "doc_id",
        "ord",
        indent.alias("l"),
        F.length("line").cast("long").alias("r"),
    )
    fin = lines.where(F.length(F.trim(F.col("line"))) >= 4).select(
        F.col("doc_id").alias("f_doc"),
        indent.alias("fl"),
        F.length(F.rtrim(F.col("line"))).cast("long").alias("fr"),
    )
    best = (
        pre.join(fin, pre.doc_id == fin.f_doc, "left")
        .select(
            "doc_id",
            "ord",
            F.expr(
                "greatest(0L, least(r, fr) - greatest(l, fl)) * 1000000"
                " div (greatest(r, fr) - least(l, fl))"
            ).alias("iou_ppm"),
        )
        .groupBy("doc_id", "ord")
        .agg(
            F.coalesce(F.max("iou_ppm"), F.lit(1000000).cast("long"))
            .alias("b")
        )
    )
    return (
        best.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.expr("sum(b) div count(*)").cast("long")
            .alias("mean_best_iou_ppm"),
            (F.expr("sum(b) div count(*)") > 300000).alias("preserved"),
        )
        .orderBy("doc_id")
    )


# --- exact edit-distance QA ---------------------------------------------------


@register(
    "qa_edit_distance",
    sql="""
    WITH a AS (
      SELECT doc_id AS doc_a, text AS text_a
      FROM documents WHERE doc_id < 250
    ), b AS (
      SELECT doc_id - 250 AS doc_a, doc_id AS doc_b, text AS text_b
      FROM documents WHERE doc_id >= 250 AND doc_id < 500
    )
    SELECT a.doc_a, b.doc_b,
           length(a.text_a) AS len_a, length(b.text_b) AS len_b,
           levenshtein(a.text_a, b.text_b) AS lev,
           CAST(levenshtein(a.text_a, b.text_b) AS BIGINT) * 1000000
             // GREATEST(length(a.text_a), 1) AS cer_ppm
    FROM a JOIN b ON a.doc_a = b.doc_a
    ORDER BY a.doc_a
    """,
)
def qa_edit_distance(spark, sf_dir):
    """True Levenshtein edit distance between the deterministically
    paired documents (i, i+250) — the exact-metric twin of f15's
    difflib-ratio CER (reference qa_pipeline_evaluator.py:490-509): both
    engines run the classic unit-cost DP natively, so unlike f15 this
    carries a full cross-engine oracle.  cer_ppm = distance / reference
    length in exact integer ppm.

    100 TB shape: the pairing is an equi-join on the derived pair key
    (here doc_id mod the pairing offset); levenshtein is a per-row
    JVM-side expression inside whole-stage codegen — no UDF, no
    shuffle beyond the pair join.  Cost is O(len_a * len_b) per pair —
    at production lengths, gate it behind a length cap or switch to the
    banded variant."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    a = docs.where(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    b = docs.where(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
    )
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.length("text_a").cast("long").alias("len_a"),
            F.length("text_b").cast("long").alias("len_b"),
            F.levenshtein("text_a", "text_b").cast("long").alias("lev"),
            F.expr(
                "cast(levenshtein(text_a, text_b) as bigint) * 1000000"
                " div greatest(length(text_a), 1)"
            ).alias("cer_ppm"),
        )
        .orderBy("doc_a")
    )


# --- ROUGE-n overlap between paired documents --------------------------------


@register(
    "qa_rouge_overlap",
    sql="""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> '') AS ws
      FROM documents WHERE doc_id < 500
    ), sides AS (
      SELECT CASE WHEN doc_id < 250 THEN doc_id ELSE doc_id - 250 END
               AS doc_a,
             doc_id < 250 AS is_a, ws
      FROM d
    ), grams AS (
      SELECT doc_a, is_a, 1 AS n, unnest(ws) AS g FROM sides
      UNION ALL
      SELECT doc_a, is_a, 2 AS n,
             unnest([ws[i + 1] || ' ' || ws[i + 2]
                     FOR i IN range(0, greatest(len(ws) - 1, 0))]) AS g
      FROM sides
    ), cnt AS (
      SELECT doc_a, n, g,
             SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
      FROM grams GROUP BY doc_a, n, g
    ), agg AS (
      SELECT doc_a, n,
             CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(LEAST(ca, cb)) AS BIGINT) AS n_common
      FROM cnt GROUP BY doc_a, n
    )
    SELECT doc_a, doc_a + 250 AS doc_b, n, n_a, n_b, n_common,
           n_common * 1000000 // GREATEST(n_a, 1) AS rouge_p_ppm,
           n_common * 1000000 // GREATEST(n_b, 1) AS rouge_r_ppm,
           2 * n_common * 1000000 // GREATEST(n_a + n_b, 1) AS rouge_f_ppm
    FROM agg
    ORDER BY doc_a, n
    """,
)
def qa_rouge_overlap(spark, sf_dir):
    """ROUGE-1 / ROUGE-2 overlap between the deterministically paired
    documents (i, i+250): clipped n-gram precision, recall, and F1 in
    exact-integer ppm (F1 = 2PR/(P+R) = 2*common/(n_a+n_b), so no float
    ever appears).  The clipped common count is the MULTISET
    intersection — sum over grams of least(count_a, count_b) — i.e.
    Lin's ROUGE-n and the per-n term of BLEU's modified precision.
    Extraction-QA analogue of the reference's similarity scoring
    (qa_pipeline_evaluator.py:490-509): where f15 uses difflib ratio and
    qa_edit_distance uses Levenshtein, this is the n-gram-level recall
    metric used to score extracted text against a gold reference.

    100 TB shape: bigrams are built ARRAY-SIDE from the words array
    (transform over slice — no window, no self-join, same trick as the
    repetition stats); gram counts are one combinable
    (pair, n, gram) groupBy; the final per-pair rollup is combinable
    too.  Everything keys on the pair id, so pairs hash-distribute and
    no task ever holds more than one pair's gram table."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    ws = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]+"),
        lambda w: w != F.lit(""),
    )
    sides = docs.select(
        F.when(F.col("doc_id") < 250, F.col("doc_id"))
        .otherwise(F.col("doc_id") - 250)
        .alias("doc_a"),
        (F.col("doc_id") < 250).alias("is_a"),
        ws.alias("ws"),
    )
    big = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " (x, i) -> concat(x, ' ', ws[i + 1]))"
    )
    grams = sides.select(
        "doc_a", "is_a", F.lit(1).alias("n"), F.explode("ws").alias("g")
    ).unionByName(
        sides.select(
            "doc_a", "is_a", F.lit(2).alias("n"),
            F.explode(big).alias("g"),
        )
    )
    cnt = grams.groupBy("doc_a", "n", "g").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("cb"),
    )
    agg = cnt.groupBy("doc_a", "n").agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.least("ca", "cb")).cast("long").alias("n_common"),
    )
    return agg.select(
        "doc_a",
        (F.col("doc_a") + 250).alias("doc_b"),
        "n",
        "n_a",
        "n_b",
        "n_common",
        F.expr("n_common * 1000000 div greatest(n_a, 1)").alias(
            "rouge_p_ppm"
        ),
        F.expr("n_common * 1000000 div greatest(n_b, 1)").alias(
            "rouge_r_ppm"
        ),
        F.expr("2 * n_common * 1000000 div greatest(n_a + n_b, 1)").alias(
            "rouge_f_ppm"
        ),
    ).orderBy("doc_a", "n")


# --- exact word-level WER -----------------------------------------------------
# qa_edit_distance is CHARACTER-level (both engines have a native
# levenshtein); word error rate needs edit distance over WORD
# sequences, which neither engine has natively — f15 approximates it
# with difflib and stays rows-only.  This query computes the exact
# word-level Levenshtein distance IN PURE SQL on both sides via the
# prefix-min reformulation of the DP row recurrence:
#
#   curr[j] = min(prev[j] + 1, curr[j-1] + 1, prev[j-1] + subst)
#
# has a sequential dependency on curr[j-1], but substituting it out
# gives curr[j] = j + min_{k<=j}(base[k] - k) with
# base[0] = i, base[k] = min(prev[k] + 1, prev[k-1] + subst_k) — a
# prefix-min over a row-local array, expressible with higher-order
# array functions alone.  Spark runs it as one aggregate() fold over
# the reference words (whole-stage codegen, zero Python); DuckDB
# replays it as a recursive CTE carrying the DP row as a LIST column.
# Sequences are capped at WER_CAP words so the O(n * m^2) per-pair
# cost stays bounded; the cap is part of the metric's definition here
# and applies identically in both engines.

WER_CAP = 48

_WER_DP_SPARK = """
  element_at(
    aggregate(
      wa,
      sequence(0, size(wb)),
      (row, w) -> transform(
        sequence(0, size(wb)),
        j -> j + array_min(slice(
          concat(
            array(element_at(row, 1) + 1),
            transform(sequence(1, size(wb)),
              jj -> least(element_at(row, jj + 1) + 1,
                          element_at(row, jj)
                            + if(w = element_at(wb, jj), 0, 1)) - jj)
          ), 1, j + 1))
      )
    ),
    size(wb) + 1)
"""


@register(
    "qa_wer_exact",
    sql=f"""
    WITH RECURSIVE
    d AS MATERIALIZED (
      SELECT doc_id, list_slice(list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> ''), 1, {WER_CAP}) AS ws
      FROM documents WHERE doc_id < 500
    ),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ws AS wa, b.ws AS wb
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 250
      WHERE a.doc_id < 250
    ),
    dp AS (
      SELECT doc_a, doc_b, wa, wb, 0 AS i,
             list_transform(range(0, len(wb) + 1), x -> x) AS row
      FROM pairs
      UNION ALL
      SELECT doc_a, doc_b, wa, wb, i + 1,
             list_transform(range(0, len(wb) + 1),
               j -> j + list_aggregate(list_slice(
                 list_prepend(i + 1,
                   list_transform(range(1, len(wb) + 1),
                     jj -> least(row[jj + 1] + 1,
                                 row[jj] + CASE WHEN wa[i + 1] = wb[jj]
                                           THEN 0 ELSE 1 END) - jj)),
                 1, j + 1), 'min'))
      FROM dp WHERE i < len(wa)
    )
    SELECT doc_a, doc_b,
           CAST(len(wa) AS BIGINT) AS n_ref,
           CAST(len(wb) AS BIGINT) AS n_hyp,
           CAST(row[len(wb) + 1] AS BIGINT) AS wdist,
           CAST(row[len(wb) + 1] * 1000000 // GREATEST(len(wa), 1)
             AS BIGINT) AS wer_ppm
    FROM dp WHERE i = len(wa) ORDER BY doc_a
    """,
)
def qa_wer_exact(spark, sf_dir):
    """Exact word-level Levenshtein WER between the deterministically
    paired documents (i, i+250), over the first WER_CAP canonical words
    of each side — the word-level companion of qa_edit_distance's
    character CER and the oracle-bearing upgrade of f15's difflib WER
    (reference qa_pipeline_evaluator.py:490-509).  The DP runs ENTIRELY
    in Catalyst: one aggregate() fold over the reference words whose
    state is the current DP row (an int array), each next row built
    with transform + array_min + slice via the prefix-min
    reformulation (see module comment) — no UDF, no Python, no
    shuffle beyond the pair join.  wer_ppm = wdist / n_ref in exact
    integer ppm; both engines fold the identical integer recurrence,
    so the oracle (a recursive CTE carrying the DP row as a LIST) is
    bit-exact.

    100 TB shape: pairs hash-distribute on the join key and each
    task's cost is O(WER_CAP^3) per pair with zero cross-row state —
    embarrassingly parallel inside whole-stage codegen.  The cap is
    the production lever: raise it and the per-pair cost grows
    cubically, so a full-document WER at scale swaps this expression
    for the banded variant the same way qa_edit_distance documents."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    ws = F.slice(
        F.filter(
            F.split(
                F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]+"
            ),
            lambda w: w != F.lit(""),
        ),
        1,
        WER_CAP,
    )
    d = docs.select("doc_id", ws.alias("ws"))
    a = d.where(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"), F.col("ws").alias("wa")
    )
    b = d.where(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("ws").alias("wb"),
    )
    wdist = (
        F.when(F.expr("size(wa)") == 0, F.expr("size(wb)"))
        .when(F.expr("size(wb)") == 0, F.expr("size(wa)"))
        .otherwise(F.expr(_WER_DP_SPARK))
        .cast("long")
    )
    # fanout before the fold: at test scale the documents table is ONE
    # parquet split, so without a key redistribution all 250 per-pair
    # DP folds run serially on one core (measured 12 s vs ~1 s); at
    # production scale the join output is already key-distributed and
    # this is the same hash exchange
    return (
        fanout(a.join(b, "doc_a"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(wa)").cast("long").alias("n_ref"),
            F.expr("size(wb)").cast("long").alias("n_hyp"),
            wdist.alias("wdist"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_ref",
            "n_hyp",
            "wdist",
            # derive from the named column so the O(WER_CAP^3) fold
            # appears exactly once in the plan (the qa_rouge_l form)
            F.expr("wdist * 1000000 div greatest(n_ref, 1)")
            .cast("long")
            .alias("wer_ppm"),
        )
        .orderBy("doc_a")
    )


# --- ROUGE-L (longest common subsequence) ------------------------------------
# qa_rouge_overlap covers ROUGE-1/2 (n-gram multiset overlap); ROUGE-L
# scores IN-ORDER agreement via the longest common subsequence, which
# n-gram counting cannot see (a reversed document keeps its unigram
# overlap but loses its LCS).  Same engine trick as qa_wer_exact: the
# LCS row recurrence curr[j] = max(prev[j], curr[j-1], prev[j-1]+eq)
# drops its sequential curr[j-1] dependency under a prefix-max —
# curr[j] = max_{k<=j} base[k] with base[0]=0,
# base[k] = max(prev[k], prev[k-1]+eq_k) — so Spark folds it with
# aggregate()/transform()/array_max (pure Catalyst) and DuckDB replays
# it as a recursive CTE over the DP row LIST.

_LCS_DP_SPARK = """
  element_at(
    aggregate(
      wa,
      array_repeat(0, size(wb) + 1),
      (row, w) -> transform(
        sequence(0, size(wb)),
        j -> array_max(slice(
          concat(
            array(0),
            transform(sequence(1, size(wb)),
              jj -> greatest(element_at(row, jj + 1),
                             element_at(row, jj)
                               + if(w = element_at(wb, jj), 1, 0)))
          ), 1, j + 1))
      )
    ),
    size(wb) + 1)
"""


@register(
    "qa_rouge_l",
    sql=f"""
    WITH RECURSIVE
    d AS MATERIALIZED (
      SELECT doc_id, list_slice(list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> ''), 1, {WER_CAP}) AS ws
      FROM documents WHERE doc_id < 500
    ),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ws AS wa, b.ws AS wb
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 250
      WHERE a.doc_id < 250
    ),
    dp AS (
      SELECT doc_a, doc_b, wa, wb, 0 AS i,
             list_transform(range(0, len(wb) + 1), x -> 0) AS row
      FROM pairs
      UNION ALL
      SELECT doc_a, doc_b, wa, wb, i + 1,
             list_transform(range(0, len(wb) + 1),
               j -> list_aggregate(list_slice(
                 list_prepend(0,
                   list_transform(range(1, len(wb) + 1),
                     jj -> greatest(row[jj + 1],
                                    row[jj] + CASE WHEN wa[i + 1] = wb[jj]
                                              THEN 1 ELSE 0 END))),
                 1, j + 1), 'max'))
      FROM dp WHERE i < len(wa)
    )
    SELECT doc_a, doc_b,
           CAST(len(wa) AS BIGINT) AS n_ref,
           CAST(len(wb) AS BIGINT) AS n_hyp,
           CAST(row[len(wb) + 1] AS BIGINT) AS lcs_len,
           CAST(row[len(wb) + 1] * 1000000 // GREATEST(len(wa), 1)
             AS BIGINT) AS rouge_l_r_ppm,
           CAST(row[len(wb) + 1] * 1000000 // GREATEST(len(wb), 1)
             AS BIGINT) AS rouge_l_p_ppm,
           CAST(2 * row[len(wb) + 1] * 1000000
                // GREATEST(len(wa) + len(wb), 1) AS BIGINT)
             AS rouge_l_f_ppm
    FROM dp WHERE i = len(wa) ORDER BY doc_a
    """,
)
def qa_rouge_l(spark, sf_dir):
    """ROUGE-L between the deterministically paired documents
    (i, i+250): LCS length over the first WER_CAP canonical words,
    with recall/precision/F1 in exact-integer ppm (F1 = 2*LCS/(n_ref +
    n_hyp), Lin's harmonic form, so no float ever appears) — the
    in-order member of the QA-metric family (qa_rouge_overlap =
    position-free n-gram overlap, qa_wer_exact = edit distance,
    qa_edit_distance = character CER; reference
    qa_pipeline_evaluator.py:490-509).  The LCS DP is the same pure
    Catalyst aggregate() fold as qa_wer_exact under a prefix-MAX (see
    module comment), mirrored bit-exactly by the oracle's recursive
    CTE.

    100 TB shape: identical to qa_wer_exact — pairs hash-distribute,
    per-pair O(WER_CAP^3) inside whole-stage codegen, zero cross-row
    state, no Python."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    ws = F.slice(
        F.filter(
            F.split(
                F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]+"
            ),
            lambda w: w != F.lit(""),
        ),
        1,
        WER_CAP,
    )
    d = docs.select("doc_id", ws.alias("ws"))
    a = d.where(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"), F.col("ws").alias("wa")
    )
    b = d.where(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("ws").alias("wb"),
    )
    lcs = (
        F.when(
            (F.expr("size(wa)") == 0) | (F.expr("size(wb)") == 0), F.lit(0)
        )
        .otherwise(F.expr(_LCS_DP_SPARK))
        .cast("long")
    )
    # fanout before the fold: at test scale the documents table is ONE
    # parquet split, so without a key redistribution all 250 per-pair
    # DP folds run serially on one core (measured 12 s vs ~1 s); at
    # production scale the join output is already key-distributed and
    # this is the same hash exchange
    return (
        fanout(a.join(b, "doc_a"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(wa)").cast("long").alias("n_ref"),
            F.expr("size(wb)").cast("long").alias("n_hyp"),
            lcs.alias("lcs_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_ref",
            "n_hyp",
            "lcs_len",
            F.expr("lcs_len * 1000000 div greatest(n_ref, 1)")
            .cast("long")
            .alias("rouge_l_r_ppm"),
            F.expr("lcs_len * 1000000 div greatest(n_hyp, 1)")
            .cast("long")
            .alias("rouge_l_p_ppm"),
            F.expr("2 * lcs_len * 1000000 div greatest(n_ref + n_hyp, 1)")
            .cast("long")
            .alias("rouge_l_f_ppm"),
        )
        .orderBy("doc_a")
    )


# --- Smith-Waterman local alignment ------------------------------------------
# Third member of the Catalyst DP-fold family: qa_wer_exact scores
# GLOBAL edit distance, qa_rouge_l the longest in-order SUBSEQUENCE;
# Smith-Waterman scores the best LOCAL alignment — the strongest
# contiguous shared passage (quotes, boilerplate runs, copied
# paragraphs) that both global metrics dilute over the full document.
# Classic linear-gap scoring: match +2, mismatch -1, gap -1, floor 0.
# The within-row dependency curr[j-1] - g unrolls the same way as
# qa_wer_exact's: curr[j] = max(0, max_{k<=j}(bm[k] + k) - j) with
# bm[k] = max(prev[k-1] + s_k, prev[k] - 1), and the running best
# needs no prefix at all (max_j curr[j] = max(0, max_k bm[k])), so the
# fold state is the DP row plus ONE extra slot carrying the best score
# so far.  All integer — exact across engines by construction.

SW_MATCH = 2      # these literals appear inline in both DP bodies;
SW_MISMATCH = -1  # keep the constants and the SQL text in sync
SW_GAP = 1

_SW_DP_SPARK = """
  element_at(
    aggregate(
      wa,
      array_repeat(0, size(wb) + 2),
      (st, w) -> concat(
        transform(
          sequence(0, size(wb)),
          j -> if(j = 0, 0, greatest(0,
            array_max(slice(
              transform(sequence(1, size(wb)),
                k -> greatest(element_at(st, k)
                                + if(w = element_at(wb, k), 2, -1),
                              element_at(st, k + 1) - 1) + k),
              1, j)) - j))
        ),
        array(greatest(
          element_at(st, size(wb) + 2),
          array_max(
            transform(sequence(1, size(wb)),
              k -> greatest(element_at(st, k)
                              + if(w = element_at(wb, k), 2, -1),
                            element_at(st, k + 1) - 1)))))
      )
    ),
    size(wb) + 2)
"""


@register(
    "qa_local_align",
    sql=f"""
    WITH RECURSIVE
    d AS MATERIALIZED (
      SELECT doc_id, list_slice(list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> ''), 1, {WER_CAP}) AS ws
      FROM documents WHERE doc_id < 500
    ),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ws AS wa, b.ws AS wb
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 250
      WHERE a.doc_id < 250
    ),
    dp AS (
      SELECT doc_a, doc_b, wa, wb, 0 AS i,
             list_transform(range(0, len(wb) + 2), x -> 0) AS st
      FROM pairs
      UNION ALL
      SELECT doc_a, doc_b, wa, wb, i + 1,
             list_append(
               list_transform(range(0, len(wb) + 1),
                 j -> CASE WHEN j = 0 THEN 0 ELSE greatest(0,
                   list_aggregate(list_slice(
                     list_transform(range(1, len(wb) + 1),
                       k -> greatest(st[k] + CASE WHEN wa[i + 1] = wb[k]
                                             THEN 2 ELSE -1 END,
                                     st[k + 1] - 1) + k),
                     1, j), 'max') - j) END),
               greatest(st[len(wb) + 2],
                 COALESCE(list_aggregate(
                   list_transform(range(1, len(wb) + 1),
                     k -> greatest(st[k] + CASE WHEN wa[i + 1] = wb[k]
                                           THEN 2 ELSE -1 END,
                                   st[k + 1] - 1)), 'max'), 0)))
      FROM dp WHERE i < len(wa)
    )
    SELECT doc_a, doc_b,
           CAST(len(wa) AS BIGINT) AS n_ref,
           CAST(len(wb) AS BIGINT) AS n_hyp,
           CAST(st[len(wb) + 2] AS BIGINT) AS sw_score,
           CAST(st[len(wb) + 2] * 1000000
                // GREATEST({SW_MATCH} * LEAST(len(wa), len(wb)), 1)
             AS BIGINT) AS align_ppm
    FROM dp WHERE i = len(wa) ORDER BY doc_a
    """,
)
def qa_local_align(spark, sf_dir):
    """Smith-Waterman local alignment score between the
    deterministically paired documents (i, i+250) over the first
    WER_CAP canonical words: the strongest shared contiguous passage
    under match +2 / mismatch -1 / gap -1 with the standard zero
    floor.  align_ppm normalizes by the maximum attainable score
    (SW_MATCH * min(n_ref, n_hyp)) in exact integer ppm.  Same engine
    strategy as qa_wer_exact/qa_rouge_l — a pure Catalyst aggregate()
    fold whose state is the DP row plus one best-so-far slot, mirrored
    bit-exactly by the oracle's recursive CTE; every value is an
    integer, so no rounding discipline is even needed.

    100 TB shape: identical to qa_wer_exact — pairs hash-distribute,
    per-pair O(WER_CAP^3) inside whole-stage codegen, zero cross-row
    state.  In a production dedup stack this is the VERIFY stage run
    on LSH candidate pairs only, where the local score localizes the
    shared span that triggered the bucket collision."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    ws = F.slice(
        F.filter(
            F.split(
                F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]+"
            ),
            lambda w: w != F.lit(""),
        ),
        1,
        WER_CAP,
    )
    d = docs.select("doc_id", ws.alias("ws"))
    a = d.where(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"), F.col("ws").alias("wa")
    )
    b = d.where(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("ws").alias("wb"),
    )
    score = (
        F.when(
            (F.expr("size(wa)") == 0) | (F.expr("size(wb)") == 0), F.lit(0)
        )
        .otherwise(F.expr(_SW_DP_SPARK))
        .cast("long")
    )
    # fanout before the fold: at test scale the documents table is ONE
    # parquet split, so without a key redistribution all 250 per-pair
    # DP folds run serially on one core (measured 12 s vs ~1 s); at
    # production scale the join output is already key-distributed and
    # this is the same hash exchange
    return (
        fanout(a.join(b, "doc_a"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(wa)").cast("long").alias("n_ref"),
            F.expr("size(wb)").cast("long").alias("n_hyp"),
            score.alias("sw_score"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_ref",
            "n_hyp",
            "sw_score",
            F.expr(
                f"sw_score * 1000000"
                f" div greatest({SW_MATCH} * least(n_ref, n_hyp), 1)"
            )
            .cast("long")
            .alias("align_ppm"),
        )
        .orderBy("doc_a")
    )
