"""Remaining operator-family queries: JSON parse with corrupt capture
(F3), max_by artifact pick (O6), most-changed top-k (O4), term
preservation (U4), nested hierarchy flatten (A4), kept-version pivot
(A11), and the Catalyst structured-extraction stage (04/05).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    ROUND_DIGITS,
    load,
    register,
    words_expr,
)

R = ROUND_DIGITS
_WORD_SPLIT = "[^a-z0-9]+"


@register(
    "f3_json_parse",
    sql=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN props IS NOT NULL AND json_valid(props)
                              AND json_type(props) = 'OBJECT'
                         THEN 0 ELSE 1 END) AS BIGINT)
             AS parse_failures,
           CAST(SUM(CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
                         THEN CAST(json_extract(props, '$.k') AS BIGINT)
                         END) AS BIGINT) AS sum_k,
           ROUND(AVG(CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
                          THEN CAST(json_extract(props, '$.k') AS BIGINT)
                          END), {R}) AS avg_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def f3_json_parse(spark, sf_dir):
    """F3 at scale: from_json with PERMISSIVE corrupt-record capture over
    the events props column; failures counted, never raised.

    Failure = NULL/empty props (from_json yields a NULL struct), corrupt
    text, or valid-JSON-that-is-not-an-object ("str", [..] — from_json
    routes both to the corrupt column).  Plain `doc IS NULL` cannot
    detect malformed objects: from_json returns a struct of NULLs for
    '{{bad', not a NULL struct — the corrupt column is the only reliable
    failure signal.  The F3 light-repair (drop trailing commas) runs
    BEFORE the parse, exactly as in the reference chain — which also
    aligns the engines' JSON dialects (DuckDB's yyjson accepts trailing
    commas, Spark's Jackson does not).  The oracle mirrors via
    json_valid + json_type='OBJECT' (and guards json_extract, which
    ERRORS on malformed input in DuckDB)."""
    repaired = F.regexp_replace(F.col("props"), ",\\s*([}\\]])", "$1")
    parsed = load(spark, sf_dir, "events").select(
        "event_type",
        F.from_json(
            repaired,
            "k INT, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("doc"),
    )
    failed = F.col("doc").isNull() | F.col("doc._corrupt").isNotNull()
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(failed.cast("int")).cast("long").alias("parse_failures"),
            F.sum("doc.k").cast("long").alias("sum_k"),
            F.round(F.avg("doc.k"), R).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "o6_max_by_pick",
    sql="""
    SELECT user_id,
           arg_max(event_id, ts) AS newest_event_id,
           ROUND(arg_max(value, ts), 4) AS newest_value
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def o6_max_by_pick(spark, sf_dir):
    """O6 newest-artifact pick (mcp_ocr_docling.py:140-143) as max_by on
    the (unique) event timestamp."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("max_by(event_id, ts)").alias("newest_event_id"),
            F.round(F.expr("max_by(value, ts)"), 4).alias("newest_value"),
        )
        .orderBy("user_id")
    )


@register(
    "o4_most_changed",
    sql="""
    SELECT event_id, user_id, ROUND(value - prev_value, 4) AS change
    FROM (
      SELECT event_id, user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events
    ) WHERE prev_value IS NOT NULL
    ORDER BY ABS(value - prev_value) DESC, event_id
    LIMIT 12
    """,
)
def o4_most_changed(spark, sf_dir):
    """O4 top-12 most-changed (03a_llm_cleanup_qa cell 0:226-232):
    largest adjacent deltas, deterministic tie-break.  The top-12 rank
    key is the RAW delta (exactly as the oracle's ORDER BY) — ranking on
    the rounded display value would let two raw-distinct deltas tie at
    4 decimals and flip membership at the rank-12 cutoff."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("prev_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.col("value") - F.col("prev_value")).alias("raw_change"),
        )
        .orderBy(F.abs(F.col("raw_change")).desc(), "event_id")
        .limit(12)
        .select(
            "event_id", "user_id", F.round("raw_change", 4).alias("change")
        )
    )


@register(
    "u4_term_preservation",
    sql="""
    WITH w AS (
      SELECT lang, source,
             list_distinct(flatten(list(
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')
             ))) AS words
      FROM documents WHERE source IN ('src0','src1') GROUP BY lang, source
    )
    SELECT a.lang,
           len(list_intersect(a.words, b.words)) AS n_common,
           len(a.words) AS n_before,
           ROUND(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                 / len(a.words), 4) AS preservation
    FROM w a JOIN w b ON a.lang = b.lang
    WHERE a.source = 'src0' AND b.source = 'src1'
    ORDER BY a.lang
    """,
)
def u4_term_preservation(spark, sf_dir):
    """U4 term-preservation intersection (qa_pipeline_evaluator.py:311-325):
    |before ∩ after| / |before| on distinct token sets."""
    docs = load(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1")
    )
    words = (
        docs.select(
            "lang",
            "source",
            F.explode(
                words_expr()
            ).alias("w"),
        )
        .groupBy("lang", "source")
        .agg(F.collect_set("w").alias("words"))
    )
    a = words.where(F.col("source") == "src0").alias("a")
    b = words.where(F.col("source") == "src1").alias("b")
    inter = F.array_intersect(F.col("a.words"), F.col("b.words"))
    return (
        a.join(b, F.col("a.lang") == F.col("b.lang"))
        .select(
            F.col("a.lang").alias("lang"),
            F.size(inter).alias("n_common"),
            F.size("a.words").alias("n_before"),
            F.round(
                F.size(inter).cast("double") / F.size("a.words"), 4
            ).alias("preservation"),
        )
        .orderBy("lang")
    )


@register(
    "a4_hierarchy_flatten",
    sql=f"""
    WITH nested AS (
      SELECT user_id, event_type, list(value ORDER BY event_id) AS vals
      FROM events GROUP BY user_id, event_type
    ), per_user AS (
      SELECT user_id, list(vals ORDER BY event_type) AS groups
      FROM nested GROUP BY user_id
    )
    SELECT user_id,
           len(flatten(groups)) AS n_leaves,
           ROUND(list_aggregate(flatten(groups), 'sum'), {R}) AS total
    FROM per_user ORDER BY user_id
    """,
)
def a4_hierarchy_flatten(spark, sf_dir):
    """A4 hierarchy flatten (mcp_ocr_doctr.py:44-91): pages->blocks->
    lines->words becomes nested array-of-arrays built per group, then
    flattened/aggregated with nested F.transform/F.aggregate."""
    nested = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
    )
    per_user = nested.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("event_type", "vals"))),
            lambda s: s["vals"],
        ).alias("groups")
    )
    flat = F.flatten("groups")
    return per_user.select(
        "user_id",
        F.size(flat).alias("n_leaves"),
        F.round(
            F.aggregate(flat, F.lit(0.0), lambda acc, v: acc + v), R
        ).alias("total"),
    ).orderBy("user_id")


@register(
    "a11_kept_pivot",
    sql="""
    SELECT lang,
           COUNT(*) FILTER (WHERE source = 'src0') AS src0,
           COUNT(*) FILTER (WHERE source = 'src1') AS src1,
           COUNT(*) FILTER (WHERE source = 'src2') AS src2,
           COUNT(*) FILTER (WHERE source NOT IN ('src0','src1','src2'))
             AS other
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def a11_kept_pivot(spark, sf_dir):
    """A11 kept-version Counter (03_llm_cleanup cell 7:48-57) as a pivot:
    per group, counts of each chosen label."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "label",
        F.when(F.col("source").isin("src0", "src1", "src2"), F.col("source"))
        .otherwise("other"),
    )
    return (
        docs.groupBy("lang")
        .pivot("label", ["src0", "src1", "src2", "other"])
        .count()
        .na.fill(0)
        .orderBy("lang")
    )


@register("structured_extract_merge")
def structured_extract_merge(spark, sf_dir):
    """04/05 Catalyst structured extraction + typed per-conversation merge
    over the deterministic transcripts (rows-only driver check; semantics
    tested against the single-process merge in pytest)."""
    from medical_ocr_pipeline_spark.plans.structured import (
        merge_documents,
        structured_extract,
    )
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    tr = spark_transcripts(spark, 100, partitions=8)
    s = structured_extract(tr)
    return (
        merge_documents(s)
        .select(
            "conv_id", "summary", F.array_join("items", "|").alias("items"),
            "dose", "n_pieces",
        )
        .orderBy("conv_id")
    )


# --- relational set operations (INTERSECT / EXCEPT) --------------------------

@register(
    "set_ops_custkeys",
    sql="""
    WITH urgent AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ), low AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    SELECT 'both' AS bucket, COUNT(*) AS n FROM
      (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM low)
    UNION ALL
    SELECT 'urgent_only' AS bucket, COUNT(*) AS n FROM
      (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM low)
    ORDER BY bucket
    """,
)
def set_ops_custkeys(spark, sf_dir):
    """INTERSECT / EXCEPT as DataFrame ops (U-family at relational
    scale): both plan to hash semi/anti joins on the distinct key set —
    never a full materialized set difference."""
    orders = load(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    ).distinct()
    low = orders.where(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    ).distinct()
    both = urgent.intersect(low).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    # subtract == EXCEPT DISTINCT: matches the SQL oracle's EXCEPT and
    # plans as a left-anti join; exceptAll would plan the heavier
    # replicate-and-count rewrite and silently change semantics if the
    # upstream .distinct() were ever dropped
    only = urgent.subtract(low).agg(F.count("*").alias("n")).select(
        F.lit("urgent_only").alias("bucket"), "n"
    )
    return both.unionByName(only).orderBy("bucket")


# --- moving-window aggregate (rows frame) ------------------------------------

@register(
    "w_moving_avg",
    sql=f"""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), {R}) AS avg3
    FROM events
    ORDER BY user_id, event_id
    """,
)
def w_moving_avg(spark, sf_dir):
    """3-row trailing moving average — the bounded rows-frame window
    (SURVEY W-family uses only lag and running frames; this completes
    the bounded-frame case).  Bounded frames keep O(1) state per row at
    any scale; avg of exactly <=3 doubles is order-deterministic, so
    ROUND is safe here."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id", "event_id",
            F.round(F.avg("value").over(w), R).alias("avg3"),
        )
        .orderBy("user_id", "event_id")
    )


# --- UNPIVOT / stack ---------------------------------------------------------

@register(
    "unpivot_doc_stats",
    sql="""
    SELECT lang, metric, CAST(val AS BIGINT) AS val
    FROM (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars
      FROM documents GROUP BY lang
    ) UNPIVOT (val FOR metric IN (n_docs, total_chars, max_chars))
    ORDER BY lang, metric
    """,
)
def unpivot_doc_stats(spark, sf_dir):
    """UNPIVOT (stack): wide per-lang stats to long (lang, metric, val)
    rows — the inverse of a11's pivot, one narrow scan, no shuffle
    beyond the aggregation."""
    wide = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )
    return wide.unpivot(
        "lang", ["n_docs", "total_chars", "max_chars"], "metric", "val"
    ).orderBy("lang", "metric")


# --- edit-distance threshold self-join (J3 at relational scale) --------------

LEV_MAX = 2


@register(
    "fuzzy_name_pairs",
    sql=f"""
    SELECT levenshtein(a.p_name, b.p_name) AS dist,
           COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    GROUP BY dist ORDER BY dist
    """,
)
def fuzzy_name_pairs(spark, sf_dir):
    """Edit-distance threshold self-join (the J3 fuzzy-vocab join at
    relational scale): part-name pairs within Levenshtein {LEV_MAX}.
    Scale path: levenshtein <= k implies |len(a)-len(b)| <= k, so the
    probe side explodes into the 2k+1 adjacent length bands and the
    join is a hash equi-join on band — the quadratic comparison runs
    only within bands (lossless pruning, same result as the naive
    theta-join the oracle runs)."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.length("p_name").alias("ln")
    )
    probe = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        F.explode(
            F.sequence(F.col("ln") - LEV_MAX, F.col("ln") + LEV_MAX)
        ).alias("band"),
    )
    pairs = probe.join(p, probe.band == p.ln).where(
        (F.col("a_key") < F.col("p_partkey"))
        & (F.levenshtein(F.col("a_name"), F.col("p_name")) <= LEV_MAX)
    )
    return (
        pairs.select(
            F.levenshtein(F.col("a_name"), F.col("p_name")).alias("dist")
        )
        .groupBy("dist")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("dist")
    )
