"""Relational operator queries (SURVEY.md §2.3-§2.7) over driver testdata.

Each query re-expresses a reference operator family on the TPC-H-ish
tables so the DuckDB oracle can check it: aggregations (A5/A10/A11),
joins (J5/J6/J8), windows (W2/W4/W5/W7), top-k (O3), set ops (U6),
grouping sets, plus two classic star-schema queries exercising
broadcast-join planning at scale.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import ROUND_DIGITS, load, register

R = ROUND_DIGITS


# --- A10 / A5: stage & page totals ------------------------------------------

@register(
    "a10_stage_totals",
    sql=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), {R}) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def a10_stage_totals(spark, sf_dir):
    """A10 stage totals (quick_qa_check.py:49-143) over documents."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), R).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "a5_page_metrics",
    sql=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), {R}) AS avg_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def a5_page_metrics(spark, sf_dir):
    """A5 per-(page, engine) metrics (01_extract_blocks cell 2:13-19)."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), R).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "grouping_sets_metrics",
    sql=f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), {R}) AS avg_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (source))
    ORDER BY lang NULLS FIRST, source
    """,
)
def grouping_sets_metrics(spark, sf_dir):
    """Per-(page×engine) + per-engine summaries as GROUPING SETS
    (01_blocks_all_mcp_compare cell 1:446-469)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_gs")
    return spark.sql(
        f"""
        SELECT lang, source, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), {R}) AS avg_chars
        FROM documents_gs
        GROUP BY GROUPING SETS ((lang, source), (source))
        ORDER BY lang NULLS FIRST, source
        """
    )


# --- J5: stage-comparison join ----------------------------------------------

@register(
    "j5_stage_deltas",
    sql=f"""
    WITH a AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars_a, COUNT(*) AS docs_a
      FROM documents WHERE source = 'src0' GROUP BY lang
    ), b AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars_b, COUNT(*) AS docs_b
      FROM documents WHERE source = 'src1' GROUP BY lang
    )
    SELECT a.lang,
           a.chars_a, b.chars_b,
           CAST(b.chars_b - a.chars_a AS BIGINT) AS delta_chars,
           ROUND(100.0 * (b.chars_b - a.chars_a) / a.chars_a, {R}) AS pct_change
    FROM a JOIN b ON a.lang = b.lang
    ORDER BY a.lang
    """,
)
def j5_stage_deltas(spark, sf_dir):
    """J5 stage A vs B totals -> deltas & pct (quick_qa_check.py:97-143)."""
    docs = load(spark, sf_dir, "documents")
    a = (
        docs.where(F.col("source") == "src0")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("chars_a"), F.count("*").alias("docs_a"))
    )
    b = (
        docs.where(F.col("source") == "src1")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("chars_b"), F.count("*").alias("docs_b"))
    )
    return (
        a.join(b, "lang")
        .select(
            "lang",
            "chars_a",
            "chars_b",
            (F.col("chars_b") - F.col("chars_a")).alias("delta_chars"),
            F.round(
                100.0 * (F.col("chars_b") - F.col("chars_a")) / F.col("chars_a"), R
            ).alias("pct_change"),
        )
        .orderBy("lang")
    )


# --- J6: word-deficit anti-join ---------------------------------------------

_WORD_SPLIT = "[^a-z0-9]+"


@register(
    "j6_missing_words",
    sql=f"""
    WITH ref AS (
      SELECT w AS word, COUNT(*) AS ref_cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT}')) AS w
        FROM documents WHERE source = 'src0'
      ) WHERE w <> '' GROUP BY w
    ), ocr AS (
      SELECT w AS word, COUNT(*) AS ocr_cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '{_WORD_SPLIT}')) AS w
        FROM documents WHERE source = 'src1'
      ) WHERE w <> '' GROUP BY w
    )
    SELECT ref.word,
           ref.ref_cnt,
           COALESCE(ocr.ocr_cnt, 0) AS ocr_cnt,
           ref.ref_cnt - COALESCE(ocr.ocr_cnt, 0) AS deficit
    FROM ref LEFT JOIN ocr ON ref.word = ocr.word
    WHERE ref.ref_cnt > COALESCE(ocr.ocr_cnt, 0)
    ORDER BY deficit DESC, ref.word
    LIMIT 50
    """,
)
def j6_missing_words(spark, sf_dir):
    """J6 missing-word deficit top-50 (02_ocr_verifier.py:222-239)."""
    docs = load(spark, sf_dir, "documents")

    def words(src):
        return (
            docs.where(F.col("source") == src)
            .select(
                F.explode(F.split(F.lower("text"), _WORD_SPLIT)).alias("word")
            )
            .where(F.col("word") != "")
            .groupBy("word")
            .count()
        )

    ref = words("src0").withColumnRenamed("count", "ref_cnt")
    ocr = words("src1").withColumnRenamed("count", "ocr_cnt")
    return (
        ref.join(ocr, "word", "left")
        .select(
            "word",
            "ref_cnt",
            F.coalesce("ocr_cnt", F.lit(0)).alias("ocr_cnt"),
            (F.col("ref_cnt") - F.coalesce("ocr_cnt", F.lit(0))).alias("deficit"),
        )
        .where(F.col("ref_cnt") > F.col("ocr_cnt"))
        .orderBy(F.desc("deficit"), "word")
        .limit(50)
    )


# --- J8: best-engine argmax --------------------------------------------------

@register(
    "j8_best_event",
    sql="""
    SELECT user_id, event_id AS best_event_id, value AS best_value
    FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def j8_best_event(spark, sf_dir):
    """J8 argmax pick (prefect_pipeline.py:112-127): per key, row with
    max metric, deterministic tie-break."""
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("best_event_id"),
            F.col("value").alias("best_value"),
        )
        .orderBy("user_id")
    )


# --- W2/W4: gap sessionization ----------------------------------------------

SESSION_GAP_S = 1800


@register(
    "w4_sessionize",
    sql=f"""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > {SESSION_GAP_S} * 1000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), {R}) AS session_value
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def w4_sessionize(spark, sf_dir):
    """W2/W4 gap sessionization (the A1-A3 lag/cumsum pattern over event
    time instead of y-coordinates).

    Engine-boundary discipline: the gap compares MICROSECOND-exact
    integers (unix_micros / epoch_us) — unix_timestamp truncates to
    seconds while DuckDB epoch() keeps the fraction, so a gap straddling
    the threshold by sub-second amounts would split sessions differently
    (latent: the testdata has no such gap today).  Both windows carry
    the full (ts, event_id) order so tied timestamps cannot reorder the
    running sum."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    g = (
        load(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    # ts is TIMESTAMP_NTZ; the session tz is UTC so the
                    # cast to TIMESTAMP is exact
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                    > SESSION_GAP_S * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wrun))
    )
    return (
        g.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), R).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


# --- W5: reading-order violation score --------------------------------------

@register(
    "w5_order_violations",
    sql=f"""
    SELECT user_id,
           ROUND(AVG(CASE WHEN value < prev_value THEN 1.0 ELSE 0.0 END), {R})
             AS violation_rate,
           COUNT(*) AS n_pairs
    FROM (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events
    ) WHERE prev_value IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def w5_order_violations(spark, sf_dir):
    """W5 adjacent-pair violation fraction (qa_pipeline_evaluator.py:378-398)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("prev_value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.avg(F.when(F.col("value") < F.col("prev_value"), 1.0).otherwise(0.0)),
                R,
            ).alias("violation_rate"),
            F.count("*").alias("n_pairs"),
        )
        .orderBy("user_id")
    )


# --- W7: running-budget chunk assignment ------------------------------------

CHUNK_BUDGET = 5000


@register(
    "w7_chunk_assign",
    sql=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             CAST(SUM(n_chars + 180) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM documents
    )
    SELECT source,
           CAST(FLOOR((cum - 1) / {CHUNK_BUDGET}) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chunk_chars
    FROM c
    GROUP BY source, chunk_id
    ORDER BY source, chunk_id
    """,
)
def w7_chunk_assign(spark, sf_dir):
    """W7 char-budget chunking (04_json_extraction cell 2:134-147):
    est = len + 180, running sum -> chunk id."""
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        load(spark, sf_dir, "documents")
        .withColumn("cum", F.sum(F.col("n_chars") + 180).over(w))
        .withColumn(
            "chunk_id",
            F.floor((F.col("cum") - 1) / CHUNK_BUDGET).cast("long"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chunk_chars"),
        )
        .orderBy("source", "chunk_id")
    )


# --- O3: deterministic top-k -------------------------------------------------

@register(
    "o3_top_docs",
    sql="""
    SELECT doc_id, n_chars, lang
    FROM documents
    ORDER BY n_chars DESC, doc_id
    LIMIT 50
    """,
)
def o3_top_docs(spark, sf_dir):
    """O3 top-k with full tie-break (02_ocr_verifier.py:238-239)."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", "lang")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(50)
    )


# --- U6: source-tag union ----------------------------------------------------

@register(
    "u6_source_tags",
    sql="""
    SELECT lang,
           array_to_string(list_sort(list(DISTINCT source)), '+') AS sources,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def u6_source_tags(spark, sf_dir):
    """U6 '+'-joined sorted distinct tags (01_extract_blocks cell 4:345)."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_set("source")), "+").alias("sources"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


# --- classic star-schema queries (broadcast-join planning at scale) ---------

@register(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), {R}) AS sum_qty,
           ROUND(SUM(l_extendedprice), {R}) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), {R}) AS sum_disc_price,
           ROUND(AVG(l_quantity), {R}) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan+partial-agg (map-side combine showcase)."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), R).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), R).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), R).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_region_revenue",
    sql=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def q_region_revenue(spark, sf_dir):
    """Star join with explicit broadcast of the small dims.

    Aggregate-below-join: lineitem is first rolled up to one row per
    orderkey (map-side combinable), so the join input shrinks ~4x and
    COUNT(DISTINCT o_orderkey) becomes a plain COUNT(*) — each order
    maps to exactly one (region, nation).  Same results, no distinct
    aggregation; at 100 TB this halves the post-join state."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "order_rev"
        )
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("order_rev"), R).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("region", "nation")
    )


@register(
    "q3_shipping_priority",
    sql=f"""
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast against the fact,
    fact-side predicate pushed to the parquet scan, deterministic top-10.
    At scale: customer(BUILDING) broadcasts, lineitem never shuffles for
    the join — only for the final per-order aggregate."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R
            ).alias("revenue"),
        )
        .select("orderkey", "revenue", "orderpriority")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@register(
    "q_semi_urgent_customers",
    sql="""
    SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
)
def q_semi_urgent_customers(spark, sf_dir):
    """LEFT SEMI join (EXISTS): customers with >=1 urgent order, counted
    per segment.  The semi join never materializes order columns; what
    gets broadcast is the *distinct filtered custkeys* — projecting +
    deduping BEFORE the hint, since a priority filter still keeps ~20%
    of the orders fact and broadcasting that would OOM at 100 TB."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    urgent_keys = o.select("o_custkey").distinct()
    return (
        c.join(F.broadcast(urgent_keys), c.c_custkey == urgent_keys.o_custkey,
               "left_semi")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("mktsegment")
    )


@register(
    "q_anti_dormant_customers",
    sql="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_dormant,
           ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01'
    )
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
)
def q_anti_dormant_customers(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS), TPC-H Q22 shape: customers with no
    recent order.  The broadcast side is the distinct recent custkey
    set, not the filtered orders fact (which is far too large to ship);
    no null-handling trap because the join key is non-nullable."""
    c = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    recent_keys = recent.select("o_custkey").distinct()
    return (
        c.join(F.broadcast(recent_keys), c.c_custkey == recent_keys.o_custkey,
               "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_dormant"),
            F.round(F.sum("c_acctbal"), R).alias("total_acctbal"),
        )
        .orderBy("mktsegment")
    )


@register(
    "q_rollup_revenue",
    sql=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), {R}) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def q_rollup_revenue(spark, sf_dir):
    """ROLLUP hierarchy totals (priority -> status -> grand total) —
    complements grouping_sets_metrics; one shuffle produces all levels."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), R).alias("revenue"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@register(
    "q_brand_topn_per_nation",
    sql=f"""
    SELECT nation, brand, revenue, rk FROM (
      SELECT n.n_name AS nation, p.p_brand AS brand,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R}) AS revenue,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name
               ORDER BY ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {R})
                        DESC, p.p_brand
             ) AS rk
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, p.p_brand
    ) WHERE rk <= 3
    ORDER BY nation, rk
    """,
)
def q_brand_topn_per_nation(spark, sf_dir):
    """Per-group top-k over a star join: top-3 part brands by revenue per
    supplier nation.  part/supplier/nation broadcast; the window runs
    over the already-aggregated (nation, brand) frame — tiny, one final
    shuffle on nation."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_brand").alias("brand"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R
            ).alias("revenue"),
        )
    )
    w = W.partitionBy("nation").orderBy(F.desc("revenue"), "brand")
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("nation", "brand", "revenue", "rk")
        .orderBy("nation", "rk")
    )


@register(
    "q_cube_order_stats",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), {R}) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_cube_order_stats(spark, sf_dir):
    """CUBE completes the multidimensional-aggregate trio (grouping sets,
    rollup, cube) — all four grouping combinations in one shuffle."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), R).alias("avg_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q_value_percentiles",
    sql=f"""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), {R}) AS p50,
           ROUND(quantile_cont(value, 0.9), {R}) AS p90,
           ROUND(quantile_cont(value, 0.99), {R}) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation).  At 100 TB the
    exact version sorts per group — swap to percentile_approx and drop
    the oracle if groups stop fitting; the approx variant is asserted
    within tolerance in tests instead."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), R).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), R).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), R).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "w_ntile_quartiles",
    sql=f"""
    SELECT quartile,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), {R}) AS min_price,
           ROUND(MAX(o_totalprice), {R}) AS max_price
    FROM (
      SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    )
    GROUP BY quartile ORDER BY quartile
    """,
)
def w_ntile_quartiles(spark, sf_dir):
    """NTILE quartile bucketing (completes the window family: row_number,
    lag, running frames, bounded frames, ntile).  The global ORDER BY
    window is a single-partition sort — fine for ranking a keyed
    aggregate, wrong for a raw 100 TB fact table (there, bucket by
    percentile_approx cutpoints instead); tie-broken on o_orderkey so
    both engines assign identical buckets."""
    from pyspark.sql import Window as W

    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_totalprice", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), R).alias("min_price"),
            F.round(F.max("o_totalprice"), R).alias("max_price"),
        )
        .orderBy("quartile")
    )


@register(
    "q_below_avg_parts",
    sql=f"""
    WITH t AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey AS partkey,
           COUNT(*) AS n_small_lines,
           ROUND(SUM(l.l_extendedprice), {R}) AS small_revenue
    FROM lineitem l JOIN t ON l.l_partkey = t.l_partkey
    WHERE 2 * CAST(l.l_quantity AS BIGINT) * t.cnt < t.sum_q
    GROUP BY l.l_partkey
    HAVING COUNT(*) >= 2
    ORDER BY partkey
    """,
)
def q_below_avg_parts(spark, sf_dir):
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    threshold) decorrelated by hand into a pre-aggregate + join, which
    is exactly the plan Catalyst's DecorrelateInnerQuery would produce:
    one extra combinable aggregate over the same fact instead of a
    per-row subquery execution.  At 100 TB both sides shuffle on
    l_partkey once and AQE reuses the partitioning.

    The threshold predicate is INTEGER-EXACT in both engines:
    qty < 0.5 * avg  is rewritten as  2 * qty * cnt < sum(qty)
    (l_quantity is integer-valued, so sums and products are exact) —
    a float average feeding a PREDICATE is the one place the
    ROUND_DIGITS discipline cannot absorb a one-ulp summation-order
    difference, because it flips row MEMBERSHIP, not a display value."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count("*").alias("cnt"),
    )
    return (
        l.join(thresholds, "l_partkey")
        .where(
            2 * F.col("l_quantity").cast("long") * F.col("cnt")
            < F.col("sum_q")
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").alias("n_small_lines"),
            F.round(F.sum("l_extendedprice"), R).alias("small_revenue"),
        )
        .where(F.col("n_small_lines") >= 2)
        .orderBy("partkey")
    )


# --- Z-order (Morton) layout clustering ---------------------------------------
# The data-layout optimization behind Delta OPTIMIZE ZORDER / Iceberg
# sort orders: interleave the bits of two filter columns so a range-
# partitioned rewrite co-locates rows that are close in BOTH dimensions,
# and per-file min/max stats prune scans on either column.  This query
# computes the layout and MEASURES it: the same file-bucket assignment
# under (a) natural o_orderkey order and (b) Morton order, with each
# bucket's min/max envelope on both dimensions — the stats a format's
# pruning index would hold.  tests/test_zorder.py asserts the Morton
# layout's mean envelope area is strictly smaller (that's the point).

ZORDER_BUCKETS = 16
_Z_BITS = 16

# sum_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1)) as an engine-shared
# integer fold — Spark aggregate() over a sequence, DuckDB a list
# comprehension sum; both pure BIGINT.
_MORTON_SPARK = (
    "aggregate(sequence(0, {b} - 1), cast(0 as bigint), (acc, i) -> acc"
    " + shiftleft(shiftright(x, i) & 1, 2 * i)"
    " + shiftleft(shiftright(y, i) & 1, 2 * i + 1))"
).format(b=_Z_BITS)
# NB: SQL's << binds LOOSER than +, so every shift term is fully
# parenthesized — a bare `a << b + c` parses as a << (b + c).
_MORTON_DUCK = (
    "list_aggregate([ (((x >> i) & 1) << (2 * i))"
    " + (((y >> i) & 1) << (2 * i + 1))"
    " FOR i IN range(0, {b}) ], 'sum')"
).format(b=_Z_BITS)


@register(
    "zorder_layout",
    sql=f"""
    WITH d AS (
      SELECT o_orderkey,
             CAST(o_custkey & 65535 AS BIGINT) AS x,
             CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                  & 65535 AS BIGINT) AS y
      FROM orders
    ), m AS (
      SELECT o_orderkey, x, y,
             CAST({_MORTON_DUCK} AS BIGINT) AS morton
      FROM d
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY o_orderkey) AS rn_nat,
             row_number() OVER (ORDER BY morton, o_orderkey) AS rn_z,
             COUNT(*) OVER () AS n
      FROM m
    ), assigned AS (
      SELECT 'natural' AS layout,
             (rn_nat - 1) * {ZORDER_BUCKETS} // n AS bucket, x, y
      FROM ranked
      UNION ALL
      SELECT 'zorder' AS layout,
             (rn_z - 1) * {ZORDER_BUCKETS} // n AS bucket, x, y
      FROM ranked
    )
    SELECT layout, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_lo, CAST(MAX(x) AS BIGINT) AS x_hi,
           CAST(MIN(y) AS BIGINT) AS y_lo, CAST(MAX(y) AS BIGINT) AS y_hi,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT)
             AS envelope_area
    FROM assigned
    GROUP BY layout, bucket
    ORDER BY layout, bucket
    """,
)
def zorder_layout(spark, sf_dir):
    """Morton-interleaved (Z-order) file layout over orders
    (o_custkey x o_orderdate), measured against natural insert order:
    each layout splits the table into ZORDER_BUCKETS equal rank ranges
    and reports every bucket's min/max envelope on both dimensions —
    exactly the per-file stats min/max pruning reads.  A query filtering
    on either column skips every bucket whose envelope misses the
    predicate; Z-order shrinks envelope AREAS, so it prunes on BOTH
    columns at once where natural order only prunes the insert key.

    100 TB shape: the Morton key is a per-row integer fold inside
    codegen; the rank-range assignment IS a global range partition —
    in production you write it with repartitionByRange(morton) +
    sortWithinPartitions, which samples ranges instead of running the
    full-table window used here for the oracle's exact determinism;
    the per-bucket envelope agg is combinable."""
    d = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(o_custkey & 65535 as bigint)").alias("x"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .bitwiseAND(F.lit(65535))
        ).alias("y"),
    )
    m = d.withColumn("morton", F.expr(_MORTON_SPARK).cast("long"))
    w_nat = W.orderBy("o_orderkey")
    w_z = W.orderBy("morton", "o_orderkey")
    ranked = (
        m.withColumn("rn_nat", F.row_number().over(w_nat))
        .withColumn("rn_z", F.row_number().over(w_z))
        .withColumn("n", F.count("*").over(W.partitionBy()))
    )
    nat = ranked.select(
        F.lit("natural").alias("layout"),
        F.expr(f"(rn_nat - 1) * {ZORDER_BUCKETS} div n").alias("bucket"),
        "x",
        "y",
    )
    zo = ranked.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"(rn_z - 1) * {ZORDER_BUCKETS} div n").alias("bucket"),
        "x",
        "y",
    )
    return (
        nat.unionByName(zo)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
            F.expr(
                "cast((max(x) - min(x) + 1) * (max(y) - min(y) + 1)"
                " as bigint)"
            ).alias("envelope_area"),
        )
        .orderBy("layout", "bucket")
    )


# --- IQR / Tukey-fence outlier detection ---------------------------------------
# The robust anomaly gate a metrics pipeline runs on every numeric
# stream: quartiles by exact rank selection (value-identical in any
# engine — never an interpolating quantile function, see base.py's
# float discipline), fences at Q1/Q3 -/+ 1.5*IQR, and per-group outlier
# counts.  Complements length_quantile_sketch (which trades exactness
# for a combinable histogram); this is the exact tier.

IQR_K_X10 = 15  # Tukey's 1.5, held as an integer tenth


@register(
    "iqr_outliers",
    sql=f"""
    WITH e AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ), ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ), q AS (
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN rk * 4 >= n THEN v END) AS q1,
             MIN(CASE WHEN rk * 4 >= 3 * n THEN v END) AS q3
      FROM ranked GROUP BY event_type
    ), f AS (
      SELECT event_type, n, q1, q3, q3 - q1 AS iqr,
             10 * q1 - {IQR_K_X10} * (q3 - q1) AS lo_x10,
             10 * q3 + {IQR_K_X10} * (q3 - q1) AS hi_x10
      FROM q
    )
    SELECT f.event_type,
           CAST(f.n AS BIGINT) AS n,
           CAST(f.q1 AS BIGINT) AS q1_cents,
           CAST(f.q3 AS BIGINT) AS q3_cents,
           CAST(f.iqr AS BIGINT) AS iqr_cents,
           CAST(SUM(CASE WHEN 10 * e.v < f.lo_x10
                         OR 10 * e.v > f.hi_x10
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN f USING (event_type)
    GROUP BY f.event_type, f.n, f.q1, f.q3, f.iqr
    ORDER BY f.event_type
    """,
)
def iqr_outliers(spark, sf_dir):
    """Per-event-type Tukey-fence outlier counts over `value`: exact
    rank-selected quartiles (smallest value whose rank crosses n/4 and
    3n/4), fences at Q1/Q3 -/+ 1.5*IQR, everything in integer cents
    (floor(value*100)) and integer tenths for the 1.5 factor — zero
    float comparisons, so the oracle matches bit-for-bit.

    100 TB shape: quartiles need a per-group rank — the per-group
    window here is the exact tier and is how you'd run it per
    bounded-cardinality group (event types); for unbounded groups swap
    in the length_quantile_sketch histogram and keep the fence/count
    join, which is a broadcast of one tiny per-group fence row against
    a combinable filtered count.  The outlier count itself never
    shuffles more than (group, count) rows."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    wr = W.partitionBy("event_type").orderBy("v")
    wn = W.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "v",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("rk") * 4 >= F.col("n"), F.col("v"))).alias(
            "q1"
        ),
        F.min(
            F.when(F.col("rk") * 4 >= 3 * F.col("n"), F.col("v"))
        ).alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (
            10 * F.col("q1") - IQR_K_X10 * (F.col("q3") - F.col("q1"))
        ).alias("lo_x10"),
        (
            10 * F.col("q3") + IQR_K_X10 * (F.col("q3") - F.col("q1"))
        ).alias("hi_x10"),
    )
    return (
        e.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "iqr")
        .agg(
            F.sum(
                F.when(
                    (10 * F.col("v") < F.col("lo_x10"))
                    | (10 * F.col("v") > F.col("hi_x10")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("q1").alias("q1_cents"),
            F.col("q3").alias("q3_cents"),
            F.col("iqr").alias("iqr_cents"),
            "n_outliers",
        )
        .orderBy("event_type")
    )
