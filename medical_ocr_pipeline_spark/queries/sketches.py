"""Approximate-query sketches — HyperLogLog distinct counting, Count-Min
heavy hitters, and Bloom-filter join pruning — built from scratch on
combinable DataFrame aggregations with EXACT-INTEGER cross-engine oracles.

These are the classic OLAP sketch operators a 100 TB pipeline leans on
when exact answers are too expensive: cardinality without a distinct
shuffle (HLL registers are a 64-row combinable max), frequency without a
full count table (CMS cells are a 256-row combinable sum), and join-input
pruning without materializing the build side on every executor (a Bloom
bit set is a tiny broadcast list).  Reference analogue: the pipeline's QA
evaluator computes exact distincts/counts driver-side
(qa_pipeline_evaluator.py:419-470); these are the shapes that replace it
at scale.

Oracle discipline: every sketch is DETERMINISTIC — hashes derive from
md5 via the shared MD5_INT48 template, register math is pure integer
(bit-length via length(ltrim(bin(w),'0')), powers of two as BIGINT
shifts, the HLL alpha correction as a precomputed integer numerator over
an integer denominator) — so DuckDB can replay the identical sketch and
the driver's value hash matches exactly.  No floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_DUCK,
    MD5_INT48_SPARK,
    WORD_SPLIT,
    load,
    register,
    words_expr,
)

# --- HyperLogLog ------------------------------------------------------------
# m = 64 registers (b = 6 index bits), 42-bit rank field from the 48-bit
# md5-derived hash.  rho(w) = position of the leftmost 1-bit in the
# 42-bit field = 43 - bit_length(w)  (w = 0 -> 43, the all-zeros rank).
# Raw estimate E = alpha_64 * m^2 / sum_j 2^(-R_j); scaling every
# 2^(-R_j) by 2^43 makes the denominator the integer
# S = sum_j 2^(43 - R_j)  (absent registers contribute 2^43), and the
# numerator the integer constant floor(alpha_64 * m^2 * 2^43), so
# E = HLL_NUM // S in pure BIGINT division — identical in both engines.
# The small-range linear-counting branch (E <= 5/2 m and V > 0 ->
# m * ln(m / V)) needs a transcendental, so the query emits the raw
# estimate plus V (zero-register count); a consumer applies the branch.
_HLL_M = 64
_HLL_RANK_BITS = 42
_HLL_NUM = 25_544_417_086_445_452  # floor(0.709 * 64^2 * 2^43)


@register(
    "sketch_hll_distinct",
    sql=f"""
    WITH w AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{WORD_SPLIT}'),
               x -> x <> '')) AS w
      FROM documents
    ), h AS (
      SELECT lang, {MD5_INT48_DUCK.format(x="w")} AS h, w FROM w
    ), reg AS (
      SELECT lang, h & 63 AS idx,
             MAX(43 - length(ltrim(bin(h >> 6), '0'))) AS rho
      FROM h GROUP BY lang, idx
    ), summary AS (
      SELECT lang,
             COUNT(*) AS n_reg_hit,
             CAST(64 - COUNT(*) AS BIGINT) AS v_zero,
             CAST(SUM(CAST(1 AS BIGINT) << (43 - rho)) AS BIGINT)
               + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 43) AS s_scaled
      FROM reg GROUP BY lang
    ), exact AS (
      SELECT lang, COUNT(DISTINCT w) AS n_exact FROM w GROUP BY lang
    )
    SELECT s.lang, e.n_exact, s.n_reg_hit, s.v_zero,
           {_HLL_NUM} // s.s_scaled AS hll_est
    FROM summary s JOIN exact e ON s.lang = e.lang
    ORDER BY s.lang
    """,
)
def sketch_hll_distinct(spark, sf_dir):
    """Per-language distinct-word cardinality via a from-scratch
    HyperLogLog-64 (Flajolet et al. 2007), next to the exact distinct for
    error inspection.

    100 TB shape: the register table is a (lang, idx) -> max(rho)
    aggregation — 64 rows per language, combinable (partial max on the
    map side), no distinct shuffle of the word stream.  The exact
    COUNT(DISTINCT) column exists only for the QA comparison; the
    production caller drops it and pays one combinable pass."""
    words = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(words_expr()).alias("w"))
    )
    h = F.expr(MD5_INT48_SPARK.format(x="w"))
    hashed = words.select("lang", "w", h.alias("h"))
    # Spark's bin(bigint) emits no leading zeros, so its length IS the
    # bit length; the regexp strip is a no-op kept for symmetry with the
    # DuckDB side's ltrim(bin(w), '0') (DuckDB also emits minimal
    # binary, and both collapse w = 0 to length 0 -> rho = 43).
    rho = F.lit(43) - F.length(
        F.regexp_replace(F.bin(F.shiftright(F.col("h"), 6)), "^0+", "")
    )
    reg = (
        hashed.select(
            "lang",
            F.expr("h & 63").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("lang", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    summary = reg.groupBy("lang").agg(
        F.count("*").alias("n_reg_hit"),
        (F.lit(64) - F.count("*")).cast("long").alias("v_zero"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 43 - rho)"))
            + (F.lit(64) - F.count("*")).cast("long")
            * F.lit(1 << 43).cast("long")
        ).alias("s_scaled"),
    )
    exact = hashed.groupBy("lang").agg(
        F.countDistinct("w").alias("n_exact")
    )
    return (
        summary.join(exact, "lang")
        .select(
            "lang",
            "n_exact",
            "n_reg_hit",
            "v_zero",
            F.expr(f"{_HLL_NUM} div s_scaled").alias("hll_est"),
        )
        .orderBy("lang")
    )


# --- Count-Min sketch -------------------------------------------------------
# depth d = 4 hash rows, width w = 64 columns; cell(r, c) accumulates the
# counts of every word whose r-th hash lands on column c; the estimate
# for a word is the MIN over its d cells (Cormode & Muthukrishnan 2005)
# — an upper bound on the true count, overcounting only by collisions.
_CMS_D = 4
_CMS_W = 64
_CMS_TOPK = 20


def cms_cell_col():
    """THE Count-Min cell-key column for frames carrying (r, w): the
    salted md5 of 'r:w' masked to _CMS_W columns.  Single definition
    shared by the batch sketch's cell build, its probe side, and
    streaming/sketch.cms_cells — changing the width or hash in one
    place keeps the streamed-equals-batch parity tests honest instead
    of silently breaking them."""
    from pyspark.sql import functions as F

    return F.expr(
        MD5_INT48_SPARK.format(x="concat(cast(r as string), ':', w)")
    ).bitwiseAND(_CMS_W - 1)


@register(
    "sketch_cms_heavy",
    sql=f"""
    WITH w AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{WORD_SPLIT}'),
               x -> x <> '')) AS w
      FROM documents
    ), counts AS (
      SELECT w, COUNT(*) AS n_exact FROM w GROUP BY w
    ), cells AS (
      SELECT r, {MD5_INT48_DUCK.format(x="r || ':' || w")} & 63 AS c,
             CAST(SUM(n_exact) AS BIGINT) AS cell
      FROM counts, range({_CMS_D}) t(r)
      GROUP BY r, c
    ), topk AS (
      SELECT w, n_exact FROM counts
      ORDER BY n_exact DESC, w LIMIT {_CMS_TOPK}
    ), probes AS (
      SELECT k.w, k.n_exact, t.r,
             {MD5_INT48_DUCK.format(x="t.r || ':' || k.w")} & 63 AS c
      FROM topk k, range({_CMS_D}) t(r)
    )
    SELECT p.w AS word, p.n_exact,
           MIN(cl.cell) AS cms_est,
           MIN(cl.cell) - p.n_exact AS overcount
    FROM probes p JOIN cells cl ON p.r = cl.r AND p.c = cl.c
    GROUP BY p.w, p.n_exact
    ORDER BY p.n_exact DESC, p.w
    """,
)
def sketch_cms_heavy(spark, sf_dir):
    """Heavy hitters via a from-scratch 4x64 Count-Min sketch: the exact
    top-20 words with their CMS estimate and overcount (collision error).

    100 TB shape: the sketch is a fixed 256-cell combinable SUM — the
    word stream never shuffles by word; only the (r, c) cell key does
    (256 distinct keys, map-side partials do nearly all the work).  The
    exact count table exists here for the QA comparison; the production
    path keeps only the 256-cell sketch and answers point queries from
    the broadcast cells."""
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(words_expr()).alias("w"))
    )
    counts = words.groupBy("w").agg(F.count("*").alias("n_exact"))
    counts = counts.persist()
    r_tab = spark.range(_CMS_D).select(F.col("id").alias("r"))
    keyed = counts.crossJoin(F.broadcast(r_tab)).select(
        "w",
        "n_exact",
        "r",
        cms_cell_col().alias("c"),
    )
    cells = keyed.groupBy("r", "c").agg(F.sum("n_exact").alias("cell"))
    topk = counts.orderBy(F.desc("n_exact"), "w").limit(_CMS_TOPK)
    probes = topk.crossJoin(F.broadcast(r_tab)).select(
        "w",
        "n_exact",
        "r",
        cms_cell_col().alias("c"),
    )
    return (
        probes.join(cells, ["r", "c"])
        .groupBy(F.col("w").alias("word"), "n_exact")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "word",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), "word")
    )


# --- Bloom-filter join pruning ----------------------------------------------
# The runtime-filter pattern (Spark's own spark.sql.optimizer.runtime.
# bloomFilter does this opaquely; this is the explicit, oracle-checkable
# form): hash the small build side's keys into a bit set (m = 8192 bits,
# k = 3 md5-derived hash functions), broadcast the bits, and keep a probe
# key only if ALL k of its bits are set.  False positives are possible
# (collisions), false negatives are not — the summary row quantifies both
# against the exact semi-join.
_BLOOM_M = 8192
_BLOOM_K = 3


@register(
    "bloom_prefilter_join",
    sql=f"""
    WITH build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ), bits AS (
      SELECT DISTINCT
             {MD5_INT48_DUCK.format(x="i || ':' || k")} % {_BLOOM_M} AS bit
      FROM build, range({_BLOOM_K}) t(i)
    ), probe AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem
    ), probe_bits AS (
      SELECT p.k, {MD5_INT48_DUCK.format(x="i || ':' || p.k")} % {_BLOOM_M} AS bit
      FROM probe p, range({_BLOOM_K}) t(i)
    ), passed AS (
      SELECT pb.k
      FROM probe_bits pb JOIN bits b ON pb.bit = b.bit
      GROUP BY pb.k HAVING COUNT(*) = {_BLOOM_K}
    ), truth AS (
      SELECT p.k FROM probe p JOIN build b ON p.k = b.k
    )
    SELECT (SELECT COUNT(*) FROM probe) AS n_probe,
           (SELECT COUNT(*) FROM passed) AS n_pass,
           (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM passed) - (SELECT COUNT(*) FROM truth)
             AS n_false_pos,
           ((SELECT COUNT(*) FROM passed) - (SELECT COUNT(*) FROM truth))
             * 1000000
             // GREATEST((SELECT COUNT(*) FROM probe)
                         - (SELECT COUNT(*) FROM truth), 1) AS fpr_ppm
    """,
)
def bloom_prefilter_join(spark, sf_dir):
    """Explicit Bloom-filter join pruning: build a 8192-bit / 3-hash
    Bloom over urgent orders' keys, prefilter the lineitem key set, and
    report pass/true/false-positive counts plus the measured FPR (ppm).

    100 TB shape: the bit set is at most 8192 rows (here it is DISTINCT
    bit positions, i.e. the sparse representation of the bitmap) and is
    BROADCAST to the probe side — the big table never shuffles to learn
    which keys can't possibly join.  The all-k-bits test is a broadcast
    join + combinable HAVING COUNT(*) = k, not a per-key UDF.  This is
    the oracle-checkable twin of Spark's opaque runtime bloom filter."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    build = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    i_tab = spark.range(_BLOOM_K).select(F.col("id").alias("i"))
    bit_expr = F.expr(
        MD5_INT48_SPARK.format(x="concat(cast(i as string), ':', cast(k as string))")
    ) % _BLOOM_M
    bits = (
        build.crossJoin(F.broadcast(i_tab))
        .select(bit_expr.alias("bit"))
        .distinct()
    )
    probe = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    probe_bits = probe.crossJoin(F.broadcast(i_tab)).select(
        "k", bit_expr.alias("bit")
    )
    passed = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg(F.count("*").alias("nb"))
        .where(F.col("nb") == _BLOOM_K)
        .select("k")
    )
    truth = probe.join(build, "k", "left_semi")
    n_probe = probe.agg(F.count("*").alias("n_probe"))
    n_pass = passed.agg(F.count("*").alias("n_pass"))
    n_true = truth.agg(F.count("*").alias("n_true"))
    return (
        n_probe.crossJoin(n_pass)
        .crossJoin(n_true)
        .select(
            "n_probe",
            "n_pass",
            "n_true",
            (F.col("n_pass") - F.col("n_true")).alias("n_false_pos"),
            F.expr(
                "(n_pass - n_true) * 1000000"
                " div greatest(n_probe - n_true, 1)"
            ).alias("fpr_ppm"),
        )
    )


# --- HLL mergeability ---------------------------------------------------------
# The property that makes HLL the production cardinality sketch: register
# tables merge by elementwise MAX, so per-shard / per-source sketches
# union without rescanning data.  This query materializes the per-source
# sketches AND their merged union (tagged '__union__'), whose registers
# are provably identical to a direct whole-corpus sketch (max is
# associative/commutative) — asserted against the direct sketch in
# tests/test_sketches.py.


@register(
    "sketch_hll_union",
    sql=f"""
    WITH w AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{WORD_SPLIT}'),
               x -> x <> '')) AS w
      FROM documents
    ), h AS (
      SELECT source, {MD5_INT48_DUCK.format(x="w")} AS h FROM w
    ), reg AS (
      SELECT source, h & 63 AS idx,
             MAX(43 - length(ltrim(bin(h >> 6), '0'))) AS rho
      FROM h GROUP BY source, idx
    ), allreg AS (
      SELECT source, idx, rho FROM reg
      UNION ALL
      SELECT '__union__' AS source, idx, MAX(rho) AS rho
      FROM reg GROUP BY idx
    ), summary AS (
      SELECT source,
             CAST(64 - COUNT(*) AS BIGINT) AS v_zero,
             CAST(SUM(CAST(1 AS BIGINT) << (43 - rho)) AS BIGINT)
               + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 43) AS s_scaled
      FROM allreg GROUP BY source
    )
    SELECT source, v_zero, {_HLL_NUM} // s_scaled AS hll_est
    FROM summary
    ORDER BY source
    """,
)
def sketch_hll_union(spark, sf_dir):
    """Per-source HLL sketches plus their merged union ('__union__'):
    registers merge by elementwise MAX — the distributive property that
    lets shards sketch independently and a coordinator union them
    without a second scan.

    100 TB shape: per-source registers are a (source, idx) combinable
    max (64 rows per source); the union is a 64-row re-aggregation of
    the register TABLE, not of the data.  This is the sketch the
    per-crawl / per-dump dedup-rate dashboards aggregate over."""
    words = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(words_expr()).alias("w"))
    )
    h = F.expr(MD5_INT48_SPARK.format(x="w"))
    rho = F.lit(43) - F.length(
        F.regexp_replace(F.bin(F.shiftright(h, 6)), "^0+", "")
    )
    reg = (
        words.select("source", h.bitwiseAND(63).alias("idx"), rho.alias("rho"))
        .groupBy("source", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    merged = reg.groupBy("idx").agg(F.max("rho").alias("rho")).select(
        F.lit("__union__").alias("source"), "idx", "rho"
    )
    allreg = reg.unionByName(merged)
    return (
        allreg.groupBy("source")
        .agg(
            (F.lit(64) - F.count("*")).cast("long").alias("v_zero"),
            (
                F.sum(F.expr("shiftleft(cast(1 as bigint), 43 - rho)"))
                + (F.lit(64) - F.count("*")).cast("long")
                * F.lit(1 << 43).cast("long")
            ).alias("s_scaled"),
        )
        .select(
            "source",
            "v_zero",
            F.expr(f"{_HLL_NUM} div s_scaled").alias("hll_est"),
        )
        .orderBy("source")
    )


# --- KMV (k-minimum values) ----------------------------------------------------
# The order-statistics cardinality sketch (Bar-Yossef et al. 2002):
# keep the K smallest distinct hash values; if the Kth smallest of a
# uniform 48-bit hash is h_K, the distinct count is ≈ (K-1) * 2^48 /
# h_K.  Complements HLL: KMV supports set INTERSECTION estimates (keep
# the union's K smallest, count how many fall in both sketches), which
# registers can't, at the cost of K values instead of m 6-bit registers.
# Pure integer math -> exact cross-engine oracle.

_KMV_K = 32
_KMV_SALTS = 16  # level-1 salt fanout for the megagroup-safe top-k
_H48_SPAN = 1 << 48


@register(
    "sketch_kmv_distinct",
    sql=f"""
    WITH w AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{WORD_SPLIT}'),
               x -> x <> '')) AS w
      FROM documents
    ), h AS (
      SELECT DISTINCT lang, {MD5_INT48_DUCK.format(x="w")} AS h FROM w
    ), k1 AS (
      SELECT lang, h FROM h
      QUALIFY row_number() OVER (
        PARTITION BY lang, h % {_KMV_SALTS} ORDER BY h) <= {_KMV_K}
    ), k2 AS (
      SELECT lang, h FROM k1
      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h) <= {_KMV_K}
    ), sk AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(MAX(h) AS BIGINT) AS h_k
      FROM k2 GROUP BY lang
    ), exact AS (
      SELECT lang, CAST(COUNT(DISTINCT w) AS BIGINT) AS n_exact
      FROM w GROUP BY lang
    )
    SELECT s.lang, e.n_exact, s.n_kept, s.h_k,
           CASE WHEN s.n_kept < {_KMV_K} THEN s.n_kept
                ELSE {(_KMV_K - 1) * _H48_SPAN} // s.h_k END AS kmv_est
    FROM sk s JOIN exact e ON s.lang = e.lang
    ORDER BY s.lang
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    """Per-language distinct-word cardinality via a from-scratch KMV
    (k-minimum-values) sketch next to the exact distinct: the K smallest
    distinct 48-bit hashes per language; estimate (K-1) * 2^48 // h_K
    (exact count when fewer than K distincts exist).

    100 TB shape: the distinct is a combinable (lang, h) dedup; the
    top-K is the salted TWO-LEVEL row_number (level 1 partitions by
    (lang, h % 16) so no single window task ever sees a whole
    megalanguage; level 2 ranks the ≤ 16*K survivors) — the same
    megagroup-safe shape as the BM25/ANN top-k.  Unlike HLL the kept
    values support intersection estimates across sketches, which is why
    production dedup-rate dashboards carry both."""
    from pyspark.sql import Window as W

    words = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(words_expr()).alias("w"))
    )
    h = (
        words.select(
            "lang", F.expr(MD5_INT48_SPARK.format(x="w")).alias("h")
        )
        .distinct()
    )
    w1 = W.partitionBy("lang", F.expr(f"h % {_KMV_SALTS}")).orderBy("h")
    w2 = W.partitionBy("lang").orderBy("h")
    k2 = (
        h.withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= _KMV_K)
        .withColumn("rk2", F.row_number().over(w2))
        .where(F.col("rk2") <= _KMV_K)
    )
    sk = k2.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("h_k"),
    )
    exact = words.groupBy("lang").agg(
        F.countDistinct("w").alias("n_exact")
    )
    return (
        sk.join(exact, "lang")
        .select(
            "lang",
            "n_exact",
            "n_kept",
            "h_k",
            F.when(F.col("n_kept") < _KMV_K, F.col("n_kept"))
            .otherwise(
                F.expr(f"{(_KMV_K - 1) * _H48_SPAN} div h_k")
            )
            .alias("kmv_est"),
        )
        .orderBy("lang")
    )
