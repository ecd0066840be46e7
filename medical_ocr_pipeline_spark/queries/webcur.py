"""Web-corpus curation queries — the URL / model-score half of the
published training-data-pipeline rules (the text-rule half lives in
curation.py, the dedup half in dedup.py):

* ``url_canonicalize`` — URL canonicalization + canonical-URL exact
  dedup, the FIRST dedup pass of every web pipeline (CCNet §3.1, C4,
  RefinedWeb §3.2 run URL dedup before any content hashing): lowercase
  scheme/host, strip default ports and ``www.``, drop fragments and
  tracking parameters (``utm_*``/``fbclid``/``gclid``), sort the
  surviving query parameters, fold ``/index.html`` into its directory.
* ``host_cap_sample`` — per-host document cap (RefinedWeb-style domain
  balancing): keep the K hash-smallest documents of every host, exact,
  with a salted two-level rank so no single megahost ever concentrates
  on one reducer, and an under-cap bypass so the (overwhelmingly
  common) hosts with <= K docs never touch a sort at all.
* ``quality_classifier`` — hashed-feature linear model SERVING (the
  fastText-style quality filter of CCNet §3.3 / DCLM): token ->
  hashing-trick bucket -> broadcast weight-table join -> per-doc
  combinable sum.  The weight table here is hash-derived (deterministic
  stand-in for trained weights — this sandbox trains nothing), but the
  plan is exactly the production serving shape for ARBITRARY weights.
* ``ccnet_buckets`` — CCNet §3.3 head/middle/tail assignment: per-
  language score tertile cutoffs (tiny frame, broadcast back), then a
  shuffle-free per-row bucket tag.  Value-based (equal scores share a
  bucket), NOT ntile — rank-splitting ties is nondeterministic under
  re-partitioning and an ntile window partitioned by language is a
  5-partition sort at 100 TB.

The documents table has no URL column, so the URL queries derive a
deterministic messy URL per document from (source, lang, doc_id) —
identically in both engines — and canonicalize THAT; the
canonicalization core itself (`canonicalize_url_cols`) takes any URL
column and is unit-tested on adversarial real-world shapes.

Hash-match discipline (base.py): every score/threshold is exact BIGINT
(basis points, nonnegative before any integer division so Spark DIV ==
DuckDB //); the only float ops are single IEEE divisions / percentile
interpolations that are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_DUCK,
    MD5_INT48_SPARK,
    load,
    register,
)
from medical_ocr_pipeline_spark.queries.textstats import (
    _REP_WS_DUCK,
    _REP_WS_SPARK,
)

# ---------------------------------------------------------------------------
# deterministic messy-URL derivation (same string in both engines)

_RAW_URL_SPARK = (
    "concat('HTTPS://WWW.', source, '.Example.COM:443/', lang,"
    " '/article/', cast(doc_id % 5 as string),"
    " '/index.html?utm_source=feed&ref=', cast(doc_id % 3 as string),"
    " '&utm_campaign=x#sec', cast(doc_id % 7 as string))"
)
_RAW_URL_DUCK = (
    "'HTTPS://WWW.' || source || '.Example.COM:443/' || lang ||"
    " '/article/' || CAST(doc_id % 5 AS VARCHAR) ||"
    " '/index.html?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR)"
    " || '&utm_campaign=x#sec' || CAST(doc_id % 7 AS VARCHAR)"
)

# tracking parameters dropped by canonicalization (name match, with or
# without a value)
_TRACK_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"

# URL part extraction (identical regexes in both engines)
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def canonicalize_url_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``host`` and ``url_canon`` columns computed from
    ``url_col`` with pure Catalyst expressions (zero Python, zero
    shuffle — embarrassingly parallel at any scale).

    Canonicalization policy (the CCNet/C4 common denominator):
    scheme+host lowercased, ``www.`` prefix and default ports
    (https:443, http:80) stripped, fragment dropped, tracking params
    (``utm_*``, ``fbclid``, ``gclid``) removed, remaining query params
    sorted bytewise, trailing ``/index.html`` folded to ``/``, empty
    path normalized to ``/``.  A string with no ``scheme://`` prefix is
    passed through unchanged with ``host = ''`` (callers filter on it).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")),
        "^www\\.",
        "",
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    port_sfx = F.when(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "/index\\.html$", "/")
    )
    # Spark SQL string literals eat one backslash level, so the regex
    # embedded in the expr text needs its backslashes doubled
    _query_re_sql = _QUERY_RE.replace("\\", "\\\\")
    kept = F.array_join(
        F.array_sort(
            F.expr(
                f"filter(split(regexp_extract({url_col},"
                f" '{_query_re_sql}', 1),"
                f" '&'), p -> p != '' and p not rlike '{_TRACK_RE}')"
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_sfx,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    no_scheme = scheme == ""
    return df.withColumn(
        "host", F.when(no_scheme, F.lit("")).otherwise(host)
    ).withColumn("url_canon", F.when(no_scheme, u).otherwise(canon))


# the same canonicalization as one DuckDB SQL fragment over column u
def _canon_sql(u: str) -> str:
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    hostport = f"regexp_extract({u}, '{_HOSTPORT_RE}', 1)"
    host = (
        f"regexp_replace(lower(regexp_replace({hostport},"
        f" ':[0-9]+$', '')), '^www\\.', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port_sfx = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'https' AND {port} = '443')"
        f" OR ({scheme} = 'http' AND {port} = '80') THEN ''"
        f" ELSE ':' || {port} END"
    )
    path = (
        f"CASE WHEN regexp_extract({u}, '{_PATH_RE}', 1) = '' THEN '/'"
        f" ELSE regexp_replace(regexp_extract({u}, '{_PATH_RE}', 1),"
        f" '/index\\.html$', '/') END"
    )
    # COALESCE: DuckDB's array_to_string over an empty survivor list
    # yields NULL (not ''), which would NULL the whole || chain for any
    # URL with no query string or only tracking params
    kept = (
        f"COALESCE(array_to_string(list_sort(list_filter("
        f"string_split(regexp_extract({u}, '{_QUERY_RE}', 1), '&'),"
        f" p -> p != '' AND NOT regexp_matches(p, '{_TRACK_RE}'))), '&'),"
        f" '')"
    )
    return (
        f"{scheme} || '://' || {host} || {port_sfx} || {path} ||"
        f" CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END"
    )


@register(
    "url_canonicalize",
    sql=f"""
    WITH d AS (SELECT doc_id, {_RAW_URL_DUCK} AS url FROM documents),
    c AS (
      SELECT doc_id,
             regexp_replace(lower(regexp_replace(
               regexp_extract(url, '{_HOSTPORT_RE}', 1), ':[0-9]+$', '')),
               '^www\\.', '') AS host,
             {_canon_sql("url")} AS url_canon
      FROM d
    ),
    g AS (
      SELECT url_canon, CAST(COUNT(*) AS BIGINT) AS n_dups,
             MIN(doc_id) AS keep_id
      FROM c GROUP BY 1
    )
    SELECT c.doc_id, c.host, c.url_canon, g.n_dups,
           c.doc_id = g.keep_id AS keep
    FROM c JOIN g USING (url_canon) ORDER BY c.doc_id
    """,
)
def url_canonicalize(spark, sf_dir):
    """URL canonicalization + canonical-URL exact dedup — the first
    dedup pass of every web pipeline (CCNet §3.1 / C4 / RefinedWeb
    §3.2 dedup by URL before touching content).  Each document gets a
    deterministic messy URL (uppercase host, default port, tracking
    params, fragment, /index.html tail), the canonicalizer normalizes
    it, and documents sharing a canonical URL form a dup group that
    keeps its min-doc_id representative.

    Scale shape: canonicalization is pure per-row Catalyst regex (zero
    shuffle); the dup grouping is ONE combinable groupBy(url_canon)
    (count + min — map-side partial) plus an equi-join back, no row
    amplification.  A viral URL duplicated a million times is one
    hot-ish reduce key handled by AQE, never a pair blowup."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_RAW_URL_SPARK).alias("url")
    )
    c = canonicalize_url_cols(d).select("doc_id", "host", "url_canon")
    g = c.groupBy("url_canon").agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id")
    )
    return (
        c.join(g, "url_canon")
        .select(
            "doc_id",
            "host",
            "url_canon",
            "n_dups",
            (F.col("doc_id") == F.col("keep_id")).alias("keep"),
        )
        .orderBy("doc_id")
    )


HOST_CAP_K = 3  # keep at most K docs per host
_HOST_SALTS = 16  # salt fanout for the two-level megahost-safe rank

_DOC_H_SPARK = MD5_INT48_SPARK.format(x="cast(doc_id as string)")
_DOC_H_DUCK = MD5_INT48_DUCK.format(x="CAST(doc_id AS VARCHAR)")


@register(
    "host_cap_sample",
    sql=f"""
    WITH d AS (
      SELECT doc_id,
             regexp_replace(lower(regexp_replace(
               regexp_extract({_RAW_URL_DUCK}, '{_HOSTPORT_RE}', 1),
               ':[0-9]+$', '')), '^www\\.', '') AS host,
             {_DOC_H_DUCK} AS h
      FROM documents
    ),
    r AS (
      SELECT doc_id, host, h,
             CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n_host,
             row_number() OVER (PARTITION BY host ORDER BY h, doc_id)
               AS rk
      FROM d
    )
    SELECT doc_id, host, n_host, rk <= {HOST_CAP_K} AS kept
    FROM r ORDER BY doc_id
    """,
)
def host_cap_sample(spark, sf_dir):
    """Per-host document cap (RefinedWeb-style domain balancing): keep
    the HOST_CAP_K hash-smallest documents of every host — exact,
    deterministic (md5(doc_id) order, doc_id tiebreak), reproducible
    across runs and cluster sizes.

    Scale shape (the part the naive window gets wrong at 100 TB):

    1. combinable groupBy(host) count, broadcast back;
    2. hosts with n_host <= K are kept OUTRIGHT — no sort, no window.
       At web scale that is almost every host, so almost every row
       takes the shuffle-free path;
    3. only over-cap rows rank, and in TWO levels: row_number within
       (host, salt) keeps <= K per salt (bounds any single sort
       partition to ~n_megahost/{_HOST_SALTS}), then a second
       row_number within host over the <= K*{_HOST_SALTS} survivors
       picks the true K smallest.  Selecting the K smallest per salt
       then re-selecting globally is exact because the global K
       smallest are each the smallest <= K of their own salt.  A
       billion-page megahost never lands on one reducer."""
    from pyspark.sql import Window

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_RAW_URL_SPARK).alias("url"))
        .transform(canonicalize_url_cols)
        .select("doc_id", "host", F.expr(_DOC_H_SPARK).alias("h"))
    )
    # no broadcast hint: one row per distinct host is still ~10^8 rows
    # on the open web — AQE picks broadcast when it actually fits
    counts = d.groupBy("host").agg(F.count("*").alias("n_host"))
    d = d.join(counts, "host")
    under = d.filter(F.col("n_host") <= HOST_CAP_K).select(
        "doc_id", "host", "n_host", F.lit(True).alias("kept")
    )
    over = d.filter(F.col("n_host") > HOST_CAP_K).withColumn(
        "salt", F.col("h") % _HOST_SALTS
    )
    w1 = Window.partitionBy("host", "salt").orderBy("h", "doc_id")
    w2 = Window.partitionBy("host").orderBy("h", "doc_id")
    survivors = (
        over.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= HOST_CAP_K)
        .withColumn("rk", F.row_number().over(w2))
    )
    capped = over.select("doc_id", "host", "n_host").join(
        survivors.filter(F.col("rk") <= HOST_CAP_K).select(
            "doc_id", F.lit(True).alias("kept")
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "host",
        "n_host",
        F.coalesce(F.col("kept"), F.lit(False)).alias("kept"),
    )
    return under.unionByName(capped).orderBy("doc_id")


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier + CCNet buckets

N_BUCKETS = 4096  # hashing-trick feature space
# nonnegative weights in [0, 2000] basis points so every integer
# division below has a nonnegative numerator (Spark DIV truncates
# toward zero, DuckDB // floors — they agree only for nonnegatives)
_W_SPARK = (
    MD5_INT48_SPARK.format(x="concat('w', cast(id as string))") + " % 2001"
)
_W_DUCK = MD5_INT48_DUCK.format(x="'w' || CAST(i AS VARCHAR)") + " % 2001"
_TOK_BUCKET_SPARK = MD5_INT48_SPARK.format(x="tok") + f" % {N_BUCKETS}"
_TOK_BUCKET_DUCK = MD5_INT48_DUCK.format(x="tok") + f" % {N_BUCKETS}"
KEEP_MEAN_BP = 1000  # keep when mean token weight >= 1000 bp (midpoint)

_CLF_SQL = f"""
    WITH w AS (
      SELECT i AS bucket, {_W_DUCK} AS w_bp FROM range({N_BUCKETS}) t(i)
    ),
    d AS (SELECT doc_id, lang, {_REP_WS_DUCK} AS ws FROM documents),
    tok AS (
      SELECT doc_id, {_TOK_BUCKET_DUCK} AS bucket
      FROM (SELECT doc_id, unnest(ws) AS tok FROM d)
    ),
    s AS (
      SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w.w_bp) AS BIGINT) AS sum_w_bp
      FROM tok JOIN w USING (bucket) GROUP BY 1
    )
    SELECT d.doc_id, d.lang,
           COALESCE(s.n_tokens, 0) AS n_tokens,
           COALESCE(s.sum_w_bp, 0) AS sum_w_bp,
           CASE WHEN COALESCE(s.n_tokens, 0) > 0
                THEN (s.sum_w_bp * 10) // s.n_tokens ELSE 0 END
             AS score_mbp,
           COALESCE(s.n_tokens, 0) > 0
             AND s.sum_w_bp >= {KEEP_MEAN_BP} * s.n_tokens AS keep
    FROM d LEFT JOIN s USING (doc_id)
"""


def classifier_weights(spark):
    """The deterministic {N_BUCKETS}-bucket weight table (stand-in for
    trained weights; the serving plan below works for any table of this
    shape)."""
    return spark.range(N_BUCKETS).select(
        F.col("id").cast("long").alias("bucket"),
        F.expr(_W_SPARK).alias("w_bp"),
    )


def classifier_scores(raw_docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Hashed linear model serving: (doc_id, lang, text) + (bucket,
    w_bp) in, per-doc (n_tokens, sum_w_bp, score_mbp, keep) out.

    Plan: tokenize per-row -> explode -> hash to bucket -> BROADCAST
    join the weight table ({N_BUCKETS} rows — a real fastText-quality
    head is this small) -> combinable groupBy(doc_id) sum.  The
    exploded rows of one doc are colocated with their source row, so
    the partial agg collapses map-side and the shuffle carries ~one row
    per document, not one per token.  score_mbp is exact BIGINT
    milli-basis-points (numerator nonnegative by weight construction);
    keep compares integers cross-multiplied — no float anywhere."""
    d = raw_docs.select(
        "doc_id", "lang", F.expr(_REP_WS_SPARK).alias("ws")
    )
    tok = d.select(
        "doc_id", F.explode("ws").alias("tok")
    ).select("doc_id", F.expr(_TOK_BUCKET_SPARK).alias("bucket"))
    s = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w_bp").alias("sum_w_bp"),
        )
    )
    return d.select("doc_id", "lang").join(s, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
            "n_tokens"
        ),
        F.coalesce(F.col("sum_w_bp"), F.lit(0)).cast("long").alias(
            "sum_w_bp"
        ),
        F.expr(
            "CASE WHEN COALESCE(n_tokens, 0L) > 0 THEN"
            " (sum_w_bp * 10) DIV n_tokens ELSE 0L END"
        ).alias("score_mbp"),
        (
            (F.coalesce(F.col("n_tokens"), F.lit(0)) > 0)
            & (
                F.col("sum_w_bp")
                >= F.lit(KEEP_MEAN_BP) * F.col("n_tokens")
            )
        ).alias("keep"),
    )


@register("quality_classifier", sql=_CLF_SQL + " ORDER BY doc_id")
def quality_classifier(spark, sf_dir):
    """Model-based quality filter serving (CCNet §3.3 / DCLM fastText
    filter shape): hashing-trick features, broadcast weight table,
    per-doc combinable score, integer keep threshold.  See
    classifier_scores for the plan analysis."""
    return classifier_scores(
        load(spark, sf_dir, "documents"), classifier_weights(spark)
    ).orderBy("doc_id")


@register(
    "ccnet_buckets",
    sql=f"""
    WITH scored AS ({_CLF_SQL}),
    cuts AS (
      SELECT lang,
             quantile_cont(score_mbp, 1.0/3) AS p33,
             quantile_cont(score_mbp, 2.0/3) AS p66
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.score_mbp,
           CASE WHEN s.score_mbp <= c.p33 THEN 'tail'
                WHEN s.score_mbp <= c.p66 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scored s JOIN cuts c USING (lang) ORDER BY s.doc_id
    """,
)
def ccnet_buckets(spark, sf_dir):
    """CCNet §3.3 head/middle/tail split: per-language score tertile
    cutoffs, then a per-row bucket tag.  Value-based on the exact
    integer score — equal scores always share a bucket, unlike ntile,
    whose tie-splitting depends on sort nondeterminism AND whose
    per-language window is a 5-partition global sort at 100 TB.

    Scale shape: the cutoff frame is one row per language (exact
    `percentile` here for oracle equality; at 100 TB the documented
    dial is `percentile_approx` or a fixed-rate sample — CCNet itself
    computes cutoffs on a sample), broadcast back for a shuffle-free
    per-row CASE.  Interpolated cutoffs are bit-identical across
    engines (same IEEE ops over the same sorted integers — the
    discipline q_value_percentiles pins)."""
    # persist: scored feeds BOTH the cutoff aggregation and the join
    # probe side — without it the tokenize/explode/join/agg pipeline
    # (the expensive part) executes twice from the scan (same
    # no-unpersist session-cache policy as the dedup shingle index)
    scored = classifier_scores(
        load(spark, sf_dir, "documents"), classifier_weights(spark)
    ).persist()
    cuts = scored.groupBy("lang").agg(
        F.expr("percentile(score_mbp, 1D/3)").alias("p33"),
        F.expr("percentile(score_mbp, 2D/3)").alias("p66"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "score_mbp",
            F.when(F.col("score_mbp") <= F.col("p33"), F.lit("tail"))
            .when(F.col("score_mbp") <= F.col("p66"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --- host-graph PageRank ------------------------------------------------------


def _pagerank_oracle_sql(n_iters: int = 10) -> str:
    """Unrolled fixed-iteration PageRank as chained DuckDB CTEs — one
    (dangling, inflow, ranks) CTE triple per power iteration, the same
    dataflow the Spark operator runs.  Fully deterministic STRUCTURE;
    the only cross-engine freedom is double summation order inside the
    per-host inflow SUM, whose error (~1e-14 after 10 iterations) sits
    five orders of magnitude below the 8-decimal output rounding, so
    the hash compare is stable (see base.py's rounding-boundary note)."""
    # AS MATERIALIZED on EVERY CTE, the iteration triple included:
    # without it DuckDB inlines each CTE at every reference site —
    # r{i} is referenced twice (d{i+1} and inf{i+1}), so the chain
    # inlines EXPONENTIALLY (measured 2x per iteration: 1.8 s at 8
    # iterations, 30 s at 10) and the base CTEs additionally re-open
    # the parquet file per inlined scan (EMFILE).
    parts = [
        """
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    edges AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    verts AS MATERIALIZED (
      SELECT src AS vertex FROM edges UNION SELECT dst FROM edges
    ),
    nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
    outdeg AS MATERIALIZED (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ),
    r0 AS (SELECT vertex, 1.0 / nv.n AS rank FROM verts, nv)"""
    ]
    for i in range(1, n_iters + 1):
        parts.append(f""",
    d{i} AS MATERIALIZED (
      SELECT COALESCE(SUM(r.rank), 0.0) AS m
      FROM r{i - 1} r LEFT JOIN outdeg o ON r.vertex = o.src
      WHERE o.deg IS NULL
    ),
    inf{i} AS MATERIALIZED (
      SELECT e.dst AS vertex, SUM(r.rank / o.deg) AS inflow
      FROM edges e
      JOIN outdeg o ON e.src = o.src
      JOIN r{i - 1} r ON r.vertex = e.src
      GROUP BY e.dst
    ),
    r{i} AS MATERIALIZED (
      SELECT v.vertex,
             ((1.0 - 0.85) / nv.n + 0.85 * d{i}.m / nv.n)
               + 0.85 * COALESCE(inf{i}.inflow, 0.0) AS rank
      FROM verts v LEFT JOIN inf{i} ON v.vertex = inf{i}.vertex, nv, d{i}
    )""")
    parts.append(f"""
    SELECT vertex AS host, ROUND(rank, 8) AS rank
    FROM r{n_iters} ORDER BY rank DESC, host""")
    return "".join(parts)


@register("host_pagerank", sql=_pagerank_oracle_sql())
def host_pagerank(spark, sf_dir):
    """PageRank over a derived host citation graph (Common Crawl ships
    exactly this artifact as its host ranking; pipelines consume it as
    a quality prior).  The documents table has no link column, so the
    graph is derived deterministically: doc i cites doc (7i + 1) mod n,
    giving a host->host multigraph over the 20 sources.  Full DuckDB
    oracle: the 10 power iterations unroll into chained CTEs replicating
    the operator's exact dataflow (see _pagerank_oracle_sql); the
    operator's math is additionally pinned by closed-form and
    sequential-reference tests in tests/test_pagerank.py.  Ranks rounded
    to 8 decimals (half-grid 5e-9 vs ~1e-14 cross-engine summation
    noise, a ~5e5 margin) with a vertex-id tie-break for stable
    output."""
    from medical_ocr_pipeline_spark.operators.pagerank import pagerank

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    edges = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    return (
        pagerank(edges, n_iters=10)
        .select(
            F.col("vertex").alias("host"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("host"))
    )


# ---------------------------------------------------------------------------
# UT1-style URL/domain blocklist filter
#
# Every production web pipeline applies category blocklists (the
# Toulouse/UT1 lists in RefinedWeb §3.1, C4's badwords analogue) as a
# first-pass URL filter.  A blocklist rule is a DOMAIN SUFFIX:
# "example.com" blocks every host under it.  The scalable form is NOT a
# per-rule LIKE scan (rules x corpus work): explode each host into its
# domain-suffix chain (a.b.c -> [a.b.c, b.c, c]) and equi-join the
# broadcast rule table — fixed ~4-6x fanout per doc, one broadcast
# hash join, combinable verdict groupBy.

# deterministic stand-in blocklist (this sandbox ships no UT1 data):
# one parent-domain rule (blocks every language subdomain of src3),
# one exact leaf, one more parent — the suffix logic is exercised by
# the parent rules, the plan is the production shape for ANY rule set.
BLOCKLIST_RULES = (
    "src3.example.com",
    "src11.example.com",
    "zh.src7.example.com",
)


def blocklist_verdicts(hosts: DataFrame, rules) -> DataFrame:
    """Per-doc blocklist verdict over a (doc_id, host) frame: blocked=1
    iff ANY domain suffix of the host equals a rule; matched_rule is
    the lexicographically-smallest matching rule (deterministic when
    several match, '' when none).  The rule table is broadcast — UT1
    lists are a few MB, executor-resident at any corpus size."""
    spark = hosts.sparkSession
    bl = spark.createDataFrame([(r,) for r in rules], "rule string")
    sfx = hosts.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(host, '[.]'))), i ->"
                " array_join(slice(split(host, '[.]'), i,"
                " size(split(host, '[.]')) - i + 1), '.'))"
            )
        ).alias("sfx"),
    )
    m = (
        sfx.join(F.broadcast(bl), F.col("sfx") == F.col("rule"))
        .groupBy("doc_id")
        .agg(F.min("rule").alias("matched_rule"))
    )
    return (
        hosts.join(m, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            F.col("matched_rule")
            .isNotNull()
            .cast("long")
            .alias("blocked"),
            F.coalesce("matched_rule", F.lit("")).alias("matched_rule"),
        )
        .orderBy("doc_id")
    )


_BL_VALUES = ", ".join(f"('{r}')" for r in BLOCKLIST_RULES)


@register(
    "url_blocklist_filter",
    sql=f"""
    WITH d AS (
      SELECT doc_id, lang || '.' || source || '.example.com' AS host
      FROM documents
    ),
    p AS (
      SELECT doc_id, host, string_split(host, '.') AS parts FROM d
    ),
    sfx AS (
      SELECT doc_id,
             unnest([ array_to_string(parts[i:], '.')
                      FOR i IN range(1, len(parts) + 1) ]) AS sfx
      FROM p
    ),
    bl(rule) AS (VALUES {_BL_VALUES}),
    m AS (
      SELECT doc_id, MIN(rule) AS matched_rule
      FROM sfx JOIN bl ON sfx.sfx = bl.rule
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.host,
           CAST(CASE WHEN m.matched_rule IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS blocked,
           COALESCE(m.matched_rule, '') AS matched_rule
    FROM d LEFT JOIN m USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def url_blocklist_filter(spark, sf_dir):
    """Registry wrapper: hierarchical host per doc (language subdomain
    under the source domain, deterministic in both engines), verdicts
    via the suffix-chain blocklist core."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("concat(lang, '.', source, '.example.com')").alias("host"),
    )
    return blocklist_verdicts(d, BLOCKLIST_RULES)


# --- triangle counting / clustering coefficient -------------------------------


@register(
    "host_triangles",
    sql="""
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw
    ),
    deg AS MATERIALIZED (
      SELECT v, COUNT(*) AS deg FROM (
        SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
      ) GROUP BY v
    ),
    tri AS MATERIALIZED (
      SELECT e1.a, e1.b, e2.b AS c
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pv AS (
      SELECT v, COUNT(*) AS n_tri FROM (
        SELECT a AS v FROM tri UNION ALL SELECT b AS v FROM tri
        UNION ALL SELECT c AS v FROM tri
      ) GROUP BY v
    )
    SELECT d.v AS host, d.deg, COALESCE(p.n_tri, 0) AS n_tri,
           CASE WHEN d.deg >= 2
                THEN COALESCE(p.n_tri, 0) * 2000000 // (d.deg * (d.deg - 1))
                ELSE 0 END AS clust_ppm
    FROM deg d LEFT JOIN pv p ON d.v = p.v
    ORDER BY host
    """,
)
def host_triangles(spark, sf_dir):
    """Triangle count and local clustering coefficient per host over the
    same derived host graph as host_pagerank (doc i cites doc (7i+1)
    mod n; undirected, deduplicated).  clust_ppm = 2 * triangles /
    (deg * (deg - 1)) in exact-integer ppm.

    100 TB shape: the canonical a < b < c enumeration joins the
    undirected edge list with itself twice on equi-keys — each triangle
    is produced exactly once, no candidate is counted twice, and the
    join keys (the shared vertex) hash-distribute.  On a power-law web
    graph the standard refinement is degree-ordering (orient each edge
    from the lower- to the higher-degree endpoint) so the heavy vertex's
    adjacency never self-joins — noted here, unnecessary for a 20-host
    graph but the same plan shape."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    raw = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    pv = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.join(pv, "v", "left")
        .select(
            F.col("v").alias("host"),
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "coalesce(n_tri, 0) * 2000000"
                    " div (deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("clust_ppm"),
        )
        .orderBy("host")
    )


# --- BFS hop distance ---------------------------------------------------------

BFS_MAX_HOPS = 8


@register(
    "host_bfs_hops",
    sql=f"""
    WITH RECURSIVE
    docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw
    ),
    bidir AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM und
      UNION ALL SELECT b AS src, a AS dst FROM und
    ),
    seed AS (SELECT MIN(source) AS v FROM docs),
    bfs AS (
      SELECT v, 0 AS d FROM seed
      UNION
      SELECT e.dst AS v, b.d + 1 AS d
      FROM bfs b JOIN bidir e ON e.src = b.v
      WHERE b.d < {BFS_MAX_HOPS}
    ),
    dist AS (SELECT v, CAST(MIN(d) AS BIGINT) AS hops FROM bfs GROUP BY v)
    SELECT h.source AS host,
           COALESCE(d.hops, CAST(-1 AS BIGINT)) AS hops
    FROM (SELECT DISTINCT source FROM docs) h
    LEFT JOIN dist d ON d.v = h.source
    ORDER BY host
    """,
)
def host_bfs_hops(spark, sf_dir):
    """Hop distance from the lexicographically smallest host over the
    same derived undirected host graph as host_pagerank/host_triangles
    (doc i cites doc (7i+1) mod n).  Hosts unreachable within
    BFS_MAX_HOPS rounds report -1.  The shortest-path primitive of the
    graph family — crawl pipelines use hop-from-seed as a
    frontier-depth feature and link-spam heuristic.

    100 TB shape: each BFS round is one frontier-to-edges equi-join
    (shuffled on the src key) plus a combinable MIN groupBy — never a
    window, never a cartesian; lineage is truncated per round and the
    loop early-exits at the fixpoint (operators/bfs.py).  The DuckDB
    oracle replays it as a bounded recursive CTE — exact because BFS
    hop counts are final the round a vertex first appears."""
    from medical_ocr_pipeline_spark.operators.bfs import bfs_hops

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    raw = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    bidir = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seed = docs.agg(F.min("source").alias("vertex"))
    dist = bfs_hops(bidir, seed, max_hops=BFS_MAX_HOPS)
    hosts = docs.select("source").distinct()
    return (
        hosts.join(dist, hosts["source"] == dist["vertex"], "left")
        .select(
            F.col("source").alias("host"),
            F.coalesce("hops", F.lit(-1).cast("long")).alias("hops"),
        )
        .orderBy("host")
    )


# --- crawl snapshot diff ------------------------------------------------------
# Incremental-crawl bookkeeping: given two corpus snapshots keyed by a
# stable document key, classify every key as added / removed /
# modified / unchanged by content hash.  dedup_incremental answers
# "which NEW docs survive dedup against the old corpus"; this answers
# the upstream inventory question "what did the new crawl change".
# Snapshots are derived deterministically from the one documents table:
# A = doc_id < 400, B = doc_id >= 100, and B re-hashes every 10th doc
# with a version salt so the modified class is non-empty.

CRAWL_A_END = 400
CRAWL_B_START = 100
CRAWL_MOD_EVERY = 10


@register(
    "crawl_diff",
    sql=f"""
    WITH a AS (
      SELECT doc_id, source, md5(text) AS h
      FROM documents WHERE doc_id < {CRAWL_A_END}
    ), b AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {CRAWL_MOD_EVERY} = 0
                  THEN md5(text || ':v2') ELSE md5(text) END AS h
      FROM documents WHERE doc_id >= {CRAWL_B_START}
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           COALESCE(a.source, b.source) AS source,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h <> b.h THEN 'modified'
                ELSE 'unchanged' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ORDER BY doc_id
    """,
)
def crawl_diff(spark, sf_dir):
    """Snapshot diff between two derived crawl versions of the corpus:
    per document key, added / removed / modified (content hash
    changed) / unchanged.  The inventory pass an incremental pipeline
    runs before dedup_incremental decides what to keep.

    100 TB shape: ONE full-outer equi-join on the stable document key —
    keys are unique per side, so there is no row amplification and no
    skew; the content comparison is a per-row md5 inside codegen.  In a
    real lakehouse this is the MERGE-source computation, and on Iceberg
    the same classification falls out of a snapshot-to-snapshot changelog
    scan without touching unchanged files — this operator is the
    format-agnostic form."""
    docs = load(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") < CRAWL_A_END).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    b = docs.where(F.col("doc_id") >= CRAWL_B_START).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % CRAWL_MOD_EVERY == 0,
            F.md5(F.concat(F.col("text"), F.lit(":v2"))),
        )
        .otherwise(F.md5("text"))
        .alias("h"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    return (
        aa.join(bb, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
        .select(
            F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias(
                "doc_id"
            ),
            F.coalesce(F.col("a.source"), F.col("b.source")).alias(
                "source"
            ),
            F.when(F.col("a.doc_id").isNull(), F.lit("added"))
            .when(F.col("b.doc_id").isNull(), F.lit("removed"))
            .when(F.col("a.h") != F.col("b.h"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .orderBy("doc_id")
    )


# --- harmonic centrality --------------------------------------------------------


@register(
    "host_harmonic_centrality",
    sql=f"""
    WITH RECURSIVE
    docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw
    ),
    bidir AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM und
      UNION ALL SELECT b AS src, a AS dst FROM und
    ),
    hosts AS MATERIALIZED (SELECT DISTINCT source FROM docs),
    bfs AS (
      SELECT source AS seed, source AS v, 0 AS d FROM hosts
      UNION
      SELECT b.seed, e.dst AS v, b.d + 1 AS d
      FROM bfs b JOIN bidir e ON e.src = b.v
      WHERE b.d < {BFS_MAX_HOPS}
    ),
    dist AS (SELECT seed, v, MIN(d) AS d FROM bfs GROUP BY seed, v)
    SELECT seed AS host,
           CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reached,
           CAST(SUM(CASE WHEN d > 0 THEN 1000000 // d ELSE 0 END)
             AS BIGINT) AS harmonic_ppm
    FROM dist GROUP BY seed
    ORDER BY harmonic_ppm DESC, host
    """,
)
def host_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality per host — sum over reachable vertices of
    1/hops, in exact-integer ppm (1000000 // d) — over the derived
    undirected host graph.  THE ranking Common Crawl actually publishes
    for hosts (the pagerank docstring's companion artifact): robust on
    disconnected graphs because unreachable vertices contribute 0
    instead of breaking a closeness average.

    100 TB shape: all |V| searches advance together in ONE multi-source
    BFS state frame keyed (seed, vertex) — each round is one equi-join
    + one combinable MIN, one Spark job, regardless of seed count
    (operators/bfs.py::multi_source_bfs_hops); the centrality rollup is
    a combinable per-seed sum.  Run on the contracted host graph, state
    is O(host pairs within the hop radius); on a page graph you sample
    seeds instead."""
    from medical_ocr_pipeline_spark.operators.bfs import (
        multi_source_bfs_hops,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    raw = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    bidir = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    hosts = docs.select("source").distinct()
    dist = multi_source_bfs_hops(bidir, hosts, max_hops=BFS_MAX_HOPS)
    return (
        dist.groupBy("seed")
        .agg(
            F.sum(F.when(F.col("hops") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_reached"),
            F.sum(
                F.when(
                    F.col("hops") > 0,
                    F.expr("1000000 div hops"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("harmonic_ppm"),
        )
        .select(
            F.col("seed").alias("host"), "n_reached", "harmonic_ppm"
        )
        .orderBy(F.desc("harmonic_ppm"), "host")
    )


# --- HITS hubs & authorities ---------------------------------------------------


def _hits_oracle_sql(n_iters: int = 8) -> str:
    """Unrolled fixed-iteration HITS as chained DuckDB CTEs — one
    (a_raw, a_norm, a, h_raw, h_norm, h) sextuple per iteration, the
    exact dataflow operators/hits.py runs.  AS MATERIALIZED everywhere
    for the same exponential-inlining reason as _pagerank_oracle_sql."""
    parts = [
        """
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    edges AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    verts AS MATERIALIZED (
      SELECT src AS vertex FROM edges UNION SELECT dst FROM edges
    ),
    nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
    h0 AS (SELECT vertex, 1.0 / nv.n AS hub FROM verts, nv)"""
    ]
    for i in range(1, n_iters + 1):
        parts.append(f""",
    ar{i} AS MATERIALIZED (
      SELECT v.vertex, COALESCE(s.s, 0.0) AS s
      FROM verts v LEFT JOIN (
        SELECT e.dst AS vertex, SUM(h.hub) AS s
        FROM edges e JOIN h{i - 1} h ON h.vertex = e.src
        GROUP BY e.dst
      ) s ON v.vertex = s.vertex
    ),
    an{i} AS MATERIALIZED (SELECT SUM(s) AS norm FROM ar{i}),
    a{i} AS MATERIALIZED (
      SELECT vertex, s / an{i}.norm AS auth FROM ar{i}, an{i}
    ),
    hr{i} AS MATERIALIZED (
      SELECT v.vertex, COALESCE(s.s, 0.0) AS s
      FROM verts v LEFT JOIN (
        SELECT e.src AS vertex, SUM(a.auth) AS s
        FROM edges e JOIN a{i} a ON a.vertex = e.dst
        GROUP BY e.src
      ) s ON v.vertex = s.vertex
    ),
    hn{i} AS MATERIALIZED (SELECT SUM(s) AS norm FROM hr{i}),
    h{i} AS MATERIALIZED (
      SELECT vertex, s / hn{i}.norm AS hub FROM hr{i}, hn{i}
    )""")
    parts.append(f"""
    SELECT a.vertex AS host, ROUND(a.auth, 8) AS auth,
           ROUND(h.hub, 8) AS hub
    FROM a{n_iters} a JOIN h{n_iters} h ON a.vertex = h.vertex
    ORDER BY auth DESC, host""")
    return "".join(parts)


@register("host_hits", sql=_hits_oracle_sql())
def host_hits(spark, sf_dir):
    """HITS hubs & authorities over the derived DIRECTED host citation
    graph (doc i cites doc (7i+1) mod n) — the second classic
    link-analysis prior next to host_pagerank: authority separates
    content hosts from the link directories that point at them, which
    a single PageRank eigenvector conflates.  Full unrolled-CTE DuckDB
    oracle replaying the operator's per-iteration dataflow; the math is
    additionally pinned by closed-form and sequential-reference tests
    in tests/test_hits.py.  Scores rounded to 8 decimals (same
    cross-engine double-summation margin argument as host_pagerank)
    with a host tie-break."""
    from medical_ocr_pipeline_spark.operators.hits import hits

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    edges = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    return (
        hits(edges, n_iters=8)
        .select(
            F.col("vertex").alias("host"),
            F.round("auth", 8).alias("auth"),
            F.round("hub", 8).alias("hub"),
        )
        .orderBy(F.desc("auth"), F.asc("host"))
    )


# ---------------------------------------------------------------------------
# Label propagation communities over the host graph
#
# The clustering counterpart of host_pagerank/host_hits: mirror-farm /
# site-family detection groups hosts BEFORE host-level dedup and
# sampling, and synchronous LPA with a total tie-break is the cheap
# deterministic way to do it (operators/lpa.py).  Full oracle: the
# rounds unroll into chained CTEs replaying the operator's exact
# dataflow — the per-round argmax is integer-weighted with a min-label
# tie-break, so the chain is bit-exact cross-engine (no doubles
# anywhere, unlike the pagerank/hits oracles).


def _lpa_oracle_sql(n_iters: int = 5) -> str:
    """Unrolled synchronous LPA as chained DuckDB CTEs — one
    (support, argmax) pair per round over the undirected weighted edge
    list.  AS MATERIALIZED everywhere for the same exponential-inlining
    reason as _pagerank_oracle_sql (l{i} is referenced once, but the
    base CTEs would still re-scan parquet per inline)."""
    parts = [
        """
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE b.doc_id = (a.doc_id * 7 + 1) % nct.n AND a.source <> b.source
    ),
    uedges AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT src, dst FROM raw
        UNION ALL
        SELECT dst AS src, src AS dst FROM raw
      ) GROUP BY src, dst
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS vertex, src AS label FROM uedges
    )"""
    ]
    for i in range(1, n_iters + 1):
        parts.append(f""",
    l{i} AS MATERIALIZED (
      SELECT vertex, label FROM (
        SELECT e.dst AS vertex, l.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.dst
                 ORDER BY SUM(e.w) DESC, l.label) AS rk
        FROM uedges e JOIN l{i - 1} l ON l.vertex = e.src
        GROUP BY e.dst, l.label
      ) WHERE rk = 1
    )""")
    parts.append(f"""
    SELECT vertex AS host, label AS community
    FROM l{n_iters} ORDER BY host""")
    return "".join(parts)


@register("host_lpa", sql=_lpa_oracle_sql())
def host_lpa(spark, sf_dir):
    """Synchronous label-propagation communities over the derived host
    citation graph (doc i cites doc (7i+1) mod n, undirected with edge
    multiplicity as weight) — 5 rounds, greatest-support argmax with a
    min-label tie-break.  Unlike the pagerank/hits oracles this chain
    is INTEGER-exact end to end (BIGINT weights, string labels): the
    unrolled-CTE oracle replays the operator's dataflow bit-for-bit.
    Operator semantics additionally pinned by fixture tests in
    tests/test_lpa.py (two planted cliques + a bridge; partition-count
    invariance)."""
    from medical_ocr_pipeline_spark.operators.lpa import label_propagation

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    edges = (
        a.join(b, F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    return (
        label_propagation(edges, n_iters=5)
        .select(F.col("vertex").alias("host"), F.col("label").alias("community"))
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Host-neighborhood Jaccard similarity (structural near-duplicate hosts)
#
# Two mirror hosts cite (and are cited by) the SAME set of hosts even
# when their names share nothing — neighborhood Jaccard is the
# structural-similarity signal that catches them, the graph-side
# complement of content MinHash.  Exact rational in the degree counts:
# jacc(u, v) = |N(u) & N(v)| / (deg(u) + deg(v) - |N(u) & N(v)|).


@register(
    "host_neighbor_jaccard",
    sql="""
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE (b.doc_id = (a.doc_id * 7 + 1) % nct.n
             OR b.doc_id = (a.doc_id * 13 + 5) % nct.n)
        AND a.source <> b.source
    ),
    adj AS MATERIALIZED (
      SELECT DISTINCT src AS v, dst AS w FROM (
        SELECT src, dst FROM raw
        UNION ALL
        SELECT dst AS src, src AS dst FROM raw
      )
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    common AS (
      SELECT a.v AS u, b.v AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM adj a JOIN adj b ON a.w = b.w AND a.v < b.v
      GROUP BY a.v, b.v
    )
    SELECT common.u, common.v, common.c AS n_common,
           du.d + dv.d - common.c AS n_union,
           CAST(common.c * 1000000 // (du.d + dv.d - common.c)
             AS BIGINT) AS jaccard_ppm
    FROM common
    JOIN deg du ON du.v = common.u
    JOIN deg dv ON dv.v = common.v
    ORDER BY jaccard_ppm DESC, common.u, common.v
    """,
)
def host_neighbor_jaccard(spark, sf_dir):
    """Pairwise neighborhood Jaccard over a derived undirected host
    graph — the structural mirror-host signal (two hosts embedded in
    the same citation neighborhood) complementing content-hash dedup.
    This query derives a RICHER graph than host_pagerank's single
    citation rule (two rules: 7i+1 and 13i+5 mod n): the single-rule
    graph is a near-permutation whose neighborhoods are degenerate
    (every common-neighbor pair is identical), which would make the
    similarity vacuous.
    Exact integer-division ppm; pairs enumerated through the shared-
    neighbor equi-join (u < v dedup), so a pair with zero common
    neighbors is never materialized.

    100 TB shape: the join is on the neighbor key — each neighbor w
    contributes deg(w)^2/2 pairs, so hub hosts dominate cost exactly
    like the shingle self-join in dedup_ngram_jaccard, and the same
    controls apply (degree cap on hubs = freq_cap; AQE skew split).
    On the host graph (|hosts| ~ 10^5-10^6 in a real crawl, degrees
    power-law) this is the standard SimRank-lite first pass."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    raw = (
        a.join(
            b,
            (F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
            | (F.col("b.doc_id") == (F.col("a.doc_id") * 13 + 5) % n),
        )
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
    )
    adj = (
        raw.select("src", "dst")
        .union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .persist()
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("d"))
    aa = adj.alias("aa")
    bb = adj.alias("bb")
    common = (
        aa.join(
            bb,
            (F.col("aa.w") == F.col("bb.w"))
            & (F.col("aa.v") < F.col("bb.v")),
        )
        .groupBy(F.col("aa.v").alias("u"), F.col("bb.v").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dv = deg.select("v", F.col("d").alias("dv"))
    return (
        common.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("c").alias("n_common"),
            (F.col("du") + F.col("dv") - F.col("c"))
            .cast("long")
            .alias("n_union"),
            F.expr("c * 1000000 div (du + dv - c)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "u", "v")
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the host graph
#
# Newman's r: the Pearson correlation of (deg(src), deg(dst)) over the
# directed edge list — do hubs cite hubs (r > 0, mirror farms /
# link rings) or leaves (r < 0, hub-and-spoke)?  Pure moment algebra
# over the edge list (the ols_chars_vs_words discipline): five BIGINT
# sums, one double sqrt on identical operands, floor-ppm.


@register(
    "host_assortativity",
    sql="""
    WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
    nct AS (SELECT COUNT(*) AS n FROM docs),
    raw AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst
      FROM docs a, nct, docs b
      WHERE (b.doc_id = (a.doc_id * 7 + 1) % nct.n
             OR b.doc_id = (a.doc_id * 13 + 5) % nct.n)
        AND a.source <> b.source
    ),
    edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),
    outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
             FROM edges GROUP BY src),
    ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY dst),
    j AS (
      SELECT outd.d AS x, ind.d AS y
      FROM edges JOIN outd ON outd.src = edges.src
      JOIN ind ON ind.dst = edges.dst
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM j
    )
    SELECT n AS n_edges, sx AS sum_outdeg, sy AS sum_indeg,
           CAST(FLOOR((n * sxy - sx * sy) * 1000000.0
                / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)))
             AS BIGINT) AS assortativity_ppm
    FROM s
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def host_assortativity(spark, sf_dir):
    """Directed degree assortativity (Newman 2002) of the two-rule
    derived host graph: Pearson r of (out-degree(src), in-degree(dst))
    over the distinct edge list, exact floor-ppm via five combinable
    BIGINT moment sums and one identical-operand double sqrt — the
    ols_chars_vs_words pattern on graph structure.  Positive reads
    hub-cites-hub (link rings); negative reads hub-and-spoke.

    100 TB shape: two combinable degree counts, one edge-keyed join
    back (src then dst — broadcastable: the degree tables are one row
    per HOST, not per edge), one combinable global moment aggregate."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    a = docs.alias("a")
    b = docs.alias("b")
    edges = (
        a.join(
            b,
            (F.col("b.doc_id") == (F.col("a.doc_id") * 7 + 1) % n)
            | (F.col("b.doc_id") == (F.col("a.doc_id") * 13 + 5) % n),
        )
        .where(F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
        .distinct()
        .persist()
    )
    outd = edges.groupBy("src").agg(F.count("*").alias("xd"))
    ind = edges.groupBy("dst").agg(F.count("*").alias("yd"))
    j = (
        edges.join(F.broadcast(outd), "src")
        .join(F.broadcast(ind), "dst")
        .select(F.col("xd").alias("x"), F.col("yd").alias("y"))
    )
    s = j.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.where((vx > 0) & (vy > 0))
        .select(
            F.col("n").alias("n_edges"),
            F.col("sx").alias("sum_outdeg"),
            F.col("sy").alias("sum_indeg"),
            F.floor(
                cov * 1000000.0
                / F.sqrt(vx.cast("double") * vy.cast("double"))
            )
            .cast("long")
            .alias("assortativity_ppm"),
        )
    )


# --- k-core decomposition -----------------------------------------------------
# The density-based curation selector: the k-core is the maximal
# subgraph where every host keeps >= k neighbours — interconnected
# content hubs survive, peripheral link chaff peels away.  The graph
# here is a hash-random host graph (both endpoints are salted md5
# buckets of doc_id, vertex count scaled with corpus size) rather than
# the modular citation graph of pagerank/LPA: the modular rules give
# every vertex near-identical degree, which makes peeling all-or-
# nothing; a degree-varying graph exercises the actual cascade.

KCORE_K = 10
KCORE_ROUNDS = 16
_KC_DIV = 8
_KCA_SPARK = MD5_INT48_SPARK.format(x="concat('kca', cast(doc_id as string))")
_KCB_SPARK = MD5_INT48_SPARK.format(x="concat('kcb', cast(doc_id as string))")
_KCA_DUCK = MD5_INT48_DUCK.format(x="'kca' || CAST(doc_id AS VARCHAR)")
_KCB_DUCK = MD5_INT48_DUCK.format(x="'kcb' || CAST(doc_id AS VARCHAR)")


def _kcore_oracle_sql(k: int = KCORE_K, n_rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled synchronous peeling as chained DuckDB CTEs — per round
    one degree HAVING filter plus an adjacency re-join on both
    endpoints.  Exact because synchronous peeling is a pure function of
    the graph and extra rounds past the fixpoint are no-ops (the
    operator early-exits there; see operators/kcore.py)."""
    parts = [f"""
    WITH nct AS (
      SELECT GREATEST(COUNT(*) // {_KC_DIV}, 10) AS v FROM documents
    ),
    raw AS MATERIALIZED (
      SELECT 'h' || ({_KCA_DUCK} % nct.v) AS src,
             'h' || ({_KCB_DUCK} % nct.v) AS dst
      FROM documents, nct
      WHERE ({_KCA_DUCK} % nct.v) <> ({_KCB_DUCK} % nct.v)
    ),
    adj0 AS MATERIALIZED (
      SELECT DISTINCT src AS v, dst AS w FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
      )
    )"""]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
    keep{i} AS MATERIALIZED (
      SELECT v FROM adj{i - 1} GROUP BY v HAVING COUNT(*) >= {k}
    ),
    adj{i} AS MATERIALIZED (
      SELECT a.v, a.w FROM adj{i - 1} a
      JOIN keep{i} kv ON kv.v = a.v
      JOIN keep{i} kw ON kw.v = a.w
    )""")
    parts.append(f"""
    SELECT v AS host, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM adj{n_rounds} GROUP BY v ORDER BY host""")
    return "".join(parts)


@register("host_kcore", sql=_kcore_oracle_sql())
def host_kcore(spark, sf_dir):
    """KCORE_K-core of the hash-random host graph: hosts surviving
    synchronous peeling (every round drops ALL hosts with fewer than
    KCORE_K surviving neighbours) plus their degree inside the core.
    Deterministic: both edge endpoints are salted md5 buckets, peeling
    is a pure function of the graph, and the fixpoint is reached well
    inside KCORE_ROUNDS at every SF (the round-(R-1) == round-R
    equality is what the unrolled oracle's no-op tail verifies).

    100 TB shape: each round is one combinable degree groupBy plus two
    LEFT SEMI joins of the adjacency list against the tiny survivor
    set — no windows, no pair materialization, per-round lineage
    truncation (operators/kcore.py).  Real crawl graphs reach their
    k-core fixpoint in a few dozen rounds; each round's cost SHRINKS
    with the edge list, the opposite of an iteration blowup."""
    from medical_ocr_pipeline_spark.operators.kcore import kcore

    docs = load(spark, sf_dir, "documents")
    nv = max(docs.count() // _KC_DIV, 10)
    edges = docs.select(
        F.concat(F.lit("h"), (F.expr(_KCA_SPARK) % nv).cast("string"))
        .alias("src"),
        F.concat(F.lit("h"), (F.expr(_KCB_SPARK) % nv).cast("string"))
        .alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return (
        kcore(edges, k=KCORE_K, max_rounds=KCORE_ROUNDS)
        .select(F.col("vertex").alias("host"), "core_deg")
        .orderBy("host")
    )


# --- per-language quality percentile normalization ---------------------------
# ccnet_buckets cuts the score distribution into three named buckets;
# downstream samplers (and any cross-language comparison) want the
# CONTINUOUS rank transform: each doc's quality score mapped to its
# within-language percentile, so "keep the top 30% of each language"
# is a single integer predicate and a score of 510 mbp means the same
# thing in a high-scoring language as in a low-scoring one.  Exact:
# pct_ppm = (rk - 1) * 1e6 // max(n - 1, 1) over the total
# (score, doc_id) order — no quantile interpolation, no floats.


def quality_percentiles_frame(scored):
    """Frame-level core: scored(doc_id, lang, score_mbp) -> within-
    language percentile rank (rk, n_lang, pct_ppm) via the TWO-PHASE
    range-partitioned rank (stats._ranked_by_lang — rank locally per
    contiguous range slice, broadcast per-(slice, lang) prefix counts),
    never Window.partitionBy(lang): one language can be 40% of a
    100 TB corpus and a per-language window would sort all of it in a
    handful of tasks (VERDICT r04 item #2 — the exact ntile
    anti-pattern ccnet_buckets documents).  The rank is a pure function
    of the total (score_mbp, doc_id) order, so the output is
    bit-identical to the window form at every partition count
    (invariance + plan tests); n_lang is one combinable groupBy
    broadcast back."""
    from medical_ocr_pipeline_spark.queries.stats import _ranked_by_lang

    d = scored.select("doc_id", "lang", F.col("score_mbp").alias("x"))
    ranked = _ranked_by_lang(d)
    nl = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_lang"))
    return (
        ranked.join(F.broadcast(nl), "lang")
        .select(
            "doc_id",
            "lang",
            F.col("x").alias("score_mbp"),
            # _ranked_by_lang's i is already BIGINT, so the *1e6 cannot
            # overflow 32-bit under ANSI (the old window form had to
            # cast row_number's IntegerType first)
            F.col("i").alias("rk"),
            "n_lang",
            F.expr("(i - 1) * 1000000 div greatest(n_lang - 1, 1)")
            .cast("long")
            .alias("pct_ppm"),
        )
    )


@register(
    "quality_percentiles",
    sql=f"""
    WITH scored AS ({_CLF_SQL}),
    r AS (
      SELECT doc_id, lang, score_mbp,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY score_mbp, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT doc_id, lang, score_mbp, CAST(rk AS BIGINT) AS rk,
           CAST(n AS BIGINT) AS n_lang,
           CAST((CAST(rk AS BIGINT) - 1) * 1000000
                // GREATEST(n - 1, 1) AS BIGINT) AS pct_ppm
    FROM r ORDER BY doc_id
    """,
)
def quality_percentiles(spark, sf_dir):
    """Within-language percentile rank of the quality-classifier score
    (rank transform in floor-ppm, (score, doc_id)-tie-broken) — the
    continuous companion of ccnet_buckets' tertiles: language-balanced
    quality filtering is then `pct_ppm >= 700000` with no per-language
    threshold table.

    100 TB shape: classifier serving is the broadcast-join combinable
    plan of classifier_scores; the rank is the two-phase
    range-partitioned form (quality_percentiles_frame) — the
    per-language window exists only in the DuckDB oracle SQL, where it
    is the clearest exact specification of the same total order."""
    scored = classifier_scores(
        load(spark, sf_dir, "documents"), classifier_weights(spark)
    ).select("doc_id", "lang", "score_mbp")
    return quality_percentiles_frame(scored).orderBy("doc_id")
