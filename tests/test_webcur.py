"""Web-corpus curation family (queries/webcur.py): URL
canonicalization on adversarial shapes, the exactness of the salted
two-level per-host cap, classifier keep semantics, and bucket
assignment invariants."""

import pytest
from pyspark.sql import Row, functions as F

from medical_ocr_pipeline_spark.queries.webcur import (
    HOST_CAP_K,
    KEEP_MEAN_BP,
    canonicalize_url_cols,
    ccnet_buckets,
    classifier_scores,
    classifier_weights,
    host_cap_sample,
    url_canonicalize,
)
from tests.conftest import SF_DIR


# -------------------------------------------------------------- canonicalize

CASES = [
    # tracking params dropped, survivors sorted, fragment dropped,
    # www + default port stripped, host lowercased, path case KEPT
    (
        "HTTPS://WWW.Ex.COM:443/A/b?z=1&utm_source=x&a=2#frag",
        "ex.com",
        "https://ex.com/A/b?a=2&z=1",
    ),
    # http default port stripped; non-default port kept
    ("http://ex.com:80/p", "ex.com", "http://ex.com/p"),
    ("http://ex.com:8080/p", "ex.com", "http://ex.com:8080/p"),
    # index.html folds into its directory; bare host gets /
    ("https://ex.com/dir/index.html", "ex.com", "https://ex.com/dir/"),
    ("https://ex.com", "ex.com", "https://ex.com/"),
    # valueless tracking param and fbclid/gclid dropped; empty query
    # leaves no '?'
    (
        "https://ex.com/p?utm_campaign&fbclid=abc&gclid=1",
        "ex.com",
        "https://ex.com/p",
    ),
    # utm-ish but not utm_*: kept (utmx is not utm_<x>)
    ("https://ex.com/p?utmx=1", "ex.com", "https://ex.com/p?utmx=1"),
    # index.html only folds as a FILENAME, not mid-path
    (
        "https://ex.com/index.html/sub",
        "ex.com",
        "https://ex.com/index.html/sub",
    ),
    # no scheme: passed through unchanged, host empty
    ("not a url at all", "", "not a url at all"),
    ("", "", ""),
]


def test_canonicalize_adversarial(spark):
    df = spark.createDataFrame(
        [Row(i=i, url=u) for i, (u, _, _) in enumerate(CASES)]
    )
    got = {
        r["i"]: (r["host"], r["url_canon"])
        for r in canonicalize_url_cols(df).collect()
    }
    for i, (u, host, canon) in enumerate(CASES):
        assert got[i] == (host, canon), f"case {i}: {u!r} -> {got[i]}"


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame(
        [Row(url=u) for u, _, _ in CASES]
    )
    once = canonicalize_url_cols(df).select(
        F.col("url_canon").alias("url")
    )
    twice = canonicalize_url_cols(once)
    bad = twice.filter(F.col("url_canon") != F.col("url")).collect()
    assert bad == [], bad


def test_url_canonicalize_keeps_one_per_group(spark):
    out = url_canonicalize(spark, SF_DIR).collect()
    by_canon = {}
    for r in out:
        by_canon.setdefault(r["url_canon"], []).append(r)
    assert any(len(v) > 1 for v in by_canon.values()), (
        "derivation should produce at least one dup group"
    )
    for rows in by_canon.values():
        keepers = [r for r in rows if r["keep"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == min(r["doc_id"] for r in rows)
        assert all(r["n_dups"] == len(rows) for r in rows)


# ---------------------------------------------------------------- host cap


def test_host_cap_exactness_vs_single_level(spark):
    """The salted two-level rank must select exactly the K
    hash-smallest docs per host — compare against a plain reference
    rank computed driver-side."""
    from medical_ocr_pipeline_spark.queries.base import MD5_INT48_SPARK

    out = host_cap_sample(spark, SF_DIR).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.expr(
                MD5_INT48_SPARK.format(x="cast(doc_id as string)")
            ).alias("h"),
        )
        .collect()
    )
    h_of = {r["doc_id"]: r["h"] for r in docs}
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert any(len(v) > HOST_CAP_K for v in by_host.values()), (
        "testdata should have at least one over-cap host"
    )
    for host, rows in by_host.items():
        expect_kept = {
            r["doc_id"]
            for r in sorted(
                rows, key=lambda r: (h_of[r["doc_id"]], r["doc_id"])
            )[:HOST_CAP_K]
        }
        got_kept = {r["doc_id"] for r in rows if r["kept"]}
        assert got_kept == expect_kept, host
        assert all(r["n_host"] == len(rows) for r in rows)


# --------------------------------------------------------------- classifier


def test_classifier_scores_handcrafted(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="aa bb aa"),
            Row(doc_id=2, lang="en", text="   "),  # zero tokens
            Row(doc_id=3, lang="en", text="cc"),
        ]
    )
    # weight table where every bucket weighs 2000 except token cc's
    w = classifier_weights(spark).withColumn("w_bp", F.lit(2000))
    from medical_ocr_pipeline_spark.queries.webcur import (
        _TOK_BUCKET_SPARK,
    )
    cc_bucket = (
        spark.createDataFrame([Row(tok="cc")])
        .select(F.expr(_TOK_BUCKET_SPARK).alias("b"))
        .collect()[0]["b"]
    )
    w = w.withColumn(
        "w_bp",
        F.when(F.col("bucket") == cc_bucket, F.lit(0)).otherwise(
            F.col("w_bp")
        ),
    )
    got = {
        r["doc_id"]: r
        for r in classifier_scores(docs, w).collect()
    }
    assert got[1]["n_tokens"] == 3 and got[1]["sum_w_bp"] == 6000
    assert got[1]["keep"] is True  # mean 2000 >= KEEP_MEAN_BP
    assert got[2]["n_tokens"] == 0 and got[2]["sum_w_bp"] == 0
    assert got[2]["keep"] is False  # zero-token doc never kept
    assert got[2]["score_mbp"] == 0
    # doc 3 is one cc token at weight 0 < KEEP_MEAN_BP
    assert got[3]["keep"] is False and got[3]["score_mbp"] == 0


def test_classifier_keep_matches_threshold(spark):
    out = classifier_scores(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        classifier_weights(spark),
    ).collect()
    assert any(r["keep"] for r in out) and any(
        not r["keep"] for r in out
    ), "threshold should split the corpus"
    for r in out:
        want = (
            r["n_tokens"] > 0
            and r["sum_w_bp"] >= KEEP_MEAN_BP * r["n_tokens"]
        )
        assert r["keep"] == want


# ------------------------------------------------------------------ buckets


def test_ccnet_buckets_invariants(spark):
    out = ccnet_buckets(spark, SF_DIR).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        buckets = {r["bucket"] for r in rows}
        assert buckets <= {"head", "middle", "tail"}
        if len(rows) >= 10:
            assert buckets == {"head", "middle", "tail"}, lang
        # value-based: equal scores share a bucket
        score_to_bucket = {}
        for r in rows:
            prev = score_to_bucket.setdefault(r["score_mbp"], r["bucket"])
            assert prev == r["bucket"]
        # monotone: head scores > middle scores > tail scores
        lo = {b: min(r["score_mbp"] for r in rows if r["bucket"] == b)
              for b in buckets}
        hi = {b: max(r["score_mbp"] for r in rows if r["bucket"] == b)
              for b in buckets}
        if "tail" in buckets and "middle" in buckets:
            assert hi["tail"] <= lo["middle"]
        if "middle" in buckets and "head" in buckets:
            assert hi["middle"] <= lo["head"]


def test_host_cap_underflow_bypass_all_kept(spark):
    """A corpus where every host is under cap keeps everything (the
    bypass path) — and the plan for that frame contains no Window."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i}", lang="en") for i in range(6)]
    )
    from medical_ocr_pipeline_spark.queries.webcur import (
        _DOC_H_SPARK,
        _RAW_URL_SPARK,
    )
    d = (
        docs.select("doc_id", F.expr(_RAW_URL_SPARK).alias("url"))
        .transform(canonicalize_url_cols)
        .select("doc_id", "host", F.expr(_DOC_H_SPARK).alias("h"))
    )
    counts = d.groupBy("host").agg(F.count("*").alias("n_host"))
    under = d.join(counts, "host").filter(
        F.col("n_host") <= HOST_CAP_K
    )
    assert under.count() == 6
    assert "Window" not in under._jdf.queryExecution().executedPlan().toString()


def test_canon_sql_matches_spark_on_adversarial_urls(spark):
    """_canon_sql (the DuckDB mirror used by the oracles) must agree
    with canonicalize_url_cols on every scheme-ful CASE — including
    URLs whose query string empties out (the NULL-vs-'' hazard)."""
    import duckdb

    from medical_ocr_pipeline_spark.queries.webcur import _canon_sql

    urls = [u for u, host, _ in CASES if host]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {_canon_sql('u')} FROM (VALUES (?)) t(u)", [u]
        ).fetchone()[0]
        for u in urls
    ]
    df = spark.createDataFrame(
        [Row(i=i, url=u) for i, u in enumerate(urls)]
    )
    got_spark = [
        r["url_canon"]
        for r in canonicalize_url_cols(df).orderBy("i").collect()
    ]
    assert got_duck == got_spark
    assert all(v is not None for v in got_duck)


def test_blocklist_suffix_semantics(spark):
    """Parent-domain rules block every subdomain; exact-leaf rules
    block only that host; matched_rule is the lexicographic min when
    several rules match; clean hosts pass with ''."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.webcur import (
        blocklist_verdicts,
    )

    hosts = spark.createDataFrame([
        Row(doc_id=1, host="de.src3.example.com"),   # parent rule
        Row(doc_id=2, host="zh.src7.example.com"),   # exact leaf rule
        Row(doc_id=3, host="en.src7.example.com"),   # sibling: clean
        Row(doc_id=4, host="src3.example.com"),      # rule itself
        Row(doc_id=5, host="en.src0.example.com"),   # clean
        Row(doc_id=6, host="src3.example.com.evil.net"),  # suffix only,
        # not a substring match: must stay clean
    ])
    rules = ("src3.example.com", "zh.src7.example.com")
    got = {r["doc_id"]: r for r in
           blocklist_verdicts(hosts, rules).collect()}
    assert got[1]["blocked"] == 1 and got[1]["matched_rule"] == rules[0]
    assert got[2]["blocked"] == 1 and got[2]["matched_rule"] == rules[1]
    assert got[3]["blocked"] == 0 and got[3]["matched_rule"] == ""
    assert got[4]["blocked"] == 1
    assert got[5]["blocked"] == 0
    assert got[6]["blocked"] == 0


def test_blocklist_plan_is_broadcast_join(spark):
    """The rule side must broadcast (never shuffle the corpus against
    a few-MB rule list) and the suffix fanout must not cartesian."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["url_blocklist_filter"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- triangles


def test_host_triangles_matches_bruteforce(spark):
    import itertools

    import duckdb

    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    src = {d: s for d, s in rows}
    n = len(rows)
    edges = set()
    for d, s in rows:
        t = src[(d * 7 + 1) % n]
        if s != t:
            edges.add((min(s, t), max(s, t)))
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = {v: 0 for v in adj}
    for v, nbrs in adj.items():
        for x, y in itertools.combinations(sorted(nbrs), 2):
            if y in adj.get(x, ()):
                n_tri[v] += 1
    got = {
        r["host"]: r.asDict()
        for r in REGISTRY["host_triangles"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        deg = len(adj[v])
        assert got[v]["deg"] == deg
        assert got[v]["n_tri"] == n_tri[v]
        want_ppm = (
            n_tri[v] * 2_000_000 // (deg * (deg - 1)) if deg >= 2 else 0
        )
        assert got[v]["clust_ppm"] == want_ppm


# ------------------------------------------------------------- crawl diff


def test_crawl_diff_matches_python_reference(spark):
    import hashlib

    import duckdb

    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.queries.webcur import (
        CRAWL_A_END,
        CRAWL_B_START,
        CRAWL_MOD_EVERY,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    a = {d: hashlib.md5(t.encode()).hexdigest()
         for d, _, t in rows if d < CRAWL_A_END}
    b = {
        d: hashlib.md5(
            (t + ":v2" if d % CRAWL_MOD_EVERY == 0 else t).encode()
        ).hexdigest()
        for d, _, t in rows
        if d >= CRAWL_B_START
    }
    want = {}
    for d in set(a) | set(b):
        if d not in a:
            want[d] = "added"
        elif d not in b:
            want[d] = "removed"
        elif a[d] != b[d]:
            want[d] = "modified"
        else:
            want[d] = "unchanged"
    got = {
        r["doc_id"]: r["status"]
        for r in REGISTRY["crawl_diff"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    # all four classes are exercised by the derived snapshots
    assert set(want.values()) == {"added", "removed", "modified",
                                  "unchanged"}


def test_quality_percentiles_is_the_rank_transform(spark):
    """pct_ppm must be the exact per-language rank transform of the
    classifier scores, consistent with ccnet_buckets' ordering."""
    from collections import defaultdict

    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    rows = REGISTRY["quality_percentiles"].fn(spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for lang, rs in by_lang.items():
        order = sorted(rs, key=lambda r: (r.score_mbp, r.doc_id))
        n = len(rs)
        for i, r in enumerate(order, start=1):
            assert r.rk == i
            assert r.n_lang == n
            assert r.pct_ppm == (i - 1) * 1_000_000 // max(n - 1, 1)
        # bounds + monotonicity of the transform
        assert order[0].pct_ppm == 0
        assert order[-1].pct_ppm == 1_000_000
    # cross-check with ccnet_buckets: a 'head' doc never has a lower
    # percentile than a 'tail' doc of the same language
    buckets = {
        r.doc_id: r.bucket
        for r in REGISTRY["ccnet_buckets"].fn(spark, SF_DIR).collect()
    }
    for lang, rs in by_lang.items():
        head_min = min(
            (r.pct_ppm for r in rs if buckets[r.doc_id] == "head"),
            default=1_000_000,
        )
        tail_max = max(
            (r.pct_ppm for r in rs if buckets[r.doc_id] == "tail"),
            default=0,
        )
        assert head_min >= tail_max
