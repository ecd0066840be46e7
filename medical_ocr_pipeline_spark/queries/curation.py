"""Corpus-curation queries over the documents table — the remaining
published training-data-pipeline rules beyond the dedup / repetition /
PII / contamination families already registered:

* ``quality_gopher_rules`` — the per-document Gopher rule set (Rae et
  al. 2021, Table A1): word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, alpha-word fraction, stopword presence.  The
  corpus-level triple (f14) and the repetition pair
  (quality_repetition) cover the other Gopher axes; this closes the
  document-verdict form.
* ``span_boilerplate`` — C4-style cross-document duplicated-span
  detection (Raffel et al. 2020 §2.2 use three-sentence spans; the
  word-stream documents here have no sentence structure, so the span
  analogue is the 3-word shingle): a span occurring in >= 2 distinct
  documents is boilerplate, and each document reports the fraction of
  its span occurrences that are boilerplate.  Corpus-FREQUENCY based —
  deliberately distinct from the pairwise-similarity dedup family.
* ``line_dedup`` — C4/CCNet keep-one-copy line dedup as a corpus
  REWRITE: duplicated fixed-width word-segments ("lines" — the word
  streams have no newlines) keep only their first corpus occurrence
  and documents are reassembled from the survivors in order.
* ``token_budget_sample`` — deterministic domain-mixing primitive:
  downsample every language to the smallest language's token total via
  an exact integer keep-rate and an md5-derived per-doc hash threshold,
  so the sample is reproducible across engines, runs, and cluster
  sizes (no RNG, no sampleBy seed semantics to mirror).

Hash-match discipline (base.py): every threshold and rate is exact
BIGINT arithmetic (basis points / ppm, floor division); reported
fractions are integer/10000.0 — identical IEEE doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_DUCK,
    MD5_INT48_SPARK,
    load,
    register,
)
from medical_ocr_pipeline_spark.queries.textstats import (
    _REP_WS_DUCK,
    _REP_WS_SPARK,
    _TOKEN_RE,
    _gram_expr,
    STOP_WORDS,
    SYMBOL_RE_SPARK,
    SYMBOL_RE_SQL,
)

# DuckDB list literal of the canonical stop set (textstats.STOP_WORDS)
_STOP_LIST_SQL = "[" + ",".join(f"'{s}'" for s in STOP_WORDS) + "]"

# Gopher Table A1 bounds (document-level rules)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3  # mean word length in [3, 10]
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MAX_SYMBOL_X10 = 1  # symbol-to-word ratio <= 0.1
GOPHER_MIN_ALPHA_X5 = 4  # >= 80% of words contain an alphabetic char
GOPHER_MIN_STOP_HITS = 2  # >= 2 distinct stopwords present


@register(
    "quality_gopher_rules",
    sql=f"""
    WITH t AS (
      SELECT doc_id,
             {_REP_WS_DUCK} AS ws,
             CAST(len(regexp_extract_all(text, '{SYMBOL_RE_SQL}'))
                  AS BIGINT) AS n_symbols
      FROM documents
    ),
    m AS (
      SELECT doc_id, n_symbols,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))),
                           0) AS BIGINT) AS word_chars,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                  AS BIGINT) AS n_alpha_words,
             CAST(len(list_intersect(list_distinct(ws),
                                     {_STOP_LIST_SQL})) AS BIGINT)
               AS n_stop_hits
      FROM t
    )
    SELECT doc_id, n_words,
           (CASE WHEN n_words > 0 THEN (word_chars * 10000) // n_words
                 ELSE 0 END) / 10000.0 AS mean_word_len,
           n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AS ok_word_count,
           n_words > 0
             AND {GOPHER_MIN_MEAN_LEN} * n_words <= word_chars
             AND word_chars <= {GOPHER_MAX_MEAN_LEN} * n_words
             AS ok_mean_len,
           n_symbols * 10 <= {GOPHER_MAX_SYMBOL_X10} * n_words
             AS ok_symbol_ratio,
           n_words > 0
             AND 5 * n_alpha_words >= {GOPHER_MIN_ALPHA_X5} * n_words
             AS ok_alpha,
           n_stop_hits >= {GOPHER_MIN_STOP_HITS} AS ok_stop,
           -- lateral alias reuse: keep is defined FROM the flags, so a
           -- threshold tweak can never make them disagree
           ok_word_count AND ok_mean_len AND ok_symbol_ratio
             AND ok_alpha AND ok_stop AS keep
    FROM m ORDER BY doc_id
    """,
)
def quality_gopher_rules(spark, sf_dir):
    """Per-document Gopher quality rules (Rae et al. 2021 Table A1);
    with f14 (corpus triple) and quality_repetition (2-gram/5-gram
    fractions) this completes the Gopher filter family.

    Every rule is an exact integer comparison (3 <= mean <= 10 becomes
    3*n_words <= word_chars <= 10*n_words, ratio <= 0.1 becomes
    symbols*10 <= n_words) so the engines cannot disagree at a
    boundary; the reported mean_word_len is basis points / 10000.0.

    Scale shape: SINGLE scan, pure per-row Catalyst array expressions,
    zero joins / windows / groupBy — embarrassingly parallel at 100 TB
    like the extraction path; the only shuffle is the presentation
    ORDER BY."""
    return gopher_rules(load(spark, sf_dir, "documents"))


def gopher_rules(raw_docs):
    """Shared core for quality_gopher_rules: (doc_id, text) frame in,
    per-doc rule verdicts out (schema in the registry docstring)."""
    stop_arr = F.array(*[F.lit(s) for s in STOP_WORDS])
    t = raw_docs.select(
        "doc_id",
        F.expr(_REP_WS_SPARK).alias("ws"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{SYMBOL_RE_SPARK}', 0)")
        ).cast("long").alias("n_symbols"),
    )
    m = t.select(
        "doc_id",
        "n_symbols",
        F.size("ws").cast("long").alias("n_words"),
        F.expr("aggregate(ws, 0L, (a, y) -> a + length(y))").alias(
            "word_chars"
        ),
        F.size(
            F.filter("ws", lambda w: w.rlike("[a-z]"))
        ).cast("long").alias("n_alpha_words"),
        F.size(
            F.array_intersect(F.array_distinct("ws"), stop_arr)
        ).cast("long").alias("n_stop_hits"),
    )
    ok_word_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    ok_mean_len = (
        (F.col("n_words") > 0)
        & (F.lit(GOPHER_MIN_MEAN_LEN) * F.col("n_words")
           <= F.col("word_chars"))
        & (F.col("word_chars")
           <= F.lit(GOPHER_MAX_MEAN_LEN) * F.col("n_words"))
    )
    ok_symbol_ratio = (
        F.col("n_symbols") * 10
        <= F.lit(GOPHER_MAX_SYMBOL_X10) * F.col("n_words")
    )
    ok_alpha = (F.col("n_words") > 0) & (
        F.col("n_alpha_words") * 5
        >= F.lit(GOPHER_MIN_ALPHA_X5) * F.col("n_words")
    )
    ok_stop = F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS
    return m.select(
        "doc_id",
        "n_words",
        (
            F.expr(
                "CASE WHEN n_words > 0 THEN "
                "(word_chars * 10000) DIV n_words ELSE 0L END"
            )
            / F.lit(10000.0)
        ).alias("mean_word_len"),
        ok_word_count.alias("ok_word_count"),
        ok_mean_len.alias("ok_mean_len"),
        ok_symbol_ratio.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        (
            ok_word_count & ok_mean_len & ok_symbol_ratio & ok_alpha
            & ok_stop
        ).alias("keep"),
    ).orderBy("doc_id")


SPAN_N = 3  # C4's three-sentence span, word-stream analogue
SPAN_MIN_DF = 2  # boilerplate = span present in >= 2 distinct docs
SPAN_FLAG_BP = 3000  # flag a doc when >= 30% of its spans are boilerplate


@register(
    "span_boilerplate",
    sql=f"""
    WITH wl AS (SELECT doc_id, {_REP_WS_DUCK} AS ws FROM documents),
    ws AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
      FROM wl
    ),
    led AS (
      SELECT doc_id, w,
             lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM ws
    ),
    occ AS (
      SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS span,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM led WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    dfq AS (SELECT span, COUNT(*) AS df FROM occ GROUP BY 1),
    hits AS (
      SELECT o.doc_id, CAST(SUM(o.c) AS BIGINT) AS nb
      FROM occ o JOIN dfq USING (span)
      WHERE df >= {SPAN_MIN_DF} GROUP BY 1
    ),
    base AS (
      SELECT doc_id,
             CAST(greatest(len(ws) - {SPAN_N - 1}, 0) AS BIGINT)
               AS n_spans
      FROM wl
    )
    SELECT doc_id, n_spans, n_boiler_spans,
           boiler_bp / 10000.0 AS boiler_frac,
           boiler_bp >= {SPAN_FLAG_BP} AS flagged
    FROM (
      SELECT b.doc_id, b.n_spans,
             COALESCE(h.nb, 0) AS n_boiler_spans,
             CASE WHEN b.n_spans > 0
                  THEN (COALESCE(h.nb, 0) * 10000) // b.n_spans
                  ELSE 0 END AS boiler_bp
      FROM base b LEFT JOIN hits h USING (doc_id)
    )
    ORDER BY doc_id
    """,
)
def span_boilerplate(spark, sf_dir):
    """C4-style cross-document duplicated-span detection (Raffel et al.
    2020 §2.2): a SPAN_N-word span occurring in >= SPAN_MIN_DF
    distinct documents is boilerplate; each document reports how many
    of its span occurrences are boilerplate and the exact
    basis-point fraction.  Corpus-FREQUENCY based, so it catches
    templated text that pairwise similarity (the dedup family) never
    pairs up.

    Scale shape: explode spans -> groupBy(doc_id, span) counts ->
    groupBy(span) document frequency.  Both aggregations are
    COMBINABLE (partial map-side agg), so a mega-hot boilerplate span
    never concentrates on one reducer the way a pair-enumerating
    self-join would; the hits join back to per-(doc, span) rows is an
    equi-join with no row amplification (one output row per input occ
    row max).  AQE handles residual span skew.  No pair blowup
    anywhere — this is the shape that survives 100 TB, unlike the
    quadratic all-pairs form."""
    return boilerplate_metrics(load(spark, sf_dir, "documents"))


def boilerplate_metrics(raw_docs):
    """Shared core for span_boilerplate: (doc_id, text) frame in,
    per-doc boilerplate-span metrics + flag out."""
    wl = raw_docs.select(
        "doc_id", F.expr(_REP_WS_SPARK).alias("ws")
    )
    base = wl.select(
        "doc_id",
        F.greatest(
            F.size("ws") - F.lit(SPAN_N - 1), F.lit(0)
        ).cast("long").alias("n_spans"),
        F.expr(_gram_expr(SPAN_N)).alias("spans"),
    )
    occ = (
        base.select("doc_id", F.explode("spans").alias("span"))
        .groupBy("doc_id", "span")
        .agg(F.count("*").alias("c"))
    )
    dfq = occ.groupBy("span").agg(F.count("*").alias("df"))
    hits = (
        occ.join(dfq.filter(F.col("df") >= SPAN_MIN_DF), "span")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("nb"))
    )
    out = (
        base.select("doc_id", "n_spans")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias(
                "n_boiler_spans"
            ),
            F.expr(
                "CASE WHEN n_spans > 0 THEN "
                "(COALESCE(nb, 0L) * 10000) DIV n_spans ELSE 0L END"
            ).alias("boiler_bp"),
        )
    )
    return out.select(
        "doc_id",
        "n_spans",
        "n_boiler_spans",
        (F.col("boiler_bp") / F.lit(10000.0)).alias("boiler_frac"),
        (F.col("boiler_bp") >= F.lit(SPAN_FLAG_BP)).alias("flagged"),
    ).orderBy("doc_id")


LINE_W = 4  # words per "line" segment (the word-stream line analogue)
LINE_KEY_MUL = 1_000_000  # first-occurrence key = doc_id * MUL + seg_idx


@register(
    "line_dedup",
    sql=f"""
    WITH wl AS (SELECT doc_id, {_REP_WS_DUCK} AS ws FROM documents),
    segs AS (
      SELECT doc_id,
             list_transform(range(0, (len(ws) + {LINE_W - 1}) // {LINE_W}),
               i -> array_to_string(ws[i*{LINE_W}+1 : i*{LINE_W}+{LINE_W}],
                                    ' ')) AS sg
      FROM wl
    ),
    occ AS (
      SELECT doc_id, unnest(sg) AS seg,
             CAST(generate_subscripts(sg, 1) - 1 AS BIGINT) AS seg_idx
      FROM segs
    ),
    win AS (
      SELECT seg,
             CAST(MIN(doc_id * {LINE_KEY_MUL} + seg_idx) AS BIGINT)
               AS keep_key
      FROM occ GROUP BY seg
    ),
    kept AS (
      SELECT o.doc_id, o.seg_idx, o.seg
      FROM occ o JOIN win w USING (seg)
      WHERE o.doc_id * {LINE_KEY_MUL} + o.seg_idx = w.keep_key
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(len(s.sg) AS BIGINT) AS n_segments,
           COALESCE(a.n_kept, 0) AS n_kept,
           CAST(len(s.sg) AS BIGINT) - COALESCE(a.n_kept, 0) AS n_dropped,
           COALESCE(a.dedup_text, '') AS dedup_text
    FROM segs s LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
)
def line_dedup(spark, sf_dir):
    """Corpus-wide line-level dedup, the C4/CCNet rewrite rule (Raffel
    et al. 2020 §2.2 keep-one-copy; Wenzek et al. 2019 per-line dedup):
    documents are segmented into fixed LINE_W-word "lines" (the
    word-stream analogue — these documents have no newlines), every
    duplicated line keeps exactly its FIRST corpus occurrence (min over
    the exact BIGINT key doc_id * 1e6 + seg_idx), and each document is
    REASSEMBLED from its surviving lines in original order.  Distinct
    from span_boilerplate (metrics only) and the pairwise dedup family
    (whole-document verdicts): this is the operator that rewrites the
    corpus text itself.

    Scale shape: the winner table is a COMBINABLE groupBy(seg) MIN —
    map-side partial agg collapses hot boilerplate lines before the
    shuffle, so a line duplicated a billion times costs one row per map
    partition, never a hot reducer.  The join back is the shingle
    inverted-index equi-join (no row amplification: <= 1 output per occ
    row) and reassembly is a groupBy(doc_id) whose collect_list is
    bounded by document length.  No windows, no self-join, no pair
    enumeration — the same two-phase shape as corpus_keep_drop, which
    is the one that survives 100 TB."""
    return line_dedup_rewrite(load(spark, sf_dir, "documents"))


def line_dedup_rewrite(raw_docs):
    """Shared core for line_dedup: (doc_id, text) frame in, per-doc
    surviving-line counts + reassembled dedup_text out.

    The exploded line-occurrence frame is persist()ed (same discipline
    as the Jaccard shingle index, dedup.py): it feeds THREE consumers —
    per-doc segment counts, the winner MIN table, and the join-back —
    and without materialization each would re-run the regex
    segmentation scan over the full corpus.  No unpersist: the frame
    lives until Spark evicts it (bench/driver sessions are short; a
    long-lived job should unpersist after the write)."""
    wl = raw_docs.select("doc_id", F.expr(_REP_WS_SPARK).alias("ws"))
    occ = (
        wl.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "CASE WHEN size(ws) = 0 THEN "
                    "cast(array() as array<string>) "
                    f"ELSE transform(sequence(0, (size(ws) + {LINE_W - 1}) "
                    f"DIV {LINE_W} - 1), "
                    f"i -> array_join(slice(ws, i*{LINE_W}+1, {LINE_W}), "
                    "' ')) END"
                )
            ).alias("seg_idx", "seg"),
        )
        .select(
            "doc_id",
            F.col("seg_idx").cast("long").alias("seg_idx"),
            "seg",
        )
        .persist()
    )
    stats = occ.groupBy("doc_id").agg(
        F.count("*").alias("n_segments")
    )
    key = F.col("doc_id") * F.lit(LINE_KEY_MUL) + F.col("seg_idx")
    win = occ.groupBy("seg").agg(F.min(key).alias("keep_key"))
    kept = occ.join(win, "seg").filter(key == F.col("keep_key"))
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(seg_idx, seg))),"
                " s -> s.seg)"
            ),
            " ",
        ).alias("dedup_text"),
    )
    # zero-word docs never reach occ; the doc_id-only scan is column-
    # pruned (no re-tokenization) and restores them with 0 segments
    return (
        raw_docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_segments"), F.lit(0)).cast("long").alias(
                "n_segments"
            ),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias(
                "n_kept"
            ),
            (
                F.coalesce(F.col("n_segments"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_dropped"),
            F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
        )
        .orderBy("doc_id")
    )


# md5-hex prefix -> 48-bit int (canonical templates in base.py, shared
# with the MinHash family), reduced to [0, 1e6) ppm buckets.
_H_SPARK = MD5_INT48_SPARK.format(x="cast(doc_id as string)") + " % 1000000"
_H_DUCK = MD5_INT48_DUCK.format(x="CAST(doc_id AS VARCHAR)") + " % 1000000"

# Exact floor(mt * 1e6 / total) in pure BIGINT via split multiplication:
# mt*1e6 = ((mt*1000) div t)*1000*t + ((mt*1000) mod t)*1000, so the ppm
# is q1*1000 + (r1*1000) div t — no single product exceeds max(mt,t)*1000,
# overflow-safe to ~9.2e15 tokens (petatoken-scale) per language where
# the naive (mt * 1000000) form wraps at ~9.2e12 (only ~37 TB of text).
_PPM_SPARK = (
    "CASE WHEN total_tokens > 0 AND mt IS NOT NULL THEN "
    "((mt * 1000) DIV total_tokens) * 1000 "
    "+ (((mt * 1000) % total_tokens) * 1000) DIV total_tokens "
    "ELSE 0L END"
)
_PPM_DUCK = (
    "CASE WHEN total_tokens > 0 AND mt IS NOT NULL THEN "
    "((mt * 1000) // total_tokens) * 1000 "
    "+ (((mt * 1000) % total_tokens) * 1000) // total_tokens "
    "ELSE 0 END"
)


@register(
    "token_budget_sample",
    sql=f"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len(regexp_extract_all(text, '{_TOKEN_RE}'))
                  AS BIGINT) AS nt,
             {_H_DUCK} AS h
      FROM documents
    ),
    tot AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS total_tokens
      FROM d GROUP BY lang
    ),
    m AS (SELECT CAST(MIN(total_tokens) AS BIGINT) AS mt FROM tot
          WHERE total_tokens > 0),
    r AS (
      SELECT lang, n_docs, total_tokens,
             {_PPM_DUCK} AS keep_rate_ppm
      FROM tot, m
    ),
    k AS (
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(d.nt) AS BIGINT) AS kept_tokens
      FROM d JOIN r USING (lang)
      WHERE d.h < r.keep_rate_ppm GROUP BY d.lang
    )
    SELECT lang, n_docs, total_tokens, keep_rate_ppm,
           COALESCE(kept_docs, 0) AS kept_docs,
           COALESCE(kept_tokens, 0) AS kept_tokens
    FROM r LEFT JOIN k USING (lang) ORDER BY lang
    """,
)
def token_budget_sample(spark, sf_dir):
    """Deterministic token-budget downsampling (domain mixing): every
    language is sampled down to the SMALLEST language's token total —
    the uniform-mixing primitive of training-data pipelines.  The
    keep decision is hash(doc_id) mod 1e6 < keep_rate_ppm with
    keep_rate_ppm = floor(min_total * 1e6 / lang_total) computed by the
    overflow-safe split-multiplication (_PPM_SPARK/_PPM_DUCK — exact
    BIGINT to ~9.2e15 tokens per language) — reproducible across
    engines, runs, and cluster sizes, unlike RNG-seeded sampleBy
    (whose per-partition streams change with partitioning).

    Edge semantics: min_total is taken over languages with AT LEAST
    ONE token, so a bucket of whitespace-only docs cannot collapse the
    whole sample to zero; zero-token languages themselves get ppm 0
    (they contribute nothing a token budget could count).

    Scale shape: two scans of (lang, doc_id, text).  Scan 1 feeds a
    COMBINABLE groupBy(lang) token total (lang cardinality is tiny, so
    the shuffle is a few rows after map-side partial agg); the
    per-lang rate frame is broadcast back for the filter, so the keep
    pass is shuffle-free per row.  The smallest language keeps
    everything (ppm = 1e6); others keep ~min/total of their tokens in
    expectation."""
    return budget_sample_summary(load(spark, sf_dir, "documents"))


def budget_sample_summary(raw_docs):
    """Shared core for token_budget_sample: (lang, doc_id, text) frame
    in, per-lang sampling summary out."""
    d = raw_docs.select(
        "lang",
        "doc_id",
        F.size(
            F.expr(
                "regexp_extract_all(text, '"
                + _TOKEN_RE.replace("\\", "\\\\")
                + "', 0)"
            )
        ).cast("long").alias("nt"),
        F.expr(_H_SPARK).alias("h"),
    )
    tot = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("nt").alias("total_tokens")
    )
    m = tot.filter(F.col("total_tokens") > 0).agg(
        F.min("total_tokens").alias("mt")
    )
    r = tot.crossJoin(F.broadcast(m)).select(
        "lang",
        "n_docs",
        "total_tokens",
        F.expr(_PPM_SPARK).alias("keep_rate_ppm"),
    )
    k = (
        d.join(F.broadcast(r.select("lang", "keep_rate_ppm")), "lang")
        .filter(F.col("h") < F.col("keep_rate_ppm"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("nt").alias("kept_tokens"),
        )
    )
    return (
        r.join(k, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "keep_rate_ppm",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_tokens"), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# --- n-gram novelty (first-occurrence rate) ----------------------------------
# Curation metric for incremental crawls: how much of each document's
# content is NEW relative to everything ingested before it (doc_id is
# the ingest order here).  Low-novelty tails are what host caps and
# span dedup exist to drop; this measures them directly.

NOVELTY_N = SPAN_N  # reuse the C4 word-span width


@register(
    "ngram_novelty",
    sql=f"""
    WITH wl AS (SELECT doc_id, {_REP_WS_DUCK} AS ws FROM documents),
    g AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest([array_to_string(ws[i + 1 : i + {NOVELTY_N}], ' ')
                       FOR i IN range(0, greatest(len(ws) - {NOVELTY_N - 1},
                                                  0))]) AS g
        FROM wl
      )
    ),
    first AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g),
    per AS (
      SELECT a.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(CASE WHEN f.first_doc = a.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
      FROM g a JOIN first f USING (g) GROUP BY 1
    )
    SELECT w.doc_id,
           COALESCE(p.n_distinct, 0) AS n_distinct,
           COALESCE(p.n_novel, 0) AS n_novel,
           COALESCE(p.n_novel, 0) * 1000000
             // GREATEST(COALESCE(p.n_distinct, 0), 1) AS novelty_ppm
    FROM wl w LEFT JOIN per p USING (doc_id)
    ORDER BY w.doc_id
    """,
)
def ngram_novelty(spark, sf_dir):
    """Per-document content novelty: the fraction of a document's
    distinct {NOVELTY_N}-word shingles whose FIRST corpus occurrence
    (min doc_id — ingest order) is this document, in exact-integer ppm.
    The direct measurement of "how much new text does each crawl
    increment add", the quantity incremental-dedup pipelines
    (dedup_incremental) optimize.

    100 TB shape: distinct (doc, shingle) is a combinable dedup;
    first-occurrence is a combinable MIN per shingle (never a window
    over the corpus); the attribution join back to the distinct
    occurrence table is a shingle-keyed equi-join with no row
    amplification; the per-doc rollup is combinable.  A mega-hot
    boilerplate shingle is ONE row on the min side — skew lives only
    in the occurrence table, where AQE splits it."""
    wl = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_REP_WS_SPARK).alias("ws")
    )
    sh = (
        wl.select(
            "doc_id", F.explode(F.expr(_gram_expr(NOVELTY_N))).alias("g")
        )
        .distinct()
    )
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        wl.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct", F.lit(0).cast("long")).alias(
                "n_distinct"
            ),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            F.expr(
                "coalesce(n_novel, 0) * 1000000"
                " div greatest(coalesce(n_distinct, 0), 1)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )
