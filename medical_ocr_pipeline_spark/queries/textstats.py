"""Text-analysis queries over the documents table (SURVEY.md §2.8 scalars
+ the training-data-pipeline text ops): rules cleanup (F1), markup strip
(F2), language ID (F9), tokenization (F10), quality scoring (F14),
document fingerprinting.  All pure Catalyst on the Spark side; DuckDB
oracles mirror the regexes (DuckDB regexp_replace needs the 'g' flag to
match Spark's replace-all default).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_DUCK,
    MD5_INT48_SPARK,
    ROUND_DIGITS,
    fanout,
    load,
    register,
    words_expr,
)

R = ROUND_DIGITS

_WORD_SPLIT = "[^a-z0-9]+"
# BPE-ish token estimate: alnum runs + each non-alnum non-space char
_TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


@register(
    "f1_rules_cleanup",
    sql=f"""
    SELECT source,
           CAST(SUM(length(text)) AS BIGINT) AS raw_chars,
           CAST(SUM(length(
             trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text, '[•·∙●]', '.', 'g'), '[–—−]+', '-', 'g'),
               '[×✕✖]', 'x', 'g'), '\\s+', ' ', 'g'))
           )) AS BIGINT) AS clean_chars,
           ROUND(AVG(length(text)), {R}) AS avg_raw_len
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def f1_rules_cleanup(spark, sf_dir):
    """F1 bullet/dash/×/whitespace normalization as a Catalyst regex chain
    (02_domain_cleanup cell 0:93-98)."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), "[•·∙●]", "."),
                    "[–—−]+",
                    "-",
                ),
                "[×✕✖]",
                "x",
            ),
            "\\s+",
            " ",
        )
    )
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.length("text")).alias("raw_chars"),
            F.sum(F.length(cleaned)).alias("clean_chars"),
            F.round(F.avg(F.length("text")), R).alias("avg_raw_len"),
        )
        .orderBy("source")
    )


@register(
    "f2_markup_strip",
    sql="""
    SELECT doc_id,
           length(text) - length(
             trim(regexp_replace(regexp_replace(text, '<[^>]+>', ' ', 'g'),
                                 '\\s+', ' ', 'g'))
           ) AS bytes_stripped
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def f2_markup_strip(spark, sf_dir):
    """F2 HTML tag strip seed (01_blocks_all_mcp_compare cell 1:188)."""
    stripped = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "<[^>]+>", " "), "\\s+", " "
        )
    )
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            (F.length("text") - F.length(stripped)).alias("bytes_stripped"),
        )
        .orderBy("doc_id")
    )


@register(
    "f9_lang_id",
    sql="""
    SELECT CASE WHEN regexp_matches(text, '[ऀ-ॿ]') THEN 'hi'
                WHEN regexp_matches(text, '[ఀ-౿]') THEN 'te'
                ELSE 'en' END AS lang_tag,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang_tag ORDER BY lang_tag
    """,
)
def f9_lang_id(spark, sf_dir):
    """F9 unicode-range language tag (03_llm_cleanup cell 4:3-6)."""
    return (
        load(spark, sf_dir, "documents")
        .select(
            F.when(F.col("text").rlike("[ऀ-ॿ]"), "hi")
            .when(F.col("text").rlike("[ఀ-౿]"), "te")
            .otherwise("en")
            .alias("lang_tag")
        )
        .groupBy("lang_tag")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_tag")
    )


@register(
    "f10_token_counts",
    sql=f"""
    SELECT lang,
           CAST(SUM(len(list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                                    w -> w <> ''))) AS BIGINT) AS total_words,
           CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT)
             AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '{_TOKEN_RE}'))), {R})
             AS avg_tokens
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def f10_token_counts(spark, sf_dir):
    """F10 whitespace/word tokenization + BPE-ish token-count estimate."""
    words = words_expr()
    # Spark SQL string literals consume one level of backslash escaping
    tokens = F.expr(
        f"regexp_extract_all(text, '{_TOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)"
    )
    return (
        load(spark, sf_dir, "documents")
        .select("lang", F.size(words).alias("nw"), F.size(tokens).alias("nt"))
        .groupBy("lang")
        .agg(
            F.sum("nw").alias("total_words"),
            F.sum("nt").alias("total_tokens"),
            F.round(F.avg("nt"), R).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


# Canonical quality-signal constants, shared with queries/curation.py —
# edit HERE so f14's ratios and the Gopher rule set can never drift apart.
STOP_WORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on",
              "with")
_STOP = "(" + ",".join(f"'{w}'" for w in STOP_WORDS) + ")"
SYMBOL_RE_SQL = "[^A-Za-z0-9\\s]"  # DuckDB literal form
SYMBOL_RE_SPARK = SYMBOL_RE_SQL.replace("\\", "\\\\")  # Spark expr literal


@register(
    "f14_quality_scores",
    sql=f"""
    WITH t AS (
      SELECT lang,
             length(text) AS n,
             len(regexp_extract_all(text, '{SYMBOL_RE_SQL}')) AS special,
             list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                         w -> w <> '') AS words
      FROM documents
    )
    SELECT lang,
           ROUND(AVG(CAST(special AS DOUBLE) / NULLIF(n, 0)), {R})
             AS special_ratio,
           ROUND(AVG(CAST(len(list_filter(words, w -> w IN {_STOP})) AS DOUBLE)
                     / GREATEST(len(words), 1)), {R}) AS stopword_ratio,
           ROUND(AVG(CAST(len(words) AS DOUBLE)
                     / GREATEST(len(list_distinct(words)), 1)), {R})
             AS repetition,
           COUNT(*) AS n_docs
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def f14_quality_scores(spark, sf_dir):
    """F14-style quality metrics (01_qa_pipeline_evaluation cell 5):
    special-char ratio, stopword ratio, repetition factor — the
    training-data quality-scoring triple.  An empty document contributes
    a NULL special_ratio (try_divide / NULLIF(n,0), skipped by AVG in
    both engines) rather than aborting the job under ANSI mode."""
    stop_arr = F.array(*[F.lit(s) for s in STOP_WORDS])
    words = words_expr()
    t = load(spark, sf_dir, "documents").select(
        "lang",
        F.length("text").alias("n"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{SYMBOL_RE_SPARK}', 0)")
        ).alias("special"),
        words.alias("words"),
    )
    return (
        t.select(
            "lang",
            F.try_divide(F.col("special").cast("double"), F.col("n")).alias(
                "sr"
            ),
            (
                F.size(
                    F.filter("words", lambda w: F.array_contains(stop_arr, w))
                ).cast("double")
                / F.greatest(F.size("words"), F.lit(1))
            ).alias("swr"),
            (
                F.size("words").cast("double")
                / F.greatest(F.size(F.array_distinct("words")), F.lit(1))
            ).alias("rep"),
        )
        .groupBy("lang")
        .agg(
            F.round(F.avg("sr"), R).alias("special_ratio"),
            F.round(F.avg("swr"), R).alias("stopword_ratio"),
            F.round(F.avg("rep"), R).alias("repetition"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


@register(
    "fingerprint_docs",
    sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
             AS n_fingerprints
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def fingerprint_docs(spark, sf_dir):
    """Document fingerprinting: md5 of whitespace-normalized lowercase text
    (deterministic across engines), distinct count per source."""
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")))
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(fp).alias("n_fingerprints"),
        )
        .orderBy("source")
    )


# --- n-gram language-ID heuristic -------------------------------------------
# Character-trigram profiles of function words (public-knowledge lists);
# the classifier is argmax over profile-intersection sizes with a fixed
# tie-break precedence — deterministic and expressible in both engines.
_LANG_PROFILES = {
    "en": ["the", "he ", "nd ", "and", "ing", " th", "ion", " of", "of ", "to "],
    "es": ["de ", " de", "la ", " la", "os ", "el ", " el", "que", " qu", "ión"],
    "de": ["er ", "en ", "der", " de", "ie ", "die", "und", " un", "sch", "ein"],
    "fr": ["es ", " de", "de ", "le ", " le", "ent", "et ", " et", "la ", "des"],
}
_LANG_ORDER = ["en", "es", "de", "fr"]


def _tri_sql_duck(col):
    return (f"list_distinct([substr({col}, i, 3) "
            f"FOR i IN range(1, greatest(length({col}) - 1, 1))])")


def _profile_sql(lang):
    return "[" + ", ".join(f"'{t}'" for t in _LANG_PROFILES[lang]) + "]"


_LANGID_DUCK_SCORES = ", ".join(
    f"len(list_intersect(tri, {_profile_sql(lg)})) AS s_{lg}"
    for lg in _LANG_ORDER
)
_LANGID_DUCK_WINNER = (
    "CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en' "
    "WHEN s_es >= s_de AND s_es >= s_fr THEN 'es' "
    "WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END"
)


def _langid_pred_frame(docs):
    """(true_lang, pred_lang, s_en..s_fr) per document — the trigram
    argmax predictor shared by langid_ngram and langid_eval."""
    t = F.lower("text")
    tri = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
            lambda i: F.substring(t, 1, 0x7FFFFFFF).substr(i, F.lit(3)),
        )
    )
    docs = docs.select(
        F.col("lang").alias("true_lang"), tri.alias("tri")
    )
    for lg in _LANG_ORDER:
        profile = F.array(*[F.lit(x) for x in _LANG_PROFILES[lg]])
        docs = docs.withColumn(
            f"s_{lg}", F.size(F.array_intersect("tri", profile))
        )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_ORDER}
    winner = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return docs.withColumn("pred_lang", winner)


@register(
    "langid_ngram",
    sql=f"""
    WITH tri AS (
      SELECT lang AS true_lang, {_tri_sql_duck("lower(text)")} AS tri
      FROM documents
    ), scored AS (
      SELECT true_lang, {_LANGID_DUCK_SCORES} FROM tri
    )
    SELECT true_lang, {_LANGID_DUCK_WINNER} AS pred_lang, COUNT(*) AS n,
           ROUND(AVG(s_en), {R}) AS avg_s_en
    FROM scored
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def langid_ngram(spark, sf_dir):
    """Language-ID via char-trigram profile intersection (the n-gram
    heuristic of the training-data pipeline; the reference's unicode-range
    tagger F9 is the degenerate single-feature case)."""
    return (
        _langid_pred_frame(load(spark, sf_dir, "documents"))
        .groupBy("true_lang", "pred_lang")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("s_en"), R).alias("avg_s_en"),
        )
        .orderBy("true_lang", "pred_lang")
    )


# --- rolling-hash document fingerprint --------------------------------------
# Rabin-Karp-style polynomial hash over the word sequence:
#   h = sum_i( (H48(w_i) mod p) * B^i ) mod p,  B = 31, p = 2^31 - 1
# computed incrementally (h = h*B + w mod p) — order-sensitive, so
# reordered documents fingerprint differently (unlike a bag-of-words md5),
# and identical in Spark and DuckDB via the shared md5-derived word hash.
_ROLL_P = 2147483647
_ROLL_B = 31


@register(
    "fingerprint_rolling",
    sql=f"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                         x -> x <> '') AS words
      FROM documents
    ), fp AS (
      SELECT doc_id, source,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 [ CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT) % {_ROLL_P}
                   FOR x IN words ]),
               (h, x) -> (h * {_ROLL_B} + x) % {_ROLL_P}) AS fp
      FROM w
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_fingerprints,
           CAST(MIN(fp) AS BIGINT) AS min_fp, CAST(MAX(fp) AS BIGINT) AS max_fp
    FROM fp GROUP BY source ORDER BY source
    """,
)
def fingerprint_rolling(spark, sf_dir):
    """Order-sensitive rolling-hash fingerprint per document, aggregated
    per source.  h*B never exceeds 2^36 before the mod, so the arithmetic
    is exact in both engines."""
    words = words_expr()
    fp = F.expr(
        f"""
        aggregate(words, cast(0 as bigint),
          (h, x) -> (h * {_ROLL_B}
                     + cast(conv(substr(md5(x), 1, 12), 16, 10) as bigint)
                       % {_ROLL_P}) % {_ROLL_P})
        """
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", words.alias("words"))
        .select("doc_id", "source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("source")
    )


# --- composite corpus curation (the 100 TB training-data filter job) --------

CURATE_MIN_WORDS = 30
CURATE_MAX_REP = 3.0
CURATE_PFX_WORDS = 8


def document_verdicts(docs, extra_cols: tuple = (),
                      with_fingerprint: bool = False):
    """Per-document curation verdict frame — THE shared core of the
    oracle-checked corpus_keep_drop aggregate and job_corpus's per-doc
    output (one definition, so the production job can never drift from
    the DuckDB-verified gates).

    Output: (doc_id, lang, *extra_cols, n_words, rep, [fp,] reason,
    keep).  Prefix dedup is the skew-safe two-phase min (combinable,
    eqNullSafe on the prefix so NULL-text docs form their own group —
    the window oracle's PARTITION BY semantics)."""
    words = words_expr()
    cols = [
        "doc_id",
        "lang",
        *extra_cols,
        F.size("words").alias("n_words"),
        (
            F.size("words").cast("double")
            / F.nullif(F.size(F.array_distinct("words")), F.lit(0))
        ).alias("rep"),
        F.array_join(F.slice("words", 1, CURATE_PFX_WORDS), " ").alias("pfx"),
    ]
    if with_fingerprint:
        cols.append(
            F.md5(
                F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
            ).alias("fp")
        )
    s = docs.select("doc_id", "lang", *extra_cols, words.alias("words"),
                    "text").select(*cols)
    firsts = s.groupBy("pfx").agg(F.min("doc_id").alias("first_doc"))
    s = s.join(
        firsts.withColumnRenamed("pfx", "pfx_f"),
        F.col("pfx").eqNullSafe(F.col("pfx_f")),
    ).drop("pfx_f")
    reason = (
        F.when(F.col("doc_id") != F.col("first_doc"), "dup")
        .when(F.col("n_words") < CURATE_MIN_WORDS, "too_short")
        .when(F.col("rep") >= CURATE_MAX_REP, "repetitive")
        .otherwise("keep")
    )
    return (
        s.withColumn("reason", reason)
        .withColumn("keep", F.col("reason") == "keep")
        .drop("pfx", "first_doc")
    )


# shared oracle CTE: the per-doc verdict frame (words -> length /
# repetition / prefix-dup-rank -> first-failing reason), the DuckDB twin
# of document_verdicts — used by corpus_keep_drop AND curation_funnel so
# the two oracles cannot drift.
_VERDICT_S_DUCK = f"""
    w AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                         x -> x <> '') AS words
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
             len(words) AS n_words,
             len(words) * 1.0 / NULLIF(len(list_distinct(words)), 0) AS rep,
             ROW_NUMBER() OVER (
               PARTITION BY array_to_string(words[1:{CURATE_PFX_WORDS}], ' ')
               ORDER BY doc_id
             ) AS dup_rank
      FROM w
    ), v AS (
      SELECT doc_id, lang, n_words,
             CASE
               WHEN dup_rank > 1 THEN 'dup'
               WHEN n_words < {CURATE_MIN_WORDS} THEN 'too_short'
               WHEN rep >= {CURATE_MAX_REP} THEN 'repetitive'
               ELSE 'keep'
             END AS reason
      FROM s
    )
"""


@register(
    "corpus_keep_drop",
    sql=f"""
    WITH {_VERDICT_S_DUCK}
    SELECT reason,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_words), {R}) AS avg_words
    FROM v GROUP BY reason ORDER BY reason
    """,
)
def corpus_keep_drop(spark, sf_dir):
    """Composite corpus-curation filter — the shape of a real training-
    data keep/drop job: prefix dedup (first-8-words fingerprint, the
    RefinedWeb-style cheap near-dup gate), length gate, and repetition
    gate, with first-failing-reason attribution.

    Skew note (VERDICT r01): boilerplate openings make the 8-word prefix
    a hot key at 100 TB, so the dup rank is NOT a row_number window
    (which sorts the whole hot partition in one task) but the two-phase
    equivalent: groupBy(pfx).agg(min(doc_id)) — min is combinable, so
    the hot prefix is pre-aggregated map-side — then a join back on pfx,
    which AQE skew-split handles (the build side is one row per distinct
    prefix).  dup_rank>1 == doc_id != min(doc_id) per prefix, exactly."""
    s = document_verdicts(load(spark, sf_dir, "documents"))
    return (
        s.groupBy(F.col("reason"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_words"), R).alias("avg_words"),
        )
        .orderBy("reason")
    )


# ordered gate chain of document_verdicts (first-failing attribution):
# a doc dropped at stage k was never seen by stage k+1.
CURATION_STAGES = ("dup", "too_short", "repetitive")


@register(
    "curation_funnel",
    sql=f"""
    WITH {_VERDICT_S_DUCK},
    per AS (
      SELECT reason, CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(n_words) AS BIGINT) AS t
      FROM v GROUP BY reason
    ),
    st(stage_idx, stage) AS (
      VALUES (1, 'dup'), (2, 'too_short'), (3, 'repetitive')
    ),
    j AS (
      SELECT CAST(st.stage_idx AS BIGINT) AS stage_idx, st.stage,
             CAST(COALESCE(per.d, 0) AS BIGINT) AS docs_dropped,
             CAST(COALESCE(per.t, 0) AS BIGINT) AS dropped_tokens
      FROM st LEFT JOIN per ON st.stage = per.reason
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
             CAST(SUM(n_words) AS BIGINT) AS total_tokens
      FROM v
    ),
    c AS (
      SELECT stage_idx, stage, docs_dropped,
             CAST(SUM(docs_dropped) OVER (ORDER BY stage_idx) AS BIGINT)
               AS cum_d,
             CAST(SUM(dropped_tokens) OVER (ORDER BY stage_idx) AS BIGINT)
               AS cum_t
      FROM j
    )
    SELECT c.stage_idx, c.stage,
           CAST(tot.total_docs - c.cum_d + c.docs_dropped AS BIGINT)
             AS docs_in,
           c.docs_dropped,
           CAST(tot.total_docs - c.cum_d AS BIGINT) AS docs_out,
           CAST(tot.total_tokens - c.cum_t AS BIGINT) AS tokens_out
    FROM c, tot ORDER BY c.stage_idx
    """,
)
def curation_funnel(spark, sf_dir):
    """Stage-ordered attrition report over the composite curation gate
    — the monitoring frame every production pipeline publishes: for
    each gate in first-failing order (dup -> too_short -> repetitive),
    how many documents entered, were dropped, and survived, and how
    many tokens remain after the stage.  Invariants by construction:
    docs_in(k+1) == docs_out(k); docs_out(last) == kept docs;
    tokens_out(last) == kept tokens.

    Scale shape: ONE pass over the shared document_verdicts core (the
    oracle-checked gate), one combinable groupBy(reason) to a <=4-row
    frame, one single-row total aggregate broadcast back; the only
    window is the cumulative sum over the 3-row stage frame (same
    provably-tiny-frame precedent as global_running_offset's prefix
    window)."""
    v = document_verdicts(load(spark, sf_dir, "documents"))
    per = v.groupBy("reason").agg(
        F.count("*").alias("d"), F.sum("n_words").alias("t")
    )
    stages = v.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(CURATION_STAGES)],
        "stage_idx long, stage string",
    )
    j = stages.join(per, stages.stage == per.reason, "left").select(
        "stage_idx",
        "stage",
        F.coalesce("d", F.lit(0)).cast("long").alias("docs_dropped"),
        F.coalesce("t", F.lit(0)).cast("long").alias("dropped_tokens"),
    )
    tot = v.agg(
        F.count("*").cast("long").alias("total_docs"),
        F.sum("n_words").cast("long").alias("total_tokens"),
    )
    w = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = j.withColumn(
        "cum_d", F.sum("docs_dropped").over(w).cast("long")
    ).withColumn("cum_t", F.sum("dropped_tokens").over(w).cast("long"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "stage_idx",
            "stage",
            (F.col("total_docs") - F.col("cum_d") + F.col("docs_dropped"))
            .cast("long")
            .alias("docs_in"),
            "docs_dropped",
            (F.col("total_docs") - F.col("cum_d"))
            .cast("long")
            .alias("docs_out"),
            (F.col("total_tokens") - F.col("cum_t"))
            .cast("long")
            .alias("tokens_out"),
        )
        .orderBy("stage_idx")
    )


# --- TF-IDF top terms (two-pass aggregation + broadcast scalar) --------------

TFIDF_TOP_K = 5
TFIDF_MIN_LEN = 4


@register(
    "tfidf_top_terms",
    sql=f"""
    WITH tf AS (
      SELECT lang, w AS term, COUNT(*) AS tf FROM (
        SELECT lang,
               unnest(list_filter(string_split_regex(lower(text),
                 '{_WORD_SPLIT}'), x -> len(x) >= {TFIDF_MIN_LEN})) AS w
        FROM documents
      ) GROUP BY lang, w
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT lang) AS n_langs FROM documents
    ), scored AS (
      SELECT tf.lang, tf.term,
             CAST((tf.tf * n.n_langs * 10000) // df.df AS BIGINT)
               AS score_e4,
             ROW_NUMBER() OVER (
               PARTITION BY tf.lang
               ORDER BY (tf.tf * n.n_langs * 10000) // df.df DESC, tf.term
             ) AS rk
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT lang, term, score_e4, rk FROM scored
    WHERE rk <= {TFIDF_TOP_K}
    ORDER BY lang, rk
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-language top-k terms by tf-idf — the classic two-pass corpus
    statistic: term frequency per lang, document frequency across langs
    (lang-as-document), idf' = N/df (linear, not log: transcendental
    functions are not bit-identical across engines), score carried as
    exact integer micro-units (tf*N*10000 div df) so ranking and hashing
    are float-free.  At 100 TB: tf is one shuffle on (lang, term), df
    reuses it with a term-only shuffle, N broadcasts as a 1-row frame."""
    from pyspark.sql import Window as W

    words = F.filter(
        F.split(F.lower("text"), _WORD_SPLIT),
        lambda w: F.length(w) >= TFIDF_MIN_LEN,
    )
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("lang", F.explode(words).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.countDistinct("lang").alias("n_langs"))
    score = F.expr("div(tf * n_langs * 10000, df)")
    w = W.partitionBy("lang").orderBy(F.desc(score), "term")
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score_e4", score.cast("long"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select("lang", "term", "score_e4", "rk")
        .orderBy("lang", "rk")
    )


# --- stratified corpus rebalancing ------------------------------------------

REBALANCE_SALT = "rebal"  # hash-domain separator vs token_budget_sample
REBALANCE_CAP = 80  # target max docs per language

_REBAL_H_SPARK = (
    MD5_INT48_SPARK.format(
        x=f"concat('{REBALANCE_SALT}:', cast(doc_id as string))"
    )
    + " % 1000000"
)
_REBAL_H_DUCK = (
    MD5_INT48_DUCK.format(
        x=f"'{REBALANCE_SALT}:' || CAST(doc_id AS VARCHAR)"
    )
    + " % 1000000"
)


@register(
    "corpus_rebalance",
    sql=f"""
    WITH d AS (
      SELECT lang, doc_id, {_REBAL_H_DUCK} AS h FROM documents
    ),
    tot AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before FROM d GROUP BY lang
    ),
    r AS (
      SELECT lang, n_before,
             LEAST(CAST(1000000 AS BIGINT),
                   {REBALANCE_CAP} * 1000000 // n_before) AS rate_ppm
      FROM tot
    )
    SELECT d.lang, r.n_before, r.rate_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d JOIN r USING (lang)
    WHERE d.h < r.rate_ppm
    GROUP BY d.lang, r.n_before, r.rate_ppm
    ORDER BY d.lang
    """,
)
def corpus_rebalance(spark, sf_dir):
    """Stratified downsampling of over-represented languages: languages
    above REBALANCE_CAP docs are sampled down to ~the cap, under-
    represented ones kept whole.  The keep decision is a DETERMINISTIC
    hash threshold — md5int48('rebal:' || doc_id) % 1e6 <
    floor(CAP * 1e6 / n_lang) — not an RNG sampleBy: the sample is
    identical across engines, runs, retries, and cluster sizes, which
    is what a resumable production pipeline needs (a task retry must
    not change the corpus), and it gives this query the full
    cross-engine oracle that seeded Bernoulli sampling (per-partition
    RNG streams, partitioning-dependent) can never have.  The salt
    makes the keep-set independent of token_budget_sample's sampler.

    100 TB shape: one combinable per-lang histogram (tiny — lang
    cardinality rows after map-side partial agg), broadcast back as the
    per-lang rate; the keep pass is then a shuffle-free per-row filter.
    No driver collect anywhere."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select("lang", "doc_id", F.expr(_REBAL_H_SPARK).alias("h"))
    tot = d.groupBy("lang").agg(F.count("*").alias("n_before"))
    r = tot.select(
        "lang",
        "n_before",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(f"{REBALANCE_CAP} * 1000000 div n_before"),
        ).alias("rate_ppm"),
    )
    return (
        d.join(F.broadcast(r), "lang")
        .where(F.col("h") < F.col("rate_ppm"))
        .groupBy("lang", "n_before", "rate_ppm")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select("lang", "n_before", "rate_ppm", "n_docs")
        .orderBy("lang")
    )


# --- F16 domain-term extraction (dictionary + regex patterns) ---------------

# broadcast dictionary (config/medical_terms.yml analogue): canonical
# domain vocabulary looked up by set intersection with the doc's words
F16_TERMS = ["spark", "join", "merge", "window", "vector", "stream"]
# regex pattern bank — the reference extracts quantity patterns
# ("\d+\s*mg") and title+name patterns ("dr\.?\s+\w+"); the first entry
# is the literal reference pattern (zero hits on the synthetic corpus,
# still oracle-checked), the other two are the corpus-hitting analogues
# of the same shapes (word+unit-noun, determiner+word).
F16_PAT_QTY_REF = r"\d+\s*mg"
F16_PAT_QTY = r"\w+\s+join"
F16_PAT_TITLE = r"the\s+\w+"


@register(
    "f16_term_extraction",
    sql=f"""
    SELECT doc_id,
           len(list_intersect(
             list_distinct(list_filter(
               string_split_regex(lower(text), '{_WORD_SPLIT}'),
               w -> w <> '')),
             {F16_TERMS})) AS n_dict_terms,
           len(regexp_extract_all(text, '{F16_PAT_QTY_REF}')) AS n_ref_qty,
           len(regexp_extract_all(text, '{F16_PAT_QTY}')) AS n_qty,
           len(regexp_extract_all(text, '{F16_PAT_TITLE}')) AS n_title,
           COALESCE(array_to_string(
             list_sort(list_intersect(
               list_distinct(list_filter(
                 string_split_regex(lower(text), '{_WORD_SPLIT}'),
                 w -> w <> '')),
               {F16_TERMS})), '+'), '') AS terms_found
    FROM documents ORDER BY doc_id
    """,
)
def f16_term_extraction(spark, sf_dir):
    """F16 med-term extraction (01_qa_pipeline_evaluation cell 5
    `extract_medical_terms`, qa_pipeline_evaluator.py:322-325): per
    document, (a) dictionary containment via array_intersect with the
    broadcast term list — a broadcast join in set-function form — and
    (b) counts per regex pattern via regexp_extract_all.  All pure
    Catalyst; at 100 TB this is one scan, zero shuffles (final sort is
    presentation-only)."""
    words = F.array_distinct(
        words_expr()
    )
    terms = F.array_sort(
        F.array_intersect(words, F.array(*[F.lit(t) for t in F16_TERMS]))
    )

    def _hits(pat):
        esc = pat.replace("\\", "\\\\")
        return F.expr(f"size(regexp_extract_all(text, '{esc}', 0))")

    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(terms).alias("n_dict_terms"),
            _hits(F16_PAT_QTY_REF).alias("n_ref_qty"),
            _hits(F16_PAT_QTY).alias("n_qty"),
            _hits(F16_PAT_TITLE).alias("n_title"),
            F.array_join(terms, "+").alias("terms_found"),
        )
        .orderBy("doc_id")
    )


# --- PII scrub ---------------------------------------------------------------

# Patterns deliberately restricted to syntax with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, \b word boundaries — no lookaround, no backreferences.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def scrub_pii(docs):
    """PII detection + redaction core — the pre-training scrub stage a
    large-scale text pipeline runs before the corpus ships.  The
    synthetic corpus carries no PII, so the op DEFINES a deterministic
    augmentation (doc_id-derived emails/phones appended identically on
    both engines) and then detects and redacts it; the oracle checks
    count parity AND full redacted-string equality, which pins the
    regex semantics across engines.

    100 TB shape: pure per-row column expressions (regexp_count /
    regexp_replace inside whole-stage codegen) — no shuffle, no UDF, no
    state; the ORDER BY exists only for oracle determinism."""
    did = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" cc admin"), did.cast("string"),
                     F.lit("@corp.example.org")),
        ).otherwise(F.lit("")),
        F.lit(" or call 555-"), (did % 900 + 100).cast("string"),
        F.lit("-"),
        F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select("doc_id", pii_text.alias("pii_text"))
    return aug.select(
        "doc_id",
        F.regexp_count("pii_text", F.lit(PII_EMAIL_RE))
        .cast("long").alias("n_emails"),
        F.regexp_count("pii_text", F.lit(PII_PHONE_RE))
        .cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("pii_text", PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE, "<PHONE>",
        ).alias("clean_text"),
    ).orderBy("doc_id")


@register(
    "pii_scrub",
    sql=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com'
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' cc admin' || doc_id || '@corp.example.org'
                          ELSE '' END
                  || ' or call 555-' || (doc_id % 900 + 100) || '-'
                  || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               AS pii_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{PII_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{PII_PHONE_RE}'))
                AS BIGINT) AS n_phones,
           regexp_replace(
             regexp_replace(pii_text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g'
           ) AS clean_text
    FROM aug
    ORDER BY doc_id
    """,
)
def pii_scrub(spark, sf_dir):
    """Registry wrapper over the shared PII-scrub core."""
    return scrub_pii(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Repetition-based quality filter (Gopher-style, Rae et al. 2021 Table A1)
# ---------------------------------------------------------------------------

# word n-gram strings ('w1 w2 ... wn').  Built with transform+slice
# instead of sequence(1, size-n+1) because Spark's sequence(1, 0)
# yields the DESCENDING [1, 0], and ws[i] past the end raises under
# ANSI mode; slice() is total on both counts.  The word characters one
# occurrence covers (separators excluded) need no second fold: words
# are non-empty [a-z0-9]+ runs joined by single spaces, so
# glen == length(g) - (n - 1).
def _gram_expr(n: int) -> str:
    return f"""
      slice(
        transform(ws, (x, i) -> concat_ws(' ', slice(ws, i + 1, {n}))),
        1, greatest(size(ws) - {n} + 1, 0))
    """


_REP_WS_SPARK = f"filter(split(lower(text), '{_WORD_SPLIT}'), x -> x != '')"
# per-occurrence covered chars must agree between engines: DuckDB builds
# grams from lead() windows over the exploded word stream
_REP_WS_DUCK = (
    f"list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),"
    " x -> x != '')"
)
# Gopher drop thresholds: top 2-gram char fraction 0.20, duplicate
# 5-gram char fraction 0.15.  Applied in exact integer basis points
# (floor(chars * 10000 / word_chars), BIGINT division) — base.py's
# header documents that ROUND(double) can disagree between Spark and
# DuckDB within half an ulp of the boundary, so thresholds must never
# compare rounded doubles
REP_TOP2_MAX_BP = 2000
REP_DUP5_MAX_BP = 1500


@register(
    "quality_repetition",
    sql=f"""
    WITH ws AS (
      SELECT doc_id,
             unnest({_REP_WS_DUCK}) AS w,
             generate_subscripts({_REP_WS_DUCK}, 1) AS pos
      FROM documents
    ),
    base AS (
      -- from the word LIST, not the exploded stream: a wordless doc
      -- must still emit a row (n_words 0), matching Spark's base
      SELECT doc_id, CAST(len(wl) AS BIGINT) AS n_words,
             COALESCE(list_sum(list_transform(wl, x -> length(x))), 0)
               AS word_chars
      FROM (SELECT doc_id, {_REP_WS_DUCK} AS wl FROM documents)
    ),
    led AS (
      SELECT doc_id, w,
             lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             lead(w, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS w3,
             lead(w, 4) OVER (PARTITION BY doc_id ORDER BY pos) AS w4
      FROM ws
    ),
    bic AS (
      SELECT doc_id, w || ' ' || w1 AS g,
             length(w) + length(w1) AS glen, COUNT(*) AS c
      FROM led WHERE w1 IS NOT NULL GROUP BY 1, 2, 3
    ),
    top2 AS (
      SELECT doc_id, c AS top_bigram_count, c * glen AS top_chars
      FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
            FROM bic)
      WHERE rn = 1
    ),
    fic AS (
      SELECT doc_id,
             w || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4 AS g,
             length(w) + length(w1) + length(w2) + length(w3)
               + length(w4) AS glen,
             COUNT(*) AS c
      FROM led WHERE w4 IS NOT NULL GROUP BY 1, 2, 3
    ),
    dup5 AS (
      SELECT doc_id,
             SUM(CASE WHEN c > 1 THEN c * glen ELSE 0 END) AS dup_chars
      FROM fic GROUP BY doc_id
    )
    SELECT doc_id, n_words, top_bigram_count,
           top_bp / 10000.0 AS top_bigram_frac,
           dup_bp / 10000.0 AS dup_5gram_frac,
           (top_bp >= {REP_TOP2_MAX_BP} OR dup_bp >= {REP_DUP5_MAX_BP})
             AS repetitive
    FROM (
      SELECT b.doc_id,
             CAST(b.n_words AS BIGINT) AS n_words,
             CAST(COALESCE(t.top_bigram_count, 0) AS BIGINT)
               AS top_bigram_count,
             CASE WHEN b.word_chars > 0
                  THEN (COALESCE(t.top_chars, 0) * 10000) // b.word_chars
                  ELSE 0 END AS top_bp,
             CASE WHEN b.word_chars > 0
                  THEN (COALESCE(d.dup_chars, 0) * 10000) // b.word_chars
                  ELSE 0 END AS dup_bp
      FROM base b
      LEFT JOIN top2 t USING (doc_id)
      LEFT JOIN dup5 d USING (doc_id)
    )
    ORDER BY doc_id
    """,
)
def quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality filter (Rae et al. 2021, Table A1
    of the Gopher paper; the reference's cleanup QA has no corpus-level
    analogue — this is a training-data-pipeline op): per document, the
    character fraction covered by the most frequent word 2-gram and by
    all duplicated word 5-grams, with the published drop thresholds
    (0.20 / 0.15).  Both fractions are over word characters (separators
    excluded), computed from the same lowercased [^a-z0-9]+ split as the
    tokenizer family.

    Scale shape: SINGLE scan of (doc_id, text), everything per-doc and
    array-side — grams are a narrow transform, duplicate counting is a
    run-length walk over the array_sort()ed gram list, so the whole
    query is shuffle-free except the presentation-order sort.  Both
    metrics are per-document, so no groupBy is ever needed; at 100 TB
    the job is embarrassingly parallel like the extraction path."""
    return repetition_metrics(load(spark, sf_dir, "documents"))


# run-length walks over array_sort()ed gram-string lists.  Accumulator
# fields: pg/pl = current run's gram text and its per-occurrence word
# chars (length(g) - (n-1) separators), run = current run length;
# comparing x = a.pg with pg NULL (the seed) is NULL, so the first
# element always takes the ELSE branch.  Ties on run length keep the
# FIRST (lexicographically smallest) gram because the update requires
# strictly-greater — i.e. argmax by (count desc, gram asc), mirroring
# the oracle's row_number order.
_TOP_RUN_EXPR = """
  aggregate(
    array_sort({arr}),
    named_struct('pg', CAST(NULL AS STRING), 'pl', 0, 'run', 0,
                 'maxc', 0, 'bestlen', 0),
    (a, x) -> CASE WHEN x = a.pg THEN
        named_struct('pg', a.pg, 'pl', a.pl, 'run', a.run + 1,
                     'maxc', a.maxc, 'bestlen', a.bestlen)
      ELSE
        named_struct('pg', x, 'pl', length(x) - {sep}, 'run', 1,
          'maxc', CASE WHEN a.run > a.maxc THEN a.run ELSE a.maxc END,
          'bestlen', CASE WHEN a.run > a.maxc THEN a.pl
                          ELSE a.bestlen END)
      END,
    a -> named_struct(
      'c', CASE WHEN a.run > a.maxc THEN a.run ELSE a.maxc END,
      'glen', CASE WHEN a.run > a.maxc THEN a.pl ELSE a.bestlen END))
"""

_DUP_RUN_EXPR = """
  aggregate(
    array_sort({arr}),
    named_struct('pg', CAST(NULL AS STRING), 'pl', 0, 'run', 0,
                 'dup', 0L),
    (a, x) -> CASE WHEN x = a.pg THEN
        named_struct('pg', a.pg, 'pl', a.pl, 'run', a.run + 1,
                     'dup', a.dup)
      ELSE
        named_struct('pg', x, 'pl', length(x) - {sep}, 'run', 1,
          'dup', a.dup + CASE WHEN a.run > 1
                              THEN CAST(a.run AS BIGINT) * a.pl
                              ELSE 0L END)
      END,
    a -> a.dup + CASE WHEN a.run > 1
                      THEN CAST(a.run AS BIGINT) * a.pl ELSE 0L END)
"""


def repetition_metrics(raw_docs):
    """Shared core for quality_repetition: (doc_id, text) frame in,
    per-doc repetition metrics + drop flag out (schema in the registry
    docstring).  Wordless docs get 0.0 fractions, not NULL.

    Pure per-row Catalyst: one projection computes word stats, the top
    bigram (count + covered chars) and the duplicated-5-gram chars from
    sorted gram arrays — no explode, no groupBy, no join.  Fractions
    and the drop flag derive from exact integer basis points (BIGINT
    floor division), so the engines can never disagree at a threshold
    boundary; the reported doubles are bp/10000.0, identical IEEE
    results in both engines."""
    docs = raw_docs.select("doc_id", F.expr(_REP_WS_SPARK).alias("ws"))
    per_doc = docs.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.expr("aggregate(ws, 0L, (a, y) -> a + length(y))")
        .alias("word_chars"),
        F.expr(
            _TOP_RUN_EXPR.format(arr=_gram_expr(2), sep=1)
        ).alias("t2"),
        F.expr(
            _DUP_RUN_EXPR.format(arr=_gram_expr(5), sep=4)
        ).alias("dup_chars"),
    )
    bp = per_doc.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("t2.c").cast("long").alias("top_bigram_count"),
        F.expr(
            "CASE WHEN word_chars > 0 THEN "
            "(CAST(t2.c AS BIGINT) * t2.glen * 10000) DIV word_chars "
            "ELSE 0L END"
        ).alias("top_bp"),
        F.expr(
            "CASE WHEN word_chars > 0 THEN "
            "(dup_chars * 10000) DIV word_chars ELSE 0L END"
        ).alias("dup_bp"),
    )
    return bp.select(
        "doc_id",
        "n_words",
        "top_bigram_count",
        (F.col("top_bp") / F.lit(10000.0)).alias("top_bigram_frac"),
        (F.col("dup_bp") / F.lit(10000.0)).alias("dup_5gram_frac"),
        (
            (F.col("top_bp") >= F.lit(REP_TOP2_MAX_BP))
            | (F.col("dup_bp") >= F.lit(REP_DUP5_MAX_BP))
        ).alias("repetitive"),
    ).orderBy("doc_id")


# --- corpus-trained bigram LM scoring ----------------------------------------
#
# CCNet buckets documents by the perplexity of a KenLM 5-gram model; the
# Spark-native analogue trains the LM ON the corpus ITSELF in one pass
# (bigram + context counts are combinable groupBys) and scores each
# document by its mean bigram conditional probability.  The score is the
# integer-exact ppm form of avg P(w_i | w_{i-1}) — monotone in the
# geometric/arithmetic LM quality signal without transcendental log(),
# whose last-ulp differences between JVM and C libm would break the
# cross-engine hash (base.py discipline).


_LM_SQL = f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                         x -> x <> '') AS words
      FROM documents
    ),
    bo AS (
      SELECT doc_id,
             unnest([ words[i] FOR i IN range(1, len(words)) ]) AS w1,
             unnest([ words[i] || ' ' || words[i+1]
                      FOR i IN range(1, len(words)) ]) AS bg
      FROM w
    ),
    bc AS ( SELECT bg, COUNT(*) AS cb FROM bo GROUP BY bg ),
    cc AS ( SELECT w1, COUNT(*) AS cw FROM bo GROUP BY w1 ),
    sc AS (
      SELECT bo.doc_id, (1000000 * cb) // cw AS p_ppm
      FROM bo JOIN bc USING (bg) JOIN cc USING (w1)
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(p_ppm) AS BIGINT) AS s
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
                ELSE s // n_bigrams END AS BIGINT) AS lm_score_ppm
    FROM documents d LEFT JOIN agg USING (doc_id)
"""


@register("ngram_lm_score", sql=_LM_SQL + " ORDER BY doc_id")
def ngram_lm_score(spark, sf_dir):
    """Per-document mean bigram conditional probability (ppm) under the
    corpus's own bigram LM: score = avg_i 1e6 * c(w_{i-1} w_i) /
    c_ctx(w_{i-1}), exact integer arithmetic end to end.  High score =
    predictable in-distribution text; the low tail is the gibberish /
    boilerplate-noise cut, the CCNet tail bucket.

    Scale shape: bigram and context counts are combinable groupBys over
    the one-row-per-token bigram frame (linear); scoring joins that
    frame back on the bigram key and the context key — equi-join
    shuffles on real keys.  At 100 TB the LM tables are themselves
    distributed tables (never collected); a production variant would
    frequency-floor the bigram table to bound its size, exactly like
    KenLM pruning."""
    return lm_doc_scores(
        load(spark, sf_dir, "documents")).orderBy("doc_id")


def lm_doc_scores(docs):
    """Shared core: (doc_id, n_bigrams, lm_score_ppm) frame for any
    (doc_id, text) input — consumed by ngram_lm_score and
    lm_perplexity_buckets."""
    words = words_expr()
    bo = (
        fanout(docs, "doc_id")
        .select("doc_id", words.alias("words"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("words") >= 2,
                    F.expr(
                        """transform(sequence(0, size(words) - 2),
                             i -> struct(words[i] AS w1,
                                         concat(words[i], ' ', words[i+1])
                                           AS bg))"""
                    ),
                ).otherwise(
                    F.expr(
                        "cast(array() as array<struct<w1:string,bg:string>>)")
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.bg")
    )
    bc = bo.groupBy("bg").agg(F.count("*").alias("cb"))
    ctx = bo.groupBy("w1").agg(F.count("*").alias("cw"))
    agg = (
        bo.join(bc, "bg")
        .join(ctx, "w1")
        .select("doc_id", F.expr("(1000000 * cb) div cw").alias("p_ppm"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("p_ppm").alias("s"))
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0,
                   F.lit(0).cast("long"))
            .otherwise(F.expr("s div n_bigrams"))
            .alias("lm_score_ppm"),
        )
    )


@register(
    "lm_perplexity_buckets",
    sql=f"""
    WITH lm AS ({_LM_SQL}),
    j AS (
      SELECT lm.doc_id, d.lang, lm.lm_score_ppm
      FROM lm JOIN documents d USING (doc_id)
    ),
    cuts AS (
      SELECT lang,
             quantile_cont(lm_score_ppm, 1.0/3) AS p33,
             quantile_cont(lm_score_ppm, 2.0/3) AS p66
      FROM j GROUP BY lang
    )
    SELECT j.doc_id, j.lang, j.lm_score_ppm,
           CASE WHEN j.lm_score_ppm <= c.p33 THEN 'tail'
                WHEN j.lm_score_ppm <= c.p66 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM j JOIN cuts c USING (lang)
    ORDER BY j.doc_id
    """,
)
def lm_perplexity_buckets(spark, sf_dir):
    """The FULL CCNet §3.3 pipeline with its actual signal: per-language
    head/middle/tail buckets cut on LANGUAGE-MODEL score tertiles
    (ccnet_buckets uses the classifier score; this uses the corpus-
    trained bigram LM from lm_doc_scores — high mean conditional
    probability = low perplexity = head).  Value-based cutoffs, exact
    integer scores, same interpolated-percentile discipline as
    ccnet_buckets (bit-identical IEEE ops over the same sorted ints).

    Scale shape: LM scoring is the documented ngram_lm_score plan; the
    cutoff frame is one row per language broadcast back; the bucket tag
    is a shuffle-free per-row CASE."""
    docs = load(spark, sf_dir, "documents")
    j = (
        lm_doc_scores(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "lm_score_ppm")
        .persist()
    )
    cuts = j.groupBy("lang").agg(
        F.expr("percentile(lm_score_ppm, 1D/3)").alias("p33"),
        F.expr("percentile(lm_score_ppm, 2D/3)").alias("p66"),
    )
    return (
        j.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "lm_score_ppm",
            F.when(F.col("lm_score_ppm") <= F.col("p33"), F.lit("tail"))
            .when(F.col("lm_score_ppm") <= F.col("p66"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --- interpolated Kneser-Ney bigram LM ---------------------------------------
#
# The published smoothing CCNet's KenLM actually ships (Kneser-Ney with
# absolute discounting) on top of the corpus-trained bigram LM above:
#
#   P_KN(w | u) = max(c(uw) - D, 0) / c(u.)  +  lambda(u) * P_cont(w)
#   lambda(u)   = D * N1+(u.) / c(u.)
#   P_cont(w)   = N1+(.w) / N1+(..)
#
# With D = 3/4 every quantity is rational with denominator 4, so the
# whole formula stays in exact BIGINT ppm (the ngram_lm_score
# discipline — no transcendental log(), no float division whose
# JVM-vs-libm last-ulp drift would break the cross-engine hash).  The
# two interpolation terms floor-divide SEPARATELY (documented: keeps
# every intermediate under 4e12 * N1+ ~ well inside int64 even at a
# 1e6-type vocabulary; the combined-fraction form would need
# 1e6 * 4*c * Ntypes, which overflows at web scale).

_KN_SQL = f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_WORD_SPLIT}'),
                         x -> x <> '') AS words
      FROM documents
    ),
    bo AS (
      SELECT doc_id,
             unnest([ words[i] FOR i IN range(1, len(words)) ]) AS w1,
             unnest([ words[i+1] FOR i IN range(1, len(words)) ]) AS w2
      FROM w
    ),
    bc AS ( SELECT w1, w2, COUNT(*) AS cb FROM bo GROUP BY w1, w2 ),
    ctx AS ( SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw,
                    COUNT(*) AS n1f
             FROM bc GROUP BY w1 ),
    rev AS ( SELECT w2, COUNT(*) AS n1r FROM bc GROUP BY w2 ),
    nt AS ( SELECT COUNT(*) AS ntypes FROM bc ),
    sc AS (
      SELECT bo.doc_id,
             (1000000 * greatest(4 * cb - 3, 0)) // (4 * cw)
             + (1000000 * 3 * n1f * n1r) // (4 * cw * ntypes) AS p_ppm
      FROM bo JOIN bc USING (w1, w2) JOIN ctx USING (w1)
              JOIN rev USING (w2) CROSS JOIN nt
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(p_ppm) AS BIGINT) AS s
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
                ELSE s // n_bigrams END AS BIGINT) AS kn_score_ppm
    FROM documents d LEFT JOIN agg USING (doc_id)
    ORDER BY d.doc_id
"""


@register("lm_kneser_ney", sql=_KN_SQL)
def lm_kneser_ney(spark, sf_dir):
    """Per-document mean interpolated Kneser-Ney bigram probability
    (ppm, D=3/4) under the corpus's own LM — the smoothing KenLM uses
    in the CCNet pipeline, vs ngram_lm_score's unsmoothed MLE.  The
    continuation term rewards words seen after MANY distinct contexts
    (the classic "san francisco" correction: "francisco" is frequent
    but follows only "san", so its continuation probability is low).

    Scale shape: the LM tables are three combinable groupBys over the
    one-row-per-token bigram frame (bigram types, per-context totals +
    distinct-continuation counts, distinct-left-context counts) plus a
    1-row type-count frame; scoring equi-joins those tables back on
    real keys (w1, w2) and cross-joins the 1-row frame (broadcast).
    Nothing is collected; at 100 TB the LM tables are distributed
    tables exactly like ngram_lm_score's, and a production variant
    frequency-floors bc like KenLM pruning.  Exact integer ppm end to
    end; reference analogue: the reference scores extraction quality
    per page (qa_pipeline_evaluator.py) — this is the corpus-level
    form a training pipeline gates on."""
    return kn_doc_scores(
        load(spark, sf_dir, "documents")).orderBy("doc_id")


def kn_doc_scores(docs):
    """Shared core: (doc_id, n_bigrams, kn_score_ppm) under the
    interpolated Kneser-Ney bigram LM trained on `docs` itself."""
    words = words_expr()
    bo = (
        fanout(docs, "doc_id")
        .select("doc_id", words.alias("words"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("words") >= 2,
                    F.expr(
                        """transform(sequence(0, size(words) - 2),
                             i -> struct(words[i] AS w1,
                                         words[i+1] AS w2))"""
                    ),
                ).otherwise(
                    F.expr(
                        "cast(array() as array<struct<w1:string,w2:string>>)")
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bc = bo.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx = bc.groupBy("w1").agg(
        F.sum("cb").alias("cw"), F.count("*").alias("n1f"))
    rev = bc.groupBy("w2").agg(F.count("*").alias("n1r"))
    nt = bc.agg(F.count("*").alias("ntypes"))
    sc = (
        bo.join(bc, ["w1", "w2"])
        .join(ctx, "w1")
        .join(rev, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id",
            F.expr(
                "(1000000 * greatest(4 * cb - 3, 0L)) div (4 * cw)"
                " + (1000000 * 3 * n1f * n1r) div (4 * cw * ntypes)"
            ).alias("p_ppm"),
        )
    )
    agg = sc.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("p_ppm").alias("s"))
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0,
                   F.lit(0).cast("long"))
            .otherwise(F.expr("s div n_bigrams"))
            .alias("kn_score_ppm"),
        )
    )


# --- PMI collocations ---------------------------------------------------------
# Pointwise-mutual-information bigram extraction (the collocation pass a
# tokenizer/vocab pipeline runs to find multi-word units worth merging):
#   PMI(a,b) = log P(ab) / (P(a) P(b))
#            = log c_ab * N_uni^2 / (c_a * c_b * N_bi)
# Ranking needs only the RATIO, so the score is the log-free integer
#   pmi_ratio_x1e6 = ((c_ab*1000 div c_a) * N_uni div c_b) * 1000 div N_bi
# — three chained BIGINT floor-divisions, identical in both engines, with
# every intermediate bounded by 1e6 * N_uni (safe to ~9e12 total tokens;
# past that, scale the two 1000 factors down).  Truncation changes the
# absolute score, not the engine agreement; ties break on the bigram.
_PMI_MIN_COUNT = 5
_PMI_TOPK = 30


@register(
    "pmi_bigrams",
    sql=f"""
    WITH w AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> '') AS words
      FROM documents
    ), uni AS (
      SELECT unnest(words) AS w FROM w
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), bi AS (
      SELECT unnest([words[i + 1] || ' ' || words[i + 2]
                     FOR i IN range(0, len(words) - 1)]) AS bg
      FROM w WHERE len(words) >= 2
    ), bcnt AS (
      SELECT bg, COUNT(*) AS c_ab FROM bi GROUP BY bg
    ), tot AS (
      SELECT (SELECT SUM(c) FROM ucnt) AS n_uni,
             (SELECT SUM(c_ab) FROM bcnt) AS n_bi
    )
    SELECT b.bg AS bigram, b.c_ab, a.c AS c_a, c.c AS c_b,
           ((b.c_ab * 1000 // a.c) * CAST(t.n_uni AS BIGINT) // c.c) * 1000
             // CAST(t.n_bi AS BIGINT) AS pmi_ratio_x1e6
    FROM bcnt b
    JOIN ucnt a ON a.w = string_split(b.bg, ' ')[1]
    JOIN ucnt c ON c.w = string_split(b.bg, ' ')[2]
    CROSS JOIN tot t
    WHERE b.c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi_ratio_x1e6 DESC, bigram
    LIMIT {_PMI_TOPK}
    """,
)
def pmi_bigrams(spark, sf_dir):
    """Top-30 PMI-ranked bigram collocations over the corpus word stream
    (min count 5), with the log-free exact-integer ratio score above.

    100 TB shape: unigram and bigram counts are combinable groupBys over
    the exploded streams; the two totals are 1-row aggregates broadcast
    back; the c_a/c_b lookups are joins of the K surviving bigrams (after
    the min-count filter, a tiny fraction) against the unigram count
    table — never a join of the raw token stream against itself."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", words_expr().alias("words")
    )
    uni = docs.select(F.explode("words").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    bi = docs.where(F.size("words") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("words") - 2),
                lambda i: F.concat(
                    F.element_at("words", i + 1),
                    F.lit(" "),
                    F.element_at("words", i + 2),
                ),
            )
        ).alias("bg")
    )
    bcnt = (
        bi.groupBy("bg")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    tot = uni.agg(F.count("*").alias("n_uni")).crossJoin(
        bi.agg(F.count("*").alias("n_bi"))
    )
    left = F.split(F.col("bg"), " ").getItem(0)
    right = F.split(F.col("bg"), " ").getItem(1)
    keyed = bcnt.withColumn("w_a", left).withColumn("w_b", right)
    scored = (
        keyed.join(ucnt.select(F.col("w").alias("w_a"), F.col("c").alias("c_a")), "w_a")
        .join(ucnt.select(F.col("w").alias("w_b"), F.col("c").alias("c_b")), "w_b")
        .crossJoin(F.broadcast(tot))
    )
    return (
        scored.select(
            F.col("bg").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "((c_ab * 1000 div c_a) * n_uni div c_b) * 1000 div n_bi"
            ).alias("pmi_ratio_x1e6"),
        )
        .orderBy(F.desc("pmi_ratio_x1e6"), "bigram")
        .limit(_PMI_TOPK)
    )


# --- length-distribution quantile sketch -------------------------------------
# The histogram-sketch replacement for "sort 100 TB to get P99": doc
# lengths bucket into log2 bins (a combinable (lang, bin) count), and
# quantiles read off the cumulative bin table (≤ ~48 rows per lang).
# The exact rank-selected quantiles ride along for error inspection,
# the same exact-next-to-sketch discipline as sketch_hll_distinct.

QSKETCH_QS = (50, 90, 99)


@register(
    "length_quantile_sketch",
    sql=f"""
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{_WORD_SPLIT}'),
               x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ), b AS (
      SELECT lang, CAST(length(ltrim(bin(nt), '0')) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM d GROUP BY lang, bin
    ), cum AS (
      SELECT lang, bin, c,
             SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS n_docs
      FROM b
    ), sk AS (
      SELECT lang, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
             {", ".join(
                 f'''CAST(MIN(CASE WHEN cum * 100 >= {q} * n_docs
                       THEN bin END) AS BIGINT) AS p{q}_bin'''
                 for q in QSKETCH_QS)}
      FROM cum GROUP BY lang
    ), ranked AS (
      SELECT lang, nt,
             row_number() OVER (PARTITION BY lang ORDER BY nt) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM d
    ), exact AS (
      SELECT lang,
             {", ".join(
                 f'''CAST(MIN(CASE WHEN rk * 100 >= {q} * n
                       THEN nt END) AS BIGINT) AS p{q}_exact'''
                 for q in QSKETCH_QS)}
      FROM ranked GROUP BY lang
    )
    SELECT s.lang, s.n_docs,
           {", ".join(
               f"s.p{q}_bin, "
               f"(CAST(1 AS BIGINT) << p{q}_bin) - 1 AS p{q}_hi, "
               f"e.p{q}_exact"
               for q in QSKETCH_QS)}
    FROM sk s JOIN exact e ON s.lang = e.lang
    ORDER BY s.lang
    """,
)
def length_quantile_sketch(spark, sf_dir):
    """Per-language P50/P90/P99 of document word counts, twice: the
    log2-bin HISTOGRAM SKETCH (quantile = first bin whose cumulative
    count crosses the rank; upper bound 2^bin - 1) and the EXACT
    rank-selected value for error inspection.  Pure integer math ->
    exact cross-engine oracle (the crossing test is cum*100 >= q*n,
    never a float quantile function, whose interpolation rules differ
    between engines).

    100 TB shape: the sketch path is ONE combinable (lang, bin) count —
    the bin table is ≤ ~48 rows per language, so the cumulative window
    runs over the aggregate, not the data; this is how length
    dashboards avoid sorting the corpus.  The exact path's per-lang
    row_number IS the full sort (megalanguage window) — it rides along
    here as the sketch's error oracle, exactly like n_exact in
    sketch_hll_distinct, and is the thing you'd drop first at scale."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select(
        "lang", F.size(words_expr()).cast("long").alias("nt")
    )
    bin_expr = F.length(
        F.regexp_replace(F.bin(F.col("nt")), "^0+", "")
    ).cast("long")
    b = (
        d.select("lang", bin_expr.alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("c"))
    )
    wcum = W.partitionBy("lang").orderBy("bin")
    wall = W.partitionBy("lang")
    cum = b.select(
        "lang",
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n_docs"),
    )
    sk = cum.groupBy("lang").agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        *[
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(q) * F.col("n_docs"),
                    F.col("bin"),
                )
            )
            .cast("long")
            .alias(f"p{q}_bin")
            for q in QSKETCH_QS
        ],
    )
    wrk = W.partitionBy("lang").orderBy("nt")
    ranked = d.select(
        "lang",
        "nt",
        F.row_number().over(wrk).alias("rk"),
        F.count("*").over(wall).alias("n"),
    )
    exact = ranked.groupBy("lang").agg(
        *[
            F.min(
                F.when(
                    F.col("rk") * 100 >= F.lit(q) * F.col("n"), F.col("nt")
                )
            )
            .cast("long")
            .alias(f"p{q}_exact")
            for q in QSKETCH_QS
        ]
    )
    cols = ["lang", "n_docs"]
    sel = [F.col("lang"), F.col("n_docs")]
    for q in QSKETCH_QS:
        sel.append(F.col(f"p{q}_bin"))
        sel.append(
            F.expr(f"shiftleft(cast(1 as bigint), p{q}_bin) - 1").alias(
                f"p{q}_hi"
            )
        )
        sel.append(F.col(f"p{q}_exact"))
    return sk.join(exact, "lang").select(*sel).orderBy("lang")


# --- closed-form OLS from combinable sums -------------------------------------
# The "ML-lite" aggregate every metrics pipeline wants (trend lines,
# drift monitors): simple linear regression computed EXACTLY from five
# combinable sums — slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — no
# iteration, no solver, one shuffle of a handful of rows per group.
# Integer inputs keep the sums BIGINT-exact; the two final divisions
# are single double ops on bit-identical operands, reported in ppm via
# floor so the oracle hash-matches.


@register(
    "ols_chars_vs_words",
    sql=f"""
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(
               string_split_regex(lower(coalesce(text, '')), '{_WORD_SPLIT}'),
               x -> x <> '')) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ), s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM d GROUP BY lang
    )
    , m AS (
      SELECT lang, n,
             CAST(n AS HUGEINT) * sxy
               - CAST(sx AS HUGEINT) * sy AS cov,
             CAST(n AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sx AS vx,
             CAST(n AS HUGEINT) * syy
               - CAST(sy AS HUGEINT) * sy AS vy,
             CAST(sy AS HUGEINT) * sxx
               - CAST(sx AS HUGEINT) * sxy AS icept_num
      FROM s
    )
    SELECT lang, n,
           CAST(FLOOR(CAST(cov AS DOUBLE) * 1000000.0
                      / CAST(vx AS DOUBLE)) AS BIGINT) AS slope_ppm,
           CAST(FLOOR(CAST(icept_num AS DOUBLE) * 1000000.0
                      / CAST(vx AS DOUBLE)) AS BIGINT)
             AS intercept_e6,
           CAST(FLOOR(
             CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE) * 1000000.0
             / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
           ) AS BIGINT) AS r2_ppm
    FROM m
    WHERE vx > 0 AND vy > 0
    ORDER BY lang
    """,
)
def ols_chars_vs_words(spark, sf_dir):
    """Per-language simple linear regression of n_chars on word count,
    closed-form from five combinable BIGINT sums (n, Sx, Sy, Sxx, Sxy,
    plus Syy for R^2): slope and intercept in exact floor-ppm, R^2 in
    ppm.  Degenerate groups (zero variance in x or y) are excluded by
    the same predicate in both engines.

    100 TB shape: ONE combinable groupBy — the five sums partial-
    aggregate map-side and reduce to one row per group; the regression
    itself is arithmetic on that row.  This is how drift/trend monitors
    fit lines over petabytes without a solver; for multiple regression
    the same trick ships X'X (k^2 combinable sums) to the driver."""
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(words_expr()).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # DECIMAL(38,0) moments (HUGEINT in the oracle): n * Syy with
    # y = n_chars passes BIGINT range around a per-group ~2e7 x 9e4
    # second moment — the corr_frame overflow family (x4096 scaling
    # capture); the decimal holds the integers exactly, so the final
    # double expressions stay operand-identical cross-engine.
    def _d(c):
        return F.col(c).cast("decimal(38,0)")

    vx = _d("n") * _d("sxx") - _d("sx") * _d("sx")
    vy = _d("n") * _d("syy") - _d("sy") * _d("sy")
    cov = _d("n") * _d("sxy") - _d("sx") * _d("sy")
    return (
        s.where((vx > 0) & (vy > 0))
        .select(
            "lang",
            "n",
            F.floor(cov.cast("double") * 1000000.0 / vx.cast("double"))
            .cast("long").alias("slope_ppm"),
            F.floor(
                (_d("sy") * _d("sxx") - _d("sx") * _d("sxy"))
                .cast("double")
                * 1000000.0
                / vx.cast("double")
            )
            .cast("long")
            .alias("intercept_e6"),
            F.floor(
                cov.cast("double")
                * cov.cast("double")
                * 1000000.0
                / (vx.cast("double") * vy.cast("double"))
            )
            .cast("long")
            .alias("r2_ppm"),
        )
        .orderBy("lang")
    )


# --- classifier evaluation of the language-ID heuristic ----------------------
# The standard supervised-eval table over the langid confusion matrix:
# per-class precision / recall / F1 plus overall accuracy and Cohen's
# kappa — every metric a RATIONAL in the confusion counts (F1 denominator
# is row_total + col_total = 2tp + fp + fn), so the whole frame is
# integer-exact; kappa's numerator can be negative, so it goes through
# the identical-operand double FLOOR instead of integer division
# (integer division of negatives truncates differently across engines).


@register(
    "langid_eval",
    sql=f"""
    WITH tri AS (
      SELECT lang AS true_lang, {_tri_sql_duck("lower(text)")} AS tri
      FROM documents
    ), scored AS (
      SELECT true_lang, {_LANGID_DUCK_SCORES} FROM tri
    ),
    conf AS (
      SELECT true_lang, {_LANGID_DUCK_WINNER} AS pred_lang,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM scored GROUP BY true_lang, pred_lang
    ),
    labels AS (
      SELECT true_lang AS label FROM conf
      UNION SELECT pred_lang FROM conf
    ),
    rowt AS (SELECT true_lang AS label, SUM(n) AS row_n
             FROM conf GROUP BY true_lang),
    colt AS (SELECT pred_lang AS label, SUM(n) AS col_n
             FROM conf GROUP BY pred_lang),
    diag AS (SELECT true_lang AS label, SUM(n) AS tp
             FROM conf WHERE true_lang = pred_lang GROUP BY true_lang),
    tot AS (SELECT SUM(n) AS nn FROM conf),
    agree AS (SELECT CAST(COALESCE(SUM(tp), 0) AS BIGINT) AS stp FROM diag),
    pe AS (
      SELECT CAST(SUM(COALESCE(r.row_n, 0) * COALESCE(c.col_n, 0))
        AS BIGINT) AS spe
      FROM labels l
      LEFT JOIN rowt r ON r.label = l.label
      LEFT JOIN colt c ON c.label = l.label
    )
    SELECT l.label,
           CAST(COALESCE(d.tp, 0) AS BIGINT) AS tp,
           CAST(COALESCE(c.col_n, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fp,
           CAST(COALESCE(r.row_n, 0) - COALESCE(d.tp, 0) AS BIGINT) AS fn,
           CAST(CASE WHEN COALESCE(c.col_n, 0) > 0
             THEN COALESCE(d.tp, 0) * 1000000 // c.col_n
             ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN COALESCE(r.row_n, 0) > 0
             THEN COALESCE(d.tp, 0) * 1000000 // r.row_n
             ELSE 0 END AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN COALESCE(r.row_n, 0) + COALESCE(c.col_n, 0) > 0
             THEN 2 * COALESCE(d.tp, 0) * 1000000
                  // (COALESCE(r.row_n, 0) + COALESCE(c.col_n, 0))
             ELSE 0 END AS BIGINT) AS f1_ppm,
           CAST(agree.stp * 1000000 // tot.nn AS BIGINT) AS accuracy_ppm,
           CAST(CASE WHEN tot.nn * tot.nn = pe.spe THEN 0
             ELSE FLOOR((tot.nn * agree.stp - pe.spe) * 1000000.0
                        / (tot.nn * tot.nn - pe.spe))
             END AS BIGINT) AS kappa_ppm
    FROM labels l
    LEFT JOIN rowt r ON r.label = l.label
    LEFT JOIN colt c ON c.label = l.label
    LEFT JOIN diag d ON d.label = l.label, tot, agree, pe
    ORDER BY l.label
    """,
)
def langid_eval(spark, sf_dir):
    """Supervised evaluation of the langid_ngram classifier against the
    gold lang column: per-class tp/fp/fn with precision / recall / F1
    in exact integer-division ppm, plus overall accuracy and Cohen's
    kappa = (N*sum_tp - sum_c row_c*col_c) / (N^2 - sum_c row_c*col_c)
    repeated on every row — kappa is the chance-corrected agreement a
    class-imbalanced eval must report next to raw accuracy.  Kappa can
    be negative, so it is floored through the identical-operand double
    path; everything else is non-negative integer division.

    100 TB shape: ONE combinable confusion groupBy collapses the corpus
    to |labels|^2 rows — a bounded frame BY CONSTRUCTION (label
    cardinality, not corpus size) — which is collected and finished
    driver-side: metric arithmetic over <= |labels|^2 integers is the
    textbook bounded-collect (the kmeans/bpe precedent), and doing it
    distributed costs ~8 extra query stages of fixed AQE latency for
    zero scalability gain.  The N^2 kappa products exceed BIGINT at
    10^12 docs; Python integers are arbitrary-precision, so the
    driver-side form is exact at any scale (the final kappa floor goes
    through the same IEEE-double expression as the oracle)."""
    conf_rows = (
        _langid_pred_frame(load(spark, sf_dir, "documents"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()  # bounded: |labels|^2 rows
    )
    conf = {(r.true_lang, r.pred_lang): r.n for r in conf_rows}
    labels = sorted({t for t, _ in conf} | {p for _, p in conf})
    row_n = {
        L: sum(n for (t, _), n in conf.items() if t == L) for L in labels
    }
    col_n = {
        L: sum(n for (_, p), n in conf.items() if p == L) for L in labels
    }
    tp = {L: conf.get((L, L), 0) for L in labels}
    nn = sum(conf.values())
    stp = sum(tp.values())
    spe = sum(row_n[L] * col_n[L] for L in labels)
    import math as _m

    acc = stp * 1_000_000 // nn
    kappa = (
        0
        if nn * nn == spe
        else _m.floor((nn * stp - spe) * 1000000.0 / (nn * nn - spe))
    )
    out = [
        (
            L,
            tp[L],
            col_n[L] - tp[L],
            row_n[L] - tp[L],
            tp[L] * 1_000_000 // col_n[L] if col_n[L] else 0,
            tp[L] * 1_000_000 // row_n[L] if row_n[L] else 0,
            2 * tp[L] * 1_000_000 // (row_n[L] + col_n[L])
            if row_n[L] + col_n[L]
            else 0,
            acc,
            kappa,
        )
        for L in labels
    ]
    return spark.createDataFrame(
        out,
        "label string, tp long, fp long, fn long, precision_ppm long,"
        " recall_ppm long, f1_ppm long, accuracy_ppm long, kappa_ppm long",
    ).orderBy("label")


# --- head-coverage curve of the token distribution ---------------------------
# "What share of all token occurrences do the top-k words cover?" — the
# Zipf head summary a tokenizer/stopword decision reads.  Exact: counts
# are BIGINT, the cumulative share is an integer division, and the
# running sum lives on the top-k rows only (the TakeOrdered output),
# never the full vocabulary.

HEAD_COVERAGE_K = 20


@register(
    "token_head_coverage",
    sql=f"""
    WITH w AS (
      SELECT unnest(list_filter(
        string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
        x -> x <> '')) AS word
      FROM documents
    ),
    c AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY word
    ),
    t AS (SELECT SUM(cnt) AS tot FROM c),
    top AS (
      SELECT word, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rk
      FROM c ORDER BY cnt DESC, word LIMIT {HEAD_COVERAGE_K}
    )
    SELECT rk, word, cnt,
           CAST(SUM(cnt) OVER (ORDER BY rk) AS BIGINT) AS cum_cnt,
           CAST(SUM(cnt) OVER (ORDER BY rk) * 1000000 // t.tot AS BIGINT)
             AS cum_share_ppm
    FROM top, t ORDER BY rk
    """,
)
def token_head_coverage(spark, sf_dir):
    """Top-20 words by corpus frequency with their cumulative
    occurrence share in exact integer-division ppm — the Zipf-head
    table behind stopword lists and tokenizer vocab budgeting.

    100 TB shape: one combinable word count, a 1-row total broadcast,
    the global top-k via TakeOrdered (per-partition top-k + driver
    merge, no global sort), and the cumulative window runs over the
    K-row result only."""
    return head_coverage_frame(load(spark, sf_dir, "documents"))


def head_coverage_frame(docs):
    """Frame-level core of token_head_coverage (job_monitor)."""
    c = (
        docs.select(F.explode(words_expr()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        # consumed twice (grand total + top-k): without the persist
        # each consumer re-runs the corpus tokenize.  |vocab| rows.
        .persist()
    )
    t = c.agg(F.sum("cnt").alias("tot"))
    top = (
        c.orderBy(F.desc("cnt"), "word")
        .limit(HEAD_COVERAGE_K)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), "word")
            ),
        )
    )
    cum_w = (
        Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top.crossJoin(F.broadcast(t))
        .withColumn("cum_cnt", F.sum("cnt").over(cum_w).cast("long"))
        .select(
            F.col("rk").cast("long").alias("rk"),
            "word",
            "cnt",
            "cum_cnt",
            F.expr("cum_cnt * 1000000 div tot")
            .cast("long")
            .alias("cum_share_ppm"),
        )
        .orderBy("rk")
    )


# --- TextRank keyword centrality ---------------------------------------------
# Corpus-level TextRank (Mihalcea & Tarau 2004): rank the corpus
# vocabulary by random-walk centrality in the word co-occurrence graph
# — the graph-based keyword extractor next to the frequency-ratio
# tfidf_top_terms (tf-idf scores rarity; TextRank scores structural
# centrality, surviving even when every document shares the same
# template vocabulary).  Vertices are canonical words of length >= 4
# whose corpus count clears a scale-relative floor (n_docs // 20, so
# the vocabulary stays comparable as the corpus grows); edges are
# adjacent-word co-occurrences with multiplicity as weight,
# symmetrized.

TEXTRANK_ITERS = 10
_TR_MIN_LEN = 4
_TR_COUNT_DIV = 20


def _textrank_oracle_sql(n_iters: int = TEXTRANK_ITERS) -> str:
    """Unrolled weighted power iteration as chained DuckDB CTEs — one
    inflow/rank pair per round, replicating the operator's dataflow
    (operators/textrank.py).  AS MATERIALIZED everywhere for the
    exponential-inlining reason documented at _pagerank_oracle_sql;
    cross-engine double noise (~1e-14) sits far below the 8-decimal
    output rounding."""
    parts = [f"""
    WITH w AS MATERIALIZED (
      SELECT list_filter(
        string_split_regex(lower(coalesce(text, '')), '{_WORD_SPLIT}'),
        x -> len(x) >= {_TR_MIN_LEN}) AS ws
      FROM documents
    ),
    nd AS (SELECT GREATEST(COUNT(*) // {_TR_COUNT_DIV}, 3) AS minc
           FROM documents),
    cnt AS MATERIALIZED (
      SELECT g AS word, COUNT(*) AS c
      FROM (SELECT unnest(ws) AS g FROM w) GROUP BY g
    ),
    kept AS MATERIALIZED (
      SELECT word FROM cnt, nd WHERE c >= nd.minc
    ),
    bg AS MATERIALIZED (
      SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b
      FROM (
        SELECT unnest([ws[i + 1] || ' ' || ws[i + 2]
                       FOR i IN range(0, greatest(len(ws) - 1, 0))]) AS g
        FROM w)
      WHERE split_part(g, ' ', 1) <> split_part(g, ' ', 2)
    ),
    e AS MATERIALIZED (
      SELECT a, b, COUNT(*) AS wt FROM bg
      JOIN kept ka ON ka.word = a JOIN kept kb ON kb.word = b
      GROUP BY a, b
    ),
    sym AS MATERIALIZED (
      SELECT a AS src, b AS dst, CAST(SUM(wt) AS BIGINT) AS w FROM (
        SELECT a, b, wt FROM e UNION ALL SELECT b, a, wt FROM e
      ) GROUP BY a, b
    ),
    verts AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM sym),
    nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
    wsum AS MATERIALIZED (
      SELECT src, SUM(w) AS wu FROM sym GROUP BY src
    ),
    r0 AS (SELECT vertex, 1.0 / nv.n AS rank FROM verts, nv)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
    inf{i} AS MATERIALIZED (
      SELECT e.dst AS vertex, SUM(r.rank * e.w / s.wu) AS inflow
      FROM sym e
      JOIN wsum s ON s.src = e.src
      JOIN r{i - 1} r ON r.vertex = e.src
      GROUP BY e.dst
    ),
    r{i} AS MATERIALIZED (
      SELECT v.vertex,
             (1.0 - 0.85) / nv.n
               + 0.85 * COALESCE(inf{i}.inflow, 0.0) AS rank
      FROM verts v LEFT JOIN inf{i} ON v.vertex = inf{i}.vertex, nv
    )""")
    parts.append(f"""
    SELECT vertex AS word, ROUND(rank, 8) AS rank
    FROM r{n_iters} ORDER BY rank DESC, word""")
    return "".join(parts)


@register("textrank_keywords", sql=_textrank_oracle_sql())
def textrank_keywords(spark, sf_dir):
    """TextRank keyword centrality over the corpus word co-occurrence
    graph: canonical words (length >= _TR_MIN_LEN, corpus count >=
    n_docs // _TR_COUNT_DIV) linked by adjacent co-occurrence with
    multiplicity weights, ranked by TEXTRANK_ITERS weighted power
    iterations (operators/textrank.py — no dangling term, the graph is
    symmetric by construction).  Full
    DuckDB oracle: graph construction mirrors array-side (the
    qa_rouge_overlap bigram trick) and the iterations unroll into
    chained CTEs; ranks round to 8 decimals (double summation-order
    noise ~1e-14, the host_pagerank margin) with a word tie-break.

    100 TB shape: the heavy stages are the two combinable groupBys
    (word counts, edge counts) over array-side bigrams — no window, no
    self-join on the corpus; the power iteration then runs on the
    VOCABULARY graph, whose size is corpus-independent by the
    scale-relative count floor.  This is the standard shape for
    graph-based keyword extraction over a crawl: reduce to the word
    graph first, iterate on the reduction."""
    from medical_ocr_pipeline_spark.operators.textrank import textrank

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    minc = max(n_docs // _TR_COUNT_DIV, 3)
    ws = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _WORD_SPLIT),
        lambda x: F.length(x) >= _TR_MIN_LEN,
    )
    w = docs.select(ws.alias("ws"))
    cnt = (
        w.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    kept = cnt.where(F.col("c") >= minc).select("word")
    big = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " (x, i) -> concat(x, ' ', ws[i + 1]))"
    )
    bg = (
        w.select(F.explode(big).alias("g"))
        .select(
            F.expr("split_part(g, ' ', 1)").alias("a"),
            F.expr("split_part(g, ' ', 2)").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    e = (
        bg.join(F.broadcast(kept.select(F.col("word").alias("a"))), "a")
        .join(F.broadcast(kept.select(F.col("word").alias("b"))), "b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("wt"))
    )
    sym = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"), "wt")
        .unionAll(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"), "wt")
        )
        .groupBy("src", "dst")
        .agg(F.sum("wt").cast("long").alias("w"))
    )
    return (
        textrank(sym, n_iters=TEXTRANK_ITERS)
        .select(
            F.col("vertex").alias("word"), F.round("rank", 8).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("word"))
    )


# --- language-ID confidence margins ------------------------------------------
# CCNet-style pipelines threshold the LID classifier's CONFIDENCE, not
# just its argmax (a doc the model barely prefers as 'en' over 'es' is
# rejected or routed to review).  For the trigram profile classifier
# the natural confidence is the integer margin top1 - top2 over the
# per-language intersection scores — margin 0 is an exact tie broken
# only by the fixed precedence order, the rows a production gate
# refuses to trust.  This query is the margin histogram per predicted
# language: the table a curation pipeline reads to pick its rejection
# threshold.


@register(
    "langid_margin",
    sql=f"""
    WITH tri AS (
      SELECT lang AS true_lang, {_tri_sql_duck("lower(text)")} AS tri
      FROM documents
    ), scored AS (
      SELECT true_lang, {_LANGID_DUCK_SCORES} FROM tri
    ), m AS (
      SELECT true_lang, {_LANGID_DUCK_WINNER} AS pred_lang,
             list_sort([s_en, s_es, s_de, s_fr]) AS srt
      FROM scored
    )
    SELECT pred_lang,
           CAST(srt[4] - srt[3] AS BIGINT) AS margin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct
    FROM m GROUP BY pred_lang, margin
    ORDER BY pred_lang, margin
    """,
)
def langid_margin(spark, sf_dir):
    """Confidence-margin histogram of the trigram language classifier:
    per (predicted language, top1 - top2 score margin), the doc count
    and how many of them the true label confirms — the calibration
    table behind a rejection threshold (margin-0 rows are exact ties
    resolved only by precedence; accuracy should rise with margin).
    All integer: the scores are intersection sizes, the margin is the
    difference of the two largest after an array sort (identical
    4-element sort in both engines).

    100 TB shape: the scoring is langid_ngram's per-row expression
    chain (array ops inside whole-stage codegen, no UDF, no shuffle);
    the histogram is one combinable groupBy of at most
    |langs| x max_profile_size rows."""
    docs = _langid_pred_frame(load(spark, sf_dir, "documents"))
    srt = F.array_sort(
        F.array(*[F.col(f"s_{lg}") for lg in _LANG_ORDER])
    )
    m = docs.select(
        "true_lang",
        "pred_lang",
        (F.element_at(srt, 4) - F.element_at(srt, 3)).alias("margin"),
    )
    return (
        m.groupBy("pred_lang", F.col("margin").cast("long").alias("margin"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("true_lang"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .orderBy("pred_lang", "margin")
    )
