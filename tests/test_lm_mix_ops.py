"""Corpus-trained bigram LM scoring + (later in this file) data-mixing
and BPE ops: handcrafted semantics tests — the oracle gate pins engine
parity on the shared testdata; these pin the MATH on frames small enough
to verify by hand.
"""

from __future__ import annotations

from pyspark.sql import Row


def _write_docs(spark, tmp_path, texts):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_lm_score_perfectly_predictable_text(spark, tmp_path):
    """'x y x y x y' alone in the corpus: every bigram occurrence has
    conditional probability 1 -> score exactly 1_000_000 ppm."""
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score

    sf = _write_docs(spark, tmp_path, ["x y x y x y"])
    [r] = ngram_lm_score(spark, sf).collect()
    assert r.n_bigrams == 5
    assert r.lm_score_ppm == 1_000_000


def test_lm_score_split_context_and_degenerate_docs(spark, tmp_path):
    """Context 'p' continues to 'q' and 'r' once each -> both docs score
    500_000; a one-word doc has zero bigrams and scores 0."""
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score

    sf = _write_docs(spark, tmp_path, ["p q", "p r", "solo"])
    got = {r.doc_id: r for r in ngram_lm_score(spark, sf).collect()}
    assert got[0].lm_score_ppm == 500_000
    assert got[1].lm_score_ppm == 500_000
    assert got[2].n_bigrams == 0 and got[2].lm_score_ppm == 0


def test_bpe_pair_counts_weighted_by_word_frequency(spark, tmp_path):
    """'ab' occurs 3x, 'cd' once -> pair 'ab' counts 3 (weighted over
    the DISTINCT-word table), 'cd' counts 1; 1-char words contribute
    nothing."""
    from medical_ocr_pipeline_spark.queries.training import bpe_pair_counts

    sf = _write_docs(spark, tmp_path, ["ab ab cd x", "ab x"])
    got = {r.pair: r.pair_count for r in bpe_pair_counts(spark, sf).collect()}
    assert got == {"ab": 3, "cd": 1}


def _mix_coin(doc_id: int) -> int:
    import hashlib

    h = hashlib.md5(f"mix{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 1_000_000


def test_mixture_sample_rates_and_draw(spark, tmp_path):
    """Two sources, 30 vs 10 tokens, 50% budget split evenly -> 10
    tokens target each: heavy source rate 333_333 ppm, light source
    capped at 1_000_000 (fully kept); the draw matches the salted md5
    coin recomputed in python."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.training import mixture_sample

    ten_words = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        Row(doc_id=i, text=ten_words, lang="en", source="heavy", n_chars=0)
        for i in range(3)
    ] + [Row(doc_id=3, text=ten_words, lang="en", source="light", n_chars=0)]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: r for r in mixture_sample(spark, str(tmp_path)).collect()}
    assert got["heavy"].n_tokens == 30 and got["light"].n_tokens == 10
    assert got["heavy"].rate_ppm == 1_000_000 * 10 // 30
    assert got["light"].rate_ppm == 1_000_000
    assert got["light"].n_docs_sampled == 1
    assert got["light"].tokens_sampled == 10
    expect_heavy = sum(
        1 for i in range(3) if _mix_coin(i) < got["heavy"].rate_ppm
    )
    assert got["heavy"].n_docs_sampled == expect_heavy
    assert got["heavy"].tokens_sampled == expect_heavy * 10


def _dsir_ref(texts_by_id):
    """Pure-python DSIR reference: identical md5 bucketing, add-1
    smoothing, 4-dp rounding, (score desc, doc_id) top-k."""
    import hashlib
    import math

    from medical_ocr_pipeline_spark.queries.training import (
        DSIR_BUCKETS,
        DSIR_TARGET_MOD,
        DSIR_TARGET_REM,
        DSIR_TOP,
    )
    import re

    def grams(text):
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        return words + [
            f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
        ]

    def bucket(g):
        h = hashlib.md5(("dsir" + g).encode()).hexdigest()[:12]
        return int(h, 16) % DSIR_BUCKETS

    t_cnt, s_cnt = {}, {}
    doc_buckets = {}
    for doc_id, text in texts_by_id.items():
        bs = [bucket(g) for g in grams(text)]
        doc_buckets[doc_id] = bs
        side = (
            t_cnt
            if doc_id % DSIR_TARGET_MOD == DSIR_TARGET_REM
            else s_cnt
        )
        for b in bs:
            side[b] = side.get(b, 0) + 1
    t_tot, s_tot = sum(t_cnt.values()), sum(s_cnt.values())
    out = []
    for doc_id, bs in doc_buckets.items():
        if doc_id % DSIR_TARGET_MOD == DSIR_TARGET_REM or not bs:
            continue
        score = sum(
            math.log((t_cnt.get(b, 0) + 1) / (t_tot + DSIR_BUCKETS))
            - math.log((s_cnt[b] + 1) / (s_tot + DSIR_BUCKETS))
            for b in bs
        )
        out.append((doc_id, len(bs), round(score, 4)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:DSIR_TOP]


def test_dsir_matches_python_reference(spark, tmp_path):
    """The Spark DSIR scorer must equal the sequential reference —
    same buckets, same smoothing, same rounding, same top-k order."""
    from medical_ocr_pipeline_spark.queries.training import dsir_sample

    texts = {
        5: "cat dog cat dog ferret",            # target (5 % 17 == 5)
        22: "cat dog hamster cat",              # target (22 % 17 == 5)
        0: "cat dog cat dog ferret",            # raw: identical to target
        1: "stock market index fund bond",      # raw: disjoint
        2: "cat dog walks in the park",         # raw: partial overlap
        3: "bond index cat",                    # raw: mixed
        4: "dog dog dog dog dog dog",           # raw: repeated target word
    }
    rows = [
        Row(doc_id=k, text=t, lang="en", source="s", n_chars=len(t))
        for k, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    sf = str(tmp_path)
    got = [
        (r.doc_id, r.n_grams, r.score)
        for r in dsir_sample(spark, sf).collect()
    ]
    assert got == _dsir_ref(texts)
    # the verbatim target copy must outrank the disjoint doc
    rank = {doc_id: i for i, (doc_id, _, _) in enumerate(got)}
    assert rank[0] < rank[1]


# --- interpolated Kneser-Ney bigram LM ---------------------------------------


def test_kn_single_bigram_type_is_certainty(spark, tmp_path):
    """A corpus whose LM has one bigram type: discounted mass + the
    continuation term reassemble to exactly 1.0 (250k + 750k at cb=1);
    'x y x y x y' hand-computes to 850_000 ppm."""
    from medical_ocr_pipeline_spark.queries.textstats import lm_kneser_ney

    sf = _write_docs(spark, tmp_path, ["x y"])
    [r] = lm_kneser_ney(spark, sf).collect()
    assert r.n_bigrams == 1 and r.kn_score_ppm == 1_000_000

    sf2 = _write_docs(spark, tmp_path / "b", ["x y x y x y"])
    [r2] = lm_kneser_ney(spark, sf2).collect()
    # (x,y): cb=3,cw=3,n1f=1,n1r=1; (y,x): cb=2,cw=2; ntypes=2
    # p(x,y)=9e6//12 + 3e6//24 = 875_000; p(y,x)=5e6//8 + 3e6//16 = 812_500
    # doc = (3*875000 + 2*812500)//5
    assert r2.n_bigrams == 5 and r2.kn_score_ppm == 850_000


def test_kn_hand_computed_split_context(spark, tmp_path):
    """'a b a c': ctx a splits two ways (cw=2, n1f=2), ntypes=3.
    p(a,b)=p(a,c)=125k+250k=375k, p(b,a)=250k+250k=500k ->
    (375k+500k+375k)//3 = 416_666."""
    from medical_ocr_pipeline_spark.queries.textstats import lm_kneser_ney

    sf = _write_docs(spark, tmp_path, ["a b a c"])
    [r] = lm_kneser_ney(spark, sf).collect()
    assert r.n_bigrams == 3 and r.kn_score_ppm == 416_666


def test_kn_continuation_term_rewards_diverse_contexts(spark, tmp_path):
    """The 'san francisco' correction: bigrams (a,t) and (c,u) have
    IDENTICAL counts (cb=1, cw=1) but 't' continues two distinct
    contexts while 'u' continues one -> 750k vs 500k ppm.  The
    unsmoothed MLE scores both 1_000_000 (can't tell them apart)."""
    from medical_ocr_pipeline_spark.queries.textstats import (
        lm_kneser_ney, ngram_lm_score)

    sf = _write_docs(spark, tmp_path, ["a t", "b t", "c u"])
    kn = {r.doc_id: r.kn_score_ppm
          for r in lm_kneser_ney(spark, sf).collect()}
    assert kn[0] == 750_000 and kn[1] == 750_000 and kn[2] == 500_000
    mle = {r.doc_id: r.lm_score_ppm
           for r in ngram_lm_score(spark, sf).collect()}
    assert mle[0] == mle[2] == 1_000_000


def test_kn_degenerate_docs_score_zero(spark, tmp_path):
    """One-word and null-text docs carry zero bigrams and score 0 (the
    words_expr null guard: F.size(NULL)=-1 must never reach the div)."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.textstats import lm_kneser_ney

    rows = [
        Row(doc_id=0, text="p q", lang="en", source="s", n_chars=3),
        Row(doc_id=1, text="solo", lang="en", source="s", n_chars=4),
        Row(doc_id=2, text=None, lang="en", source="s", n_chars=0),
    ]
    spark.createDataFrame(rows).write.parquet(
        f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in lm_kneser_ney(spark, str(tmp_path)).collect()}
    assert got[1].n_bigrams == 0 and got[1].kn_score_ppm == 0
    assert got[2].n_bigrams == 0 and got[2].kn_score_ppm == 0
    assert got[0].kn_score_ppm == 1_000_000
