"""qa_wer_exact: the Catalyst prefix-min DP must equal classic
word-level Levenshtein — pinned on adversarial fixtures and against a
pure-Python DP over the real testdata pairing."""

import re

from pyspark.sql import Row, functions as F

from medical_ocr_pipeline_spark.queries.qa import (
    WER_CAP,
    _WER_DP_SPARK,
    qa_wer_exact,
)
from tests.conftest import SF_DIR

WORD_RE = re.compile("[^a-z0-9]+")


def _lev(a, b):
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[m]


def _dp(spark, wa, wb):
    df = spark.createDataFrame(
        [Row(wa=wa, wb=wb)], "wa array<string>, wb array<string>"
    )
    expr = (
        F.when(F.expr("size(wa)") == 0, F.expr("size(wb)"))
        .when(F.expr("size(wb)") == 0, F.expr("size(wa)"))
        .otherwise(F.expr(_WER_DP_SPARK))
    )
    return df.select(expr.cast("long").alias("d")).collect()[0].d


def test_dp_fixtures(spark):
    cases = [
        ([], [], 0),
        ([], ["a", "b"], 2),
        (["a", "b"], [], 2),
        (["a", "b", "c"], ["a", "b", "c"], 0),
        (["a", "b", "c"], ["x", "y", "z"], 3),
        (["a", "b", "c"], ["a", "c"], 1),           # deletion
        (["a", "c"], ["a", "b", "c"], 1),           # insertion
        (["a", "b", "c"], ["a", "x", "c"], 1),      # substitution
        (["a", "b"], ["b", "a"], 2),                # transposition costs 2
        (["a", "a", "a"], ["a"], 2),                # runs collapse
        (["x", "a", "b", "c"], ["a", "b", "c", "y"], 2),  # shift
    ]
    for wa, wb, want in cases:
        assert _dp(spark, wa, wb) == want == _lev(wa, wb), (wa, wb)


def test_dp_matches_python_on_random_sequences(spark):
    import hashlib

    def seq(salt, n, vocab):
        return [
            "w%d"
            % (
                int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
                % vocab
            )
            for i in range(n)
        ]

    for salt in range(6):
        wa = seq(f"a{salt}", 5 + salt * 7, 4 + salt)
        wb = seq(f"b{salt}", 3 + salt * 9, 4 + salt)
        assert _dp(spark, wa, wb) == _lev(wa, wb)


def test_query_matches_python_reference(spark):
    rows = qa_wer_exact(spark, SF_DIR).collect()
    assert len(rows) == 250
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def words(t):
        return [w for w in WORD_RE.split((t or "").lower()) if w][:WER_CAP]

    for r in rows[:60]:
        wa, wb = words(texts[r.doc_a]), words(texts[r.doc_b])
        assert (r.n_ref, r.n_hyp) == (len(wa), len(wb))
        d = _lev(wa, wb)
        assert r.wdist == d
        assert r.wer_ppm == d * 1_000_000 // max(len(wa), 1)
        # WER bounded by max(n_ref, n_hyp)/n_ref; distance >= |n-m|
        assert r.wdist >= abs(r.n_ref - r.n_hyp)
        assert r.wdist <= max(r.n_ref, r.n_hyp)


# --- ROUGE-L / LCS ------------------------------------------------------------


def _py_lcs(a, b):
    m = len(b)
    prev = [0] * (m + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = max(
                prev[j], cur[j - 1], prev[j - 1] + (a[i - 1] == b[j - 1])
            )
        prev = cur
    return prev[m]


def _lcs_dp(spark, wa, wb):
    from medical_ocr_pipeline_spark.queries.qa import _LCS_DP_SPARK

    df = spark.createDataFrame(
        [Row(wa=wa, wb=wb)], "wa array<string>, wb array<string>"
    )
    expr = (
        F.when(
            (F.expr("size(wa)") == 0) | (F.expr("size(wb)") == 0), F.lit(0)
        )
        .otherwise(F.expr(_LCS_DP_SPARK))
    )
    return df.select(expr.cast("long").alias("d")).collect()[0].d


def test_lcs_fixtures(spark):
    cases = [
        ([], [], 0),
        ([], ["a"], 0),
        (["a", "b", "c"], ["a", "b", "c"], 3),
        (["a", "b", "c"], ["x", "y"], 0),
        (["a", "b", "c", "d"], ["b", "d"], 2),
        (["a", "b"], ["b", "a"], 1),                 # order matters
        (["a", "x", "b", "y", "c"], ["a", "b", "c"], 3),
        (["a", "a", "b"], ["a", "b", "a"], 2),
    ]
    for wa, wb, want in cases:
        assert _lcs_dp(spark, wa, wb) == want == _py_lcs(wa, wb), (wa, wb)


def test_rouge_l_query_matches_python(spark):
    from medical_ocr_pipeline_spark.queries.qa import qa_rouge_l

    rows = qa_rouge_l(spark, SF_DIR).collect()
    assert len(rows) == 250
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def words(t):
        return [w for w in WORD_RE.split((t or "").lower()) if w][:WER_CAP]

    for r in rows[:40]:
        wa, wb = words(texts[r.doc_a]), words(texts[r.doc_b])
        lcs = _py_lcs(wa, wb)
        assert r.lcs_len == lcs
        assert r.rouge_l_f_ppm == 2 * lcs * 1_000_000 // max(
            len(wa) + len(wb), 1
        )
        # LCS + WER consistency: lcs <= min lengths; and for the same
        # pair, wdist >= max(n) - lcs (edits must bridge the non-LCS part)
        assert lcs <= min(r.n_ref, r.n_hyp)


# --- Smith-Waterman local alignment ------------------------------------------


def _py_sw(a, b, match=2, mismatch=-1, gap=1):
    best = 0
    m = len(b)
    prev = [0] * (m + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            cur[j] = max(0, prev[j - 1] + s, prev[j] - gap, cur[j - 1] - gap)
            best = max(best, cur[j])
        prev = cur
    return best


def _sw_dp(spark, wa, wb):
    from medical_ocr_pipeline_spark.queries.qa import _SW_DP_SPARK

    df = spark.createDataFrame(
        [Row(wa=wa, wb=wb)], "wa array<string>, wb array<string>"
    )
    expr = (
        F.when(
            (F.expr("size(wa)") == 0) | (F.expr("size(wb)") == 0), F.lit(0)
        )
        .otherwise(F.expr(_SW_DP_SPARK))
    )
    return df.select(expr.cast("long").alias("d")).collect()[0].d


def test_sw_fixtures(spark):
    cases = [
        ([], [], 0),
        (["a"], [], 0),
        (["a", "b", "c"], ["a", "b", "c"], 6),          # full match
        (["a", "b"], ["x", "y"], 0),                    # nothing shared
        (["x", "a", "b", "y"], ["z", "a", "b", "w"], 4),  # inner run
        # gap inside a shared run: a b c vs a X b c -> 2+2+2-1 = 5
        (["a", "b", "c"], ["a", "x", "b", "c"], 5),
        # local beats global: long junk around a short perfect core
        (["j1", "j2", "a", "b", "j3"], ["k1", "a", "b", "k2", "k3"], 4),
        # mismatch inside run: a b c vs a z c -> max(2+2-1... ) = 3
        (["a", "b", "c"], ["a", "z", "c"], 3),
    ]
    for wa, wb, want in cases:
        assert _sw_dp(spark, wa, wb) == want == _py_sw(wa, wb), (wa, wb)


def test_sw_matches_python_on_random_sequences(spark):
    import hashlib

    def seq(salt, n, vocab):
        return [
            "w%d"
            % (
                int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
                % vocab
            )
            for i in range(n)
        ]

    for salt in range(6):
        wa = seq(f"a{salt}", 4 + salt * 6, 3 + salt)
        wb = seq(f"b{salt}", 2 + salt * 8, 3 + salt)
        assert _sw_dp(spark, wa, wb) == _py_sw(wa, wb)


def test_local_align_query_bounds(spark):
    from medical_ocr_pipeline_spark.queries.qa import qa_local_align

    rows = qa_local_align(spark, SF_DIR).collect()
    assert len(rows) == 250
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def words(t):
        return [w for w in WORD_RE.split((t or "").lower()) if w][:WER_CAP]

    for r in rows[:40]:
        wa, wb = words(texts[r.doc_a]), words(texts[r.doc_b])
        assert r.sw_score == _py_sw(wa, wb)
        assert 0 <= r.sw_score <= 2 * min(len(wa), len(wb))
        assert 0 <= r.align_ppm <= 1_000_000
