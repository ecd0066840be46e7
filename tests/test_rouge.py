"""qa_rouge_overlap vs an independent pure-Python ROUGE-n: clipped
multiset intersection, precision/recall/F1 in exact-integer ppm."""

import re
from collections import Counter

import duckdb

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from tests.conftest import SF_DIR

WORD_SPLIT = re.compile("[^a-z0-9]+")


def _grams(text, n):
    ws = [w for w in WORD_SPLIT.split((text or "").lower()) if w]
    return Counter(
        " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
    )


def test_rouge_matches_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE doc_id < 500"
    ).fetchall()
    texts = dict(rows)
    got = {
        (r["doc_a"], r["n"]): r.asDict()
        for r in REGISTRY["qa_rouge_overlap"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == 2 * 250
    for pair in range(250):
        for n in (1, 2):
            ca = _grams(texts[pair], n)
            cb = _grams(texts[pair + 250], n)
            common = sum((ca & cb).values())  # Counter & = clipped min
            na, nb = sum(ca.values()), sum(cb.values())
            row = got[(pair, n)]
            assert row["doc_b"] == pair + 250
            assert row["n_a"] == na and row["n_b"] == nb
            assert row["n_common"] == common
            assert row["rouge_p_ppm"] == common * 1_000_000 // max(na, 1)
            assert row["rouge_r_ppm"] == common * 1_000_000 // max(nb, 1)
            assert (
                row["rouge_f_ppm"]
                == 2 * common * 1_000_000 // max(na + nb, 1)
            )


def test_rouge_identical_texts_score_million(spark):
    # self-pair sanity via the python reference semantics: identical
    # multisets -> P = R = F = 1.0 exactly
    ca = _grams("alpha beta gamma alpha", 1)
    assert sum((ca & ca).values()) == sum(ca.values())
