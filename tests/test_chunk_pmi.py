"""Invariants for the round-4 additions chunk_overlap / pmi_bigrams /
qa_edit_distance beyond the cross-engine oracle (test_queries_oracle.py):
token coverage and overlap geometry for the chunker, a from-first-
principles PMI recompute, and a pure-Python Levenshtein DP spot check."""

import re

import duckdb

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from medical_ocr_pipeline_spark.queries.training import CHUNK_STRIDE, CHUNK_W

SF_DIR = "/root/testdata/sf0.001"
WORD_SPLIT = re.compile("[^a-z0-9]+")


def doc_words():
    rows = duckdb.sql(
        f"SELECT doc_id, lower(coalesce(text, '')) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    return {
        doc_id: [w for w in WORD_SPLIT.split(text) if w]
        for doc_id, text in rows
    }


def test_chunk_overlap_covers_every_token_with_correct_geometry(spark):
    rows = REGISTRY["chunk_overlap"].fn(spark, SF_DIR).collect()
    words = doc_words()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty doc appears; empty docs don't
    assert set(by_doc) == {d for d, w in words.items() if w}
    for doc_id, chunks in by_doc.items():
        n = len(words[doc_id])
        chunks.sort(key=lambda r: r["chunk_idx"])
        covered = set()
        for r in chunks:
            assert r["start_tok"] == r["chunk_idx"] * CHUNK_STRIDE
            assert 1 <= r["chunk_len"] <= CHUNK_W
            assert r["chunk_len"] == min(CHUNK_W, n - r["start_tok"])
            assert r["first_word"] == words[doc_id][r["start_tok"]]
            assert (
                r["last_word"]
                == words[doc_id][r["start_tok"] + r["chunk_len"] - 1]
            )
            covered.update(
                range(r["start_tok"], r["start_tok"] + r["chunk_len"])
            )
        assert covered == set(range(n))  # no token escapes chunking
        # consecutive chunks overlap by exactly W - S while both are full
        for a, b in zip(chunks, chunks[1:]):
            if a["chunk_len"] == CHUNK_W:
                overlap = a["start_tok"] + a["chunk_len"] - b["start_tok"]
                assert overlap == CHUNK_W - CHUNK_STRIDE


def test_pmi_score_matches_first_principles_recompute(spark):
    rows = REGISTRY["pmi_bigrams"].fn(spark, SF_DIR).collect()
    assert rows, "corpus should yield collocations"
    words = doc_words()
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for ws in words.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ws, ws[1:]):
            bi[f"{x} {y}"] = bi.get(f"{x} {y}", 0) + 1
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    for r in rows:
        a, b = r["bigram"].split(" ")
        assert r["c_ab"] == bi[r["bigram"]]
        assert r["c_a"] == uni[a] and r["c_b"] == uni[b]
        want = ((r["c_ab"] * 1000 // r["c_a"]) * n_uni // r["c_b"]) * 1000 // n_bi
        assert r["pmi_ratio_x1e6"] == want
    # ranking is by (score desc, bigram asc) — verify it's sorted
    keys = [(-r["pmi_ratio_x1e6"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python_dp_on_sample(spark):
    rows = (
        REGISTRY["qa_edit_distance"].fn(spark, SF_DIR).limit(5).collect()
    )
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
            "WHERE doc_id < 500"
        ).fetchall()
    )
    for r in rows:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        want = _lev(a, b)
        assert r["lev"] == want
        assert r["cer_ppm"] == want * 1000000 // max(len(a), 1)
