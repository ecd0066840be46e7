"""Sketch operators (queries/sketches.py) vs exact pure-Python references:
the HLL registers/estimate, the CMS cells/estimates, and the Bloom
bit-set semantics are each recomputed from first principles over the
same parquet input and compared value-for-value (the DuckDB oracle in
test_queries_oracle.py covers cross-engine parity; this file pins the
sketch MATH itself — register indexing, rank extraction, min-over-rows,
all-k-bits membership — against an independent implementation)."""

import hashlib
import re

import duckdb
import pytest

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from medical_ocr_pipeline_spark.queries.sketches import (
    _BLOOM_K,
    _BLOOM_M,
    _CMS_D,
    _HLL_NUM,
)

SF_DIR = "/root/testdata/sf0.001"
WORD_SPLIT = re.compile("[^a-z0-9]+")


def h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def corpus_words():
    rows = duckdb.sql(
        f"SELECT lang, lower(coalesce(text, '')) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    out = []
    for lang, text in rows:
        out.extend((lang, w) for w in WORD_SPLIT.split(text) if w)
    return out


def test_hll_registers_and_estimate_match_reference(spark):
    got = {
        r["lang"]: r.asDict()
        for r in REGISTRY["sketch_hll_distinct"].fn(spark, SF_DIR).collect()
    }
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for lang, w in corpus_words():
        h = h48(w)
        idx, rest = h & 63, h >> 6
        rho = 43 - rest.bit_length()  # bit_length(0) == 0 -> rho 43
        regs.setdefault(lang, {})
        regs[lang][idx] = max(regs[lang].get(idx, 0), rho)
        exact.setdefault(lang, set()).add(w)
    assert set(got) == set(regs)
    for lang, reg in regs.items():
        s = sum(1 << (43 - r) for r in reg.values())
        s += (64 - len(reg)) * (1 << 43)
        row = got[lang]
        assert row["n_exact"] == len(exact[lang])
        assert row["n_reg_hit"] == len(reg)
        assert row["v_zero"] == 64 - len(reg)
        assert row["hll_est"] == _HLL_NUM // s
        # sanity: apply the small-range branch the query intentionally
        # leaves to the consumer (raw E <= 2.5m with zero registers ->
        # linear counting m*ln(m/V)), then require the corrected
        # estimate within 3 sigma of the 1.04/sqrt(64) = 13% bound
        import math

        est = row["hll_est"]
        if est <= 2.5 * 64 and row["v_zero"] > 0:
            est = 64 * math.log(64 / row["v_zero"])
        assert abs(est - row["n_exact"]) <= 0.39 * max(row["n_exact"], 8)


def test_cms_estimate_is_min_over_rows_and_upper_bound(spark):
    rows = REGISTRY["sketch_cms_heavy"].fn(spark, SF_DIR).collect()
    counts: dict[str, int] = {}
    for _, w in corpus_words():
        counts[w] = counts.get(w, 0) + 1
    cells: dict[tuple, int] = {}
    for w, n in counts.items():
        for r in range(_CMS_D):
            c = h48(f"{r}:{w}") & 63
            cells[(r, c)] = cells.get((r, c), 0) + n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [r["word"] for r in rows] == [w for w, _ in top]
    for row in rows:
        w = row["word"]
        est = min(cells[(r, h48(f"{r}:{w}") & 63)] for r in range(_CMS_D))
        assert row["n_exact"] == counts[w]
        assert row["cms_est"] == est
        assert row["cms_est"] >= row["n_exact"]  # CMS never undercounts
        assert row["overcount"] == est - counts[w]


def test_bloom_no_false_negatives_and_exact_fp_count(spark):
    row = REGISTRY["bloom_prefilter_join"].fn(spark, SF_DIR).collect()[0]
    build = {
        k
        for (k,) in duckdb.sql(
            f"SELECT DISTINCT o_orderkey FROM '{SF_DIR}/orders.parquet' "
            "WHERE o_orderpriority = '1-URGENT'"
        ).fetchall()
    }
    probe = {
        k
        for (k,) in duckdb.sql(
            f"SELECT DISTINCT l_orderkey FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchall()
    }
    bits = {h48(f"{i}:{k}") % _BLOOM_M for k in build for i in range(_BLOOM_K)}
    passed = {
        k
        for k in probe
        if all(h48(f"{i}:{k}") % _BLOOM_M in bits for i in range(_BLOOM_K))
    }
    true = probe & build
    assert true <= passed  # no false negatives, ever
    assert row["n_probe"] == len(probe)
    assert row["n_pass"] == len(passed)
    assert row["n_true"] == len(true)
    assert row["n_false_pos"] == len(passed - true)
    denom = max(len(probe) - len(true), 1)
    assert row["fpr_ppm"] == len(passed - true) * 1000000 // denom


@pytest.mark.parametrize(
    "name", ["sketch_hll_distinct", "sketch_cms_heavy", "bloom_prefilter_join"]
)
def test_sketch_plans_have_no_fixed_numpartitions(spark, name):
    plan = REGISTRY[name].fn(spark, SF_DIR)._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning" not in plan


def corpus_words_by_source():
    rows = duckdb.sql(
        f"SELECT source, lower(coalesce(text, '')) "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    out = []
    for source, text in rows:
        out.extend((source, w) for w in WORD_SPLIT.split(text) if w)
    return out


def test_hll_union_is_elementwise_max_and_equals_direct_sketch(spark):
    got = {
        r["source"]: r.asDict()
        for r in REGISTRY["sketch_hll_union"].fn(spark, SF_DIR).collect()
    }
    regs: dict[str, dict[int, int]] = {}
    for source, w in corpus_words_by_source():
        h = h48(w)
        idx, rho = h & 63, 43 - (h >> 6).bit_length()
        regs.setdefault(source, {})
        regs[source][idx] = max(regs[source].get(idx, 0), rho)

    def summarize(reg):
        s = sum(1 << (43 - r) for r in reg.values())
        s += (64 - len(reg)) * (1 << 43)
        return 64 - len(reg), _HLL_NUM // s

    # per-source rows match the python per-shard sketches
    assert set(got) == set(regs) | {"__union__"}
    for source, reg in regs.items():
        v_zero, est = summarize(reg)
        assert got[source]["v_zero"] == v_zero
        assert got[source]["hll_est"] == est

    # the merged row equals (a) the elementwise max of the shard
    # registers and (b) a direct whole-corpus sketch — the mergeability
    # property that lets shards sketch independently
    merged: dict[int, int] = {}
    for reg in regs.values():
        for idx, rho in reg.items():
            merged[idx] = max(merged.get(idx, 0), rho)
    direct: dict[int, int] = {}
    for _, w in corpus_words_by_source():
        h = h48(w)
        idx, rho = h & 63, 43 - (h >> 6).bit_length()
        direct[idx] = max(direct.get(idx, 0), rho)
    assert merged == direct
    v_zero, est = summarize(merged)
    assert got["__union__"]["v_zero"] == v_zero
    assert got["__union__"]["hll_est"] == est


def test_kmv_kept_set_and_estimate_match_reference(spark):
    from medical_ocr_pipeline_spark.queries.sketches import _KMV_K

    got = {
        r["lang"]: r.asDict()
        for r in REGISTRY["sketch_kmv_distinct"].fn(spark, SF_DIR).collect()
    }
    hashes: dict[str, set] = {}
    exact: dict[str, set] = {}
    for lang, w in corpus_words():
        hashes.setdefault(lang, set()).add(h48(w))
        exact.setdefault(lang, set()).add(w)
    assert set(got) == set(hashes)
    for lang, hs in hashes.items():
        kept = sorted(hs)[:_KMV_K]
        row = got[lang]
        assert row["n_exact"] == len(exact[lang])
        assert row["n_kept"] == len(kept)
        assert row["h_k"] == max(kept)
        if len(kept) < _KMV_K:
            assert row["kmv_est"] == len(kept)  # exact below K
        else:
            want = (_KMV_K - 1) * (1 << 48) // max(kept)
            assert row["kmv_est"] == want
            # order-statistics bound: relative sd ~ 1/sqrt(K-2) = 18%;
            # allow 3 sigma
            assert abs(want - row["n_exact"]) <= 0.55 * row["n_exact"]


def test_length_quantile_sketch_matches_reference(spark):
    rows = duckdb.sql(
        f"SELECT lang, lower(coalesce(text, '')) "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list] = {}
    for lang, text in rows:
        nt = len([w for w in WORD_SPLIT.split(text) if w])
        by_lang.setdefault(lang, []).append(nt)
    got = {
        r["lang"]: r.asDict()
        for r in REGISTRY["length_quantile_sketch"].fn(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(by_lang)
    for lang, nts in by_lang.items():
        nts.sort()
        n = len(nts)
        row = got[lang]
        assert row["n_docs"] == n
        for q in (50, 90, 99):
            # exact: smallest value whose rank crosses ceil(q*n/100)
            exact = nts[(q * n + 99) // 100 - 1]
            assert row[f"p{q}_exact"] == exact
            # sketch: the log2 bin of that exact value (the crossing
            # bin is the bin the rank falls in)
            want_bin = exact.bit_length()
            assert row[f"p{q}_bin"] == want_bin
            assert row[f"p{q}_hi"] == (1 << want_bin) - 1
            assert exact <= row[f"p{q}_hi"]  # sketch upper-bounds exact
