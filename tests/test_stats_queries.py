"""queries/stats.py semantics vs pure-Python references on the sf0.001
testdata (the oracle gate checks cross-engine hashes; these tests check
the MATH — pearson vs the textbook formula, chi-square vs the manual
contingency computation, Gini vs the sorted-rank formula, fixed-k
sampling vs a replayed hash draw, drift vs a dict-based reference)."""

import hashlib
import math
import re

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
WORD_RE = re.compile("[^a-z0-9]+")


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _words(text):
    return [w for w in WORD_RE.split((text or "").lower()) if w]


def _md5_int48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_corr_doc_stats_matches_textbook_pearson(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import corr_doc_stats

    feats = [
        (len(_words(t)), len(set(_words(t))), nc)
        for _, t, _, _, nc in docs
    ]

    def pearson(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        cov = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        return math.floor(cov * 1e6 / math.sqrt(float(vx) * float(vy)))

    a = [f[0] for f in feats]
    b = [f[1] for f in feats]
    c = [f[2] for f in feats]
    expected = {
        "words~uniq": pearson(a, b),
        "words~chars": pearson(a, c),
        "uniq~chars": pearson(b, c),
    }
    got = {r.pair: r.corr_ppm for r in corr_doc_stats(spark, SF).collect()}
    assert got == expected
    # sanity: words and chars must correlate strongly positively
    assert got["words~chars"] > 900_000


def test_chi2_matches_manual_contingency(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import chi2_lang_source

    obs = {}
    for _, _, lang, src, _ in docs:
        obs[(lang, src)] = obs.get((lang, src), 0) + 1
    n = sum(obs.values())
    rt = {}
    ct = {}
    for (lang, src), o in obs.items():
        rt[lang] = rt.get(lang, 0) + o
        ct[src] = ct.get(src, 0) + o
    rows = chi2_lang_source(spark, SF).collect()
    assert len(rows) == len(obs)
    for r in rows:
        e = float(rt[r.lang]) * ct[r.source] / n
        assert r.o == obs[(r.lang, r.source)]
        assert r.expected_e6 == math.floor(e * 1e6)
        assert r.contrib_ppm == math.floor(
            (r.o - e) * (r.o - e) * 1e6 / e
        )


def test_gini_matches_sorted_formula_and_bounds(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import gini_doc_lengths

    by_lang = {}
    for doc_id, _, lang, _, nc in docs:
        by_lang.setdefault(lang, []).append((nc, doc_id))
    rows = {r.lang: r for r in gini_doc_lengths(spark, SF).collect()}
    assert set(rows) == set(by_lang)
    for lang, xs in by_lang.items():
        xs.sort()
        n = len(xs)
        sx = sum(x for x, _ in xs)
        six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        g = math.floor((2 * six - (n + 1) * sx) * 1e6 / (float(n) * sx))
        assert rows[lang].gini_ppm == g
        assert 0 <= rows[lang].gini_ppm < 1_000_000
        assert rows[lang].n == n
        assert rows[lang].total_chars == sx


def test_gini_rank_is_partition_count_invariant(spark):
    # the two-phase range-partitioned rank must be a pure function of
    # the global order: same result at 1 and 97 shuffle partitions
    from medical_ocr_pipeline_spark.queries.stats import gini_doc_lengths

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        r1 = sorted(map(tuple, gini_doc_lengths(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "97")
        r97 = sorted(map(tuple, gini_doc_lengths(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r1 == r97


def test_sample_fixed_k_is_the_replayed_hash_draw(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import (
        SAMPLE_K,
        sample_fixed_k,
    )

    by_lang = {}
    for doc_id, _, lang, _, _ in docs:
        by_lang.setdefault(lang, []).append(
            (_md5_int48(f"sample{doc_id}"), doc_id)
        )
    expected = {}
    for lang, hs in by_lang.items():
        hs.sort()
        expected[lang] = [d for _, d in hs[:SAMPLE_K]]
    rows = sample_fixed_k(spark, SF).collect()
    got = {}
    for r in rows:
        got.setdefault(r.lang, []).append((r.rk, r.doc_id))
    for lang in expected:
        assert [d for _, d in sorted(got[lang])] == expected[lang]
        assert len(got[lang]) == min(SAMPLE_K, len(by_lang[lang]))


def test_split_token_drift_matches_dict_reference(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import (
        _DRIFT_TOP,
        split_token_drift,
    )
    from medical_ocr_pipeline_spark.queries.training import (
        TRAIN_PPM,
        VAL_PPM,
    )

    a = {}
    b = {}
    for doc_id, t, _, _, _ in docs:
        hv = _md5_int48(f"split{doc_id}") % 1_000_000
        split = (
            "train" if hv < TRAIN_PPM else "val" if hv < VAL_PPM else "test"
        )
        if split == "val":
            continue
        tgt = a if split == "train" else b
        for w in _words(t):
            tgt[w] = tgt.get(w, 0) + 1
    ta, tb = sum(a.values()), sum(b.values())
    contrib = {}
    for w in set(a) | set(b):
        x, y = a.get(w, 0), b.get(w, 0)
        num = x * tb - y * ta
        contrib[w] = math.floor(
            float(num) * num * 1e9 / (float(ta) * tb * (x * tb + y * ta))
        )
    top = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:_DRIFT_TOP]
    rows = split_token_drift(spark, SF).collect()
    assert [(r.word, r.contrib_ppb) for r in rows] == [
        (w, c) for w, c in top
    ]
    for r in rows:
        assert r.a == a.get(r.word, 0)
        assert r.b == b.get(r.word, 0)


def test_source_diversity_matches_manual_indices(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import source_diversity

    counts = {}
    for _, _, lang, src, _ in docs:
        counts.setdefault(lang, {})
        counts[lang][src] = counts[lang].get(src, 0) + 1
    rows = {r.lang: r for r in source_diversity(spark, SF).collect()}
    assert set(rows) == set(counts)
    for lang, per_src in counts.items():
        ni = list(per_src.values())
        n = sum(ni)
        ssq = sum(x * x for x in ni)
        spair = sum(x * (x - 1) for x in ni)
        r = rows[lang]
        assert r.n_docs == n
        assert r.n_sources == len(ni)
        assert r.hhi_ppm == ssq * 1_000_000 // (n * n)
        assert r.simpson_ppm == (
            spair * 1_000_000 // (n * (n - 1)) if n > 1 else 1_000_000
        )
        assert r.eff_sources_e3 == n * n * 1000 // ssq
        # effective sources can never exceed actual sources
        assert r.eff_sources_e3 <= len(ni) * 1000


def test_oov_rate_matches_replayed_split(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import oov_rate
    from medical_ocr_pipeline_spark.queries.training import (
        TRAIN_PPM,
        VAL_PPM,
    )

    def split_of(doc_id):
        hv = _md5_int48(f"split{doc_id}") % 1_000_000
        return "train" if hv < TRAIN_PPM else "val" if hv < VAL_PPM else "test"

    train_vocab = set()
    test_tokens = {}
    for doc_id, t, lang, _, _ in docs:
        s = split_of(doc_id)
        if s == "train":
            train_vocab.update(_words(t))
        elif s == "test":
            test_tokens.setdefault(lang, []).extend(_words(t))
    rows = {r.lang: r for r in oov_rate(spark, SF).collect()}
    assert set(rows) == {L for L, toks in test_tokens.items() if toks}
    for lang, toks in test_tokens.items():
        if not toks:
            continue
        oov = [w for w in toks if w not in train_vocab]
        types = set(toks)
        oov_types = {w for w in oov}
        r = rows[lang]
        assert r.n_test_tokens == len(toks)
        assert r.n_oov_tokens == len(oov)
        assert r.oov_ppm == len(oov) * 1_000_000 // len(toks)
        assert r.n_test_types == len(types)
        assert r.n_oov_types == len(oov_types)
        assert r.type_oov_ppm == len(oov_types) * 1_000_000 // len(types)


def test_bm25_eval_consistent_with_topk_ranking(spark, docs):
    from medical_ocr_pipeline_spark.queries.similarity import (
        _DISC_E6,
        _NDCG_AT,
        BM25_QUERIES,
        bm25_eval,
        bm25_topk,
    )

    # relevance oracle: doc contains ALL query terms
    doc_words = {doc_id: set(_words(t)) for doc_id, t, _, _, _ in docs}
    rel = {
        qid: {d for d, ws in doc_words.items() if set(terms) <= ws}
        for qid, terms in BM25_QUERIES
    }
    ranking = {}
    for r in bm25_topk(spark, SF).collect():
        ranking.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    rows = {r.query_id: r for r in bm25_eval(spark, SF).collect()}
    assert set(rows) == {qid for qid, _ in BM25_QUERIES}
    for qid, r in rows.items():
        rks = sorted(ranking.get(qid, []))
        rel_ranks = [rk for rk, d in rks if d in rel[qid]]
        assert r.n_rel == len(rel[qid])
        assert r.mrr_ppm == (
            1_000_000 // rel_ranks[0] if rel_ranks else 0
        )
        in10 = [rk for rk in rel_ranks if rk <= _NDCG_AT]
        assert r.p10_ppm == len(in10) * 100_000
        dcg = sum(_DISC_E6[rk - 1] for rk in in10)
        idcg = sum(_DISC_E6[: min(len(rel[qid]), _NDCG_AT)])
        assert r.dcg_e6 == dcg
        assert r.idcg_e6 == idcg
        assert r.ndcg_ppm == (
            math.floor(dcg * 1e6 / idcg) if idcg else 0
        )
        assert 0 <= r.ndcg_ppm <= 1_000_000


def test_event_rate_spikes_matches_dict_reference(spark):
    from medical_ocr_pipeline_spark.queries.temporal import (
        SPIKE_MIN_CNT,
        SPIKE_MULT,
        SPIKE_WINDOW_H,
        event_rate_spikes,
    )

    con = duckdb.connect()
    evs = con.execute(
        f"SELECT event_type, CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    buckets = {}
    for et, hr in evs:
        buckets[(et, hr)] = buckets.get((et, hr), 0) + 1
    hr0 = {}
    for et, hr in buckets:
        hr0[et] = min(hr0.get(et, hr), hr)
    rows = event_rate_spikes(spark, SF).collect()
    assert len(rows) == len(buckets)
    n_spikes = 0
    for r in rows:
        assert r.cnt == buckets[(r.event_type, r.hr)]
        trail = sum(
            c
            for (et, h), c in buckets.items()
            if et == r.event_type
            and r.hr - SPIKE_WINDOW_H <= h <= r.hr - 1
        )
        assert r.trail_sum == trail
        assert r.ratio_ppm == (
            r.cnt * SPIKE_WINDOW_H * 1_000_000 // max(trail, 1)
        )
        expect_spike = (
            r.hr >= hr0[r.event_type] + SPIKE_WINDOW_H
            and r.cnt >= SPIKE_MIN_CNT
            and r.cnt * SPIKE_WINDOW_H > SPIKE_MULT * trail
        )
        assert r.is_spike == expect_spike
        n_spikes += r.is_spike
    # the synthetic stream is roughly uniform: spikes must be rare
    assert n_spikes < len(rows) * 0.05


def test_langid_eval_matches_manual_confusion_metrics(spark):
    from medical_ocr_pipeline_spark.queries import REGISTRY
    from medical_ocr_pipeline_spark.queries.textstats import langid_eval

    conf = {}
    for r in REGISTRY["langid_ngram"].fn(spark, SF).collect():
        conf[(r.true_lang, r.pred_lang)] = r.n
    labels = sorted(
        {t for t, _ in conf} | {p for _, p in conf}
    )
    row_n = {L: sum(n for (t, _), n in conf.items() if t == L)
             for L in labels}
    col_n = {L: sum(n for (_, p), n in conf.items() if p == L)
             for L in labels}
    tp = {L: conf.get((L, L), 0) for L in labels}
    nn = sum(conf.values())
    stp = sum(tp.values())
    spe = sum(row_n[L] * col_n[L] for L in labels)
    rows = {r.label: r for r in langid_eval(spark, SF).collect()}
    assert set(rows) == set(labels)
    for L in labels:
        r = rows[L]
        assert r.tp == tp[L]
        assert r.fp == col_n[L] - tp[L]
        assert r.fn == row_n[L] - tp[L]
        assert r.precision_ppm == (
            tp[L] * 1_000_000 // col_n[L] if col_n[L] else 0
        )
        assert r.recall_ppm == (
            tp[L] * 1_000_000 // row_n[L] if row_n[L] else 0
        )
        assert r.f1_ppm == (
            2 * tp[L] * 1_000_000 // (row_n[L] + col_n[L])
            if row_n[L] + col_n[L]
            else 0
        )
        assert r.accuracy_ppm == stp * 1_000_000 // nn
        assert r.kappa_ppm == math.floor(
            (nn * stp - spe) * 1e6 / (nn * nn - spe)
        )
    # kappa must be below raw accuracy (chance correction) on this
    # imbalanced 5-class problem
    any_row = rows[labels[0]]
    assert any_row.kappa_ppm < any_row.accuracy_ppm


def test_event_burstiness_matches_moment_formula(spark):
    from medical_ocr_pipeline_spark.queries.temporal import (
        event_burstiness,
    )

    con = duckdb.connect()
    evs = con.execute(
        f"SELECT event_type, CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    buckets = {}
    for et, hr in evs:
        buckets[(et, hr)] = buckets.get((et, hr), 0) + 1
    hrs = [h for _, h in buckets]
    nh = max(hrs) - min(hrs) + 1
    rows = {r.event_type: r for r in event_burstiness(spark, SF).collect()}
    for et in {t for t, _ in buckets}:
        cs = [c for (t, _), c in buckets.items() if t == et]
        tot, ssq = sum(cs), sum(c * c for c in cs)
        r = rows[et]
        assert r.n_events == tot
        assert r.n_active == len(cs)
        assert r.n_hours == nh
        assert r.mean_uph_ppm == tot * 1_000_000 // nh
        assert r.fano_ppm == (nh * ssq - tot * tot) * 1_000_000 // (
            nh * tot
        )
        # moment identity sanity: full-bucket population variance
        full = cs + [0] * (nh - len(cs))
        mean = tot / nh
        var = sum((c - mean) ** 2 for c in full) / nh
        assert abs(r.fano_ppm / 1e6 - var / mean) < 1e-3


def test_token_head_coverage_matches_dict_reference(spark, docs):
    from medical_ocr_pipeline_spark.queries.textstats import (
        HEAD_COVERAGE_K,
        token_head_coverage,
    )

    counts = {}
    for _, t, _, _, _ in docs:
        for w in _words(t):
            counts[w] = counts.get(w, 0) + 1
    tot = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:HEAD_COVERAGE_K]
    rows = token_head_coverage(spark, SF).collect()
    assert [(r.word, r.cnt) for r in rows] == top
    cum = 0
    for r, (w, c) in zip(rows, top):
        cum += c
        assert r.cum_cnt == cum
        assert r.cum_share_ppm == cum * 1_000_000 // tot
    # the head must cover a meaningful share but not everything
    assert 0 < rows[-1].cum_share_ppm < 1_000_000


def test_rolling_active_users_matches_dict_reference(spark):
    from medical_ocr_pipeline_spark.queries.temporal import (
        WAU_WINDOW_D,
        rolling_active_users,
    )

    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    ud = {(u, d) for u, d in evs}
    d1 = max(d for _, d in ud)
    rows = {r.day: r for r in rolling_active_users(spark, SF).collect()}
    days = sorted({d for _, d in ud})
    # every day from first activity to d1 that has >= 1 in-window
    # user-day must appear
    for day in range(days[0], d1 + 1):
        window = {
            (u, d) for u, d in ud if day - WAU_WINDOW_D < d <= day
        }
        if not window:
            assert day not in rows
            continue
        assert rows[day].wau == len({u for u, _ in window})
        assert rows[day].active_user_days == len(window)
    # WAU must be >= the single-day distinct count of its last day
    for day in days:
        dau = len({u for u, d in ud if d == day})
        assert rows[day].wau >= dau


def test_host_neighbor_jaccard_matches_set_reference(spark):
    from medical_ocr_pipeline_spark.queries.webcur import (
        host_neighbor_jaccard,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source FROM"
        f" read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    n = len(docs)
    src = dict(docs)
    nbr = {}
    for a, s in docs:
        for bid in ((a * 7 + 1) % n, (a * 13 + 5) % n):
            if bid in src and src[bid] != s:
                nbr.setdefault(s, set()).add(src[bid])
                nbr.setdefault(src[bid], set()).add(s)
    rows = host_neighbor_jaccard(spark, SF).collect()
    got = {(r.u, r.v): r for r in rows}
    hosts = sorted(nbr)
    expected = {}
    for i, u in enumerate(hosts):
        for v in hosts[i + 1:]:
            c = len(nbr[u] & nbr[v])
            if c:
                un = len(nbr[u]) + len(nbr[v]) - c
                expected[(u, v)] = (c, un, c * 1_000_000 // un)
    assert set(got) == set(expected)
    for k, (c, un, j) in expected.items():
        r = got[k]
        assert (r.n_common, r.n_union, r.jaccard_ppm) == (c, un, j)
        assert len(nbr[k[0]] | nbr[k[1]]) == un


def test_host_assortativity_matches_moment_reference(spark, docs):
    from medical_ocr_pipeline_spark.queries.webcur import (
        host_assortativity,
    )

    n = len(docs)
    src = {d: s for d, _, _, s, _ in docs}
    edges = set()
    for a in src:
        for bid in ((a * 7 + 1) % n, (a * 13 + 5) % n):
            if bid in src and src[bid] != src[a]:
                edges.add((src[a], src[bid]))
    outd = {}
    ind = {}
    for u, v in edges:
        outd[u] = outd.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    xs = [outd[u] for u, v in sorted(edges)]
    ys = [ind[v] for u, v in sorted(edges)]
    ne = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    vx, vy = ne * sxx - sx * sx, ne * syy - sy * sy
    cov = ne * sxy - sx * sy
    rows = host_assortativity(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_edges == ne
    assert r.sum_outdeg == sx
    assert r.sum_indeg == sy
    assert r.assortativity_ppm == math.floor(
        cov * 1e6 / math.sqrt(float(vx) * float(vy))
    )
    assert -1_000_000 <= r.assortativity_ppm <= 1_000_000


def test_split_length_quantiles_matches_nearest_rank(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import (
        _SPLIT_QS,
        split_length_quantiles,
    )
    from medical_ocr_pipeline_spark.queries.training import (
        TRAIN_PPM,
        VAL_PPM,
    )

    by_split = {}
    for doc_id, _, _, _, nc in docs:
        hv = _md5_int48(f"split{doc_id}") % 1_000_000
        s = "train" if hv < TRAIN_PPM else "val" if hv < VAL_PPM else "test"
        by_split.setdefault(s, []).append((nc, doc_id))
    rows = {r.split: r for r in split_length_quantiles(spark, SF).collect()}
    assert set(rows) == {s for s, v in by_split.items() if v}
    for s, xs in by_split.items():
        if not xs:
            continue
        xs.sort()
        n = len(xs)
        r = rows[s]
        assert r.n_docs == n
        for q in _SPLIT_QS:
            want = next(
                x for i, (x, _) in enumerate(xs, 1) if i * 100 >= q * n
            )
            assert getattr(r, f"p{q}") == want
        # monotone quantiles
        vals = [getattr(r, f"p{q}") for q in _SPLIT_QS]
        assert vals == sorted(vals)


def test_split_centroid_drift_matches_numpy_reference(spark):
    import numpy as np

    from medical_ocr_pipeline_spark.queries.stats import (
        _EDRIFT_TRAIN_PPM,
        split_centroid_drift,
    )

    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT vec_id, label, embedding FROM"
        f" read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by = {}
    for vec_id, label, emb in vecs:
        hv = _md5_int48(f"esplit{vec_id}") % 1_000_000
        split = "train" if hv < _EDRIFT_TRAIN_PPM else "test"
        q = [math.floor(float(x) * 1e8) for x in emb]
        by.setdefault(label, {"train": [], "test": []})[split].append(q)
    rows = {r.label: r for r in split_centroid_drift(spark, SF).collect()}
    for label, d in by.items():
        if not d["train"] or not d["test"]:
            assert label not in rows
            continue
        r = rows[label]
        nt, ns = len(d["train"]), len(d["test"])
        assert (r.n_train, r.n_test) == (nt, ns)
        st = [sum(v[i] for v in d["train"]) for i in range(64)]
        ss = [sum(v[i] for v in d["test"]) for i in range(64)]
        terms = [float(st[i] * ns - ss[i] * nt) ** 2 for i in range(64)]
        acc = 0.0
        for t in terms:  # dim-order fold, matching both engines
            acc += t
        want = math.floor(
            math.sqrt(acc) * 1e6 / (float(nt) * ns * 1e8)
        )
        assert r.dist_e6 == want
        # sanity: the quantized distance approximates the float one
        ctr_t = np.mean(np.array(d["train"], dtype=float), axis=0)
        ctr_s = np.mean(np.array(d["test"], dtype=float), axis=0)
        approx = np.linalg.norm(ctr_t - ctr_s) / 1e8
        assert abs(r.dist_e6 / 1e6 - approx) < 1e-3


def test_mad_outliers_matches_robust_reference(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import (
        _MAD_Z_E4,
        _PHI_E4,
        mad_outliers,
    )

    by_lang = {}
    for doc_id, _, lang, _, nc in docs:
        by_lang.setdefault(lang, []).append((nc, doc_id))
    rows = {r.lang: r for r in mad_outliers(spark, SF).collect()}
    assert set(rows) == set(by_lang)
    for lang, xs in by_lang.items():
        xs.sort()
        n = len(xs)

        def nearest_rank_med(vals):
            # min value whose 1-based rank satisfies rk*2 >= n
            return next(
                v for i, v in enumerate(sorted(vals), 1) if i * 2 >= n
            )

        med = nearest_rank_med([x for x, _ in xs])
        mad = nearest_rank_med([abs(x - med) for x, _ in xs])
        n_out = sum(
            1
            for x, _ in xs
            if mad > 0 and abs(x - med) * _PHI_E4 > _MAD_Z_E4 * mad
        )
        r = rows[lang]
        assert (r.n, r.med, r.mad, r.n_outliers) == (n, med, mad, n_out)
        assert 0 <= r.n_outliers < n


def _ksplit(doc_id):
    return (
        "train"
        if _md5_int48(f"ksplit{doc_id}") % 1_000_000 < 800_000
        else "test"
    )


def _rank_reference(docs):
    """Python reference for the KS / Mann-Whitney pair: per lang, the
    exact D numerator (max |cum_t*n_e - cum_e*n_t| over distinct
    lengths) and 2U (ties count once)."""
    from collections import defaultdict

    groups = defaultdict(lambda: {"train": [], "test": []})
    for doc_id, _, lang, _, nc in docs:
        groups[lang][_ksplit(doc_id)].append(nc)
    out = {}
    for lang, g in groups.items():
        tr, te = sorted(g["train"]), sorted(g["test"])
        nt, ne = len(tr), len(te)
        if nt == 0 or ne == 0:
            continue
        xs = sorted(set(tr) | set(te))
        cum_t = cum_e = 0
        d_num = 0
        u2 = 0
        for x in xs:
            ct = tr.count(x)
            ce = te.count(x)
            u2 += ct * (2 * cum_e + ce)
            cum_t += ct
            cum_e += ce
            d_num = max(d_num, abs(cum_t * ne - cum_e * nt))
        out[lang] = (nt, ne, d_num, u2)
    return out


def test_ks_split_drift_matches_ecdf_reference(spark, docs):
    from medical_ocr_pipeline_spark.queries.stats import ks_split_drift

    ref = _rank_reference(docs)
    rows = ks_split_drift(spark, SF).collect()
    assert {r["lang"] for r in rows} == set(ref)
    for r in rows:
        nt, ne, d_num, _ = ref[r["lang"]]
        assert (r["n_train"], r["n_test"], r["d_num"]) == (nt, ne, d_num)
        assert r["ks_ppm"] == d_num * 1_000_000 // (nt * ne)
        # D in [0, 1]: the ppm form is bounded
        assert 0 <= r["ks_ppm"] <= 1_000_000


def test_mannwhitney_matches_pairwise_counting(spark, docs):
    """2U from the cumulative formula must equal brute-force pairwise
    win counting (2 per strict win, 1 per tie) — the definition."""
    from medical_ocr_pipeline_spark.queries.stats import mannwhitney_split

    ref = _rank_reference(docs)
    rows = mannwhitney_split(spark, SF).collect()
    assert {r["lang"] for r in rows} == set(ref)
    # brute-force pairwise 2U
    from collections import defaultdict

    groups = defaultdict(lambda: {"train": [], "test": []})
    for doc_id, _, lang, _, nc in docs:
        groups[lang][_ksplit(doc_id)].append(nc)
    for r in rows:
        g = groups[r["lang"]]
        u2_brute = sum(
            2 if t > e else (1 if t == e else 0)
            for t in g["train"]
            for e in g["test"]
        )
        assert r["u2"] == u2_brute == ref[r["lang"]][3]
        nt, ne = ref[r["lang"]][0], ref[r["lang"]][1]
        assert r["auc_ppm"] == r["u2"] * 1_000_000 // (2 * nt * ne)
        assert 0 <= r["auc_ppm"] <= 1_000_000


def test_cusum_events_matches_sequential_recurrence(spark):
    """The window-identity CUSUM must equal the classic sequential
    clamp recurrence S_t = max(0, S_{t-1} + dev_t) replayed over the
    dense hour grid, empty hours included."""
    from collections import defaultdict

    import duckdb

    from medical_ocr_pipeline_spark.queries.temporal import (
        CUSUM_H,
        cusum_events,
    )

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, CAST(FLOOR(floor(epoch(ts)) / 3600) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    buckets = defaultdict(lambda: defaultdict(int))
    for et, hr in ev:
        buckets[et][hr] += 1
    want = {}
    for et, hrs in buckets.items():
        hr0, hr1 = min(hrs), max(hrs)
        n_hours = hr1 - hr0 + 1
        total = sum(hrs.values())
        s = 0
        for hr in range(hr0, hr1 + 1):
            dev = hrs.get(hr, 0) * n_hours - total
            s = max(0, s + dev)
            want[(et, hr)] = (
                hrs.get(hr, 0),
                s,
                s > CUSUM_H * total,
            )
    rows = cusum_events(spark, SF).collect()
    assert len(rows) == len(want)
    n_alarms = 0
    for r in rows:
        cnt, s, alarm = want[(r.event_type, r.hr)]
        assert (r.cnt, r.cusum, r.is_alarm) == (cnt, s, alarm)
        assert r.cusum >= 0
        n_alarms += alarm
    assert n_alarms > 0  # the sf0.001 stream does drift past 12 means


def test_event_seasonality_matches_dict_reference(spark):
    """season_ppm must equal the exact cross-product replayed from the
    dense grid, and the per-type indices must average to ~1e6."""
    from collections import defaultdict

    import duckdb

    from medical_ocr_pipeline_spark.queries.temporal import (
        event_seasonality,
    )

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, CAST(FLOOR(floor(epoch(ts)) / 3600) AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    buckets = defaultdict(lambda: defaultdict(int))
    for et, hr in ev:
        buckets[et][hr] += 1
    want = {}
    for et, hrs in buckets.items():
        hr0, hr1 = min(hrs), max(hrs)
        n_hours = hr1 - hr0 + 1
        total = sum(hrs.values())
        slots = defaultdict(int)
        cnts = defaultdict(int)
        for hr in range(hr0, hr1 + 1):
            slots[hr % 24] += 1
            cnts[hr % 24] += hrs.get(hr, 0)
        for hod in slots:
            # mirror the engines' double expression exactly (the
            # BIGINT product cnt*n_hours*1e6 would overflow at ~1e9
            # events/type/year, so both engines scale in doubles)
            import math

            want[(et, hod)] = (
                slots[hod],
                cnts[hod],
                math.floor(
                    float(cnts[hod] * n_hours)
                    * 1_000_000.0
                    / (float(total) * float(slots[hod]))
                ),
            )
    rows = event_seasonality(spark, SF).collect()
    assert len(rows) == len(want)
    weighted = defaultdict(int)
    slots_sum = defaultdict(int)
    for r in rows:
        assert (r.n_slots, r.cnt, r.season_ppm) == want[(r.event_type, r.hod)]
        weighted[r.event_type] += r.season_ppm * r.n_slots
        slots_sum[r.event_type] += r.n_slots
    for et in weighted:
        # slot-weighted mean index == 1e6 up to floor truncation
        mean = weighted[et] / slots_sum[et]
        assert abs(mean - 1_000_000) < 24


def test_event_transitions_and_paths_match_dict_reference(spark):
    """Transition matrix and trigram paths replayed from per-user
    (ts, event_id)-ordered sequences."""
    from collections import Counter, defaultdict

    import duckdb

    from medical_ocr_pipeline_spark.queries.temporal import (
        PATHS_TOPK,
        event_paths_topk,
        event_transitions,
    )

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM read_parquet('{SF}/events.parquet')"
        f" ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    seqs = defaultdict(list)
    for uid, et, _, _ in ev:
        seqs[uid].append(et)
    trans = Counter()
    paths = Counter()
    path_users = defaultdict(set)
    for uid, s in seqs.items():
        for a, b in zip(s, s[1:]):
            trans[(a, b)] += 1
        for a, b, c in zip(s, s[1:], s[2:]):
            p = f"{a}>{b}>{c}"
            paths[p] += 1
            path_users[p].add(uid)
    out_sums = Counter()
    for (a, _), n in trans.items():
        out_sums[a] += n
    rows = event_transitions(spark, SF).collect()
    assert len(rows) == len(trans)
    for r in rows:
        n = trans[(r.from_type, r.to_type)]
        assert r.n == n
        assert r.p_ppm == n * 1_000_000 // out_sums[r.from_type]
    # row-normalization sums to ~1e6 per from_type (floor truncation)
    by_from = defaultdict(int)
    for r in rows:
        by_from[r.from_type] += r.p_ppm
    for tot in by_from.values():
        assert 1_000_000 - 25 < tot <= 1_000_000

    want = sorted(
        ((len(path_users[p]), paths[p], p) for p in paths),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:PATHS_TOPK]
    got = [
        (r.n_users, r.n_occurrences, r.path)
        for r in event_paths_topk(spark, SF).collect()
    ]
    assert got == want


def test_langid_margin_matches_replayed_classifier(spark):
    """Margins replayed from the python trigram classifier; counts
    reconcile with langid_eval's totals."""
    import duckdb

    from medical_ocr_pipeline_spark.queries.textstats import (
        _LANG_ORDER,
        _LANG_PROFILES,
    )
    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT lang, lower(coalesce(text, ''))"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    from collections import Counter

    want = Counter()
    want_correct = Counter()
    for lang, t in docs:
        # mirror the engines' generator: substrings start at positions
        # 1..max(len-2, 1), so a 1-2 char text yields itself and an
        # empty text yields one empty string
        tri = {t[i:i + 3] for i in range(max(len(t) - 2, 1))} if t else {""}
        scores = [
            len(tri & set(_LANG_PROFILES[lg])) for lg in _LANG_ORDER
        ]
        s = dict(zip(_LANG_ORDER, scores))
        if s["en"] >= s["es"] and s["en"] >= s["de"] and s["en"] >= s["fr"]:
            pred = "en"
        elif s["es"] >= s["de"] and s["es"] >= s["fr"]:
            pred = "es"
        elif s["de"] >= s["fr"]:
            pred = "de"
        else:
            pred = "fr"
        srt = sorted(scores)
        margin = srt[3] - srt[2]
        want[(pred, margin)] += 1
        want_correct[(pred, margin)] += pred == lang
    rows = REGISTRY["langid_margin"].fn(spark, SF).collect()
    got = {(r.pred_lang, r.margin): (r.n_docs, r.n_correct) for r in rows}
    assert got == {
        k: (want[k], want_correct[k]) for k in want
    }
    assert sum(n for n, _ in got.values()) == len(docs)
