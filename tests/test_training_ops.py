"""Training-set assembly ops (queries/training.py): two-phase global
cumsum exactness and partition-count invariance, packing bin math, and
split determinism/stratification."""

from pyspark.sql import Row, functions as F

from medical_ocr_pipeline_spark.queries.training import (
    SEQ_LEN,
    global_running_offset,
    pack_sequences,
    train_test_split,
)
from tests.conftest import SF_DIR


def _ref_offsets(rows):
    """Driver-side reference: offsets in (h, doc_id) order."""
    acc, out = 0, {}
    for r in sorted(rows, key=lambda r: (r["h"], r["doc_id"])):
        out[r["doc_id"]] = acc
        acc += r["nt"]
    return out, acc


def test_global_running_offset_exact_and_partition_invariant(spark):
    rng_rows = [
        Row(doc_id=i, h=(i * 2654435761) % 1000, nt=(i * 7) % 13)
        for i in range(500)
    ]
    d = spark.createDataFrame(rng_rows)
    ref, total = _ref_offsets(rng_rows)
    for n_parts in (1, 4, 32, 97):
        got = {
            r["doc_id"]: r["offset"]
            for r in global_running_offset(d, n_parts=n_parts).collect()
        }
        assert got == ref, f"n_parts={n_parts}"
    assert max(ref[k] for k in ref) < total


def test_global_running_offset_plan_shape(spark):
    """The full frame goes through rangepartitioning + a
    _pid-partitioned window; the ONLY unpartitioned window runs over
    the one-row-per-partition totals (post-aggregate), never the input
    frame."""
    d = spark.createDataFrame(
        [Row(doc_id=i, h=i % 7, nt=i % 5) for i in range(100)]
    )
    plan = (
        global_running_offset(d, n_parts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan
    # every Window line either partitions by _pid (big frame) or sits
    # above the per-partition Aggregate (tiny totals frame); there is
    # no unpartitioned Window whose child is the raw input
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "expected window nodes in the plan"
    unpartitioned = [ln for ln in win_lines if "_pid#" not in ln]
    # the prefix window orders by _pid but has no partition spec —
    # it must reference _part_total (the aggregated frame), proving it
    # runs over one row per partition, not the corpus
    for ln in unpartitioned:
        assert "_part_total" in ln, ln


def test_pack_sequences_bin_math(spark):
    out = pack_sequences(spark, SF_DIR).collect()
    total = sum(r["nt"] for r in out)
    offs = sorted(out, key=lambda r: r["offset"])
    # offsets tile the token stream exactly: contiguous, no overlap
    acc = 0
    for r in offs:
        assert r["offset"] == acc
        acc += r["nt"]
    assert acc == total
    for r in out:
        assert r["first_bin"] == r["offset"] // SEQ_LEN
        end = r["offset"] + max(r["nt"] - 1, 0)
        assert r["last_bin"] == end // SEQ_LEN
        assert r["first_bin"] <= r["last_bin"]
    # multi-bin docs exist (docs longer than SEQ_LEN or straddling)
    assert any(r["last_bin"] > r["first_bin"] for r in out)


def test_train_test_split_ratios_and_determinism(spark):
    a = train_test_split(spark, SF_DIR).collect()
    b = train_test_split(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    by_split = {}
    for r in a:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    n = sum(by_split.values())
    assert n == 500
    # 96/2/2 with 500 docs: train dominates, val/test small but present
    assert by_split["train"] / n > 0.9
    assert 0 < by_split.get("val", 0) < 0.1 * n
    assert 0 < by_split.get("test", 0) < 0.1 * n
    # stratified: every language contributes a train row
    langs_with_train = {r["lang"] for r in a if r["split"] == "train"}
    all_langs = {r["lang"] for r in a}
    assert langs_with_train == all_langs


def test_pack_bin_manifest_tiles_the_token_stream(spark):
    from medical_ocr_pipeline_spark.queries.training import pack_bin_manifest

    docs = pack_sequences(spark, SF_DIR).collect()
    bins = pack_bin_manifest(spark, SF_DIR).collect()
    total = sum(r["nt"] for r in docs)
    # bins are contiguous from 0 and jointly hold every token exactly once
    assert [r["bin_id"] for r in bins] == list(range(len(bins)))
    assert sum(r["tokens_filled"] for r in bins) == total
    # every bin is exactly SEQ_LEN except possibly the last (tail)
    for r in bins[:-1]:
        assert r["tokens_filled"] == SEQ_LEN and r["full"]
    assert bins[-1]["tokens_filled"] <= SEQ_LEN
    # lead_doc is the doc whose span opens the bin (min offset intersecting)
    by_doc = {r["doc_id"]: r for r in docs if r["nt"] > 0}
    for r in bins:
        d = by_doc[r["lead_doc"]]
        assert d["first_bin"] <= r["bin_id"] <= d["last_bin"]
        # no intersecting doc starts earlier
        opener_off = d["offset"]
        for o in by_doc.values():
            if o["first_bin"] <= r["bin_id"] <= o["last_bin"]:
                assert o["offset"] >= opener_off
    # n_docs matches the interval-cover count
    for r in bins:
        n = sum(
            1 for o in by_doc.values()
            if o["first_bin"] <= r["bin_id"] <= o["last_bin"]
        )
        assert r["n_docs"] == n


def test_pack_bin_manifest_plan_shape(spark):
    """The bin rollup must be a combinable aggregation over the interval
    explode (partial_min_by/partial aggregate before the exchange), with
    no unpartitioned window over the exploded frame — the explode output
    is corpus_tokens/SEQ_LEN rows, the one frame that must never funnel
    through a single task."""
    from medical_ocr_pipeline_spark.queries.training import pack_bin_manifest

    plan = (
        pack_bin_manifest(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lowered = plan.lower()
    assert "generate explode" in lowered
    # partial (map-side) aggregation feeds the bin_id exchange
    assert "partial_min_by" in lowered or "partial_count" in lowered
    # no unpartitioned Window except global_running_offset's tiny
    # per-partition totals frame (references _part_total)
    for ln in plan.splitlines():
        if "Window [" in ln and "_pid#" not in ln:
            assert "_part_total" in ln, ln


def _lang_docs(spark, rows):
    return spark.createDataFrame(rows, "lang string, doc_id int, text string")


def test_unimax_waterfilling_hand_computed(spark):
    """Exact waterfilling on a 3-language corpus (cap=2 epochs, budget=
    150%): total=120 tokens -> budget=180; caps a=20, b=20, c=200;
    sorted prefix caps a and b (20*3<=180, 20*2<=160), c is uncapped
    and takes the floor remainder (180-40)//1 = 140 = 1 full epoch +
    40-token fractional target at exactly 400000 ppm."""
    from medical_ocr_pipeline_spark.queries.training import unimax_summary

    w = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [
        ("a", 1, w(10)),
        ("b", 2, w(5)), ("b", 3, w(5)),
        ("c", 4, w(25)), ("c", 5, w(25)), ("c", 6, w(25)), ("c", 7, w(25)),
    ]
    got = {
        r["lang"]: r
        for r in unimax_summary(_lang_docs(spark, rows)).collect()
    }
    for lang in ("a", "b"):
        assert got[lang]["capped"] is True
        assert got[lang]["alloc_tokens"] == got[lang]["cap_tokens"] == 20
        assert got[lang]["full_epochs"] == 2
        assert got[lang]["frac_rate_ppm"] == 0
        assert got[lang]["sampled_tokens"] == 20
    c = got["c"]
    assert c["capped"] is False
    assert c["alloc_tokens"] == 140
    assert c["full_epochs"] == 1 and c["frac_rate_ppm"] == 400_000
    # fractional part is a coin sample: bounded by the language's data,
    # and the audit identity holds exactly
    assert 0 <= c["frac_tokens_sampled"] <= c["n_tokens"]
    assert c["sampled_tokens"] == c["n_tokens"] + c["frac_tokens_sampled"]


def test_unimax_uniform_corpus_caps_nobody(spark):
    """Equal language masses: the uniform share (1.5x each language's
    data at BUDGET_PPM=1.5e6) sits below every 2-epoch cap, so NO
    language caps and all get the identical floor share — 1 full epoch
    plus a 50% fractional rate.  (The all-capped state is unreachable by
    construction: budget = 1.5x total < sum(caps) = 2x total always, so
    waterfilling can never strand budget.)"""
    from medical_ocr_pipeline_spark.queries.training import unimax_summary

    w = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [(f"l{i}", i, w(10)) for i in range(8)]
    out = unimax_summary(_lang_docs(spark, rows)).collect()
    assert len(out) == 8
    for r in out:
        assert r["capped"] is False
        assert r["alloc_tokens"] == 15  # (1.5 * 80) // 8
        assert r["full_epochs"] == 1
        assert r["frac_rate_ppm"] == 500_000
        assert r["sampled_tokens"] == 10 + r["frac_tokens_sampled"]


def test_unimax_plan_broadcasts_rates_no_cartesian(spark):
    """The doc-stream coin pass must join the (tiny) per-language rate
    frame by broadcast equi-join; no CartesianProduct anywhere (the
    constant one-row budget/kstar frames ride broadcast nested loops,
    which is fine — they are single-row by construction)."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["unimax_sample"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def _bfd_ref(items, seq_len):
    """Sequential best-fit-decreasing reference over (doc_id, rem)
    items of ONE group: tightest fitting bin, lowest index on ties."""
    order = sorted(items, key=lambda r: (-r[1], r[0]))
    residuals, assign = [], {}
    for doc_id, rem in order:
        best, best_res = -1, None
        for i, res in enumerate(residuals):
            if res >= rem and (best_res is None or res < best_res):
                best, best_res = i, res
        if best < 0:
            residuals.append(seq_len - rem)
            assign[doc_id] = len(residuals) - 1
        else:
            residuals[best] -= rem
            assign[doc_id] = best
    return assign, residuals


def test_pack_best_fit_matches_python_reference(spark):
    """Group assignment (salted md5) and within-group best-fit must
    equal the sequential reference exactly, including bin fills."""
    import hashlib

    from medical_ocr_pipeline_spark.queries.training import (
        BFD_GROUPS,
        pack_best_fit,
    )

    out = pack_best_fit(spark, SF_DIR).collect()
    assert out, "empty packing output"
    by_grp = {}
    for r in out:
        assert r["nt"] == r["full_bins"] * SEQ_LEN + r["rem"]
        if r["rem"] == 0:
            assert r["grp"] == -1 and r["bin_in_group"] == -1
            assert r["bin_fill"] == SEQ_LEN
            continue
        h = int(
            hashlib.md5(f"bfd{r['doc_id']}".encode()).hexdigest()[:12], 16
        )
        assert r["grp"] == h % BFD_GROUPS
        by_grp.setdefault(r["grp"], []).append(r)
    assert by_grp, "expected at least one remainder group"
    for grp, rows in by_grp.items():
        assign, residuals = _bfd_ref(
            [(r["doc_id"], r["rem"]) for r in rows], SEQ_LEN
        )
        fills = [SEQ_LEN - res for res in residuals]
        for r in rows:
            assert r["bin_in_group"] == assign[r["doc_id"]], (grp, r)
            assert r["bin_fill"] == fills[r["bin_in_group"]], (grp, r)
        # capacity + BFD quality: every bin <= SEQ_LEN, bins used within
        # the best-fit-decreasing guarantee of the group's lower bound
        total = sum(r["rem"] for r in rows)
        lb = -(-total // SEQ_LEN)
        assert all(0 <= res < SEQ_LEN for res in residuals)
        assert lb <= len(residuals) <= max(lb, (11 * lb) // 9 + 2)


def test_pack_best_fit_partition_invariant_and_untruncated(spark):
    """Output is a pure function of doc ids and lengths — invariant to
    input partitioning — and structurally truncation-free (every
    remainder lives in exactly one bin), unlike concat-and-chunk which
    splits every straddling document."""
    from medical_ocr_pipeline_spark.queries.training import best_fit_pack

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = sorted(
        tuple(r) for r in best_fit_pack(docs).collect()
    )
    for n_parts in (1, 7, 32):
        got = sorted(
            tuple(r)
            for r in best_fit_pack(docs.repartition(n_parts)).collect()
        )
        assert got == base, f"n_parts={n_parts}"
    # concat-and-chunk splits short docs across bins; best-fit never does
    straddlers = [
        r
        for r in pack_sequences(spark, SF_DIR).collect()
        if 0 < r["nt"] < SEQ_LEN and r["first_bin"] != r["last_bin"]
    ]
    assert straddlers, "testdata should produce concat-chunk straddlers"


def test_dsir_plan_broadcasts_ratio_table(spark):
    """The log-ratio table (bounded by DSIR_BUCKETS rows) must reach
    the gram stream as a broadcast hash join; no cartesian products —
    the only nested-loop joins allowed are the one-row totals
    crossJoins feeding the ratio table itself."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["dsir_sample"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bfd_packer_properties_fuzz():
    """Hypothesis fuzz of the group packer (pure pandas, no Spark):
    capacity never exceeded, every item assigned exactly once, fills
    consistent with assignments, bins within the BFD guarantee of the
    lower bound, and output independent of input row order."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from medical_ocr_pipeline_spark.queries.training import (
        SEQ_LEN,
        _bfd_pack_group,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=SEQ_LEN),
            min_size=1,
            max_size=60,
        ),
        st.randoms(use_true_random=False),
    )
    def run(rems, rng):
        rows = [
            {"doc_id": i, "nt": r, "full_bins": 0, "rem": r, "grp": 0}
            for i, r in enumerate(rems)
        ]
        shuffled = list(rows)
        rng.shuffle(shuffled)
        out = _bfd_pack_group(pd.DataFrame(rows))
        out2 = _bfd_pack_group(pd.DataFrame(shuffled))
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert sorted(out["doc_id"]) == sorted(r["doc_id"] for r in rows)
        fills = out.groupby("bin_in_group")["rem"].sum()
        assert (fills <= SEQ_LEN).all()
        for _, r in out.iterrows():
            assert r["bin_fill"] == fills[r["bin_in_group"]]
        n_bins = out["bin_in_group"].nunique()
        lb = -(-sum(rems) // SEQ_LEN)
        assert lb <= n_bins
        # The 11/9 BFD guarantee is relative to OPT, which the LP lower
        # bound `lb` can undershoot arbitrarily (hypothesis found
        # rems=[256, 257 x 6]: lb=4 but OPT=7 since no two items
        # coexist) — so bound with the AnyFit THEOREMS instead, which
        # hold exactly: best-fit never opens a bin while the item fits
        # in an open one, so no two bins can both be at-most-half full,
        # giving n_bins < 2*sum/C + 1.
        fills_sorted = sorted(fills)
        assert sum(1 for f in fills_sorted if f <= SEQ_LEN // 2) <= 1
        assert n_bins <= 2 * sum(rems) // SEQ_LEN + 1

    run()


def test_corpus_shuffle_is_permutation_and_invariant(spark):
    """corpus_shuffle assigns a 0..n-1 permutation in salted-md5 order,
    identical at any input partitioning, with the fixed docs-per-shard
    writer view consistent with the position."""
    from medical_ocr_pipeline_spark.queries.training import (
        SHUFFLE_SHARD_DOCS,
        corpus_shuffle,
    )

    rows = corpus_shuffle(spark, SF_DIR).collect()
    n = len(rows)
    positions = sorted(r["position"] for r in rows)
    assert positions == list(range(n))
    for r in rows:
        assert r["shard"] == r["position"] // SHUFFLE_SHARD_DOCS
    # decorrelated from doc_id order: the permutation must not be the
    # identity (probability ~1/n! for the salted hash)
    by_doc = [r["position"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert by_doc != sorted(by_doc)
