"""Benchmark decontamination + PII scrub (LLM-data-pipeline curation ops).

Both are registry queries with full DuckDB oracles; these tests pin the
SEMANTICS on hand-built frames (the oracle gate pins engine parity on
the shared testdata) and the 100 TB plan shape of the contamination
probe (broadcast semi-probe, no cartesian, no self-join pair blowup).
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_contamination_flags_benchmark_copy(spark):
    """A corpus doc that copies a benchmark doc verbatim is fully
    contaminated; an unrelated doc is clean; a doc sharing one shingle
    is partially contaminated but under the flag threshold."""
    from medical_ocr_pipeline_spark.queries.dedup import contamination_probe

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (3, bench_text),                       # benchmark member (3 % 19 == 3)
        (1, bench_text),                       # verbatim copy -> contaminated
        (2, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen seventeen "
            "eighteen nineteen twenty alpha beta gamma"),  # 1 shared shingle
        (4, "totally unrelated words without any overlap here today"),
    ]
    got = {
        r["doc_id"]: r
        for r in contamination_probe(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 4}  # benchmark doc itself is not scored
    assert got[1]["contaminated"] and got[1]["contamination_rate"] == 1.0
    assert got[4]["n_overlap"] == 0 and not got[4]["contaminated"]
    assert got[2]["n_overlap"] == 1 and not got[2]["contaminated"]
    assert 0.0 < got[2]["contamination_rate"] < 0.05


def test_contamination_plan_is_broadcast_probe(spark):
    """The benchmark shingle set must broadcast (it is the tiny side at
    any scale) and the probe must stay an equi-join — no cartesian, no
    nested-loop, no pair enumeration."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["contamination_check"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_scrub_redacts_and_counts(spark):
    """Exact redacted-string semantics: every synthesized email/phone is
    replaced, nothing else changes, counts match the injected PII."""
    from medical_ocr_pipeline_spark.queries.textstats import scrub_pii

    rows = [(0, "plain note"), (1, "second note"), (7, "third note")]
    got = {r["doc_id"]: r for r in scrub_pii(_docs(spark, rows)).collect()}
    # doc 0: doc_id % 3 == 0 -> two emails; phone 555-100-0000
    assert got[0]["n_emails"] == 2 and got[0]["n_phones"] == 1
    assert got[0]["clean_text"] == (
        "plain note contact <EMAIL> cc <EMAIL> or call <PHONE>"
    )
    # doc 1: one email; phone 555-101-0007
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[1]["clean_text"] == (
        "second note contact <EMAIL> or call <PHONE>"
    )
    assert "<EMAIL>" in got[7]["clean_text"]
    assert "@" not in got[7]["clean_text"]
    assert not any("555-" in got[k]["clean_text"] for k in got)


def test_pii_scrub_no_python_nodes(spark):
    """The scrub is pure Catalyst column expressions — no Python
    execution node anywhere in the plan (UDFs are the slow path)."""
    from medical_ocr_pipeline_spark.pipeline import plan_has_python_node
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["pii_scrub"].fn(spark, SF_DIR)
    assert not plan_has_python_node(df)


def test_repetition_metrics_hand_computed(spark):
    """Gopher repetition metrics pinned on hand-computable docs:
    a pure 2-gram loop, a duplicated 5-gram, a distinct-word doc long
    enough to clear both thresholds, and a wordless doc (0.0 fractions,
    never NULL, still one output row)."""
    from medical_ocr_pipeline_spark.queries.textstats import (
        repetition_metrics,
    )

    rows = [
        # 'aa bb' x3 of 5 bigrams; word_chars 12, top covers 3*4=12
        (1, "aa bb aa bb aa bb"),
        # 'a b c d e' twice among 16 5-grams; 20 1-char words
        (2, "a b c d e a b c d e x y z w v u t s r q"),
        # 18 distinct words, top bigram c=1; glen/word_chars < 0.20
        (3, "one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
        (4, "   "),
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_metrics(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 3, 4}

    assert got[1]["n_words"] == 6
    assert got[1]["top_bigram_count"] == 3
    assert got[1]["top_bigram_frac"] == 1.0   # 12/12
    assert got[1]["dup_5gram_frac"] == 0.0    # both 5-grams unique
    assert got[1]["repetitive"]

    assert got[2]["top_bigram_count"] == 2    # 'a b' twice
    assert got[2]["dup_5gram_frac"] == 0.5    # 2*5 chars of 20
    assert got[2]["repetitive"]

    assert got[3]["top_bigram_count"] == 1
    assert 0.0 < got[3]["top_bigram_frac"] < 0.20
    assert got[3]["dup_5gram_frac"] == 0.0
    assert not got[3]["repetitive"]

    assert got[4]["n_words"] == 0
    assert got[4]["top_bigram_count"] == 0
    assert got[4]["top_bigram_frac"] == 0.0
    assert got[4]["dup_5gram_frac"] == 0.0
    assert not got[4]["repetitive"]


def test_gopher_rules_hand_computed(spark):
    """Each Gopher rule pinned by a doc that fails exactly that rule,
    plus one doc that passes all five and an empty doc."""
    from medical_ocr_pipeline_spark.queries.curation import gopher_rules

    good = " ".join(
        ["the", "a", "and"] + [f"word{i:02d}" for i in range(57)]
    )  # 60 words, mean len in [3,10], all alpha, 3 stopwords
    short = "the a quick brown fox jumps over lazy dogs now"  # 10 words
    longwords = " ".join(
        ["the", "a"] + ["supercalifragilistic"] * 58
    )  # mean word length > 10
    symbols = good + " " + "!@#$%^&*" * 2  # 16 symbols > 60/10
    numeric = " ".join(
        ["the", "a"] + [str(1000 + i) for i in range(58)]
    )  # 2/60 alpha words < 80%
    nostop = " ".join([f"word{i:02d}" for i in range(60)])  # 0 stopwords
    rows = [
        (1, good), (2, short), (3, longwords), (4, symbols),
        (5, numeric), (6, nostop), (7, "   "),
    ]
    got = {r["doc_id"]: r for r in gopher_rules(_docs(spark, rows)).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}

    assert got[1]["keep"]
    assert all(got[1][c] for c in (
        "ok_word_count", "ok_mean_len", "ok_symbol_ratio", "ok_alpha",
        "ok_stop"))
    assert got[1]["n_words"] == 60

    assert not got[2]["ok_word_count"] and not got[2]["keep"]
    assert got[2]["ok_mean_len"] and got[2]["ok_alpha"]

    assert not got[3]["ok_mean_len"] and not got[3]["keep"]
    assert got[3]["mean_word_len"] > 10.0

    assert not got[4]["ok_symbol_ratio"] and not got[4]["keep"]
    assert got[4]["ok_word_count"]

    assert not got[5]["ok_alpha"] and not got[5]["keep"]

    assert not got[6]["ok_stop"] and not got[6]["keep"]
    assert got[6]["ok_word_count"] and got[6]["ok_alpha"]

    assert got[7]["n_words"] == 0 and not got[7]["keep"]
    assert got[7]["mean_word_len"] == 0.0


def test_gopher_rules_plan_single_scan(spark):
    """The rule set is pure per-row Catalyst: no join, no aggregate, no
    Python node — the only exchange is the presentation sort."""
    from medical_ocr_pipeline_spark.pipeline import plan_has_python_node
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["quality_gopher_rules"].fn(spark, SF_DIR)
    assert not plan_has_python_node(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_span_boilerplate_hand_computed(spark):
    """Cross-doc span sharing flags both sharers; WITHIN-doc repeats do
    not count (document frequency is distinct-doc based, the C4
    semantic); spanless docs still emit a row."""
    from medical_ocr_pipeline_spark.queries.curation import (
        boilerplate_metrics,
    )

    rows = [
        (1, "alpha beta gamma x1 x2"),   # 3 spans, 1 shared with doc 2
        (2, "zz alpha beta gamma"),      # 2 spans, 1 shared with doc 1
        (3, "p q r s"),                  # 2 spans, none shared
        (4, "a b"),                      # too short: 0 spans
        (5, "m n o m n o m n o"),        # span repeats ONLY within-doc
    ]
    got = {
        r["doc_id"]: r
        for r in boilerplate_metrics(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}

    assert got[1]["n_spans"] == 3 and got[1]["n_boiler_spans"] == 1
    assert got[1]["boiler_frac"] == 0.3333 and got[1]["flagged"]

    assert got[2]["n_spans"] == 2 and got[2]["n_boiler_spans"] == 1
    assert got[2]["boiler_frac"] == 0.5 and got[2]["flagged"]

    assert got[3]["n_boiler_spans"] == 0 and not got[3]["flagged"]

    assert got[4]["n_spans"] == 0 and got[4]["boiler_frac"] == 0.0
    assert not got[4]["flagged"]

    # 'm n o' occurs 3x in doc 5 but in only ONE distinct doc -> df=1
    assert got[5]["n_boiler_spans"] == 0 and not got[5]["flagged"]


def test_token_budget_sample_semantics(spark):
    """The smallest language keeps everything (ppm = 1e6); larger
    languages keep a hash-thresholded subset; the whole result is
    deterministic across runs (no RNG)."""
    from medical_ocr_pipeline_spark.queries.curation import (
        budget_sample_summary,
    )

    rows = []
    for i in range(4):   # small lang: 4 docs x 5 tokens
        rows.append(("aa", i, "t1 t2 t3 t4 t5"))
    for i in range(40):  # large lang: 40 docs x 10 tokens
        rows.append(("bb", 100 + i, " ".join(f"w{j}" for j in range(10))))
    docs = spark.createDataFrame(
        rows, "lang string, doc_id int, text string"
    )
    out = {r["lang"]: r for r in budget_sample_summary(docs).collect()}
    assert set(out) == {"aa", "bb"}

    aa, bb = out["aa"], out["bb"]
    assert aa["total_tokens"] == 20 and bb["total_tokens"] == 400
    assert aa["keep_rate_ppm"] == 1_000_000
    assert aa["kept_docs"] == 4 and aa["kept_tokens"] == 20
    assert bb["keep_rate_ppm"] == 50_000  # 20 * 1e6 // 400

    # pin bb's EXACT kept set against an independent python md5 walk —
    # a wrong modulus / substr length / inverted comparison in the
    # engine hash would satisfy mere <= bounds but not this
    import hashlib

    expected_bb = sum(
        1 for i in range(100, 140)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        % 1_000_000 < 50_000
    )
    assert bb["kept_docs"] == expected_bb
    assert bb["kept_tokens"] == 10 * expected_bb
    assert 0 < expected_bb < 40  # the fixture actually discriminates

    again = {r["lang"]: r for r in budget_sample_summary(docs).collect()}
    assert {k: v.asDict() for k, v in out.items()} == {
        k: v.asDict() for k, v in again.items()
    }


def test_token_budget_sample_zero_token_lang(spark):
    """A language bucket of whitespace-only docs must NOT collapse the
    budget to zero for every other language: min_total is computed over
    token-bearing languages only, and the empty language keeps 0."""
    from medical_ocr_pipeline_spark.queries.curation import (
        budget_sample_summary,
    )

    rows = [
        ("aa", 0, "one two three"),
        ("aa", 1, "four five six"),
        ("zz", 2, "   "),
    ]
    docs = spark.createDataFrame(
        rows, "lang string, doc_id int, text string"
    )
    out = {r["lang"]: r for r in budget_sample_summary(docs).collect()}
    assert out["aa"]["keep_rate_ppm"] == 1_000_000
    assert out["aa"]["kept_docs"] == 2 and out["aa"]["kept_tokens"] == 6
    assert out["zz"]["keep_rate_ppm"] == 0
    assert out["zz"]["kept_docs"] == 0 and out["zz"]["kept_tokens"] == 0


def test_token_budget_sample_plan_broadcasts_rates(spark):
    """The per-lang rate frame must broadcast back to the keep pass (it
    is tiny at any scale) — no sort-merge shuffle of the doc stream on
    lang, which would funnel each language through one reducer."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["token_budget_sample"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_line_dedup_keeps_first_occurrence(spark):
    """C4/CCNet keep-one-copy semantics on a hand-built corpus: a line
    (LINE_W=4 word segment) duplicated across documents survives only
    in the document where it first appears (corpus order = (doc_id,
    seg_idx)); unique lines all survive; documents are reassembled from
    survivors in original order."""
    from medical_ocr_pipeline_spark.queries.curation import (
        line_dedup_rewrite,
    )

    dup = "alpha beta gamma delta"  # exactly one LINE_W segment
    rows = [
        (1, dup + " one two three four"),
        (2, dup + " five six seven eight"),  # dup line dropped here
        (3, "nine ten eleven twelve " + dup),  # and here (seg_idx 1)
        (4, "lone words only here"),  # short doc: single partial segment
    ]
    got = {
        r["doc_id"]: r
        for r in line_dedup_rewrite(_docs(spark, rows)).collect()
    }
    assert got[1]["dedup_text"] == dup + " one two three four"
    assert got[1]["n_segments"] == 2 and got[1]["n_dropped"] == 0
    assert got[2]["dedup_text"] == "five six seven eight"
    assert got[2]["n_dropped"] == 1
    assert got[3]["dedup_text"] == "nine ten eleven twelve"
    assert got[3]["n_dropped"] == 1
    assert got[4]["dedup_text"] == "lone words only here"
    assert got[4]["n_segments"] == 1 and got[4]["n_kept"] == 1


def test_line_dedup_intra_doc_and_empty(spark):
    """A line repeated WITHIN one document also keeps only its first
    occurrence (global rule, no per-doc exemption), and a whitespace-only
    document yields zero segments and empty dedup_text, not NULL."""
    from medical_ocr_pipeline_spark.queries.curation import (
        line_dedup_rewrite,
    )

    dup = "alpha beta gamma delta"
    rows = [(7, f"{dup} {dup}"), (8, "   ")]
    got = {
        r["doc_id"]: r
        for r in line_dedup_rewrite(_docs(spark, rows)).collect()
    }
    assert got[7]["n_segments"] == 2 and got[7]["n_kept"] == 1
    assert got[7]["dedup_text"] == dup
    assert got[8]["n_segments"] == 0 and got[8]["n_kept"] == 0
    assert got[8]["dedup_text"] == ""


def test_line_dedup_plan_no_window_no_cartesian(spark):
    """The winner table must be a combinable MIN aggregation joined back
    as an equi-join — a global Window over the segment stream (the naive
    row_number form) would funnel hot boilerplate lines through single
    reducers at 100 TB."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["line_dedup"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # presentation orderBy is the only sort-adjacent node allowed; the
    # dedup rule itself must not be a Window
    assert plan.count("Window") == 0


def test_contamination_spans_islands_semantics(spark):
    """Span-resolved contamination: hand-built runs.  Benchmark doc 3 =
    'a1..a6' (4 shingles); doc 1 embeds two SEPARATED benchmark runs
    (positions 1-2 and 7); doc 2 is a verbatim copy (one run covering
    the whole doc); doc 4 is clean and must be absent."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        contamination_span_probe,
    )

    rows = [
        (3, "a1 a2 a3 a4 a5 a6"),                       # benchmark member
        (1, "x1 a1 a2 a3 a4 y1 y2 a4 a5 a6 z1"),        # runs of 2 and 1
        (2, "a1 a2 a3 a4 a5 a6"),                       # verbatim copy
        (4, "totally unrelated words without any overlap here"),
    ]
    got = {
        r["doc_id"]: r
        for r in contamination_span_probe(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2}  # clean + benchmark docs are absent
    assert got[1]["n_shingles"] == 9
    assert got[1]["n_contam"] == 3
    assert got[1]["n_runs"] == 2
    assert got[1]["longest_run"] == 2
    assert got[1]["span_tokens"] == 4
    assert got[2]["n_shingles"] == 4
    assert got[2]["n_contam"] == 4
    assert got[2]["n_runs"] == 1
    assert got[2]["longest_run"] == 4
    assert got[2]["span_tokens"] == 6  # the whole 6-word document


def test_contamination_spans_plan_is_broadcast_probe(spark):
    """Same 100 TB shape contract as contamination_check: benchmark
    shingles broadcast, probe stays an equi-join, the islands window
    partitions by doc_id (never a global sort)."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["contamination_spans"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "expected the islands window"
    for ln in win_lines:
        assert "doc_id#" in ln.split("Window [", 1)[1], ln


def test_decontaminate_rewrite_removes_exact_spans(spark):
    """The rewrite consumer of the span probe: tokens covered by any
    benchmark-colliding shingle vanish, survivors reassemble in order.
    doc 1's hits at positions 1, 2, 7 cover tokens {1..4, 7..9},
    leaving 'x1 y1 y2 z1'; the verbatim copy collapses to ''; the clean
    doc passes through untouched."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        decontaminate_rewrite_frame,
    )

    rows = [
        (3, "a1 a2 a3 a4 a5 a6"),                # benchmark member
        (1, "x1 a1 a2 a3 a4 y1 y2 a4 a5 a6 z1"),
        (2, "a1 a2 a3 a4 a5 a6"),                # verbatim copy
        (4, "totally unrelated words"),
    ]
    got = {
        r["doc_id"]: r
        for r in decontaminate_rewrite_frame(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 4}
    assert got[1]["clean_text"] == "x1 y1 y2 z1"
    assert got[1]["n_tokens"] == 11 and got[1]["n_removed"] == 7
    assert got[2]["clean_text"] == "" and got[2]["n_removed"] == 6
    assert got[4]["clean_text"] == "totally unrelated words"
    assert got[4]["n_removed"] == 0


def test_decontaminate_rewrite_plan_is_broadcast_probe(spark):
    """Same probe contract as the span query: benchmark shingles
    broadcast, no cartesian/nested-loop pair blowup anywhere in the
    rewrite plan."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    df = REGISTRY["decontaminate_rewrite"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_funnel_invariants(spark):
    """The funnel chains exactly: docs_in(k+1) == docs_out(k), stage-1
    docs_in is the corpus size, and the last stage's survivors equal
    corpus_keep_drop's kept docs (same shared verdict core)."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["curation_funnel"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    kd = {r["reason"]: r["n_docs"]
          for r in REGISTRY["corpus_keep_drop"].fn(spark, SF_DIR).collect()}
    n_total = sum(kd.values())
    assert rows[0]["docs_in"] == n_total
    for a, b in zip(rows, rows[1:]):
        assert b["docs_in"] == a["docs_out"]
    for r in rows:
        assert r["docs_out"] == r["docs_in"] - r["docs_dropped"]
        assert r["docs_dropped"] == kd.get(r["stage"], 0)
    assert rows[-1]["docs_out"] == kd.get("keep", 0)
    assert rows[-1]["tokens_out"] > 0


# ------------------------------------------------------------- novelty


def test_ngram_novelty_matches_python_reference(spark):
    import re

    import duckdb

    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.queries.curation import NOVELTY_N
    from tests.conftest import SF_DIR as _SF

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{_SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    seen: set = set()
    want = {}
    for doc_id, text in rows:
        ws = [w for w in re.split("[^a-z0-9]+", (text or "").lower()) if w]
        grams = {
            " ".join(ws[i : i + NOVELTY_N])
            for i in range(len(ws) - NOVELTY_N + 1)
        }
        novel = len(grams - seen)
        seen |= grams
        want[doc_id] = (
            len(grams),
            novel,
            novel * 1_000_000 // max(len(grams), 1),
        )
    got = {
        r["doc_id"]: (r["n_distinct"], r["n_novel"], r["novelty_ppm"])
        for r in REGISTRY["ngram_novelty"].fn(spark, _SF).collect()
    }
    assert got == want
    # the first document is all-novel by definition (unless empty)
    first = min(want)
    if want[first][0] > 0:
        assert got[first][2] == 1_000_000
