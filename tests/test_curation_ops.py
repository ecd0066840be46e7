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
