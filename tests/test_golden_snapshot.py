"""Frozen golden snapshot: the per-turn extraction semantics of
2026-08-17, pinned as committed hashes.

The parity suite compares Spark output against the single-process
oracle — but both share the core functions, so a behavior change slips
through parity as long as it changes both sides identically.  This
snapshot breaks that symmetry: tests/fixtures_golden_turns.json was
generated once and is committed; any future change to parse/lineify/
dedup/normalize/cleanup/select semantics fails here and must either be
reverted or be an INTENTIONAL semantics change that regenerates the
fixture in the same commit (call out the regeneration in the commit
message).
"""

import hashlib
import json
import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_golden_turns.json")


def test_oracle_matches_committed_snapshot():
    from medical_ocr_pipeline_spark.oracle import golden_rows

    with open(FIXTURE) as f:
        fix = json.load(f)
    want = {(t["conv_id"], t["turn_idx"]): t for t in fix["turns"]}
    rows = golden_rows(fix["n_convs"])
    assert len(rows) == fix["n_turns"]
    for r in rows:
        t = want[(r[0], r[1])]
        assert hashlib.md5(r[2].encode()).hexdigest() == t["text_md5"], (
            r[0], r[1], r[2][:80],
        )
        assert r[3] == t["n_blocks"] and r[6] == t["bytes_stripped"]
        assert r[7] == t["parse_failures"]


def test_spark_matches_committed_snapshot(spark):
    import hashlib as h

    from medical_ocr_pipeline_spark.pipeline import extract_transcripts
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    with open(FIXTURE) as f:
        fix = json.load(f)
    want = {(t["conv_id"], t["turn_idx"]): t["text_md5"] for t in fix["turns"]}
    out = extract_transcripts(
        spark_transcripts(spark, fix["n_convs"], partitions=8)
    ).collect()
    assert len(out) == fix["n_turns"]
    for r in out:
        assert h.md5(r.text_final.encode()).hexdigest() == want[
            (r.conv_id, r.turn_idx)
        ], (r.conv_id, r.turn_idx)
