"""Skew handling: an extreme megaconversation (10k turns, dwarfing every
other conversation) must flow through salted repartition, extraction, and
two-phase ordered assembly without a straggler partition and with exact
ordering preserved."""

import pandas as pd
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.pipeline import (
    conversation_text,
    extract_transcripts,
    repartition_by_conv,
)

MEGA_TURNS = 10_000
SMALL_CONVS = 40


def _skewed_frame(spark):
    mega = spark.range(MEGA_TURNS).select(
        F.lit("conv_mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("turn text payload number "), F.col("id")).alias("text"),
    )
    small = spark.range(SMALL_CONVS * 3).select(
        F.concat(F.lit("conv_s"), (F.col("id") % SMALL_CONVS)).alias("conv_id"),
        (F.col("id") / SMALL_CONVS).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("small conv text "), F.col("id")).alias("text"),
    )
    return mega.unionByName(small)


def test_salted_repartition_spreads_megaconv(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    sizes = (
        df.where(F.col("conv_id") == "conv_mega")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .toPandas()
    )
    # the megaconversation spans many partitions, none holding most of it
    assert len(sizes) >= 6
    assert sizes["count"].max() < MEGA_TURNS * 0.5


def test_unsalted_repartition_colocates(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=0)
    parts = (
        df.where(F.col("conv_id") == "conv_mega")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts == 1


def test_megaconv_assembly_exact_order(spark):
    """Two-phase assembly reproduces the exact turn order for a 10k-turn
    conversation even when the input is salted across partitions."""
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    extracted = extract_transcripts(df)
    conv = (
        conversation_text(extracted, bucket_size=128)
        .where(F.col("conv_id") == "conv_mega")
        .toPandas()
    )
    assert len(conv) == 1
    assert int(conv["n_turns"].iloc[0]) == MEGA_TURNS
    texts = conv["conv_text"].iloc[0].split("\n\n")
    assert len(texts) == MEGA_TURNS
    expected = [f"turn text payload number {i}" for i in range(MEGA_TURNS)]
    assert texts == expected


def test_extraction_row_count_under_skew(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    got = extract_transcripts(df).groupBy("conv_id").count().toPandas()
    got = got.set_index("conv_id")["count"]
    assert got["conv_mega"] == MEGA_TURNS
    assert (got.drop("conv_mega") == 3).all()


def test_adaptive_assembly_regime_and_parity(spark):
    """conversation_text picks its own regime: small state -> single
    phase (no bucket column in the plan), forced/huge state -> two
    phase; both produce identical rows."""
    extracted = extract_transcripts(_skewed_frame(spark)).cache()
    extracted.count()  # materialize: the auto probe refuses python plans

    auto = conversation_text(extracted)  # ~250 KB max state -> single
    assert "bucket" not in auto.columns
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    two = conversation_text(extracted, bucket_size=128)
    plan_two = two._jdf.queryExecution().executedPlan().toString()
    # two-phase has one more aggregate level than single-phase
    assert plan_two.count("HashAggregate") > plan_auto.count("HashAggregate")

    a = auto.orderBy("conv_id").toPandas()
    b = two.orderBy("conv_id").toPandas()
    pd.testing.assert_frame_equal(a, b)

    # a tiny threshold forces the probe down the two-phase branch
    forced = conversation_text(extracted, state_bytes_threshold=1024)
    c = forced.orderBy("conv_id").toPandas()
    pd.testing.assert_frame_equal(a, c)


def test_corpus_prefix_dedup_boilerplate_skew(spark, tmp_path):
    """VERDICT r01 #6 fixture: a corpus where 60% of docs open with the
    same 8-word boilerplate prefix (the hot key).  The two-phase prefix
    dedup must (a) match the DuckDB window oracle exactly and (b) plan
    as partial+final aggregation with NO row_number Window over the
    prefix (the hot-partition sort it replaces)."""
    import duckdb

    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    n = 500
    boiler = "thank you for contacting support how can"
    rows = []
    for i in range(n):
        if i % 5 < 3:  # 60% share the hot prefix
            body = f"{boiler} ticket {i} detail " + " ".join(
                f"w{j}" for j in range(40)
            )
        else:
            body = f"unique opening {i} " + " ".join(
                f"word{i}_{j}" for j in range(45)
            )
        rows.append((i, body, "en", "synth", len(body)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    q = REGISTRY["corpus_keep_drop"]
    got = q.fn(spark, str(tmp_path))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "prefix dedup must not be a window sort"
    got_pdf = got.toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = con.execute(q.sql).df()
    pd.testing.assert_frame_equal(
        got_pdf.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    # the hot prefix collapsed to one survivor: 60% of docs minus the
    # first are dup-reasoned
    dup_row = got_pdf[got_pdf.reason == "dup"]
    assert int(dup_row.n_docs.iloc[0]) == 3 * (n // 5) - 1


def test_quality_scores_empty_doc_matches_oracle(spark, tmp_path):
    """An empty document contributes a NULL special_ratio in BOTH
    engines (try_divide / NULLIF) instead of aborting under ANSI mode or
    poisoning the average with NaN."""
    import duckdb

    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    rows = [
        (0, "some real text with words", "en", "synth", 25),
        (1, "", "en", "synth", 0),          # empty doc: the ANSI hazard
        (2, "another document here", "en", "synth", 21),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    q = REGISTRY["f14_quality_scores"]
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = con.execute(q.sql).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    assert int(got.n_docs.iloc[0]) == 3  # empty doc still counted


def test_assembly_probe_guard(spark, tmp_path):
    """VERDICT r02 demerit #2: the auto-regime probe must refuse to
    silently execute an unmaterialized UDF pipeline, fire normally on a
    parquet read, and treat a computed cache as materialized."""
    import pytest

    from medical_ocr_pipeline_spark.pipeline import (
        assembly_regime,
        plan_has_python_node,
    )

    # an identical-plan frame cached by an earlier test would make this
    # one legitimately cache-backed — start from a clean cache
    spark.catalog.clearCache()
    extracted = extract_transcripts(_skewed_frame(spark))
    assert plan_has_python_node(extracted)
    with pytest.raises(RuntimeError, match="unmaterialized"):
        assembly_regime(extracted)
    with pytest.raises(RuntimeError, match="unmaterialized"):
        conversation_text(extracted)  # auto default propagates the guard

    # explicit opt-in still works
    bucket, mx = assembly_regime(extracted, allow_unmaterialized=True)
    assert mx > 0

    # a written stage is materialized: guard must NOT fire
    path = str(tmp_path / "stage")
    extracted.write.parquet(path)
    from_parquet = spark.read.parquet(path)
    assert not plan_has_python_node(from_parquet)
    bucket2, mx2 = assembly_regime(from_parquet)
    assert (bucket2, mx2) == (bucket, mx)

    # a computed cache reads back batches, no Python re-execution
    cached = extract_transcripts(_skewed_frame(spark)).cache()
    cached.count()
    assert not plan_has_python_node(cached)
    assert assembly_regime(cached) == (bucket, mx)
    cached.unpersist()


def test_span_dedup_rewrite_hot_window_skew(spark):
    """VERDICT r03 #6 fixture: 30% of the corpus shares ONE W=8-word
    boilerplate window — the hottest join key span_dedup_rewrite can
    see, and the case where removal semantics forbid the Jaccard
    family's freq_cap escape hatch (dropping the hot hash would
    silently keep duplicate text).

    What the fixture DEMONSTRATED (and this test pins): AQE's skew
    split does NOT apply to the occurrence join, contrary to the
    docstring's original claim — the winner aggregation and the
    occurrence side consume the same hashpartitioning(h) exchange,
    Spark reuses the shuffle stage for both SMJ children, and AQE
    refuses to touch a reused stage even with forceOptimizeSkewedJoin
    (probe (c) below).  The deterministic escape is salt_buckets: the
    occurrence side salts by pmod(xxhash64(doc_id, pos), S) and the
    one-row-per-hash winner frame replicates S ways, spreading the
    hottest window over S tasks by construction.  Pinned here:

    (a) exactness under the hot key, salted and unsalted: the
        lexicographically-first (doc_id, pos) occurrence keeps its
        tokens, every other hot doc loses exactly W, cold docs lose
        nothing, and both plans agree row-for-row;
    (b) the salted plan really joins on (h, s);
    (c) the reused-exchange AQE refusal itself, via a minimal probe:
        an identical skewed join splits (skew=true) when its sides
        come from separate exchanges and is left untouched (no
        AQEShuffleRead) when the dimension side derives from the fact
        side's own exchange — the structural fact that motivates the
        salt.
    """
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.queries.dedup import (
        SPAN_W,
        span_dedup_rewrite_frame,
    )

    n = 5_000
    boiler = " ".join(f"hotword{j}" for j in range(SPAN_W))
    rows = []
    for i in range(n):
        if i % 10 < 3:  # 30% carry the hot window
            rows.append((i, f"{boiler} u{i}a u{i}b"))
        else:  # cold docs: W+1 unique words -> 2 windows, both unique
            rows.append((i, " ".join(f"c{i}w{j}" for j in range(SPAN_W + 1))))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")

    plain = span_dedup_rewrite_frame(docs).toPandas()
    salted_df = span_dedup_rewrite_frame(docs, salt_buckets=16)
    salted = salted_df.toPandas()

    # (a) exact output: canonical = min doc_id among hot docs
    hot = {i for i in range(n) if i % 10 < 3}
    canon = min(hot)
    for pdf in (plain, salted):
        removed = dict(zip(pdf["doc_id"], pdf["n_removed"]))
        assert len(removed) == n
        assert removed[canon] == 0
        assert all(removed[d] == SPAN_W for d in hot if d != canon)
        assert all(removed[d] == 0 for d in range(n) if d not in hot)
        canon_text = pdf.set_index("doc_id").loc[canon, "clean_text"]
        assert canon_text.startswith(boiler)
    assert plain.equals(salted)

    # (b) the salted covered join keys on (h, s) — the physical form is
    # scale-dependent (AQE broadcast-converts the replicated winner
    # frame at fixture scale; SMJ/SHJ over an (h, s) exchange at
    # corpus scale), but the join keys are the salt's contract
    salted_plan = salted_df._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"Join \[h#\d+L?, s#", salted_plan), (
        "salted plan must join on (h, s)")

    # (c) the reused-exchange AQE refusal (minimal probe, forced skew)
    confs = {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # pos adds per-row entropy so the hot partition's COMPRESSED
        # shuffle bytes (what AQE's skew detector measures) actually
        # dominate — a constant-key run-length-encodes to almost
        # nothing and evades detection at fixture scale
        fact = spark.range(36_000).select(
            (F.col("id") % 97).alias("doc_id"),
            (F.col("id") % 31).cast("int").alias("pos"),
            F.when(F.col("id") < 6_000, F.lit(123456789))
            .otherwise(F.col("id")).alias("h"),
        )
        # separate-exchange dim: AQE splits the hot partition
        dim = spark.range(2_000).select(
            F.when(F.col("id") == 0, F.lit(123456789))
            .otherwise(F.col("id") + 10**7).alias("h"))
        j1 = fact.join(dim, "h").groupBy("doc_id").count()
        j1.collect()
        p1 = j1._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p1
        # dim derived from fact's own exchange: stage reused, AQE out
        dim2 = fact.groupBy("h").agg(F.count("*").alias("cnt")).select("h")
        j2 = fact.join(dim2, "h").groupBy("doc_id").count()
        j2.collect()
        p2 = j2._jdf.queryExecution().executedPlan().toString()
        # the identically-skewed join is NOT split (downstream shuffles
        # may still coalesce — the refusal is join-stage-specific)
        assert "skew=true" not in p2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
