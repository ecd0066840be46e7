"""Physical-plan assertions: the properties that matter at 100 TB.

Each test runs the query, then inspects the AQE-final executed plan:
broadcast joins for small dims, predicate/column pushdown into the
parquet scan, no cartesian products, partial (map-side) aggregation.
"""

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.relational import (
    q1_pricing_summary,
    q_region_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


def final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dims(spark):
    plan = final_plan(q_region_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = final_plan(q1_pricing_summary(spark, SF_DIR))
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    # partial aggregation before the exchange (map-side combine)
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_column_pruning(spark):
    """A 2-column projection must not scan all lineitem columns."""
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = final_plan(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "l_extendedprice" not in read_schema[0]
    assert "l_orderkey" in read_schema[0]


def test_extraction_plan_is_single_python_stage(spark, tmp_path):
    """The extraction pipeline is one MapInArrow over the scan — no
    shuffle before the python stage."""
    from medical_ocr_pipeline_spark.pipeline import extract_transcripts
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    path = str(tmp_path / "tr")
    spark_transcripts(spark, 10, partitions=2).write.parquet(path)
    df = extract_transcripts(spark.read.parquet(path))
    plan = final_plan(df)
    assert plan.count("MapInArrow") == 1
    assert "Exchange" not in plan  # narrow: no shuffle in the extract path


def test_conversation_assembly_two_phase(spark, tmp_path):
    """Skew-safe assembly: two aggregation phases (bucket then conv), so
    a megaconversation never funnels through one reduce task in phase 1."""
    from medical_ocr_pipeline_spark.pipeline import (
        conversation_text,
        extract_transcripts,
    )
    from medical_ocr_pipeline_spark.synth import spark_transcripts

    path = str(tmp_path / "tr2")
    spark_transcripts(spark, 10, partitions=2).write.parquet(path)
    # bucket_size forces the two-phase regime explicitly: the auto
    # default would (correctly) refuse this unmaterialized UDF pipeline
    # since the regime probe is an action over it (pipeline.py guard)
    df = conversation_text(
        extract_transcripts(spark.read.parquet(path)), bucket_size=64
    )
    plan = final_plan(df)
    assert plan.count("Exchange") >= 2  # bucket agg + conv agg shuffles


def test_range_join_is_equi_hash_join(spark):
    """The banded range join must plan as a hash equi-join on
    (user_id, bucket) — never a BroadcastNestedLoopJoin/CartesianProduct
    (what a naive inequality join degenerates to)."""
    from medical_ocr_pipeline_spark.queries.temporal import (
        range_join_event_pairs,
    )

    plan = final_plan(range_join_event_pairs(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_join_single_data_shuffle(spark):
    """The as-of union+window plan shuffles the event data once on
    user_id; the only other exchange is the final presentation sort."""
    from medical_ocr_pipeline_spark.queries.temporal import (
        asof_view_to_purchase,
    )

    df = asof_view_to_purchase(spark, SF_DIR)
    plan = final_plan(df)
    assert "Join" not in plan  # no join operator at all: union + window
    # a single Window node computes the carried view struct
    assert len({ln.strip() for ln in plan.splitlines() if "Window" in ln}) == 1
    # exchanges: one hashpartitioning(user_id) + one rangepartitioning
    # (AQE prints the plan twice with fresh plan_ids -> normalize + dedupe)
    import re

    ex = {
        re.sub(r"\[plan_id=\d+\]", "", ln.strip())
        for ln in plan.splitlines()
        if "+- Exchange" in ln
    }
    assert len(ex) <= 2, ex


def test_set_ops_plan_as_joins(spark):
    """INTERSECT/EXCEPT must plan as semi/anti joins over the distinct
    key sets — not as a materialized set difference or cartesian."""
    from medical_ocr_pipeline_spark.queries.misc import set_ops_custkeys

    plan = final_plan(set_ops_custkeys(spark, SF_DIR))
    assert "LeftSemi" in plan or "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketing for co-located joins (the 100 TB lever for repeated
    fact-fact joins): orders and lineitem written bucketed by orderkey
    with the same bucket count join WITHOUT exchanging either side —
    the join reads pre-partitioned buckets."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            spark.read.parquet(f"{SF_DIR}/{name}.parquet")
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / f"b_{name}"))
            .saveAsTable(f"b_{name}")
    )
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = final_plan(joined)
        assert "SortMergeJoin" in plan
        # neither side shuffles on the join key (bucket layout is the
        # partitioning); only the final aggregation exchanges
        assert "hashpartitioning(l_orderkey" not in plan, plan[:800]
        assert "hashpartitioning(o_orderkey" not in plan, plan[:800]
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cohort_retention_no_explicit_broadcast_hint(spark):
    """VERDICT r01 #3: the one-row-per-user firsts frame must not carry
    an explicit broadcast hint (1e9 users would OOM); AQE may still
    choose a broadcast at this tiny scale, but the LOGICAL plan must be
    hint-free so the choice stays AQE's at any scale."""
    from medical_ocr_pipeline_spark.queries.temporal import cohort_retention

    df = cohort_retention(spark, SF_DIR)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical
    assert "UnresolvedHint" not in logical


def test_semi_anti_broadcast_only_distinct_keys(spark):
    """The broadcast side of the semi/anti customer queries is the
    distinct filtered custkey set (one narrow column, deduped), not the
    filtered orders fact."""
    from medical_ocr_pipeline_spark.queries.relational import (
        q_anti_dormant_customers,
        q_semi_urgent_customers,
    )

    for fn, join_kind in (
        (q_semi_urgent_customers, "LeftSemi"),
        (q_anti_dormant_customers, "LeftAnti"),
    ):
        plan = final_plan(fn(spark, SF_DIR))
        assert join_kind in plan
        # the broadcast build side must aggregate (distinct) BEFORE the
        # exchange: a HashAggregate under the BroadcastExchange
        i = plan.index("BroadcastExchange")
        assert "HashAggregate" in plan[i:], plan[i:i + 400]


def test_corpus_keep_drop_partial_agg_no_window(spark):
    """The prefix-dup rank is two-phase combinable aggregation, never a
    row_number window (hot-prefix partition sort)."""
    from medical_ocr_pipeline_spark.queries.textstats import corpus_keep_drop

    plan = final_plan(corpus_keep_drop(spark, SF_DIR))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_partition_pruning_on_partitioned_stage(spark, tmp_path):
    """A stage written with partitionBy must prune partitions at read:
    the scan's PartitionFilters carry the predicate and non-matching
    directories are never listed as input files."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).where(F.col("event_type") == "view")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all("event_type=view" in f for f in files)


def test_repetition_plan_is_single_scan_no_shuffle(spark):
    """quality_repetition computes everything per-document array-side:
    exactly one parquet scan, no joins, no Window, no groupBy exchange —
    the only Exchange allowed is the presentation-order sort."""
    from medical_ocr_pipeline_spark.queries import REGISTRY

    plan = final_plan(REGISTRY["quality_repetition"].fn(spark, SF_DIR))
    # the AQE toString repeats the tree under '== Initial Plan ==';
    # assert on the final section only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("FileScan") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # AQE may split the final sort


def test_substring_spans_plan_no_blowup(spark):
    """Duplicate-span detection: no cartesian/BNLJ, no Window; the
    repeat count is a partial (combinable) aggregation."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        dedup_substring_spans,
    )

    plan = final_plan(dedup_substring_spans(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan


def test_lm_score_plan_no_blowup(spark):
    """Bigram-LM scoring: LM tables come from combinable groupBys; the
    score-back joins are equi-joins, never nested loops; no Window."""
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score

    plan = final_plan(ngram_lm_score(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan


def test_mixture_sample_plan_broadcasts_rates(spark):
    """Mixture sampling: rates flow back via broadcast (the rate table
    is one row per source), and the only unpartitioned frames are the
    one-row totals."""
    from medical_ocr_pipeline_spark.queries.training import mixture_sample

    plan = final_plan(mixture_sample(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_pair_join_is_cluster_scoped(spark):
    """SemDeDup's quadratic step must be keyed by cluster_id — a
    same-cluster equi-join, never an unconditioned cross join."""
    from medical_ocr_pipeline_spark.queries.similarity import semdedup

    plan = final_plan(semdedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_ngram_jaccard_is_hash_keyed_shuffled_hash_join(spark):
    """The exact-Jaccard pair core is a hash-keyed inverted-index
    self-join: xxhash64(shingle) is the join key, so the 25-byte
    shingle string never enters the exchange or the join-side
    sort/hash (the string-keyed SMJ was measured at 2.8x CPU excess at
    28 slots — bandwidth, not compute), and the join hint is SCALE-
    CONDITIONAL ("auto"): at/above shuffleHashMinBytes of estimated
    input the SHUFFLE_HASH hint pins the no-sort physical join
    (un-hinted, Catalyst/AQE picks SMJ at corpus scale and sorts two
    full copies of the exploded table — measured 179 s vs 69 s
    steady-state at 800k docs); below it the query runs un-hinted so
    AQE broadcasts the ~4 MB exploded side (saving the hint's ~1.4 s
    toy-scale cost).  Both plans asserted at their respective scales
    by flipping the conf threshold on the same toy input.  Also
    pinned: never a cartesian, and no per-key array state (the
    rejected posting-list variant's ObjectHashAggregate)."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        _SHJ_MIN_BYTES_CONF,
        dedup_ngram_jaccard,
    )

    # corpus-scale plan: force the threshold under the toy input size
    spark.conf.set(_SHJ_MIN_BYTES_CONF, "1")
    try:
        plan = final_plan(dedup_ngram_jaccard(spark, SF_DIR))
        assert "ShuffledHashJoin" in plan
        assert "SortMergeJoin" not in plan
    finally:
        spark.conf.unset(_SHJ_MIN_BYTES_CONF)
    # toy-scale plan (default 256 MB threshold >> sf0.001): un-hinted,
    # AQE broadcast-converts the pair self-join — and never a sort
    plan = final_plan(dedup_ngram_jaccard(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for p in (plan,):
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "xxhash64" in p
        assert "ObjectHashAggregate" not in p


def test_no_literal_numpartitions_exchange_in_query_bodies(spark):
    """No registry query may pin a literal partition count: an explicit
    numPartitions (REPARTITION_BY_NUM) is a fixed parallelism ceiling —
    AQE can neither coalesce nor split it, so repartition(64, ...) at
    100 TB means ~1.5 TB per partition forever.  Two layers:

    1. source scan — queries/*.py must not contain `repartition(<int>`
       (fan-outs go through base.fanout, a key-only repartition);
    2. plan scan — the rewritten fan-out family must compile to
       REPARTITION_BY_COL, never REPARTITION_BY_NUM.
    """
    import pathlib
    import re

    qdir = (
        pathlib.Path(__file__).resolve().parents[1]
        / "medical_ocr_pipeline_spark"
        / "queries"
    )
    offenders = []
    for p in sorted(qdir.glob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if re.search(r"\.repartition\(\s*\d", line):
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)

    from medical_ocr_pipeline_spark.queries.dedup import (
        dedup_ngram_jaccard,
        span_dedup_rewrite,
    )
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score
    from medical_ocr_pipeline_spark.queries.training import bpe_pair_counts

    for q in (dedup_ngram_jaccard, span_dedup_rewrite, ngram_lm_score,
              bpe_pair_counts):
        plan = q(spark, SF_DIR)._jdf.queryExecution().sparkPlan().toString()
        assert "REPARTITION_BY_NUM" not in plan, q.__name__
        assert "REPARTITION_BY_COL" in plan, q.__name__


def test_fanout_keeps_local_parallelism(spark):
    """The session's tiny coalescePartitions.minPartitionSize floor must
    keep a key-only fan-out at the session's parallelism on toy data —
    the whole point of the fan-out is that one parquet split doesn't
    serialize the shingle pipeline onto one core."""
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.queries.base import fanout

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("token "), F.col("id").cast("string")).alias("text"),
    )
    out = fanout(df, "doc_id")
    out.collect()
    n = out.rdd.getNumPartitions()
    assert n >= 4, n  # local[8] session, shuffle.partitions=8


def test_corr_doc_stats_single_scan_partial_agg(spark):
    """The whole correlation matrix must come from ONE corpus scan (the
    pair rows explode out of a single aggregate row) with map-side
    partial aggregation."""
    from medical_ocr_pipeline_spark.queries.stats import corr_doc_stats

    plan = final_plan(corr_doc_stats(spark, SF_DIR)).split(
        "== Initial Plan =="
    )[0]
    assert plan.count("FileScan") == 1, plan
    assert "partial_" in plan.lower()


def test_chi2_broadcasts_marginals_no_cartesian(spark):
    from medical_ocr_pipeline_spark.queries.stats import chi2_lang_source

    plan = final_plan(chi2_lang_source(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_split_token_drift_topk_is_take_ordered(spark):
    """The global top-40 must plan as TakeOrdered (per-partition top-k
    + driver merge), never a full global sort."""
    from medical_ocr_pipeline_spark.queries.stats import split_token_drift

    plan = final_plan(split_token_drift(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_bm25_eval_no_cartesian_and_broadcast_terms(spark):
    from medical_ocr_pipeline_spark.queries.similarity import bm25_eval

    plan = final_plan(bm25_eval(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_sample_fixed_k_no_literal_numpartitions(spark):
    from medical_ocr_pipeline_spark.queries.stats import sample_fixed_k

    plan = sample_fixed_k(
        spark, SF_DIR
    )._jdf.queryExecution().sparkPlan().toString()
    assert "REPARTITION_BY_NUM" not in plan


def test_dp_fold_metrics_no_python_no_blowup(spark):
    """The DP-fold metrics (WER / ROUGE-L / Smith-Waterman) must be
    pure Catalyst: no Python evaluation node, no cartesian, and only
    the pair equi-join's exchanges."""
    from medical_ocr_pipeline_spark.queries.qa import (
        qa_local_align,
        qa_rouge_l,
        qa_wer_exact,
    )

    for q in (qa_wer_exact, qa_rouge_l, qa_local_align):
        plan = final_plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__
        assert "ArrowEvalPython" not in plan, q.__name__
        assert "MapInArrow" not in plan, q.__name__


def test_rank_drift_windows_run_over_bucket_table(spark):
    """ks/mw windows must consume the aggregated (lang, length) bucket
    table: a partial (map-side) aggregate appears BELOW the window in
    the plan, so no window ever sorts raw corpus rows."""
    from medical_ocr_pipeline_spark.queries.stats import ks_split_drift

    plan = final_plan(ks_split_drift(spark, SF_DIR))
    assert "Window" in plan
    win_at = plan.index("Window")
    # a partial hash aggregate must be deeper in the tree (printed
    # after) than the window node
    below = plan[win_at:]
    assert "HashAggregate" in below and "partial" in below.lower()


def test_cusum_windows_over_dense_grid_not_raw_events(spark):
    from medical_ocr_pipeline_spark.queries.temporal import cusum_events

    plan = final_plan(cusum_events(spark, SF_DIR))
    assert "Window" in plan
    below = plan[plan.index("Window"):]
    assert "HashAggregate" in below and "partial" in below.lower()
    assert "CartesianProduct" not in plan


def test_textrank_builds_graph_without_corpus_self_join(spark):
    """textrank's corpus-touching stages are the two combinable
    groupBys with the kept-vocab filters applied as broadcast joins.
    The query's own final plan only shows the post-localCheckpoint
    tail (the operator truncates lineage every round), so the graph-
    construction plan is asserted on the edge frame directly."""
    from medical_ocr_pipeline_spark.queries.base import load
    from medical_ocr_pipeline_spark.queries.textstats import (
        _TR_MIN_LEN,
        _WORD_SPLIT,
        textrank_keywords,
    )

    docs = load(spark, SF_DIR, "documents")
    ws = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), _WORD_SPLIT),
        lambda x: F.length(x) >= _TR_MIN_LEN,
    )
    w = docs.select(ws.alias("ws"))
    cnt = (
        w.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    kept = cnt.where(F.col("c") >= 3).select("word")
    big = F.expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
        " (x, i) -> concat(x, ' ', ws[i + 1]))"
    )
    bg = (
        w.select(F.explode(big).alias("g"))
        .select(
            F.expr("split_part(g, ' ', 1)").alias("a"),
            F.expr("split_part(g, ' ', 2)").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    e = (
        bg.join(F.broadcast(kept.select(F.col("word").alias("a"))), "a")
        .join(F.broadcast(kept.select(F.col("word").alias("b"))), "b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("wt"))
    )
    plan = final_plan(e)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # and the full query never degenerates to a cartesian either
    assert "CartesianProduct" not in final_plan(
        textrank_keywords(spark, SF_DIR)
    )


def test_quality_percentiles_no_corpus_wide_lang_window(spark):
    """quality_percentiles' production path must never sort the corpus
    inside Window.partitionBy(lang) — with a handful of languages that
    is a ~n_langs-partition global sort at 100 TB.  The two-phase form
    may window only WITHIN a range slice (partition spec carries the
    slice id _pid next to lang)."""
    from medical_ocr_pipeline_spark.queries.webcur import (
        quality_percentiles,
    )

    plan = final_plan(quality_percentiles(spark, SF_DIR))
    for ln in plan.splitlines():
        if "windowspecdefinition" not in ln:
            continue
        if "lang#" in ln:
            assert "_pid#" in ln, (
                "per-language window over the corpus in the production "
                "path:\n" + ln
            )


def test_j7_block_join_is_equi_not_theta(spark):
    """The spatial best-match join must key on doc_id (pairs bounded by
    lines-per-document squared) — never a cartesian/broadcast
    nested-loop over the corpus."""
    from medical_ocr_pipeline_spark.queries.qa import j7_layout_preservation

    plan = final_plan(j7_layout_preservation(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_is_equi_with_band(spark):
    """The event-time interval join must shuffle on user_id with the
    time band as a post-join filter — an equi join, not a nested
    loop."""
    from medical_ocr_pipeline_spark.queries.temporal import (
        interval_join_view_purchase,
    )

    plan = final_plan(interval_join_view_purchase(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
