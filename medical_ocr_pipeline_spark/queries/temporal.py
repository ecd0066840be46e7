"""Temporal join operators Spark lacks as builtins: as-of join and
banded range join, both in their scale-path formulations.

The reference has no event-time operators at all (SURVEY.md §2.9 — pure
batch over spatial coordinates); these are the training-data-pipeline
analogues of its y-gap sessionization logic (A1-A3) transposed onto
event time, and the canonical pattern for joining 100 TB event streams
without a cartesian explosion:

* as-of join: union both sides, one window pass per key — O(n log n)
  per key, ONE shuffle, no join blow-up (vs the naive inequality join
  which Spark plans as broadcast-nested-loop).
* range join: band the time axis into fixed buckets, explode the probe
  side into the 3 adjacent buckets, equi-join on (key, bucket) — turns
  an inequality theta-join into a hash join; each pair is produced
  exactly once because the build row's bucket is unique.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    REGISTRY,
    ROUND_DIGITS,
    load,
    register,
)

R = ROUND_DIGITS

RANGE_BAND_S = 1800


@register(
    "asof_view_to_purchase",
    sql="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY user_id, purchase_id
    """,
)
def asof_view_to_purchase(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent view
    at-or-before it.  Implemented as union + one window pass: views sort
    before purchases at equal ts (side tiebreak) so >= semantics hold;
    `last(..., ignorenulls)` carries the latest view forward.  At 100 TB
    this is one shuffle on user_id and zero row amplification."""
    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(0).alias("side")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(1).alias("side")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "eid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_view = F.col("side") == 0
    # one struct-valued last() -> a single Window node (two separate
    # withColumns would leave two Window passes over the sorted partition)
    merged = views.unionByName(purchases).withColumn(
        "last_view",
        F.last(F.when(is_view, F.struct("eid", "ts")), True).over(w),
    )
    return (
        merged.where((F.col("side") == 1) & F.col("last_view").isNotNull())
        .select(
            "user_id",
            F.col("eid").alias("purchase_id"),
            F.col("last_view.eid").alias("view_id"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("last_view.ts")
            ).alias("gap_sec"),
        )
        .orderBy("user_id", "purchase_id")
    )


@register(
    "interval_join_view_purchase",
    sql="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT)
             AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    ORDER BY user_id, purchase_id, view_id
    """,
)
def interval_join_view_purchase(spark, sf_dir):
    """Event-time interval join: EVERY view within the attribution
    window (1 h) before each purchase — the pair table the as-of query
    reduces (asof keeps only the latest; multi-touch attribution wants
    them all) and the BATCH TWIN of the watermarked stream-stream join
    in streaming/joins.py: one frame function serves both paths, so
    the streaming operator's semantics are pinned by this oracle plus
    the stream == batch equivalence test (tests/test_streaming_joins.py).

    100 TB shape: an equi-join on user_id with a two-sided event-time
    band; row amplification is bounded by views-per-user-per-hour (the
    window), not stream length — the same bound that makes the
    streaming form's state finite under watermarks."""
    from medical_ocr_pipeline_spark.streaming.joins import interval_pairs

    ev = load(spark, sf_dir, "events")
    return interval_pairs(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        window_s=3600,
    ).orderBy("user_id", "purchase_id", "view_id")


@register(
    "interval_join_unattributed",
    sql="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    WHERE v.event_id IS NULL
    ORDER BY user_id, purchase_id
    """,
)
def interval_join_unattributed(spark, sf_dir):
    """Purchases with NO view inside the attribution window — the
    left-outer complement of interval_join_view_purchase, and the
    batch twin of streaming/joins.py's how='left_outer' mode (where
    the null-matched row may only be emitted once the view-side
    watermark proves a match impossible — pinned by the streaming
    tests).  Same join shape and bounds as the inner form."""
    from medical_ocr_pipeline_spark.streaming.joins import interval_pairs

    ev = load(spark, sf_dir, "events")
    return (
        interval_pairs(
            ev.where(F.col("event_type") == "view"),
            ev.where(F.col("event_type") == "purchase"),
            window_s=3600,
            how="left_outer",
        )
        .where(F.col("view_id").isNull())
        .select("user_id", "purchase_id")
        .orderBy("user_id", "purchase_id")
    )


@register(
    "range_join_event_pairs",
    sql=f"""
    SELECT a.user_id AS user_id,
           COUNT(*) AS n_pairs,
           ROUND(AVG(abs(floor(epoch(a.ts)) - floor(epoch(b.ts)))), {R})
             AS avg_gap_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(floor(epoch(a.ts)) - floor(epoch(b.ts))) <= {RANGE_BAND_S}
    GROUP BY a.user_id
    ORDER BY user_id
    """,
)
def range_join_event_pairs(spark, sf_dir):
    """Banded range self-join: per user, count event pairs within
    RANGE_BAND_S of each other.  The probe side explodes into the 3
    adjacent time buckets and the join is a plain equi-join on
    (user_id, bucket) — never an inequality nested-loop.  Row
    amplification is a fixed 3x on one side, independent of data size."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("sec"),
        )
        .withColumn("bucket", F.floor(F.col("sec") / RANGE_BAND_S))
    )
    probe = ev.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("sec").alias("a_sec"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket"),
    )
    pairs = probe.join(ev, (probe.a_user == ev.user_id) & (probe.bucket == ev.bucket)).where(
        (F.col("a_id") < F.col("event_id"))
        & (F.abs(F.col("a_sec") - F.col("sec")) <= RANGE_BAND_S)
    )
    return (
        pairs.groupBy(F.col("a_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("a_sec") - F.col("sec"))), R).alias(
                "avg_gap_sec"
            ),
        )
        .orderBy("user_id")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    sql="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), u AS (
      SELECT DISTINCT user_id FROM events
    )
    SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS furthest_step,
           COUNT(*) AS n_users
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    GROUP BY furthest_step
    ORDER BY furthest_step
    """,
)
def funnel_conversion(spark, sf_dir):
    """Funnel (sequential pattern matching, ClickHouse windowFunnel
    analogue): per user, the furthest step of view -> click -> purchase
    reached via greedy earliest matching; users counted per furthest
    step.

    Spark side is ONE shuffle: collect each user's (ts, type) events
    time-sorted and fold with a pure-Catalyst `aggregate` (fold state =
    current step) — no joins, no repeated scans.  The oracle is the
    equivalent min-chaining CTE formulation (first view, first click
    after it, first purchase after that); the two coincide because
    event timestamps are unique per user (greedy scan == strict-> min
    chain).  Memory note: collect_list materializes each user's events
    in one task, so this form assumes per-user activity fits a task
    (fine for bounded-retention event tables); for unbounded per-user
    history use funnel_conversion_scan (three scans, no arrays) or the
    streaming stateful rollup, whose state IS one int per user."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("evs")
    )
    step_exprs = " ".join(
        f"WHEN acc = {i} AND e.event_type = '{t}' THEN {i + 1}"
        for i, t in enumerate(FUNNEL_STEPS)
    )
    furthest = F.expr(
        f"aggregate(evs, 0, (acc, e) -> CASE {step_exprs} ELSE acc END)"
    )
    return (
        per_user.select(furthest.alias("furthest_step"))
        .groupBy("furthest_step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("furthest_step")
    )


_FUNNEL_SCAN_SQL = REGISTRY["funnel_conversion"].sql


@register("funnel_conversion_scan", sql=_FUNNEL_SCAN_SQL)
def funnel_conversion_scan(spark, sf_dir):
    """The unbounded-per-user-history funnel shape: three filtered scans
    chained by (user_id, ts > prev-step-min) joins + min aggregations —
    NO collect_list, so per-user state is one timestamp per step
    regardless of history length (the memory note on funnel_conversion's
    fold).  Every join/agg shuffles on user_id and every min is
    map-side combinable; AQE reuses the user_id partitioning across the
    chain.  Same oracle as funnel_conversion (the two implementations
    must agree — also asserted directly in tests)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    u = ev.select("user_id").distinct()
    furthest = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(furthest.alias("furthest_step"))
        .groupBy("furthest_step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("furthest_step")
    )


@register(
    "cohort_retention",
    sql="""
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR(MIN(floor(epoch(ts))) / 604800) AS BIGINT)
               AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(FLOOR(floor(epoch(e.ts)) / 604800) AS BIGINT)
             - f.cohort_week AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    ORDER BY f.cohort_week, week_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by the epoch-week of
    their first event, activity counted per (cohort_week, week_offset).
    Weeks are integer epoch-week buckets (floor(epoch/604800)) — no
    calendar functions, so both engines bucket identically.  The firsts
    frame is one row PER USER: at 10^9+ users it is NOT broadcastable
    (driver/executor OOM), so no broadcast hint — the groupBy computing
    `firsts` and the join both hash-partition on user_id, which AQE
    plans as a shuffle join reusing the same partitioning (and may
    still local-broadcast it at small scale); the distinct count then
    shuffles on (cohort, offset, user), two-phase."""
    wk = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    ev = load(spark, sf_dir, "events").select("user_id", wk.alias("week"))
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Event-rate spike detection (integer-exact anomaly monitor)
#
# The standing ops monitor every event pipeline runs: per (event_type,
# hour) bucket, flag counts that exceed SPIKE_MULT x the trailing
# SPIKE_WINDOW-hour mean.  The trailing window is RANGE-based on the
# integer hour (missing hours count as zero activity, which is what a
# rate monitor wants), and the spike predicate is the cross-multiplied
# integer form cnt * W > MULT * trailing_sum — exact, no float mean.

SPIKE_WINDOW_H = 24
SPIKE_MULT = 3
SPIKE_MIN_CNT = 5  # low-volume guard: a bucket under this count never flags


@register(
    "event_rate_spikes",
    sql=f"""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, hr
    ),
    w AS (
      SELECT event_type, hr, cnt,
             CAST(COALESCE(SUM(cnt) OVER (
               PARTITION BY event_type ORDER BY hr
               RANGE BETWEEN {SPIKE_WINDOW_H} PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS trail_sum,
             MIN(hr) OVER (PARTITION BY event_type) AS hr0
      FROM b
    )
    SELECT event_type, hr, cnt, trail_sum,
           CAST(cnt * {SPIKE_WINDOW_H} * 1000000
                // GREATEST(trail_sum, 1) AS BIGINT) AS ratio_ppm,
           (hr >= hr0 + {SPIKE_WINDOW_H}
            AND cnt >= {SPIKE_MIN_CNT}
            AND cnt * {SPIKE_WINDOW_H} > {SPIKE_MULT} * trail_sum)
             AS is_spike
    FROM w ORDER BY event_type, hr
    """,
)
def event_rate_spikes(spark, sf_dir):
    """Hourly event-rate anomaly monitor: a bucket spikes when its
    count exceeds {SPIKE_MULT}x the trailing {SPIKE_WINDOW_H}-hour mean
    (absent hours = zero activity, so the trailing window is RANGE on
    the integer hour, not ROWS on present buckets).  The predicate is
    cross-multiplied — cnt * W > MULT * trailing_sum, gated on a
    minimum bucket count of {SPIKE_MIN_CNT} so a near-idle stream's
    single stray event never pages anyone — and the reported
    ratio is integer-division ppm of cnt vs the trailing mean, so the
    whole frame is BIGINT-exact.  Buckets inside the first W hours of a
    type's history never flag (warm-up guard on MIN(hr), same rule in
    both engines).

    100 TB shape: one scan -> ONE combinable (type, hour) count; the
    windows then run over the BUCKET table — |types| x |hours| rows
    regardless of event volume — partitioned by type, so no task ever
    sees more than one type's bucket history.  This is the monitor
    shape that works at any event rate: the raw stream is only ever
    touched by the map-side-combinable count."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
    )
    b = e.groupBy("event_type", "hr").agg(
        F.count("*").cast("long").alias("cnt")
    )
    trail_w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-SPIKE_WINDOW_H, -1)
    )
    type_w = W.partitionBy("event_type")
    w = b.select(
        "event_type",
        "hr",
        "cnt",
        F.coalesce(F.sum("cnt").over(trail_w), F.lit(0))
        .cast("long")
        .alias("trail_sum"),
        F.min("hr").over(type_w).alias("hr0"),
    )
    return w.select(
        "event_type",
        "hr",
        "cnt",
        "trail_sum",
        F.expr(
            f"cnt * {SPIKE_WINDOW_H} * 1000000"
            f" div greatest(trail_sum, 1)"
        )
        .cast("long")
        .alias("ratio_ppm"),
        (
            (F.col("hr") >= F.col("hr0") + SPIKE_WINDOW_H)
            & (F.col("cnt") >= SPIKE_MIN_CNT)
            & (
                F.col("cnt") * SPIKE_WINDOW_H
                > SPIKE_MULT * F.col("trail_sum")
            )
        ).alias("is_spike"),
    ).orderBy("event_type", "hr")


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) per event type
#
# The dispersion summary next to event_rate_spikes' point alerts: is a
# stream Poisson-ish (Fano ~ 1), regular (< 1), or bursty (> 1)?
# Computed over the hourly count distribution INCLUDING empty hours
# (the shared global hour span), as a pure rational in the bucket
# sums: Fano = var/mean = (N * sum(c^2) - S^2) / (N * S) in floor-ppm.


@register(
    "event_burstiness",
    sql="""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, hr
    ),
    span AS (
      SELECT MAX(hr) - MIN(hr) + 1 AS nh FROM b
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(cnt) AS BIGINT) AS tot,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ssq
      FROM b GROUP BY event_type
    )
    SELECT event_type, tot AS n_events, n_active,
           CAST(span.nh AS BIGINT) AS n_hours,
           CAST(tot * 1000000 // span.nh AS BIGINT) AS mean_uph_ppm,
           CAST((span.nh * ssq - tot * tot) * 1000000
                // (span.nh * tot) AS BIGINT) AS fano_ppm
    FROM s, span ORDER BY event_type
    """,
)
def event_burstiness(spark, sf_dir):
    """Fano factor (variance-to-mean ratio) of each event type's hourly
    count distribution over the stream's global hour span — empty hours
    count as zero, which the moment algebra absorbs without
    materializing them: with N span hours, S total events and sum(c^2)
    over active hours only, var/mean = (N*sum(c^2) - S^2) / (N*S),
    exact floor-ppm (population variance; the integer products hold to
    ~3e9 events per type, past which the production variant goes
    through doubles).  Fano ~1e6 reads Poisson, >1e6 bursty.

    100 TB shape: one combinable (type, hour) count, one combinable
    per-type re-aggregation, one 1-row span broadcast.  Nothing ever
    touches the raw stream twice."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
    )
    b = e.groupBy("event_type", "hr").agg(
        F.count("*").cast("long").alias("cnt")
    )
    span = b.agg(
        (F.max("hr") - F.min("hr") + 1).alias("nh")
    )
    s = b.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_active"),
        F.sum("cnt").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ssq"),
    )
    return (
        s.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.col("tot").alias("n_events"),
            "n_active",
            F.col("nh").cast("long").alias("n_hours"),
            F.expr("tot * 1000000 div nh").cast("long").alias("mean_uph_ppm"),
            F.expr("(nh * ssq - tot * tot) * 1000000 div (nh * tot)")
            .cast("long")
            .alias("fano_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users (the WAU curve)
#
# The canonical product-analytics rolling-distinct: per day, how many
# distinct users were active in the trailing 7-day window.  Exact and
# scalable WITHOUT windowed distinct state: dedup to (user, day) once
# (combinable), then each user-day VOTES for the <= 7 calendar days
# whose trailing window contains it (a bounded explode), and the rest
# is one combinable per-day distinct count.  The explode factor is the
# window length — fixed — never the data.

WAU_WINDOW_D = 7


@register(
    "rolling_active_users",
    sql=f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(floor(epoch(ts)) / 86400) AS BIGINT) AS day
      FROM events
    ),
    span AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud
    ),
    votes AS (
      SELECT ud.user_id, ud.day + o.o AS day
      FROM ud, range({WAU_WINDOW_D}) o(o), span
      WHERE ud.day + o.o <= span.d1
    )
    SELECT day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(COUNT(*) AS BIGINT) AS active_user_days
    FROM votes GROUP BY day ORDER BY day
    """,
)
def rolling_active_users(spark, sf_dir):
    """Trailing-{7}-day distinct active users per day (the WAU curve),
    plus the window's total user-day count.  Shape: ONE (user, day)
    dedup (combinable), a fixed <= {7}x vote explode so each user-day
    lands in every trailing window that contains it, one combinable
    per-day distinct count — no per-day re-scan, no windowed distinct
    state, no self-join of the raw stream.  Days past the observed
    maximum are clipped so the curve ends with the data (same predicate
    in both engines).

    100 TB shape: the explode factor is the window length (a constant),
    and both aggregations are combinable; a user active every day
    contributes at most 7 votes per day regardless of event volume,
    because the dedup runs FIRST."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    ud = e.distinct()
    span = ud.agg(F.max("day").alias("d1"))
    votes = (
        ud.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(
                        F.col("day") + (WAU_WINDOW_D - 1), F.col("d1")
                    ),
                )
            ).alias("day"),
        )
    )
    return (
        votes.groupBy("day")
        .agg(
            F.countDistinct("user_id").cast("long").alias("wau"),
            F.count("*").cast("long").alias("active_user_days"),
        )
        .orderBy("day")
    )


# CUSUM change-point detection + hour-of-day seasonality
#
# event_rate_spikes flags POINT anomalies (one loud hour);
# event_burstiness summarizes dispersion; CUSUM detects SUSTAINED rate
# drift — many slightly-elevated hours that no single-bucket test sees
# — and the seasonality profile is the PERIODIC baseline all of them
# should be judged against (a 9am peak is not an anomaly, it's
# Tuesday).
#
# Both run over the same DENSE per-type hour grid — span rows are
# generated with sequence() so silent hours participate (a stream that
# stops must BLEED cusum and depress its hod's seasonal index) —
# bounded by calendar span x |types|, never by event volume.  The grid
# is defined ONCE below (_HOUR_GRID_SQL / _dense_hour_counts), shared
# by both queries in both engines.
#
# CUSUM exactness: the classic clamp recurrence
# S_t = max(0, S_{t-1} + x_t - ref) is sequential, but the standard
# identity S_t = cum_t - min(0, min_{k<=t} cum_k) (cum = prefix sums
# of the deviations) turns it into two cumulative windows — the same
# prefix-trick family as the qa.py DP folds, degenerating to plain
# running aggregates.  Deviations are scaled by n_hours so
# ref = total/n_hours never becomes a float: dev = cnt*n_hours - total
# exactly, and the alarm threshold of CUSUM_H hourly means
# cross-multiplies to cusum > CUSUM_H * total.

CUSUM_H = 12  # alarm at a cumulative excess of 12 hourly means

# shared dense-grid CTE chain: (event_type, hr, cnt, total, n_hours)
# with one row per type per calendar hour of that type's span
_HOUR_GRID_SQL = """
    b AS (
      SELECT event_type,
             CAST(FLOOR(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, hr
    ),
    span AS (
      SELECT event_type, MIN(hr) AS hr0,
             CAST(SUM(cnt) AS BIGINT) AS total,
             MAX(hr) - MIN(hr) + 1 AS n_hours
      FROM b GROUP BY event_type
    ),
    grid AS (
      SELECT s.event_type, s.hr0 + g.x AS hr, s.total, s.n_hours
      FROM span s, LATERAL (SELECT unnest(range(0, s.n_hours)) AS x) g
    ),
    d AS (
      SELECT g.event_type, g.hr, COALESCE(b.cnt, 0) AS cnt,
             g.total, g.n_hours
      FROM grid g
      LEFT JOIN b ON b.event_type = g.event_type AND b.hr = g.hr
    )
"""


def _dense_hour_counts(spark, sf_dir):
    """Spark twin of _HOUR_GRID_SQL: (event_type, hr, cnt, total,
    n_hours) over the dense per-type hour grid."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
    )
    b = e.groupBy("event_type", "hr").agg(
        F.count("*").cast("long").alias("cnt")
    )
    span = b.groupBy("event_type").agg(
        F.min("hr").alias("hr0"),
        F.sum("cnt").cast("long").alias("total"),
        (F.max("hr") - F.min("hr") + 1).alias("n_hours"),
    )
    grid = span.select(
        "event_type",
        "total",
        "n_hours",
        "hr0",
        F.explode(F.expr("sequence(0, n_hours - 1)")).alias("x"),
    ).select(
        "event_type",
        "total",
        "n_hours",
        (F.col("hr0") + F.col("x")).alias("hr"),
    )
    return grid.join(b, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        "total",
        "n_hours",
    )


@register(
    "cusum_events",
    sql=f"""
    WITH {_HOUR_GRID_SQL},
    c AS (
      SELECT event_type, hr, cnt, total,
             CAST(SUM(cnt * n_hours - total) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM d
    )
    SELECT event_type, hr, cnt, cum,
           CAST(cum - LEAST(0, MIN(cum) OVER (
             PARTITION BY event_type ORDER BY hr
             ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum,
           (cum - LEAST(0, MIN(cum) OVER (
             PARTITION BY event_type ORDER BY hr
             ROWS UNBOUNDED PRECEDING))) > {CUSUM_H} * total AS is_alarm
    FROM c ORDER BY event_type, hr
    """,
)
def cusum_events(spark, sf_dir):
    """Upward CUSUM drift monitor per event type over the dense hour
    grid: cusum_t = cum_t - min(0, running-min of cum), with cum the
    prefix sum of the n_hours-scaled deviations cnt*n_hours - total —
    BIGINT-exact throughout (see block comment: the clamp recurrence's
    prefix-min identity, the integer ref scaling, and why the grid
    must be dense).  Alarms when the cumulative excess tops CUSUM_H
    hourly means: sustained mild elevation that event_rate_spikes'
    single-bucket ratio never flags.

    100 TB shape: one scan -> one combinable (type, hour) count; the
    dense grid is |types| x calendar-hours (volume-independent), built
    with a per-type sequence explode; both cumulative windows run over
    that bucket table partitioned by type.  The monitor shape for any
    event rate — the raw stream is only touched by the map-side-
    combinable count."""
    d = _dense_hour_counts(spark, sf_dir).withColumn(
        "dev", F.col("cnt") * F.col("n_hours") - F.col("total")
    )
    cum_w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = d.select(
        "event_type",
        "hr",
        "cnt",
        "total",
        F.sum("dev").over(cum_w).cast("long").alias("cum"),
    )
    cusum = F.col("cum") - F.least(
        F.lit(0).cast("long"), F.min("cum").over(cum_w)
    )
    return c.select(
        "event_type",
        "hr",
        "cnt",
        "cum",
        cusum.cast("long").alias("cusum"),
        (cusum > CUSUM_H * F.col("total")).alias("is_alarm"),
    ).orderBy("event_type", "hr")


@register(
    "event_seasonality",
    sql=f"""
    WITH {_HOUR_GRID_SQL}
    SELECT event_type, hr % 24 AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_slots,
           CAST(SUM(cnt) AS BIGINT) AS cnt,
           CAST(FLOOR(CAST(SUM(cnt) * MAX(n_hours) AS DOUBLE)
                      * 1000000.0
                      / (CAST(MAX(total) AS DOUBLE) * COUNT(*)))
             AS BIGINT) AS season_ppm
    FROM d GROUP BY event_type, hod
    ORDER BY event_type, hod
    """,
)
def event_seasonality(spark, sf_dir):
    """Hour-of-day seasonal index per event type over the dense span
    grid: season_ppm = (hod mean rate) / (overall mean rate) in
    floor-ppm — 1e6 means "an average hour", 2e6 "double the average".
    Slots are counted on the dense grid so silent hours depress their
    hod's index (see block comment).  The numerator sum(cnt)*n_hours
    is BIGINT-exact; the *1e6 scaling and the division go through the
    identical double expression in both engines (the gini/corr
    discipline) because scaling first would overflow BIGINT at
    ~1e9 events/type/year — the denominator is >= 1 by construction
    (the type exists and has slots), so the double division is total.

    100 TB shape: identical skeleton to cusum_events — one combinable
    (type, hour) count, a calendar-bounded dense grid, then a
    combinable (type, hod) rollup of at most |types| x 24 rows.  No
    window at all here; the profile is pure groupBy."""
    d = _dense_hour_counts(spark, sf_dir).select(
        "event_type",
        (F.col("hr") % 24).alias("hod"),
        "cnt",
        "total",
        "n_hours",
    )
    return (
        d.groupBy("event_type", "hod")
        .agg(
            F.count("*").cast("long").alias("n_slots"),
            F.sum("cnt").cast("long").alias("cnt"),
            F.floor(
                (F.sum("cnt") * F.max("n_hours")).cast("double")
                * 1000000.0
                / (F.max("total").cast("double") * F.count("*"))
            )
            .cast("long")
            .alias("season_ppm"),
        )
        .orderBy("event_type", "hod")
    )


# ---------------------------------------------------------------------------
# Behavioral sequence mining: Markov transitions + frequent paths
#
# funnel_conversion matches ONE fixed pattern; these mine the pattern
# space itself: the first-order event-type transition matrix (where do
# users go next?) and the most common 3-step paths.  Both reduce to
# lag windows partitioned per user — high-cardinality partitions, a
# few rows each, the safe window shape — then combinable counts.
# Ordering is (ts, event_id): timestamps are unique per user in the
# testdata, but the event_id tiebreak keeps the sequence total (and
# the oracle byte-identical) even when they are not.


@register(
    "event_transitions",
    sql="""
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    t AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
             AS BIGINT) AS p_ppm
    FROM t ORDER BY from_type, to_type
    """,
)
def event_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types across all
    users: per (from, to), the transition count and row-normalized
    probability in floor-ppm.  The per-from normalizer is a window
    over the |types|^2 transition matrix, not over events.

    100 TB shape: one lag window partitioned by user (bounded rows per
    partition, millions of partitions — the orthodox window shape),
    one combinable pair count, and a 25-row normalization.  The raw
    stream is touched exactly once."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    t = (
        s.groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    norm = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
        F.sum("n").over(norm).alias("_den"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("cast(_num div _den as bigint)").alias("p_ppm"),
    ).orderBy("from_type", "to_type")


PATHS_TOPK = 20


@register(
    "event_paths_topk",
    sql=f"""
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p1,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p2
      FROM events
    ),
    tri AS (
      SELECT user_id, p2 || '>' || p1 || '>' || event_type AS path
      FROM s WHERE p2 IS NOT NULL
    ),
    agg AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM tri GROUP BY path
    )
    SELECT path, n_users, n_occurrences
    FROM agg
    ORDER BY n_users DESC, n_occurrences DESC, path
    LIMIT {PATHS_TOPK}
    """,
)
def event_paths_topk(spark, sf_dir):
    """The PATHS_TOPK most common 3-step event-type paths (by distinct
    users walking them, then total occurrences, then path — a total
    tie-break): funnel mining without a pre-declared pattern.  Two lag
    windows per user produce the trigram stream; counts are
    combinable; the top-k is a TakeOrdered over the bounded
    |types|^3 path table.

    100 TB shape: same single-scan per-user window as
    event_transitions; the path table is at most |types|^3 rows, so
    the distinct-user count is the only stage that scales with users
    — and it is a combinable two-level groupBy, never a global
    window."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    tri = s.select(
        "user_id",
        F.concat_ws(">", "p2", "p1", "event_type").alias("path"),
    )
    agg = tri.groupBy("path").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return (
        agg.select("path", "n_users", "n_occurrences")
        .orderBy(
            F.desc("n_users"), F.desc("n_occurrences"), F.asc("path")
        )
        .limit(PATHS_TOPK)
    )
