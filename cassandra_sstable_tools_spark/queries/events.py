"""Event-stream analytics over the `events` table (batch side).

The reference is batch-only (SURVEY.md §2.8); these extend the engine with
the time-series operators a telemetry/training-data pipeline needs. The
streaming versions of the windowed aggregations live in
``streaming/events_stream.py``; these batch formulations define their
semantics (and oracles).

Windowing is arithmetic over canonical epoch seconds (``ts_s``, see
``tpch_adapter.events_table``): a tumbling bucket is
``(ts_s div W) * W`` -- identical, exact integer math in Spark and DuckDB
(and identical to `F.window`'s UTC-aligned starts, asserted in the streaming
test which uses the real `F.window` path).

- events_hourly:   tumbling 1-hour counts / distinct users / value cents
- events_sliding:  1-hour window sliding every 30 min (each event in 2
                   windows: buckets at :00 and :30 alignments)
- sessionize:      gap-based sessionization (new session after > 30 min idle)
                   via lag + running sum
- user_activity:   per-user rollup with conditional aggregation
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.sources.tpch_adapter import events_table

SESSION_GAP_SECONDS = 1800

_TS_S_SQL = "CAST(floor(epoch_ms(ts) / 1000) AS BIGINT)"


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event type: counts, distinct users,
    floored value cents (one shuffle; integer bucket arithmetic)."""
    e = events_table(spark, sf_dir)
    return (
        e.groupBy(
            (F.expr("ts_s div 3600") * 3600).alias("hour_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 30 min as the two-offset union --
    proven equal to F.window sliding semantics in the streaming tests."""
    e = events_table(spark, sf_dir)
    w1 = (F.expr("ts_s div 3600") * 3600).alias("window_start")
    # floor((ts_s - 1800) / 3600) via the shift trick: `div` truncates
    # toward zero, so the raw (ts_s - 1800) div 3600 would round the
    # ts_s < 1800 events UP (window starting after the event) while the
    # flooring oracle and F.window both round DOWN; adding one period
    # before the div keeps the operand non-negative (ts_s >= 0), where
    # div == floor.
    w2 = (F.expr("(ts_s + 1800) div 3600") * 3600 - 3600 + 1800).alias(
        "window_start"
    )
    both = e.select(w1).unionByName(e.select(w2))
    return both.groupBy("window_start").agg(F.count(F.lit(1)).alias("events"))


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats: a session breaks after > 30 min of inactivity."""
    e = events_table(spark, sf_dir).select(
        "user_id", "event_id", "ts_s",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    with_breaks = e.withColumn(
        "is_new",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(w) > SESSION_GAP_SECONDS, 1
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_breaks.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("events"),
        F.min("ts_s").alias("session_start"),
        F.max("ts_s").alias("session_end"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        F.sum("value_cents").alias("value_cents"),
    )


# Bucket width for the hierarchical sessionize: one day. Window partitions
# are then bounded by a user's events PER DAY, not per lifetime.
SESSIONIZE_BUCKET_S = 86400


def sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sessionize`` with BOUNDED window partitions -- the 100 TB
    formulation, bit-equal to the single-window one (same oracle certifies
    both; the differential test pins byte equality).

    The plain formulation's lag + running-sum windows partition by user
    over the user's WHOLE history: a bot account with 10^8 events becomes
    one straggler task. Hierarchical two-level prefix sum (the pack_chunks
    pattern) fixes it exactly:

      level 1: lag + break flags within (user, day-bucket) -- partitions
        bounded by a user's daily volume; the bucket is a pure function of
        ts, and (bucket, ts, event_id) order == (ts, event_id) order, so
        no session logic crosses a bucket except at its first event;
      summaries: per (user, bucket) internal break count + first/last ts
        (one co-partitioned groupBy, no new exchange);
      level 2: boundary breaks + running break offsets over the SUMMARY
        frame (per-user partitions of #active-days rows -- time-bounded,
        corpus-size-independent);
      final: session_seq = bucket offset + in-bucket running sum, with the
        bucket-first event's break flag taken from the boundary check.

    session_seq is a sum of the SAME indicator set as the single window's,
    so results are identical by construction, not approximately."""
    e = events_table(spark, sf_dir).select(
        "user_id", "event_id", "ts_s",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    ).withColumn("bucket", F.expr(f"ts_s div {SESSIONIZE_BUCKET_S}"))

    w_ub = Window.partitionBy("user_id", "bucket").orderBy("ts_s", "event_id")
    local = e.withColumn("prev_local", F.lag("ts_s").over(w_ub)).withColumn(
        "is_new_local",
        F.when(
            F.col("ts_s") - F.col("prev_local") > SESSION_GAP_SECONDS, 1
        ).otherwise(F.lit(0)),
    )

    summ = local.groupBy("user_id", "bucket").agg(
        F.sum("is_new_local").alias("internal_breaks"),
        F.min("ts_s").alias("first_ts"),
        F.max("ts_s").alias("last_ts"),
    )
    w_b = Window.partitionBy("user_id").orderBy("bucket")
    with_boundary = summ.withColumn(
        "boundary_break",
        F.when(
            F.col("first_ts") - F.lag("last_ts").over(w_b)
            > SESSION_GAP_SECONDS,
            1,
        ).otherwise(F.lit(0)),  # user's first bucket: lag NULL -> 0, like
        # the single window's first-event is_new
    )
    offs = with_boundary.withColumn(
        "bucket_offset",
        F.coalesce(
            F.sum(F.col("internal_breaks") + F.col("boundary_break")).over(
                w_b.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("user_id", "bucket", "boundary_break", "bucket_offset")

    ev = local.join(offs, ["user_id", "bucket"])
    is_new_eff = F.when(
        F.col("prev_local").isNull(), F.col("boundary_break")
    ).otherwise(F.col("is_new_local"))
    seq = F.col("bucket_offset") + F.sum(is_new_eff).over(
        w_ub.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("session_seq", seq)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.min("ts_s").alias("session_start"),
            F.max("ts_s").alias("session_end"),
            (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week; for each
    (cohort_week, activity_week) the count of cohort members active that
    week. Two shuffles by construction (per-user min, then the matrix
    groupBy) -- the standard retention formulation; the per-user cohort
    frame is broadcast back against weekly activity."""
    e = events_table(spark, sf_dir)
    week = (F.expr("ts_s div 604800") * 604800).alias("week_start")
    active = e.select("user_id", week).distinct()
    cohorts = active.groupBy("user_id").agg(
        F.min("week_start").alias("cohort_week")
    )
    return (
        active.join(cohorts, "user_id")
        .groupBy("cohort_week", "week_start")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .withColumn(
            "weeks_since_cohort",
            ((F.col("week_start") - F.col("cohort_week")) / 604800).cast("bigint"),
        )
    )


def events_top_types(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k event types per hour by volume (rank over an aggregation --
    the grouped-top-N shape at event-time grain). One shuffle for the
    count, one narrow one for the per-hour ranking."""
    e = events_table(spark, sf_dir)
    counts = e.groupBy(
        (F.expr("ts_s div 3600") * 3600).alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("events"))
    # asc_nulls_last: Spark's ASC default is NULLS FIRST, DuckDB's is NULLS
    # LAST -- a NULL-typed dirty group must rank identically in both
    w = Window.partitionBy("hour_start").orderBy(
        F.desc("events"), F.asc_nulls_last("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("hour_start", "event_type", "events", "rank")
    )


def user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime rollup with conditional aggregation (positive
    events, distinct types, last-seen)."""
    e = events_table(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("event_type").alias("distinct_types"),
        F.sum(F.when(F.col("value") > 0, 1).otherwise(0)).alias("positive_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.max("ts_s").alias("last_seen"),
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every purchase event, attributed to
    the user's most recent click at-or-before it (ties: max click event_id),
    with the click-to-purchase latency. Nulls where the user never clicked
    before the purchase. Union + single-window -- one shuffle on user_id,
    linear, no per-user quadratic range-join pair blowup."""
    from cassandra_sstable_tools_spark.operators.asof import asof_join_last

    e = events_table(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_s"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts_s",
        F.col("event_id").alias("click_event_id"),
        F.col("ts_s").alias("click_ts_s"),
    )
    joined = asof_join_last(
        purchases,
        clicks,
        keys=["user_id"],
        time_col="ts_s",
        payload_cols=["click_event_id", "click_ts_s"],
        tiebreak_col="click_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_s",
        "click_event_id",
        "click_ts_s",
        (F.col("ts_s") - F.col("click_ts_s")).alias("latency_s"),
    )


ATTRIBUTION_WINDOW_S = 1800


def clicks_near_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucketing: for each purchase, how many
    clicks by the same user fell in the preceding 30-minute window
    [ts-1800, ts] (inclusive both ends).

    Scale shape: a naive range join (`c JOIN p ON user AND c.ts BETWEEN ...`)
    gives the planner no equi-key for the time axis. Bucketing restores one:
    each interval explodes to the <=2 width-1800 buckets it covers, each
    point maps to its single bucket, the join is EQUI on (user, bucket) with
    the exact range predicate as a post-filter. A point's bucket is unique,
    so a (purchase, click) pair can match through exactly one bucket copy --
    no dedup needed. Pair volume is bounded by real matches plus same-bucket
    near-misses, never the per-user cross product."""
    e = events_table(spark, sf_dir)
    w = ATTRIBUTION_WINDOW_S
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_s").alias("p_ts")
    )
    p_bucketed = purchases.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("p_ts") - w) / w), F.floor(F.col("p_ts") / w)
            )
        ),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts_s").alias("c_ts"),
        F.floor(F.col("ts_s") / w).alias("bucket"),
    )
    matched = p_bucketed.join(
        clicks,
        on=[
            p_bucketed["user_id"] == clicks["c_user"],
            p_bucketed["bucket"] == clicks["bucket"],
            clicks["c_ts"] >= p_bucketed["p_ts"] - w,
            clicks["c_ts"] <= p_bucketed["p_ts"],
        ],
        how="inner",
    ).groupBy("event_id").agg(F.count(F.lit(1)).alias("clicks_30m"))
    return (
        purchases.join(matched, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.col("p_ts").alias("ts_s"),
            F.coalesce(F.col("clicks_30m"), F.lit(0)).alias("clicks_30m"),
        )
    )


ORACLES = {
    "clicks_near_purchases": f"""
WITH p AS (
    SELECT event_id, user_id, {_TS_S_SQL} AS ts_s
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, {_TS_S_SQL} AS ts_s
    FROM events WHERE event_type = 'click'
),
m AS (
    SELECT p.event_id, count(*) AS clicks_30m
    FROM p JOIN c ON c.user_id = p.user_id
               AND c.ts_s >= p.ts_s - {ATTRIBUTION_WINDOW_S}
               AND c.ts_s <= p.ts_s
    GROUP BY 1
)
SELECT p.event_id, p.user_id, p.ts_s,
       CAST(coalesce(m.clicks_30m, 0) AS BIGINT) AS clicks_30m
FROM p LEFT JOIN m USING (event_id)
""",
    "purchase_attribution": f"""
WITH p AS (
    SELECT event_id, user_id, {_TS_S_SQL} AS ts_s
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT event_id AS click_event_id, user_id, {_TS_S_SQL} AS click_ts_s
    FROM events WHERE event_type = 'click'
),
m AS (
    SELECT p.event_id, c.click_event_id, c.click_ts_s,
           row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY c.click_ts_s DESC, c.click_event_id DESC) AS rn
    FROM p JOIN c ON c.user_id = p.user_id AND c.click_ts_s <= p.ts_s
)
SELECT p.event_id, p.user_id, p.ts_s, m.click_event_id, m.click_ts_s,
       p.ts_s - m.click_ts_s AS latency_s
FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
""",
    "events_hourly": f"""
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       event_type,
       count(*) AS events,
       count(DISTINCT user_id) AS users,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
""",
    "events_sliding": f"""
WITH both_offsets AS (
    SELECT ({_TS_S_SQL} // 3600) * 3600 AS window_start FROM events
    UNION ALL
    SELECT (({_TS_S_SQL} - 1800) // 3600) * 3600 + 1800 FROM events
)
SELECT window_start, count(*) AS events
FROM both_offsets
GROUP BY 1
""",
    "sessionize": f"""
WITH ordered AS (
    SELECT user_id, event_id,
           {_TS_S_SQL} AS ts_s,
           CAST(floor(value * 100) AS BIGINT) AS value_cents
    FROM events
),
breaks AS (
    SELECT *,
           CASE WHEN ts_s - lag(ts_s) OVER
                     (PARTITION BY user_id ORDER BY ts_s, event_id)
                     > {SESSION_GAP_SECONDS}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sessions AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts_s, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM breaks
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS events,
       min(ts_s) AS session_start,
       max(ts_s) AS session_end,
       max(ts_s) - min(ts_s) AS duration_s,
       CAST(sum(value_cents) AS BIGINT) AS value_cents
FROM sessions
GROUP BY 1, 2
""",
    "cohort_retention": f"""
WITH active AS (
    SELECT DISTINCT user_id, ({_TS_S_SQL} // 604800) * 604800 AS week_start
    FROM events
),
cohorts AS (
    SELECT user_id, min(week_start) AS cohort_week FROM active GROUP BY 1
)
SELECT c.cohort_week, a.week_start,
       count(DISTINCT a.user_id) AS active_users,
       CAST((a.week_start - c.cohort_week) // 604800 AS BIGINT)
           AS weeks_since_cohort
FROM active a JOIN cohorts c ON c.user_id = a.user_id
GROUP BY 1, 2
""",
    "events_top_types": f"""
WITH counts AS (
    SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
           event_type, count(*) AS events
    FROM events GROUP BY 1, 2
)
SELECT hour_start, event_type, events, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY hour_start ORDER BY events DESC, event_type ASC) AS rank
    FROM counts
) WHERE rank <= 3
""",
    "user_activity": f"""
SELECT user_id,
       count(*) AS events,
       count(DISTINCT event_type) AS distinct_types,
       CAST(sum(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BIGINT) AS positive_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       max({_TS_S_SQL}) AS last_seen
FROM events
GROUP BY 1
""",
}

# sessionize_bucketed is certified against the SAME single-window oracle:
# bit-equal results are the contract, only the plan shape differs
ORACLES["sessionize_bucketed"] = ORACLES["sessionize"]

QUERIES = {
    "events_hourly": events_hourly,
    "events_sliding": events_sliding,
    "sessionize": sessionize,
    "sessionize_bucketed": sessionize_bucketed,
    "user_activity": user_activity,
    "cohort_retention": cohort_retention,
    "events_top_types": events_top_types,
    "purchase_attribution": purchase_attribution,
    "clicks_near_purchases": clicks_near_purchases,
}


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type value percentiles -- the A5 percentile operator
    (shared with pstats/cfstats) applied to the events surface: one fused
    single-buffer ``percentile(col, array(...))`` aggregate per type plus
    the count. Same scale contract as pstats: exact mode for the certified
    gate, the ``approx=True`` flag of ``percentile_cols`` is the documented
    bounded-memory path at 100 TB."""
    from cassandra_sstable_tools_spark.operators.percentiles import (
        percentile_cols,
    )

    ev = events_table(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        *percentile_cols("value"),
    )


def _events_pctl_oracle() -> str:
    from cassandra_sstable_tools_spark.operators.percentiles import (
        percentile_sql,
    )

    return f"""
SELECT event_type,
       count(*) AS events,
       {percentile_sql("value")}
FROM events
GROUP BY 1
"""


ORACLES["events_value_percentiles"] = _events_pctl_oracle()
QUERIES["events_value_percentiles"] = events_value_percentiles
