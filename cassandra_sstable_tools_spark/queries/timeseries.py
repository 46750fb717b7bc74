"""Time-series analytics over `events`: funnels, gap-fill, moving windows.

The reference is a batch stats tool with no time axis (SURVEY.md §2.8);
these extend the engine with the remaining time-series shapes a telemetry /
product-analytics pipeline needs beyond ``queries/events.py``:

- funnel_stages:    ordered multi-stage conversion funnel (view -> click ->
                    purchase, each stage strictly after the previous one)
- events_gapfill:   dense hourly axis with zero-filled missing buckets
                    (sequence + explode -- the distributed gap-fill idiom)
- events_moving_avg: trailing 3-hour moving aggregate via a RANGE window
                    frame over event-time (not ROWS: gaps must widen the
                    frame, which only range frames express)
- events_anomaly:   hours exceeding 2x the strictly-preceding-hours average
                    (cross-multiplied integer threshold, no float baseline)
- events_type_stats_salted: the skew-salting operator certified against the
                    plain one-phase GROUP BY oracle
- events_cube:      all four (type, day-of-week) grouping sets in one
                    Expand+aggregate pass, grouping_id-disambiguated
- events_props_stats: typed from_json over the JSON payload column --
                    parse in-scan, only extracted ints reach the shuffle
- events_users_sketch_hourly: windowed HLL++ distinct-user contract
                    (exact count + in-tolerance boolean)

All time math is exact integer arithmetic over canonical epoch seconds
(``ts_s``, see ``tpch_adapter.events_table``) so Spark and the DuckDB
oracles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.queries.events import _TS_S_SQL
from cassandra_sstable_tools_spark.sources.tpch_adapter import events_table

FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users whose first `view` is
    followed by a later `click`, followed by a later `purchase`.

    Shape: stage N is a per-user min over the stage-N events that happened
    AFTER the user's stage-(N-1) time -- a chain of
    filter -> join(user_id) -> groupBy(user_id) steps. Every shuffle in the
    chain is keyed on user_id, so each groupBy's output is already
    hash-partitioned for the next stage's join (no re-exchange of the
    per-user frames); the big events scan is filtered to one event_type
    BEFORE its shuffle. Per-user state is one timestamp per stage -- O(users)
    total, never a per-user event blowup. At 100 TB this is 3 slim shuffles
    of the type-filtered slices, not 3 scans' worth of raw events.
    """
    e = events_table(spark, sf_dir).select("user_id", "event_type", "ts_s")
    return funnel_over(e)


def funnel_over(e: DataFrame, stages: list[str] = FUNNEL_STAGES) -> DataFrame:
    """Core funnel over any (user_id, event_type, ts_s) frame -- split out
    so the randomized differential test can drive it with generated data."""

    def stage_events(stage_type: str) -> DataFrame:
        return e.where(F.col("event_type") == stage_type)

    reached = stage_events(stages[0]).groupBy("user_id").agg(
        F.min("ts_s").alias("t_prev")
    )
    counts = [reached.agg(F.count(F.lit(1)).alias("users"))]
    for stage_type in stages[1:]:
        reached = (
            stage_events(stage_type)
            .join(reached, "user_id")
            .where(F.col("ts_s") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts_s").alias("t_prev"))
        )
        counts.append(reached.agg(F.count(F.lit(1)).alias("users")))
    out = None
    for i, (stage_type, c) in enumerate(zip(stages, counts), start=1):
        row = c.select(
            F.lit(i).alias("stage"),
            F.lit(stage_type).alias("event_type"),
            F.col("users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts per type over a DENSE hour axis: every
    (hour, event_type) cell between the corpus' first and last hour exists,
    zero-filled where no events landed.

    Shape: one shuffle aggregates events to (hour, type) counts; the dense
    axis is generated driver-free via ``sequence(min, max, 3600)`` +
    ``explode`` on a 1-row global-bounds frame crossed with the distinct
    types -- O(hours x types) rows, aggregate-sized at any corpus scale, so
    the left join back to the counts broadcasts. No collect, no Python
    loop over the time range."""
    e = events_table(spark, sf_dir)
    counts = _hourly_counts(e)
    # bucket-of-min == min-of-buckets (monotonic), using the SAME truncating
    # `div` idiom as the counts -- mixing floor() here would emit a phantom
    # axis row if ts_s could go negative
    bounds = e.agg(
        (F.expr("min(ts_s) div 3600") * 3600).cast("bigint").alias("mn"),
        (F.expr("max(ts_s) div 3600") * 3600).cast("bigint").alias("mx"),
    )
    types = e.select("event_type").distinct()
    axis = bounds.crossJoin(types).select(
        F.explode(F.sequence("mn", "mx", F.lit(3600))).alias("hour_start"),
        "event_type",
    )
    return axis.join(
        F.broadcast(counts), ["hour_start", "event_type"], "left"
    ).select(
        "hour_start",
        "event_type",
        F.coalesce(F.col("events"), F.lit(0)).alias("events"),
    )


def _hourly_counts(e: DataFrame) -> DataFrame:
    """(hour_start, event_type, events) -- THE canonical hourly bucketing,
    shared by gap-fill / moving-average / anomaly / sketch so the bucket
    expression cannot drift between them (its SQL mirror is _HOURLY_SQL).
    Domain note: ts_s >= 0 (epoch seconds; Spark's `div` truncates while
    DuckDB's `//` floors -- identical on the non-negative domain the
    events contract guarantees)."""
    hour = (F.expr("ts_s div 3600") * 3600).alias("hour_start")
    return e.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("events")
    )


MOVING_WINDOW_S = 7200  # current hour + the 2 preceding = trailing 3h


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour moving aggregate of hourly event counts, per type,
    computed with a RANGE window frame over event-time.

    RANGE (not ROWS) is the point: hours with zero events are absent from
    the sparse aggregate, and a rows-frame would silently widen the time
    span it averages over; a range frame keyed on the hour epoch keeps the
    frame exactly [h-7200, h] regardless of gaps. The window partitions by
    event_type over HOURLY aggregate rows -- O(hours) per partition, i.e.
    aggregate-sized state no matter how big the raw corpus is; the one real
    shuffle is the hourly groupBy. The average is emitted as exact
    floor-milli units (integer determinism, SCALE.md #1)."""
    counts = _hourly_counts(events_table(spark, sf_dir))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rangeBetween(-MOVING_WINDOW_S, 0)
    )
    frame_sum = F.sum("events").over(w)
    frame_n = F.count(F.lit(1)).over(w)
    return counts.select(
        "hour_start",
        "event_type",
        "events",
        frame_sum.alias("events_3h_sum"),
        F.floor(frame_sum * 1000 / frame_n).alias("moving_avg_milli"),
    )


_HOURLY_SQL = f"""
    SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
           event_type, count(*) AS events
    FROM events GROUP BY 1, 2
"""

ORACLES = {
    "funnel_stages": f"""
WITH e AS (
    SELECT user_id, event_type, {_TS_S_SQL} AS ts_s FROM events
),
s1 AS (
    SELECT user_id, min(ts_s) AS t1 FROM e
    WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts_s) AS t2
    FROM e JOIN s1 ON e.user_id = s1.user_id AND e.ts_s > s1.t1
    WHERE e.event_type = '{FUNNEL_STAGES[1]}' GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts_s) AS t3
    FROM e JOIN s2 ON e.user_id = s2.user_id AND e.ts_s > s2.t2
    WHERE e.event_type = '{FUNNEL_STAGES[2]}' GROUP BY 1
)
SELECT 1 AS stage, '{FUNNEL_STAGES[0]}' AS event_type,
       (SELECT count(*) FROM s1) AS users
UNION ALL
SELECT 2, '{FUNNEL_STAGES[1]}', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, '{FUNNEL_STAGES[2]}', (SELECT count(*) FROM s3)
""",
    "events_gapfill": f"""
WITH c AS ({_HOURLY_SQL}),
b AS (SELECT min(hour_start) AS mn, max(hour_start) AS mx FROM c),
hours AS (
    SELECT unnest(generate_series(b.mn, b.mx, 3600)) AS hour_start FROM b
),
axis AS (
    SELECT hours.hour_start, t.event_type
    FROM hours, (SELECT DISTINCT event_type FROM events) t
)
SELECT axis.hour_start, axis.event_type,
       CAST(coalesce(c.events, 0) AS BIGINT) AS events
FROM axis LEFT JOIN c
  ON c.hour_start = axis.hour_start AND c.event_type = axis.event_type
""",
    "events_moving_avg": f"""
WITH c AS ({_HOURLY_SQL})
SELECT hour_start, event_type, events,
       CAST(sum(events) OVER w AS BIGINT) AS events_3h_sum,
       CAST(floor(sum(events) OVER w * 1000.0 / count(*) OVER w) AS BIGINT)
           AS moving_avg_milli
FROM c
WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
             RANGE BETWEEN {MOVING_WINDOW_S} PRECEDING AND CURRENT ROW)
""",
}

QUERIES = {
    "funnel_stages": funnel_stages,
    "events_gapfill": events_gapfill,
    "events_moving_avg": events_moving_avg,
}


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly flags: an hour is anomalous for a type when its
    count exceeds 2x the average of the TWO PRECEDING hours (frame
    [h-7200, h-3600] -- strictly historical, so the anomaly can't dampen its
    own baseline). The comparison is cross-multiplied integers
    (events * n_prev > 2 * sum_prev): exact, no float average. Hours with no
    history flag false. Same aggregate-sized window input as
    ``events_moving_avg``."""
    counts = _hourly_counts(events_table(spark, sf_dir))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rangeBetween(-2 * 3600, -3600)
    )
    prev_sum = F.sum("events").over(w)
    prev_n = F.count(F.lit(1)).over(w)
    return counts.select(
        "hour_start",
        "event_type",
        "events",
        F.coalesce(prev_sum, F.lit(0)).alias("prev_sum"),
        prev_n.alias("prev_hours"),
        F.when(
            (prev_n > 0) & (F.col("events") * prev_n > 2 * prev_sum), True
        )
        .otherwise(False)
        .alias("is_anomaly"),
    )


ORACLES["events_anomaly"] = f"""
WITH c AS ({_HOURLY_SQL})
SELECT hour_start, event_type, events,
       CAST(coalesce(sum(events) OVER w, 0) AS BIGINT) AS prev_sum,
       CAST(count(*) OVER w AS BIGINT) AS prev_hours,
       CASE WHEN count(*) OVER w > 0
                 AND events * count(*) OVER w > 2 * sum(events) OVER w
            THEN true ELSE false END AS is_anomaly
FROM c
WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
             RANGE BETWEEN 7200 PRECEDING AND 3600 PRECEDING)
"""
QUERIES["events_anomaly"] = events_anomaly


def events_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type global stats via the SALTED two-phase aggregation
    (operators/salting.py), registered so the skew path is itself
    oracle-certified. event_type has ~5 distinct values -- exactly the
    pathological regime at 100 TB, where a plain groupBy funnels 20% of the
    corpus into each of 5 reducer tasks; the salt splits each key across 16
    reducers and the second exchange moves only 16 partial rows per key.
    The oracle is the PLAIN one-phase GROUP BY: the hash-equality proves the
    2-exchange plan is semantically invisible."""
    from cassandra_sstable_tools_spark.operators.salting import salted_agg

    e = events_table(spark, sf_dir).select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
        "ts_s",
    )
    return salted_agg(
        e,
        key_cols=["event_type"],
        aggs={
            # true count(*) kind: counts rows even if every column is NULL
            "events": ("count_star", "*"),
            "value_cents": ("sum", "value_cents"),
            "first_ts_s": ("min", "ts_s"),
            "last_ts_s": ("max", "ts_s"),
        },
    )


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping sets --
    (type, dow), (type), (dow), () -- in ONE pass with grouping_id
    disambiguating the all-rows marker from a genuine value. Spark plans
    this as a single Expand + aggregate (4x row multiplication before the
    partial agg, then one shuffle); at scale that beats four separate
    scans+shuffles as long as the expansion factor stays small."""
    e = events_table(spark, sf_dir)
    dow = ((F.expr("ts_s div 86400") + 4) % 7).alias("dow")  # epoch day 0 = Thu
    return (
        e.select("event_type", dow)
        .cube("event_type", "dow")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("events"),
        )
        .select("event_type", "dow", "gid", "events")
    )


ORACLES["events_type_stats_salted"] = f"""
SELECT event_type,
       count(*) AS events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       min({_TS_S_SQL}) AS first_ts_s,
       max({_TS_S_SQL}) AS last_ts_s
FROM events
GROUP BY 1
"""

ORACLES["events_cube"] = f"""
WITH e AS (
    SELECT event_type, (({_TS_S_SQL} // 86400) + 4) % 7 AS dow FROM events
)
SELECT event_type, dow,
       CAST(grouping(event_type) * 2 + grouping(dow) AS BIGINT) AS gid,
       count(*) AS events
FROM e
GROUP BY CUBE (event_type, dow)
-- HAVING pins the shared empty-relation contract: Spark grouping sets over
-- zero rows emit NO rows (not even the grand total), DuckDB emits the
-- all-NULL total row; no-op on any non-empty input
HAVING count(*) > 0
"""

QUERIES["events_type_stats_salted"] = events_type_stats_salted
QUERIES["events_cube"] = events_cube


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: the `props` column is a JSON
    string; parse it with a TYPED ``from_json`` schema (one JsonToStructs
    expression inside codegen -- never a per-row Python json.loads) and
    aggregate the extracted field per (event_type, k-decade).

    Scale shape: schema-on-read projection happens in the scan's own stage,
    so only the two small extracted ints reach the shuffle -- the JSON text
    itself is never exchanged. That ordering (parse THEN shuffle) is the
    whole game for wide JSON payloads at 100 TB."""
    e = events_table(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") - F.col("k") % 10).alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


ORACLES["events_props_stats"] = """
SELECT event_type,
       (k - k % 10) AS k_decade,
       count(*) AS events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       count(DISTINCT k) AS distinct_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events)
GROUP BY 1, 2
"""
QUERIES["events_props_stats"] = events_props_stats


USERS_SKETCH_TOL_PCT = 5


def events_users_sketch_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly distinct users, exact AND as an HLL++ sketch, emitted as a
    hash-checkable contract (the cardinality_estimates pattern at window
    grain): the approx value is engine-specific, so the row carries the
    exact count plus a boolean asserting the sketch landed within 5% --
    integer cross-multiplication, no float tolerance. At 100 TB the exact
    countDistinct is the expensive half (two-level Expand shuffle); the
    sketch column is the one you keep, mergeable across hours/days for
    rollups the exact count cannot do incrementally."""
    e = events_table(spark, sf_dir)
    hour = (F.expr("ts_s div 3600") * 3600).alias("hour_start")
    agg = e.groupBy(hour).agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )
    diff = F.abs(F.col("approx_users") - F.col("exact_users"))
    # Tolerance band: 5% relative OR +-2 absolute. The absolute floor
    # matters at window grain: an hour with 14 users makes 5% < 1, and
    # Spark's HLL++ has no sparse mode, so tiny cardinalities can be off
    # by one -- a pure relative band would flag correct sketch behavior.
    within = (diff <= 2) | (diff * 100 <= F.col("exact_users") * USERS_SKETCH_TOL_PCT)
    return agg.select("hour_start", "exact_users", within.alias("approx_within_tol"))


ORACLES["events_users_sketch_hourly"] = f"""
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       count(DISTINCT user_id) AS exact_users,
       true AS approx_within_tol
FROM events
GROUP BY 1
"""
QUERIES["events_users_sketch_hourly"] = events_users_sketch_hourly


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour x event-type count MATRIX via relational PIVOT: one row per
    hour, one column per type. The type list is DECLARED (not inferred) --
    `pivot(col)` without explicit values runs a whole extra distinct job
    over the corpus before the real aggregation, exactly the hidden second
    scan you can't afford at 100 TB. With the list supplied this plans as
    ONE pass: a single groupBy(hour) aggregate of conditional counts.
    Oracle = the same CASE-WHEN matrix spelled out."""
    e = events_table(spark, sf_dir)
    return (
        e.groupBy((F.expr("ts_s div 3600") * 3600).alias("hour_start"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .select(
            "hour_start",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
        )
    )


ORACLES["events_hourly_pivot"] = f"""
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
           f" AS BIGINT) AS {t}"
           for t in EVENT_TYPES)}
FROM events
GROUP BY 1
"""
QUERIES["events_hourly_pivot"] = events_hourly_pivot


def events_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (``stack``) as the certified inverse of the pivot: melt the
    hour x type matrix back to long form, drop the zero-filled cells, and
    the result must equal the plain hourly GROUP BY -- proving the wide
    matrix is lossless, and exercising the wide->long expression (a
    Generate in-stage, zero extra shuffle beyond the pivot's own)."""
    wide = events_hourly_pivot(spark, sf_dir)
    stack = F.expr(
        "stack({n}, {args}) as (event_type, events)".format(
            n=len(EVENT_TYPES),
            args=", ".join(f"'{t}', {t}" for t in EVENT_TYPES),
        )
    )
    return wide.select("hour_start", stack).where(F.col("events") > 0)


# The pivot's declared-values list IS a filter: a row whose type is NULL
# or outside EVENT_TYPES is structurally unproducible by stack() over the
# five pivoted columns, so the oracle restricts to the same set (no-op on
# the fixtures, whose types are exactly EVENT_TYPES).
ORACLES["events_pivot_roundtrip"] = f"""
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       event_type,
       count(*) AS events
FROM events
WHERE event_type IN ({", ".join(f"'{t}'" for t in EVENT_TYPES)})
GROUP BY 1, 2
"""
QUERIES["events_pivot_roundtrip"] = events_pivot_roundtrip
