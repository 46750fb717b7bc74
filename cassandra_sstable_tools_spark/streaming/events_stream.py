"""Structured Streaming ingest over the `events` table.

The reference has no streaming surface (SURVEY.md §2.8); this is the engine's
extension for continuous ingest. Semantics intentionally match the batch
formulations in ``queries/events.py`` -- a tumbling-window streaming query
with `availableNow` trigger over the same input produces exactly the batch
answer (asserted in tests).

Patterns demonstrated:
- file-source `readStream` with explicit schema (required for streams);
- event-time tumbling window aggregation with a 2-hour watermark for late
  data (state is bounded: windows older than watermark are finalized and
  evicted -- at scale this is what keeps state O(active windows), not O(data));
- `foreachBatch`-free memory-sink collection for tests; in production the
  sink would be a parquet/Delta `writeStream` with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# the ONE attribution-window definition (queries/events.clicks_near_purchases):
# the stream-stream join interval and its oracle literal are both rendered
# from it, so tuning it cannot desynchronize the three encodings
from cassandra_sstable_tools_spark.queries.events import ATTRIBUTION_WINDOW_S
from cassandra_sstable_tools_spark.sources.tpch_adapter import (
    _enable_nanos_as_long,
    ts_seconds_col,
)


def events_stream_spec(spark: SparkSession, sf_dir: str) -> tuple[StructType, Column]:
    """(read schema, epoch-seconds Column) for streaming over `events`.

    File streams require an explicit schema, but hard-coding one is how r03
    silently read micros as nanos (off by 1000x): the driver testdata has
    shipped `ts` as both int64-nanos and timestamp[us] across rounds. So the
    schema is introspected from the parquet footer via a (lazy, footer-only)
    batch read, and the seconds expression is dispatched on the actual dtype
    by the same helper the batch path uses (``tpch_adapter.ts_seconds_col``)."""
    _enable_nanos_as_long(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    return batch.schema, ts_seconds_col(batch)


def events_stream_source(
    spark: SparkSession, sf_dir: str, with_event_time: bool = True
):
    """The ONE events file-stream source (returns (stream, ts_s Column)).

    Every streaming query reads events through this helper so the
    invariants the batch-equivalence oracles rely on -- introspected
    schema, the single-file glob filter, and the `event_time` column
    watermarks key on -- have exactly one definition instead of a copy per
    query. ``with_event_time=False`` for callers that derive their own
    time columns (the stream-stream join sides, the stateful kernel)."""
    schema, ts_s = events_stream_spec(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if with_event_time:
        stream = stream.withColumn("event_time", F.timestamp_seconds(ts_s))
    return stream, ts_s


def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling 1-hour aggregation with watermark; returns the
    (unstarted) streaming DataFrame. Uses the real event-time `F.window`
    path -- the batch oracle's arithmetic bucketing must agree with it
    (asserted in tests)."""
    # File stream sources require a directory; select the single events
    # parquet via glob filter.
    stream, ts_s = events_stream_source(spark, sf_dir)
    return (
        stream.withWatermark("event_time", "2 hours")
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_start"),
            "event_type",
            "events",
            "value_cents",
        )
    )


def stream_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING 1-hour window with a 30-minute slide: every event
    lands in two overlapping windows (F.window's slideDuration path --
    overlapping-window state is the part tumbling windows don't exercise).
    Watermark bounds state exactly as in the tumbling case; the batch
    equivalence oracle is the two-offset union formulation that
    queries/events.events_sliding already proves equal to sliding-window
    semantics."""
    stream, ts_s = events_stream_source(spark, sf_dir)
    return (
        stream.withWatermark("event_time", "2 hours")
        .groupBy(F.window("event_time", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "events",
        )
    )


def stream_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: the purchases stream joined to the
    clicks stream on user_id with a time-range condition (click within the
    30 minutes at-or-before the purchase), both sides watermarked.

    This is the canonical Structured Streaming inner interval join: with
    watermarks on both sides plus a range condition, Spark derives a state
    watermark for EACH side and evicts buffered rows once no future match
    is possible -- state is O(rows within the watermark+interval horizon),
    not O(stream history). The emitted pair set is deterministic (inner
    join, no late-data dropping under availableNow), so the batch oracle is
    the naive pair list."""
    def _side(event_type: str, prefix: str):
        side, ts_s = events_stream_source(spark, sf_dir, with_event_time=False)
        return (
            side
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                ts_s.alias(f"{prefix}_ts"),
                F.timestamp_seconds(ts_s).alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", "2 hours")
        )

    purchases = _side("purchase", "p")
    clicks = _side("click", "c")
    joined = purchases.join(
        clicks,
        on=(
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_time")
               >= F.col("p_time")
               - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS"))
            & (F.col("c_time") <= F.col("p_time"))
        ),
        how="inner",
    )
    return joined.select(
        F.col("p_event_id").alias("purchase_event_id"),
        F.col("c_event_id").alias("click_event_id"),
        F.col("p_user").alias("user_id"),
        F.col("p_ts").alias("purchase_ts_s"),
        F.col("c_ts").alias("click_ts_s"),
    )


_DRAIN_COUNTER = [0]


def stream_click_purchase_pairs_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the stream-stream join (append mode)."""
    _DRAIN_COUNTER[0] += 1
    return run_available_now(
        stream_click_purchase_pairs(spark, sf_dir),
        f"t_reg_stream_sspairs_{_DRAIN_COUNTER[0]}",
        mode="append",
    )


def stream_events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the sliding-window stream to completion."""
    _DRAIN_COUNTER[0] += 1
    return run_available_now(
        stream_events_sliding(spark, sf_dir),
        f"t_reg_stream_sliding_{_DRAIN_COUNTER[0]}",
    )


def stream_events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the watermarked tumbling-window stream to
    completion (availableNow, complete mode) and return the materialized
    hourly x event_type aggregate. Drained-to-end it must equal the batch
    arithmetic bucketing exactly -- the oracle below is plain batch SQL."""
    _DRAIN_COUNTER[0] += 1
    return run_available_now(
        stream_events_hourly(spark, sf_dir),
        f"t_reg_stream_hourly_{_DRAIN_COUNTER[0]}",
    )


# Stateful-operator partition count for the drain helper. Streaming state
# partitioning is a DEPLOYMENT knob sized to stream volume, not a per-query
# constant: each micro-batch pays per-state-partition provider/commit I/O,
# so 32 state stores against the fixture's single-file stream is pure fixed
# cost (measured: drain 2.3s at 32 -> 1.7s at 8 partitions, identical
# results). A 100 TB/day feed raises this with input parallelism.
import os

STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


def run_available_now(
    df: DataFrame, table_name: str = "stream_out", mode: str = "complete"
) -> DataFrame:
    """Drain a streaming DataFrame with the availableNow trigger into an
    in-memory table; returns the materialized result (test/demo helper).
    Aggregating streams drain in complete mode; row streams (dedup) append.

    The shuffle-partition conf is scoped to the stream's lifetime (state
    partition count is read at query start; restored after) -- values are
    unaffected, only the number of state stores per micro-batch.

    No-data micro-batches are disabled for the drain (also scoped): their
    only job is watermark-driven state eviction / timeout firing, and no
    drained query shape here emits rows from one -- the aggregations drain
    in complete mode (re-emitted every data batch), dedup and the interval
    join emit in the data batch that carries the row, and the stateful
    sessionize kernel runs GroupStateTimeout.NoTimeout (a no-data batch
    invokes no handler). Measured r13: the trailing empty batch cost a
    full trigger cycle -- WAL commit + offset commit + per-partition state
    store commits, ~0.36s of a 1.3s drain -- for zero output rows."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndmb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled", "false"
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb
        )
    return spark.table(table_name)


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark``.

    The input stream is deterministically duplicated 2x in-flight (explode
    over a 2-element array -- standing in for at-least-once redelivery from
    a real source); the dedup operator must restore exactly the original
    rows. Because the duplicate copies are bit-identical, the output is
    deterministic regardless of arrival order, so the batch oracle is just
    the undoubled events table.

    Scale posture: dedup state holds one entry per key only until the
    watermark passes (2 h of event-time), i.e. O(keys per window) not
    O(stream history) -- the property that makes streaming dedup viable on
    an unbounded 100 TB/day feed. State is hash-partitioned on event_id by
    the streaming aggregation exchange; no skew (keys are unique)."""
    stream, ts_s = events_stream_source(spark, sf_dir)
    doubled = stream.withColumn(
        "copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("copy")
    deduped = doubled.withWatermark("event_time", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.select(
        "event_id",
        ts_s.alias("ts_s"),
        "user_id",
        "event_type",
    )


def stream_dedup_events_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the dedup stream (append mode) to completion."""
    _DRAIN_COUNTER[0] += 1
    return run_available_now(
        stream_dedup_events(spark, sf_dir),
        f"t_reg_stream_dedup_{_DRAIN_COUNTER[0]}",
        mode="append",
    )


# Oracle: the batch arithmetic-bucket formulation (queries/events.py proves
# F.window's UTC-aligned hour starts == (ts_s // 3600) * 3600).
from cassandra_sstable_tools_spark.queries.events import _TS_S_SQL

ORACLES = {
    "stream_events_hourly": f"""
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       event_type,
       count(*) AS events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
""",
    # dedup of a 2x-duplicated stream == the original rows
    "stream_dedup_events": f"""
SELECT event_id, {_TS_S_SQL} AS ts_s, user_id, event_type FROM events
""",
    # inner interval join emits the exact deterministic pair set
    "stream_click_purchase_pairs": f"""
WITH p AS (
    SELECT event_id AS purchase_event_id, user_id, {_TS_S_SQL} AS purchase_ts_s
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT event_id AS click_event_id, user_id, {_TS_S_SQL} AS click_ts_s
    FROM events WHERE event_type = 'click'
)
SELECT p.purchase_event_id, c.click_event_id, p.user_id,
       p.purchase_ts_s, c.click_ts_s
FROM p JOIN c ON c.user_id = p.user_id
           AND c.click_ts_s >= p.purchase_ts_s - {ATTRIBUTION_WINDOW_S}
           AND c.click_ts_s <= p.purchase_ts_s
""",
    # sliding(1h, 30min) == union of the two tumbling offsets (the batch
    # events_sliding equivalence, proven in queries/events.py).
    "stream_events_sliding": f"""
WITH both_offsets AS (
    SELECT ({_TS_S_SQL} // 3600) * 3600 AS window_start FROM events
    UNION ALL
    SELECT (({_TS_S_SQL} - 1800) // 3600) * 3600 + 1800 FROM events
)
SELECT window_start, count(*) AS events
FROM both_offsets
GROUP BY 1
""",
}

QUERIES = {
    "stream_events_hourly": stream_events_hourly_agg,
    "stream_dedup_events": stream_dedup_events_drained,
    "stream_events_sliding": stream_events_sliding_agg,
    "stream_click_purchase_pairs": stream_click_purchase_pairs_drained,
}


def stream_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC broadcast enrichment -- the canonical dimension-join
    pattern the other stream queries don't exercise: each streaming event
    joins a small static dimension (per-type historical event totals,
    computed once from the batch table) BEFORE the windowed aggregation, so
    the dim column rides through into the hourly rollup.

    Scale posture: the static side is dimension-sized and broadcast -- the
    stream side never shuffles for the join (micro-batches join against the
    executor-local copy); the only stateful exchange remains the windowed
    aggregation's, exactly as in `stream_events_hourly`. This is how a
    100 TB/day feed picks up slowly-changing reference data without a
    per-batch shuffle."""
    schema, ts_s = events_stream_spec(spark, sf_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("hist_events"))
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("event_time", F.timestamp_seconds(ts_s))
    )
    enriched = stream.join(F.broadcast(dim), "event_type")
    return (
        enriched.withWatermark("event_time", "2 hours")
        .groupBy(
            F.window("event_time", "1 hour").alias("w"),
            "event_type",
            "hist_events",
        )
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_start"),
            "event_type",
            "hist_events",
            "events",
        )
    )


def stream_events_enriched_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the enriched hourly stream to completion."""
    _DRAIN_COUNTER[0] += 1
    return run_available_now(
        stream_events_enriched(spark, sf_dir),
        f"t_reg_stream_enriched_{_DRAIN_COUNTER[0]}",
    )


ORACLES["stream_events_enriched"] = f"""
WITH dim AS (SELECT event_type, count(*) AS hist_events FROM events GROUP BY 1)
SELECT ({_TS_S_SQL} // 3600) * 3600 AS hour_start,
       e.event_type,
       d.hist_events,
       count(*) AS events
FROM events e JOIN dim d USING (event_type)
GROUP BY 1, 2, 3
"""
QUERIES["stream_events_enriched"] = stream_events_enriched_agg
