"""Structured Streaming: availableNow drain must equal the batch answer."""

from conftest import normalize

import pandas as pd

from cassandra_sstable_tools_spark.queries.events import events_hourly
from cassandra_sstable_tools_spark.streaming.events_stream import (
    run_available_now,
    stream_events_hourly,
)


def test_stream_matches_batch(spark, sf_dir):
    streamed = run_available_now(
        stream_events_hourly(spark, sf_dir), "t_stream_hourly"
    ).toPandas()
    batch = (
        events_hourly(spark, sf_dir)
        .select("hour_start", "event_type", "events", "value_cents")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        normalize(streamed), normalize(batch), check_dtype=False, check_exact=True
    )
    assert len(streamed) > 0


def test_stream_dedup_restores_original_rows(spark, sf_dir):
    """dropDuplicatesWithinWatermark over the deterministically 2x-duplicated
    stream must emit exactly the original (undoubled) events."""
    from cassandra_sstable_tools_spark.sources.tpch_adapter import events_table
    from cassandra_sstable_tools_spark.streaming.events_stream import (
        stream_dedup_events,
    )

    streamed = run_available_now(
        stream_dedup_events(spark, sf_dir), "t_stream_dedup", mode="append"
    ).toPandas()
    batch = (
        events_table(spark, sf_dir)
        .select("event_id", "ts_s", "user_id", "event_type")
        .toPandas()
    )
    # Fixture invariant the oracle (plain SELECT of events) relies on: if a
    # regenerated fixture ever carried duplicate event_ids, dedup would
    # collapse genuine rows and the mismatch would look baffling -- fail
    # loudly on the invariant instead.
    assert batch["event_id"].is_unique, "events fixture must have unique event_id"
    pd.testing.assert_frame_equal(
        normalize(streamed), normalize(batch), check_dtype=False, check_exact=True
    )
    assert len(streamed) > 0


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.events import sessionize
    from cassandra_sstable_tools_spark.streaming.stateful import (
        run_update_available_now,
        stream_sessionize,
    )

    streamed = run_update_available_now(
        stream_sessionize(spark, sf_dir), "t_stream_sessions"
    ).toPandas()
    # availableNow drains the whole input: closed + final open sessions
    # together must equal the batch answer.
    streamed = streamed.drop(columns=["open"])
    batch = sessionize(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        normalize(streamed), normalize(batch), check_dtype=False, check_exact=True
    )
    assert len(streamed) > 0


class _FakeState:
    """Minimal GroupState stand-in for driving the kernel across batches."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _run_batches(batches):
    from cassandra_sstable_tools_spark.streaming.stateful import (
        _sessionize_group,
    )

    state = _FakeState()
    emitted = {}
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["user_id", "event_id", "ts_s",
                                           "value_cents"])
        for out in _sessionize_group((7,), iter([pdf]), state):
            for r in out.itertuples(index=False):
                emitted[r.session_seq] = r  # upsert, like a real sink
    return emitted, state


def test_stateful_kernel_continues_session_across_batches():
    emitted, state = _run_batches([
        [(7, 1, 1000, 5), (7, 2, 1100, 5)],
        [(7, 3, 1200, 5)],  # within gap: same session extends
    ])
    assert list(emitted) == [0]
    s = emitted[0]
    assert (s.events, s.session_start, s.session_end, s.value_cents) == (
        3, 1000, 1200, 15)
    assert s.open == 1


def test_stateful_kernel_closes_carried_session_on_gap():
    emitted, state = _run_batches([
        [(7, 1, 1000, 5)],
        [(7, 2, 99000, 7)],  # far past gap: carried session closes
    ])
    assert sorted(emitted) == [0, 1]
    closed, opened = emitted[0], emitted[1]
    assert (closed.events, closed.value_cents, closed.open) == (1, 5, 0)
    assert (opened.events, opened.value_cents, opened.open) == (1, 7, 1)


def test_stateful_kernel_multiple_sessions_one_batch():
    emitted, _ = _run_batches([
        [(7, 1, 1000, 1), (7, 2, 1100, 2), (7, 3, 50000, 3), (7, 4, 99000, 4)],
    ])
    assert sorted(emitted) == [0, 1, 2]
    assert [emitted[k].open for k in sorted(emitted)] == [0, 0, 1]
    assert [emitted[k].events for k in sorted(emitted)] == [2, 1, 1]


def test_stream_parquet_sink_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Durable streaming: the hourly aggregate streamed into a PARQUET sink
    with a checkpoint. A restart against the same checkpoint with no new
    input must be a no-op (no reprocessing, no duplicate rows) -- the
    exactly-once file-sink contract that memory-sink demos don't exercise.
    At 100 TB this checkpoint+manifest pair is what makes a crashed
    ingestion job resumable instead of re-run."""
    out = str(tmp_path / "hourly_out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_events_hourly(spark, sf_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Append-mode window aggregation only FINALIZES windows the watermark
    # has passed; with availableNow over a finite file the watermark ends
    # beyond every window except the last open one(s), so the sink holds
    # the finalized prefix -- compare against the batch answer restricted
    # the same way (deterministic: same data, same watermark end).
    run_once()
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first > 0
    # exactly-once within one run: (hour, type) unique in the sink
    assert first.select("hour_start", "event_type").distinct().count() == n_first

    run_once()  # restart, same checkpoint, no new input
    second = spark.read.parquet(out)
    assert second.count() == n_first, "restart reprocessed data into the sink"


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Late-data policy, behaviorally: batch 1 advances the watermark past
    an old hour; batch 2 (a second availableNow run on the same checkpoint)
    delivers events for that hour. The aggregation must DROP them -- the
    old window stays finalized with its batch-1 count -- while rows inside
    the watermark horizon still land. This is the state-bounding contract:
    without the drop, 100 TB of ancient replays would resurrect every
    window ever emitted."""
    from pyspark.sql import functions as F

    indir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = "event_id long, ts_s long, user_id long"
    HOUR = 3600

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).write.parquet(f"{indir}/{name}")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(indir)
            .withColumn("event_time", F.timestamp_seconds(F.col("ts_s")))
            .withWatermark("event_time", "1 hour")
            .groupBy(F.window("event_time", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("events"))
            .select(F.unix_timestamp("w.start").alias("hour_start"), "events")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [
            (r["hour_start"], r["events"])
            for r in spark.read.parquet(out).collect()
        ]

    # batch 1: 2 events in hour 0, max event time at hour 10 -> watermark
    # ends at hour 9; hour 0's window finalizes with count 2
    write_batch("b1", [(1, 10, 1), (2, 20, 1), (3, 10 * HOUR, 1)])
    got1 = [row for row in drain() if row[0] == 0]
    assert got1 == [(0, 2)]

    # batch 2: one LATE event for hour 0 (beyond watermark -> dropped) and
    # one on-time event in hour 9 (inside horizon -> contributes). A
    # non-dropped late row would build NEW hour-0 state and append a
    # second hour-0 row once finalized -- so the invariant is exactly one
    # hour-0 row, still at its batch-1 count.
    write_batch("b2", [(4, 30, 1), (5, 9 * HOUR + 5, 1)])
    got2 = [row for row in drain() if row[0] == 0]
    assert got2 == [(0, 2)], "late event resurrected a finalized window"
