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
