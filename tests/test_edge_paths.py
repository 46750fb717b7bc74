"""Edge and error paths: failure modes must be loud and named, degenerate
configs must still be correct."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F


def test_ts_seconds_col_rejects_unsupported_dtype(spark):
    """A drifted events.ts dtype must raise with the dtype NAMED -- the
    r03 burn was a bare DATATYPE_MISMATCH from deep inside a plan."""
    from cassandra_sstable_tools_spark.sources.tpch_adapter import ts_seconds_col

    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported dtype 'string'"):
        ts_seconds_col(df)


def test_quarantine_handles_all_corrupt_input(spark, tmp_path):
    """A file of ONLY malformed lines: zero clean rows, every line
    quarantined verbatim, no exception."""
    from cassandra_sstable_tools_spark.sources.jsonl import (
        read_events_jsonl,
        split_quarantine,
    )

    path = tmp_path / "garbage.jsonl"
    path.write_text("not json\n{broken\n[1,2\n")
    clean, quarantine = split_quarantine(read_events_jsonl(spark, str(path)))
    assert clean.count() == 0
    assert quarantine.count() == 3


def test_salted_agg_single_bucket_degenerates_to_plain(spark):
    """salt_buckets=1 must equal the plain aggregation exactly (the salt
    column is constant) -- the degenerate-config boundary."""
    from cassandra_sstable_tools_spark.operators.salting import salted_agg

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v long"
    )
    got = {
        r["k"]: (r["n"], r["s"])
        for r in salted_agg(
            df, ["k"], {"n": ("count", "v"), "s": ("sum", "v")}, salt_buckets=1
        ).collect()
    }
    assert got == {"a": (2, 3), "b": (1, 5)}


def test_pagerank_empty_edges_returns_empty(spark):
    from cassandra_sstable_tools_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, "src", "dst").count() == 0


def test_funnel_empty_first_stage_zeroes_all_stages(spark):
    """No stage-1 events at all: every stage reports 0 users (the one-row
    aggregate frames must still emit their rows)."""
    from cassandra_sstable_tools_spark.queries.timeseries import funnel_over

    df = spark.createDataFrame(
        [(1, "click", 10), (1, "purchase", 20)],
        "user_id long, event_type string, ts_s long",
    )
    got = {r["stage"]: r["users"] for r in funnel_over(df).collect()}
    assert got == {1: 0, 2: 0, 3: 0}
