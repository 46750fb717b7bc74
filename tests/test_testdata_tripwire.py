"""Testdata schema tripwire: drift in the driver's parquet dtypes must fail
fast with the drifted column named (r03: events.ts silently changed from
int64-nanos to timestamp[us] and burned 9 queries + the bench)."""

from __future__ import annotations

import pytest

from cassandra_sstable_tools_spark.sources import tpch_adapter
from cassandra_sstable_tools_spark.sources.tpch_adapter import (
    EXPECTED_TESTDATA_SCHEMA,
    assert_testdata_schema,
    ts_seconds_col,
)


def test_current_testdata_passes(spark, sf_dir):
    assert_testdata_schema(spark, sf_dir)


def test_drift_names_the_column(spark, sf_dir, monkeypatch):
    drifted = {t: dict(cols) for t, cols in EXPECTED_TESTDATA_SCHEMA.items()}
    drifted["events"] = dict(drifted["events"], ts={"decimal(38,0)"})
    monkeypatch.setattr(tpch_adapter, "EXPECTED_TESTDATA_SCHEMA", drifted)
    with pytest.raises(AssertionError, match=r"events\.ts"):
        assert_testdata_schema(spark, sf_dir)


def test_missing_column_named(spark, sf_dir, monkeypatch):
    drifted = {t: dict(cols) for t, cols in EXPECTED_TESTDATA_SCHEMA.items()}
    drifted["events"] = dict(drifted["events"], no_such_col={"string"})
    monkeypatch.setattr(tpch_adapter, "EXPECTED_TESTDATA_SCHEMA", drifted)
    with pytest.raises(AssertionError, match="no_such_col: column missing"):
        assert_testdata_schema(spark, sf_dir)


def test_ts_seconds_dispatch_covers_all_supported_dtypes(spark):
    """ts_seconds_col must handle every dtype the tripwire admits for
    events.ts, and reject anything else with a clear message."""
    import pyspark.sql.functions as F

    # timestamp / timestamp_ntz / bigint all dispatch; seconds agree.
    base = spark.sql(
        "SELECT timestamp_ntz'2024-01-01 00:00:05' AS ts"
    )
    df_ts = base.select(F.col("ts").cast("timestamp").alias("ts"))
    df_ns = spark.sql("SELECT CAST(1704067205 AS BIGINT) * 1000000000 AS ts")
    vals = set()
    for df in (base, df_ts, df_ns):
        vals.add(df.select(ts_seconds_col(df).alias("s")).first().s)
    assert vals == {1704067205}

    df_bad = spark.sql("SELECT 'not a time' AS ts")
    with pytest.raises(TypeError, match="unsupported dtype"):
        ts_seconds_col(df_bad)


def test_events_ts_domain_is_nonnegative(spark):
    """The bucketing contract (queries/timeseries._hourly_counts) relies on
    ts_s >= 0: Spark's `div` truncates toward zero while DuckDB's `//`
    floors, identical only on the non-negative domain. Pin the fixtures'
    domain at every SF so a driver-side regeneration with pre-epoch
    timestamps fails HERE with the contract named, not as a silent
    bucket-boundary hash mismatch."""
    from pyspark.sql import functions as F

    from cassandra_sstable_tools_spark.sources.tpch_adapter import events_table

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mn = events_table(spark, f"/root/testdata/{sf}").agg(
            F.min("ts_s")
        ).first()[0]
        assert mn is not None and mn >= 0, (
            f"{sf}: events.ts_s has negative values (min={mn}) -- the "
            "div-vs-floor bucketing equivalence no longer holds"
        )
