"""Shared test fixtures: one SparkSession per test session + DuckDB oracle
comparison helper replicating the driver's check (row-count + schema +
order-insensitive value comparison)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_sstable_tools_spark.session import get_spark
from cassandra_sstable_tools_spark.sources.tpch_adapter import TPCH_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    # Schema tripwire: fail the whole session fast, with the drifted column
    # named, if the driver regenerated testdata with different dtypes.
    from cassandra_sstable_tools_spark.sources.tpch_adapter import (
        assert_testdata_schema,
    )

    assert_testdata_schema(s, SF_DIR)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, dtype-normalized frame for comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # tolerate nullable-int vs int
        elif df[c].dtype == object:
            # duckdb may hand back Decimal / None mixes
            df[c] = df[c].map(lambda v: float(v) if isinstance(v, (int,)) else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection):
    got = normalize(spark_df.toPandas())
    exp = normalize(con.execute(oracle_sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"schema mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count mismatch: spark={len(got)} oracle={len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
