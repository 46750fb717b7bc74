"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Registry pattern: each query module in ``cassandra_sstable_tools_spark``
exposes a callable + an ORACLE SQL string; this file only aggregates them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    First asserts the driver testdata's parquet dtypes still match what the
    adapter assumes (the schema has drifted between rounds before --
    events.ts burned r03); a named-column AssertionError here beats nine
    baffling downstream failures."""
    from cassandra_sstable_tools_spark.queries.summary import summary
    from cassandra_sstable_tools_spark.sources.tpch_adapter import (
        assert_testdata_schema,
    )

    assert_testdata_schema(spark, "/root/testdata/sf0.001")
    return summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cassandra_sstable_tools_spark.queries import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each key in ``queries()``."""
    from cassandra_sstable_tools_spark.queries import registry

    return registry.oracle_sql()
