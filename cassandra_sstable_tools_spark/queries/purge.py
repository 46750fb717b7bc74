"""`purge` -- simulated-compaction reclaimable-space report (reference cmd 5).

Reference: PurgeStatisticsCollector.java:24-103 -- top-N partitions by
reclaimable bytes + global totals. The heavy lifting is operator A7
(operators/purge.py); this module shapes the two reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import DEFAULT_TOP_N
from cassandra_sstable_tools_spark.operators.purge import purge_stats, purge_stats_sql
from cassandra_sstable_tools_spark.operators.topn import top_n_per_group
from cassandra_sstable_tools_spark.oracles import with_adapter
from cassandra_sstable_tools_spark.sources import tpch_adapter


def _per_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purge_stats(tpch_adapter.cells(spark, sf_dir))


def purge_top(spark: SparkSession, sf_dir: str, n: int = DEFAULT_TOP_N) -> DataFrame:
    """Top-N partitions by reclaimable bytes (PurgeStatisticsCollector.java:65-68,
    comparator PurgeStatistics.java:14-20 -- reclaimable, size tiebreak)."""
    return top_n_per_group(
        _per_partition(spark, sf_dir),
        ["keyspace", "table_name"],
        [F.desc("reclaimable"), F.desc("pre_size"), F.asc("partition_key")],
        n,
    ).select(
        "keyspace", "table_name", "partition_key", "tables", "pre_size",
        "merged_size", "reclaimable", "rank",
    )


def purge_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global totals (PurgeStatisticsCollector.java:62-76)."""
    return _per_partition(spark, sf_dir).groupBy("keyspace", "table_name").agg(
        F.count(F.lit(1)).alias("partitions"),
        F.sum("pre_size").alias("total_size"),
        F.sum("merged_size").alias("total_merged"),
        F.sum("reclaimable").alias("total_reclaimable"),
    )


ORACLE_PURGE_TOP = with_adapter(f""",
{purge_stats_sql().lstrip()}
SELECT keyspace, table_name, partition_key, tables, pre_size, merged_size,
       reclaimable, rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY keyspace, table_name
        ORDER BY reclaimable DESC, pre_size DESC, partition_key ASC) AS rank
    FROM purge_per_partition
) WHERE rank <= {DEFAULT_TOP_N}
""")

ORACLE_PURGE_GLOBAL = with_adapter(f""",
{purge_stats_sql().lstrip()}
SELECT keyspace, table_name,
       count(*) AS partitions,
       CAST(sum(pre_size) AS BIGINT) AS total_size,
       CAST(sum(merged_size) AS BIGINT) AS total_merged,
       CAST(sum(reclaimable) AS BIGINT) AS total_reclaimable
FROM purge_per_partition
GROUP BY 1, 2
""")

QUERIES = {"purge_top": purge_top, "purge_global": purge_global}
ORACLES = {"purge_top": ORACLE_PURGE_TOP, "purge_global": ORACLE_PURGE_GLOBAL}
