"""Bucketed-table layout: the SSTable sort-order optimization, Spark-style.

The reference exploits SSTables' partition-key sort order to merge streams
without any redistribution (`PartitionReader.java:50-52`,
`AbstractSSTableReader.java:28-30` — the k-way merge relies on DecoratedKey
order). Plain parquet loses that property, so every per-partition-key
aggregation (pstats/cfstats/purge) pays one hash Exchange. SURVEY.md §4
recorded bucketing as the optional fix; this module implements it.

`bucketBy(partition_key)` persists the cells table hash-clustered the way
the shuffle would cluster it. Catalyst then recognizes the table's output
partitioning satisfies a `groupBy(partition_key)` distribution requirement
and plans HashAggregate with NO Exchange — verified by assertion in
tests/test_plan_audit.py. At 100 TB this converts every stats query from
"full shuffle of the cells table" into "scan + local aggregation": the
shuffle is paid ONCE at ingest (when the bucketed table is written), then
amortized over every subsequent query, exactly like Cassandra pays the sort
at SSTable write time.

Trade-offs (documented, deliberate):
- bucket count is fixed at write time — size for the target deployment
  (buckets ~= executors * cores_per_executor * small_factor);
- only equi-grouping/joins ON the bucket key benefit;
- the table lives in the session catalog (warehouse dir) — in production a
  lakehouse table format would own this layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.sources.tpch_adapter import cells

DEFAULT_BUCKETS = 8


def materialize_bucketed_cells(
    spark: SparkSession,
    sf_dir: str,
    table: str = "cells_bucketed",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Write the cells table hash-bucketed (and per-file sorted) by
    partition_key; returns the catalog-backed frame."""
    (
        cells(spark, sf_dir)
        .write.mode("overwrite")
        .bucketBy(buckets, "partition_key")
        .sortBy("partition_key")
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)


def per_partition_stats_bucketed(bucketed: DataFrame) -> DataFrame:
    """The cfstats per-partition aggregation over the bucketed layout —
    plans with zero Exchange (asserted in tests)."""
    return bucketed.groupBy("partition_key").agg(
        F.count(F.lit(1)).alias("cells"),
        F.sum("cell_size").alias("size"),
        F.sum(F.when(F.col("is_tombstone"), 1).otherwise(0)).alias("tombstones"),
        F.countDistinct("sstable_id").alias("sstable_count"),
    )


def ensure_bucketed_cells(
    spark: SparkSession,
    sf_dir: str,
    table: str = "cells_bucketed",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Materialize-once accessor: returns the catalog-backed bucketed cells
    table, writing it only if absent -- the CLI's `--bucketed` entry point.
    The shuffle is paid on the FIRST scoped invocation; every later run
    (and every stats query inside one run) serves from the clustered
    layout with zero Exchange.

    The catalog table is keyed by NAME alone: runs under different
    --keyspace/--table/-f scopes (or sf dirs) must use distinct table
    names, exactly as distinct physical layouts would be distinct tables
    in a lakehouse (the CLI derives a scope-suffixed name automatically).

    Cross-process note: the session catalog is in-memory, so a NEW process
    cannot reuse a previous process's table metadata (bucketing info lives
    in the metastore) -- but the warehouse DIRECTORY persists and blocks
    CTAS. In that case the orphaned directory is cleared and the table
    rebuilt; true cross-process reuse needs a persistent metastore (the
    production lakehouse deployment)."""
    if not spark.catalog.tableExists(table):
        # clear any orphaned warehouse dir from a previous process before
        # re-materializing (saveAsTable refuses LOCATION_ALREADY_EXISTS)
        drop_bucketed_table(spark, table)
        return materialize_bucketed_cells(spark, sf_dir, table, buckets)
    return spark.table(table)


def bucketed_top_partitions(bucketed: DataFrame, n: int = 10) -> DataFrame:
    """Top-n partitions by size off the bucketed layout: the per-partition
    aggregation satisfies its distribution straight from the bucketing (no
    Exchange; asserted in tests) and the ranking is a bounded
    TakeOrderedAndProject -- scan + local agg + heap, no shuffle at all."""
    return per_partition_stats_bucketed(bucketed).orderBy(
        F.desc("size"), F.asc("partition_key")
    ).limit(n)


def drop_bucketed_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE plus removal of any orphaned warehouse directory.

    Catalog metadata is per-session (in-memory derby) but the warehouse
    DIRECTORY persists on disk, so a table written by a previous process is
    invisible to DROP TABLE yet still blocks saveAsTable with
    LOCATION_ALREADY_EXISTS; clearing both makes re-materialization safe."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{path}/{table.lower()}", ignore_errors=True)
