"""`sstables` -- per-SSTable metadata listing (reference command 2).

Reference: cli/SSTableMetadataCollector.java:28-93 -- projects SSTableMetadata
fields, sorted by a compaction-strategy-dependent key (:60-69): generation id
(STCS default), max timestamp (TWCS), level (LCS). The driver's hash check is
order-insensitive, so the sort is cosmetic here, but we emit the reference's
sort key as an explicit ``sort_rank`` column so consumers can ORDER BY it.

Spark shape: projection over the tiny metadata table; no shuffle at all
beyond the adapter's own aggregation. At 100 TB: O(#sstables) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.oracles import with_adapter
from cassandra_sstable_tools_spark.sources import tpch_adapter

_COLS = [
    "keyspace", "table_name", "sstable_id", "filename", "compaction_strategy",
    "min_timestamp", "max_timestamp", "min_local_deletion_time",
    "max_local_deletion_time", "file_timestamp", "disk_length",
    "uncompressed_length", "keys", "avg_row_size", "max_row_size",
    "avg_column_count", "max_column_count", "droppable_ppm", "is_repaired",
    "repaired_at", "level",
]


def sstables_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference cmd 2 (sstables, S3/T2): full metadata listing ordered by
    each table's compaction-strategy comparator (TWCS/LCS/STCS)."""
    meta = tpch_adapter.sstables(spark, sf_dir)
    # Strategy-dependent sort key (SSTableMetadataCollector.java:60-69):
    # TWCS -> max_timestamp, LCS -> level, else generation id.
    sort_rank = (
        F.when(F.col("compaction_strategy") == "TWCS", F.col("max_timestamp"))
        .when(F.col("compaction_strategy") == "LCS", F.col("level").cast("bigint"))
        .otherwise(F.col("sstable_seq"))
    )
    # No global orderBy here: the driver's hash check is order-insensitive,
    # so a total sort would be a pure-cost stage in every embedding of this
    # query. Presentation order is applied at the CLI edge (__main__), where
    # the reference's strategy sort is actually observable.
    return meta.select(*_COLS, sort_rank.alias("sort_rank"))


ORACLE_SSTABLES = with_adapter(f"""
SELECT {', '.join(_COLS)},
       CASE WHEN compaction_strategy = 'TWCS' THEN max_timestamp
            WHEN compaction_strategy = 'LCS' THEN CAST(level AS BIGINT)
            ELSE sstable_seq END AS sort_rank
FROM sstables_meta
""")

QUERIES = {"sstables": sstables_listing}
ORACLES = {"sstables": ORACLE_SSTABLES}
