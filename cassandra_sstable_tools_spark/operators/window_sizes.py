"""Operator W1 -- derive partition sizes from Index.db position deltas.

Reference: cassandra/IndexReader.java:88-98 -- partition size is the delta
between consecutive index positions; the final partition's size is
``file_uncompressed_length - position``.

Spark shape: ``lead(position)`` window per sstable + a broadcast join against
the tiny per-SSTable metadata table for the file length. The window shuffles
on (keyspace, table_name, sstable_id) -- at 100 TB the index_entries table is
~1/1000th of data size (1 row per partition per sstable), so this stays cheap;
the metadata side is always broadcast-able (1 row per SSTable file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def index_partition_sizes(index_entries: DataFrame, sstables_meta: DataFrame) -> DataFrame:
    """(keyspace, table_name, sstable_id, partition_key, size) from deltas."""
    w = (
        Window.partitionBy("keyspace", "table_name", "sstable_id")
        .orderBy("position")
    )
    lengths = sstables_meta.select(
        "keyspace", "table_name", "sstable_id", "uncompressed_length"
    )
    return (
        index_entries.join(
            broadcast(lengths), ["keyspace", "table_name", "sstable_id"]
        )
        .withColumn(
            "size",
            F.coalesce(F.lead("position").over(w), F.col("uncompressed_length"))
            - F.col("position"),
        )
        .select("keyspace", "table_name", "sstable_id", "partition_key", "size")
    )
