"""S4 catalog enumeration + F1 filename filtering + free relational surface
the reference lacks (rollup, approx-distinct).

- catalog_tables: sorted keyspace/table listing
  (reference getKeyspaces/getColumnFamilies, cassandra/CassandraBackend.java:43-60).
- sstables_filtered: `-f a,b,c` filename restriction
  (parse cli/PartitionSizeStatisticsCollector.java:54-59, apply
  cassandra/ColumnFamilyBackend.java:80-89) -- expressed as an `isin` filter
  that Catalyst pushes into the scan / file pruning.
- summary_rollup: per-table stats with keyspace and grand-total rollup rows
  (GROUPING SETS surface -- absent in the reference, free in Spark).
- cardinality_estimates: exact vs approx_count_distinct (HLL++) -- the
  bounded-memory distinct path for 100 TB; oracle checks the exact column
  only (approx values are engine-specific by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.oracles import with_adapter
from cassandra_sstable_tools_spark.sources import tpch_adapter

DEFAULT_FILENAMES = ["nb-00001-big-Data.db", "nb-00003-big-Data.db"]


def catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/T3: keyspace.table catalog with per-table SSTable counts, in the
    reference's sorted enumeration order."""
    meta = tpch_adapter.sstables(spark, sf_dir)
    return (
        meta.groupBy("keyspace", "table_name")
        .agg(F.count(F.lit(1)).alias("sstables"))
        .orderBy("keyspace", "table_name")
    )


def sstables_filtered(
    spark: SparkSession, sf_dir: str, filenames: list[str] | None = None
) -> DataFrame:
    """F1: the metadata listing restricted to an explicit Data.db filename
    set (the reference's `-f` flag as a pushed-down predicate)."""
    names = filenames or DEFAULT_FILENAMES
    meta = tpch_adapter.sstables(spark, sf_dir)
    return meta.where(F.col("filename").isin(names)).select(
        "keyspace", "table_name", "sstable_id", "filename",
        "uncompressed_length", "keys",
    )


def summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (keyspace, table): per-table rows, per-keyspace subtotals
    and the grand total in one grouping-sets pass (gid disambiguates)."""
    meta = tpch_adapter.sstables(spark, sf_dir)
    return (
        meta.rollup("keyspace", "table_name")
        .agg(
            F.count(F.lit(1)).alias("sstable_count"),
            F.sum("uncompressed_length").alias("data_size"),
        )
        .select(
            F.coalesce(F.col("keyspace"), F.lit("<all>")).alias("keyspace"),
            F.coalesce(F.col("table_name"), F.lit("<all>")).alias("table_name"),
            "sstable_count",
            "data_size",
        )
    )


# HLL++ rsd is 0.01; the acceptance band is 2% so the deterministic sketch
# (no RNG: same input -> same registers) stays comfortably inside it.
APPROX_DISTINCT_TOL_PCT = 2


def cardinality_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs approx_count_distinct (HLL++), emitted as a hash-checkable
    contract (r03 advice #3): the approx value itself is engine-specific, so
    the row carries the EXACT count plus a boolean asserting the sketch
    landed within the tolerance band -- integer-exact comparison
    (|approx-exact|*100 <= exact*tol), so both sides hash identically.
    Oracle = exact counts + literal TRUE."""
    c = tpch_adapter.cells(spark, sf_dir)
    agg = c.groupBy("table_name").agg(
        F.countDistinct("partition_key").alias("exact_partitions"),
        F.approx_count_distinct("partition_key", 0.01).alias("approx_partitions"),
    )
    within = (
        F.abs(F.col("approx_partitions") - F.col("exact_partitions")) * 100
        <= F.col("exact_partitions") * APPROX_DISTINCT_TOL_PCT
    )
    return agg.select(
        "table_name", "exact_partitions", within.alias("approx_within_tol")
    )


_FILENAMES_SQL = ", ".join(f"'{n}'" for n in DEFAULT_FILENAMES)

ORACLES = {
    "catalog_tables": with_adapter("""
SELECT keyspace, table_name, count(*) AS sstables
FROM sstables_meta
GROUP BY 1, 2
"""),
    "sstables_filtered": with_adapter(f"""
SELECT keyspace, table_name, sstable_id, filename,
       uncompressed_length, keys
FROM sstables_meta
WHERE filename IN ({_FILENAMES_SQL})
"""),
    "summary_rollup": with_adapter("""
SELECT coalesce(keyspace, '<all>') AS keyspace,
       coalesce(table_name, '<all>') AS table_name,
       count(*) AS sstable_count,
       CAST(sum(uncompressed_length) AS BIGINT) AS data_size
FROM sstables_meta
GROUP BY ROLLUP (keyspace, table_name)
-- HAVING pins the shared empty-relation contract: Spark grouping sets over
-- zero rows emit NO rows (not even the grand total), DuckDB emits the
-- all-NULL total row; no-op on any non-empty input
HAVING count(*) > 0
"""),
    # The approx VALUE is engine-specific (HLL++ registers), so the checkable
    # surface is exact count + tolerance boolean; Spark's sketch is
    # deterministic, so TRUE is a stable contract, not a flaky assertion.
    "cardinality_estimates": with_adapter("""
SELECT table_name,
       CAST(count(DISTINCT partition_key) AS BIGINT) AS exact_partitions,
       TRUE AS approx_within_tol
FROM cells
GROUP BY 1
"""),
}

QUERIES = {
    "catalog_tables": catalog_tables,
    "sstables_filtered": sstables_filtered,
    "summary_rollup": summary_rollup,
    "cardinality_estimates": cardinality_estimates,
}
