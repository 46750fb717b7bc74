"""`pstats` -- partition-size statistics from the index only (reference cmd 3).

Reference: cli/PartitionSizeStatisticsCollector.java:33-188. Reads ONLY the
Index.db files ("relatively quick", README.md:98) -- the covering-index trick:
sizes come from position deltas (IndexReader.java:88-98), never touching
Data.db. Per partition key, sizes/sstable-counts are collated across sstables
(PartitionReader.java:55-71), then: size histogram + percentiles, top-N
largest partitions, top-N by sstable count, global avg (integer division,
:181).

Spark shape:
- narrow scan of `index_entries` (column pruning analog of the index trick);
- W1 window for sizes (operators/window_sizes.py) + broadcast join for file
  lengths;
- one groupBy(partition_key) collate -> cached; reused by the summary row and
  both top-N reports (mirrors the reference's single pass feeding 2 heaps +
  2 histograms);
- exact percentiles for the correctness gate, `approx=True` path for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import DEFAULT_TOP_N
from cassandra_sstable_tools_spark.operators.percentiles import (
    percentile_cols,
    percentile_sql,
)
from cassandra_sstable_tools_spark.operators.topn import top_n_per_group
from cassandra_sstable_tools_spark.operators.window_sizes import index_partition_sizes
from cassandra_sstable_tools_spark.oracles import with_adapter
from cassandra_sstable_tools_spark.sources import tpch_adapter


def collate_sizes(sizes: DataFrame) -> DataFrame:
    """Per-partition (across sstables): total size + sstable count (J1).
    Takes ANY (keyspace, table_name, sstable_id, partition_key, size)
    frame -- the parquet adapter's, or the binary Index.db path's -- so
    every pstats report shares one collate definition."""
    return sizes.groupBy("keyspace", "table_name", "partition_key").agg(
        F.sum("size").alias("size"),
        F.count(F.lit(1)).alias("tables"),
    )


def _collated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-path collate, persisted via the adapter's cache registry so
    the summary and both top-N reports reuse ONE collate pass -- the Spark
    analog of the reference's single stream feeding 2 heaps + 2
    histograms."""

    def build() -> DataFrame:
        return collate_sizes(
            index_partition_sizes(
                tpch_adapter.index_entries(spark, sf_dir),
                tpch_adapter.sstables(spark, sf_dir),
            )
        )

    return tpch_adapter._cached(spark, sf_dir, "pstats_collated", build)


def summary_from_collated(c: DataFrame, approx: bool = False) -> DataFrame:
    """One row per table: count / total / min / max / avg + size percentiles."""
    return c.groupBy("keyspace", "table_name").agg(
        F.count(F.lit(1)).alias("partitions"),
        F.sum("size").alias("total_size"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        # integer division per reference (X5, PartitionSizeStatisticsCollector.java:181)
        F.floor(F.sum("size") / F.count(F.lit(1))).alias("avg_size"),
        *percentile_cols("size", approx=approx),
    )


def top_size_from_collated(c: DataFrame, n: int = DEFAULT_TOP_N) -> DataFrame:
    """Top-N largest partitions per table (SIZE_COMPARATOR + key tiebreak)."""
    return top_n_per_group(
        c,
        ["keyspace", "table_name"],
        [F.desc("size"), F.asc("partition_key")],
        n,
    ).select("keyspace", "table_name", "partition_key", "size", "tables", "rank")


def top_tables_from_collated(c: DataFrame, n: int = DEFAULT_TOP_N) -> DataFrame:
    """Top-N partitions by #sstables containing them (collate tableCount)."""
    return top_n_per_group(
        c,
        ["keyspace", "table_name"],
        [F.desc("tables"), F.desc("size"), F.asc("partition_key")],
        n,
    ).select("keyspace", "table_name", "partition_key", "tables", "size", "rank")


def pstats_summary(spark: SparkSession, sf_dir: str, approx: bool = False) -> DataFrame:
    """One row per table: count / total / min / max / avg + size percentiles
    off the cached parquet-path collate."""
    return summary_from_collated(_collated(spark, sf_dir), approx=approx)


def pstats_top_size(spark: SparkSession, sf_dir: str, n: int = DEFAULT_TOP_N) -> DataFrame:
    """Top-N largest partitions per table off the cached parquet-path
    collate (SIZE_COMPARATOR + key tiebreak)."""
    return top_size_from_collated(_collated(spark, sf_dir), n)


def pstats_top_tables(spark: SparkSession, sf_dir: str, n: int = DEFAULT_TOP_N) -> DataFrame:
    """Top-N partitions by #sstables containing them off the cached
    parquet-path collate."""
    return top_tables_from_collated(_collated(spark, sf_dir), n)


_COLLATED_CTE = """
sizes AS (
    SELECT i.keyspace, i.table_name, i.sstable_id, i.partition_key,
           coalesce(lead(i.position) OVER (
               PARTITION BY i.keyspace, i.table_name, i.sstable_id
               ORDER BY i.position), s.uncompressed_length) - i.position AS size
    FROM index_entries i
    JOIN sstables_meta s USING (keyspace, table_name, sstable_id)
),
collated AS (
    SELECT keyspace, table_name, partition_key,
           CAST(sum(size) AS BIGINT) AS size,
           count(*) AS tables
    FROM sizes
    GROUP BY 1, 2, 3
)"""

ORACLE_PSTATS_SUMMARY = with_adapter(f""",
{_COLLATED_CTE.lstrip()}
SELECT keyspace, table_name,
       count(*) AS partitions,
       CAST(sum(size) AS BIGINT) AS total_size,
       min(size) AS min_size,
       max(size) AS max_size,
       CAST(floor(sum(size) / count(*)) AS BIGINT) AS avg_size,
       {percentile_sql('size')}
FROM collated
GROUP BY 1, 2
""".replace("WITH ,", "WITH "))

ORACLE_PSTATS_TOP_SIZE = with_adapter(f""",
{_COLLATED_CTE.lstrip()}
SELECT keyspace, table_name, partition_key, size, tables, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY keyspace, table_name
        ORDER BY size DESC, partition_key ASC) AS rank
    FROM collated
) WHERE rank <= {DEFAULT_TOP_N}
""".replace("WITH ,", "WITH "))

ORACLE_PSTATS_TOP_TABLES = with_adapter(f""",
{_COLLATED_CTE.lstrip()}
SELECT keyspace, table_name, partition_key, tables, size, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY keyspace, table_name
        ORDER BY tables DESC, size DESC, partition_key ASC) AS rank
    FROM collated
) WHERE rank <= {DEFAULT_TOP_N}
""".replace("WITH ,", "WITH "))

QUERIES = {
    "pstats_summary": pstats_summary,
    "pstats_top_size": pstats_top_size,
    "pstats_top_tables": pstats_top_tables,
}
ORACLES = {
    "pstats_summary": ORACLE_PSTATS_SUMMARY,
    "pstats_top_size": ORACLE_PSTATS_TOP_SIZE,
    "pstats_top_tables": ORACLE_PSTATS_TOP_TABLES,
}


# percentile_approx returns a DISCRETE data element while the exact mode
# interpolates between ranks, so on small per-group populations a tail
# percentile can sit a whole rank away (measured: p99 off 8.6% on the
# ~330-partition sf0.001 group; deviation shrinks as groups grow -- at
# 100 TB group sizes the sketch's own 1/accuracy rank error dominates,
# ~0.01%). 10% certifies sketch sanity across every fixture SF without
# asserting a precision the discrete-vs-interpolated gap can't give.
APPROX_PCTL_TOL_PCT = 10


def pstats_summary_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certifies the documented SCALE PATH (A5 ``approx=True`` --
    bounded-memory percentile sketch instead of exact per-group buffering):
    runs BOTH modes and emits the exact percentiles plus one boolean per
    percentile asserting the sketch landed within APPROX_PCTL_TOL_PCT (10%;
    see the constant's comment for why the discrete-vs-interpolated gap
    needs that slack on small fixture groups) -- integer
    cross-multiplication, same contract pattern as cardinality_estimates.
    The oracle is the exact percentiles + literal TRUEs, so a green driver
    row proves the approx flag's output quality, not just that it runs."""
    exact = pstats_summary(spark, sf_dir, approx=False)
    apx = pstats_summary(spark, sf_dir, approx=True).select(
        "keyspace", "table_name",
        *[F.col(c).alias(f"a_{c}") for c in
          ("p50", "p75", "p90", "p95", "p99", "p999")],
    )
    j = exact.join(apx, ["keyspace", "table_name"])
    checks = [
        # NULL-safe: a group with no measurable sizes (dirty rows) yields
        # NULL from BOTH modes -- the sketch agrees with exact, so the
        # check holds (oracle emits literal TRUE); NULL from only one mode
        # is a genuine failure
        F.coalesce(
            F.abs(F.col(f"a_{c}") - F.col(c)) * 100
            <= F.col(c) * APPROX_PCTL_TOL_PCT,
            F.col(f"a_{c}").isNull() & F.col(c).isNull(),
        ).alias(f"{c}_within_tol")
        for c in ("p50", "p75", "p90", "p95", "p99", "p999")
    ]
    return j.select(
        "keyspace", "table_name", "partitions",
        "p50", "p75", "p90", "p95", "p99", "p999", *checks
    )


ORACLES["pstats_summary_approx_check"] = with_adapter(f""",
{_COLLATED_CTE.lstrip()}
SELECT keyspace, table_name,
       count(*) AS partitions,
       {percentile_sql('size')},
       true AS p50_within_tol, true AS p75_within_tol, true AS p90_within_tol,
       true AS p95_within_tol, true AS p99_within_tol, true AS p999_within_tol
FROM collated
GROUP BY 1, 2
""")
QUERIES["pstats_summary_approx_check"] = pstats_summary_approx_check
