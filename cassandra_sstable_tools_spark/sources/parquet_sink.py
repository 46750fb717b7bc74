"""Parquet sink: partitioned, size-targeted writes for pipeline outputs.

The reference's only sink is a driver-side ASCII report (SURVEY.md §2.1 S7).
A training-data engine also needs to WRITE corpora back out; this module is
that surface, with the two decisions that matter at 100 TB made explicit:

- **Partition columns** (hive-style directories) give downstream readers
  free partition pruning: `write_clean_corpus` partitions by `lang` so a
  per-language training run scans only its directory.
- **File sizing**: `repartition(n, partition_cols)` before the write keeps
  one task's output per partition-directory bounded -- without it, every
  task writes a sliver file into every directory (the classic small-files
  explosion: tasks x partitions files). n is a caller knob because the
  right value is data-dependent (target ~128 MB-1 GB per file).

Writes go through a staging `DataFrameWriter` with overwrite semantics so
re-runs are idempotent (same contract as a Delta/Iceberg replace, minus the
transaction log -- documented limitation, not a bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_sstable_tools_spark.llm.pipeline import corpus_keep_list


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``; repartition
    first so each partition directory receives ``files_per_partition`` files."""
    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_clean_corpus(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Run the cleaning pipeline and persist the keep-list partitioned by
    language; returns the re-read frame (reader-visible schema)."""
    kept = corpus_keep_list(spark, sf_dir)
    write_partitioned(kept, out_dir, ["lang"])
    return spark.read.parquet(out_dir)
