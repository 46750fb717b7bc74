"""Parquet sink: partitioned, size-targeted writes for pipeline outputs.

The reference's only sink is a driver-side ASCII report (SURVEY.md §2.1 S7).
A training-data engine also needs to WRITE corpora back out; this module is
that surface, with the two decisions that matter at 100 TB made explicit:

- **Partition columns** (hive-style directories) give downstream readers
  free partition pruning: `write_clean_corpus` partitions by `lang` so a
  per-language training run scans only its directory.
- **File sizing**: rows are shuffled on (partition_cols, file_id) where
  ``file_id = hash(spread_col) % files_per_partition``, so each partition
  directory receives exactly up to ``files_per_partition`` files AND the
  write parallelism within one partition value scales with that knob.
  Repartitioning on the partition columns alone would collapse each
  partition value into a single task (a hotspot for a skewed language at
  100 TB); no repartition at all sprays tasks x partitions sliver files
  (the classic small-files explosion). files_per_partition is a caller
  knob because the right value is data-dependent (target ~128 MB-1 GB per
  file).

Writes go through a staging `DataFrameWriter` with overwrite semantics so
re-runs are idempotent (same contract as a Delta/Iceberg replace, minus the
transaction log -- documented limitation, not a bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm.pipeline import corpus_keep_list


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    spread_col: str,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``, bounded to
    ``files_per_partition`` files per partition directory. ``spread_col`` is
    any stable high-cardinality column (e.g. the document id); its hash
    assigns each row a file slot, so one partition value spreads over up to
    ``files_per_partition`` parallel writer tasks."""
    fid = F.pmod(F.xxhash64(spread_col), F.lit(files_per_partition))
    (
        df.withColumn("_file_id", fid)
        .repartition(*partition_cols, "_file_id")
        .drop("_file_id")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_clean_corpus(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Run the cleaning pipeline and persist the keep-list partitioned by
    language; returns the re-read frame (reader-visible schema)."""
    kept = corpus_keep_list(spark, sf_dir)
    write_partitioned(kept, out_dir, ["lang"], spread_col="doc_id")
    return spark.read.parquet(out_dir)
