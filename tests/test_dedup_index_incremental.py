"""Durable chunk-hash dedup index: incremental appends must converge to the
from-scratch build, and the delta-overlap query must read the index files
rather than re-chunking the archive."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm import dedup_index as DI
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table


def test_appended_index_equals_full_build(spark, sf_dir, tmp_path):
    """Build on half the archive, append the other half's new hashes: the
    resulting membership set must equal the from-scratch distinct."""
    d = load_table(spark, sf_dir, "documents").where(
        ~DI._delta_flag(F.col("doc_id"))
    )
    ids = sorted(r.doc_id for r in d.select("doc_id").collect())
    split = ids[len(ids) // 2]

    inc_path = str(tmp_path / "chunks_incremental")
    base = DI._chunk_occurrences(d.where(F.col("doc_id") < split))
    base.select("h").distinct().write.parquet(inc_path)

    batch = DI._chunk_occurrences(d.where(F.col("doc_id") >= split))
    # the append anti-joins the existing index internally, keeping the
    # index hash-unique by construction
    DI.append_chunks_to_index(batch, inc_path)

    got = {r.h for r in spark.read.parquet(inc_path).collect()}
    want = {r.h for r in DI._chunk_occurrences(d).select("h").distinct().collect()}
    assert got == want
    assert spark.read.parquet(inc_path).count() == len(got)

    # a blind retry of the same batch must append NOTHING (the uniqueness
    # invariant the overlap query's join depends on)
    DI.append_chunks_to_index(batch, inc_path)
    assert spark.read.parquet(inc_path).count() == len(got)


def test_overlap_query_reads_index_not_archive(spark, sf_dir):
    """The registered query's plan must scan the durable index parquet (its
    path appears in the scan) and chunk ONLY the delta: exactly one
    Generate (explode) node."""
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )

    df = DI.incremental_chunk_overlap(spark, sf_dir)
    plan = formatted_plan(df)
    # the durable index's own directory (basename carries the fingerprint)
    # must be one of the plan's scan locations
    import os

    assert os.path.basename(DI.chunk_index_path(sf_dir)) in plan
    assert tree_node_count(df, "Generate") == 1


def test_overlap_is_nontrivial(spark, sf_dir):
    """Guard against vacuous certification: the fixture's delta slice DOES
    share passages with the archive."""
    rows = DI.incremental_chunk_overlap(spark, sf_dir).collect()
    assert sum(r.seen_chunks for r in rows) > 0


def test_streaming_ingest_foreachbatch(spark, sf_dir, tmp_path):
    """The production ingest loop as real code: delta documents arrive as a
    file STREAM (one file per micro-batch), each batch chunks itself,
    anti-joins the durable index, and appends only new hashes via
    foreachBatch + checkpoint. The final index must equal the from-scratch
    build over archive+delta, and a checkpointed restart with no new input
    must append nothing (the exactly-once delivery the append contract
    requires)."""
    docs = load_table(spark, sf_dir, "documents")
    archive = docs.where(~DI._delta_flag(F.col("doc_id")))
    delta = docs.where(DI._delta_flag(F.col("doc_id")))

    idx_path = str(tmp_path / "chunk_index")
    in_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    DI._chunk_occurrences(archive).select("h").distinct().write.parquet(
        idx_path
    )
    # several arrival files -> several micro-batches
    delta.repartition(3).write.parquet(in_dir)

    def ingest(batch_df, _bid):
        DI.append_chunks_to_index(
            DI._chunk_occurrences(batch_df).select("h"), idx_path
        )

    def run_once():
        q = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = {r.h for r in spark.read.parquet(idx_path).collect()}
    want = {
        r.h
        for r in DI._chunk_occurrences(docs).select("h").distinct().collect()
    }
    assert got == want
    n_rows = spark.read.parquet(idx_path).count()

    run_once()  # restart, same checkpoint, no new files
    assert spark.read.parquet(idx_path).count() == n_rows, (
        "restart re-ingested a processed batch"
    )


def test_cdc_grain_index_catches_shifted_batch_duplicates(spark, tmp_path):
    """Production grain choice made testable: a passage archived at one
    word offset and re-arriving shifted in a later batch. The fixed-grid
    index misses it entirely; a CDC-grain index (same build/append/overlap
    machinery, cdc=True) catches the passage's interior chunks. Also pins
    that append-equals-rebuild holds at CDC grain."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(200)]
    passage = " ".join(rng.choice(vocab) for _ in range(100))
    pre_a = " ".join(rng.choice(vocab) for _ in range(3))
    pre_b = " ".join(rng.choice(vocab) for _ in range(7))
    archive = spark.createDataFrame(
        [(1, f"{pre_a} {passage}")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(2, f"{pre_b} {passage}")], "doc_id long, text string"
    )

    fixed_idx = str(tmp_path / "fixed_idx")
    cdc_idx = str(tmp_path / "cdc_idx")
    DI._chunk_occurrences(archive).select("h").distinct().write.parquet(fixed_idx)
    DI._chunk_occurrences(archive, cdc=True).select("h").distinct().write.parquet(cdc_idx)

    def seen(occ_df, idx_path):
        idx = spark.read.parquet(idx_path)
        return occ_df.join(idx, "h").count()

    assert seen(DI._chunk_occurrences(batch), fixed_idx) == 0, (
        "fixed grid unexpectedly aligned"
    )
    assert seen(DI._chunk_occurrences(batch, cdc=True), cdc_idx) >= 3

    # append-equals-rebuild at CDC grain (the uniqueness-preserving append)
    DI.append_chunks_to_index(
        DI._chunk_occurrences(batch, cdc=True).select("h"), cdc_idx
    )
    both = archive.union(batch)
    want = {
        r.h
        for r in DI._chunk_occurrences(both, cdc=True).select("h").distinct().collect()
    }
    got = {r.h for r in spark.read.parquet(cdc_idx).collect()}
    assert got == want
    assert spark.read.parquet(cdc_idx).count() == len(got)
