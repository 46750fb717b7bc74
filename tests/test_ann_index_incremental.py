"""Incremental maintenance of the durable IVF index: building the index
from a base batch and APPENDING the rest must serve exactly the same
top-k answers as a from-scratch full build (and as the scan path).

The centroids are frozen at build time (the coarse quantizer is immutable
once lists exist); appends assign new vectors against those same centroids.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm import ann_index as AI
from cassandra_sstable_tools_spark.llm import similarity as S


def test_appended_index_equals_full_build(spark, sf_dir, tmp_path):
    emb = S._quantized(spark, sf_dir)
    cent_rows = S._first_k_cent_rows(emb)
    n = emb.count()
    split = n // 2
    assert split > S.N_CENTROIDS, "fixture too small to split meaningfully"

    inc_path = str(tmp_path / "ivf_incremental")
    # base build on the first half...
    base_assigned, _ = S._ivf_assign_probes(
        emb.where(F.col("vec_id") < split), cent_rows, carry=("qv", "norm")
    )
    base_assigned.write.partitionBy("centroid_id").parquet(inc_path)
    # ...then append the second half as an "ingest batch"
    AI.append_vectors_to_ivf_index(
        emb.where(F.col("vec_id") >= split), cent_rows, inc_path
    )

    # the incremental index holds every vector exactly once, in the same
    # list the full build assigns it to
    idx = spark.read.parquet(inc_path)
    assert idx.count() == n
    full_assigned, _ = S._ivf_assign_probes(emb, cent_rows)
    got_lists = {(r.vec_id, r.centroid_id)
                 for r in idx.select("vec_id", "centroid_id").collect()}
    want_lists = {(r.vec_id, r.centroid_id) for r in full_assigned.collect()}
    assert got_lists == want_lists

    # ...and serves the same answers as the scan path when queried through
    # the indexed plan (patch the path resolver at the module seam)
    orig = AI.ensure_ivf_index
    AI.ensure_ivf_index = lambda _spark, _sf: inc_path
    try:
        got = sorted(map(tuple, AI.ann_ivf_topk_indexed(spark, sf_dir).collect()))
    finally:
        AI.ensure_ivf_index = orig
    want = sorted(map(tuple, S.ann_ivf_topk(spark, sf_dir).collect()))
    assert got == want
    shutil.rmtree(inc_path, ignore_errors=True)


def test_compaction_bounds_files_and_preserves_answers(spark, sf_dir, tmp_path):
    """N appends -> fragmented lists; compact_ivf_index rewrites only the
    over-fragmented partitions, bounds files-per-list, and the indexed
    query still serves bit-identical answers."""
    emb = S._quantized(spark, sf_dir)
    cent_rows = S._first_k_cent_rows(emb)
    n = emb.count()

    path = str(tmp_path / "ivf_compact")
    n_batches = 6
    step = n // n_batches + 1
    base = emb.where(F.col("vec_id") < step)
    assigned, _ = S._ivf_assign_probes(base, cent_rows, carry=("qv", "norm"))
    assigned.write.partitionBy("centroid_id").parquet(path)
    for b in range(1, n_batches):
        AI.append_vectors_to_ivf_index(
            emb.where(
                (F.col("vec_id") >= b * step) & (F.col("vec_id") < (b + 1) * step)
            ),
            cent_rows,
            path,
        )

    frag = AI.ivf_index_file_counts(path)
    assert max(frag.values()) > 2, f"appends did not fragment: {frag}"

    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    rewritten = AI.compact_ivf_index(spark, path, max_files_per_list=2)
    assert rewritten == sum(1 for v in frag.values() if v > 2)

    after_counts = AI.ivf_index_file_counts(path)
    assert max(after_counts.values()) <= 2, after_counts
    # compaction moved bytes, not rows
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before

    # a second pass is a no-op (idempotent once bounded)
    assert AI.compact_ivf_index(spark, path, max_files_per_list=2) == 0

    # the compacted incremental index still serves scan-path answers
    orig = AI.ensure_ivf_index
    AI.ensure_ivf_index = lambda _spark, _sf: path
    try:
        got = sorted(map(tuple, AI.ann_ivf_topk_indexed(spark, sf_dir).collect()))
    finally:
        AI.ensure_ivf_index = orig
    want = sorted(map(tuple, S.ann_ivf_topk(spark, sf_dir).collect()))
    assert got == want
    shutil.rmtree(path, ignore_errors=True)


def test_streaming_vector_ingest_foreachbatch(spark, sf_dir, tmp_path):
    """The production ingest loop for a continuously-embedded corpus: new
    vectors arrive as a file STREAM (one file per micro-batch), each batch
    is assigned against the FROZEN build-time centroids and appended to the
    list-partitioned index via foreachBatch + checkpoint. After the drain
    the index must hold every vector exactly once in the same list a full
    build assigns, serve scan-path-identical answers, and a checkpointed
    restart with no new input must append nothing (append is not
    idempotent -- exactly-once delivery comes from the checkpoint)."""
    emb = S._quantized(spark, sf_dir)
    cent_rows = S._first_k_cent_rows(emb)
    n = emb.count()
    split = n // 2

    idx_path = str(tmp_path / "ivf_stream")
    in_dir = str(tmp_path / "incoming_vecs")
    ckpt = str(tmp_path / "vec_ckpt")

    base = emb.where(F.col("vec_id") < split)
    assigned, _ = S._ivf_assign_probes(base, cent_rows, carry=("qv", "norm"))
    assigned.write.partitionBy("centroid_id").parquet(idx_path)

    arriving = emb.where(F.col("vec_id") >= split)
    arriving.repartition(3).write.parquet(in_dir)

    def ingest(batch_df, _bid):
        AI.append_vectors_to_ivf_index(batch_df, cent_rows, idx_path)

    def run_once():
        q = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    idx = spark.read.parquet(idx_path)
    assert idx.count() == n
    full_assigned, _ = S._ivf_assign_probes(emb, cent_rows)
    got_lists = {(r.vec_id, r.centroid_id)
                 for r in idx.select("vec_id", "centroid_id").collect()}
    want_lists = {(r.vec_id, r.centroid_id) for r in full_assigned.collect()}
    assert got_lists == want_lists

    run_once()  # restart, same checkpoint, no new files
    assert spark.read.parquet(idx_path).count() == n, (
        "restart re-ingested a processed batch"
    )

    # streamed-in index serves the scan path's answers (then compacts)
    AI.compact_ivf_index(spark, idx_path, max_files_per_list=2)
    orig = AI.ensure_ivf_index
    AI.ensure_ivf_index = lambda _spark, _sf: idx_path
    try:
        got = sorted(map(tuple, AI.ann_ivf_topk_indexed(spark, sf_dir).collect()))
    finally:
        AI.ensure_ivf_index = orig
    want = sorted(map(tuple, S.ann_ivf_topk(spark, sf_dir).collect()))
    assert got == want
    shutil.rmtree(idx_path, ignore_errors=True)
