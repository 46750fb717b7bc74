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
