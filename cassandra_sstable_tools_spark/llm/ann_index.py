"""Durable IVF index: the inverted-file layout materialized to parquet,
partitioned BY LIST (centroid_id) -- "build once, query many" as real files
rather than a session cache.

Why this layout matters at 100 TB: a probe touches NPROBE of K inverted
lists, and because `centroid_id` is a hive PARTITION COLUMN the probe list
becomes a directory listing -- Spark opens ONLY the probed lists' files
(PartitionFilters in the scan, pinned in tests/test_plan_audit.py), never
the other K-NPROBE/K of the index. That is the file-level analog of an ANN
library loading only probed posting lists, and it composes with everything
the scan-path IVF already does (literal-argmax probe selection, broadcast
probe/query sides, bounded top-k).

Staleness safety: the index directory name embeds a fingerprint of the
source `embeddings.parquet` (mtime+size of every part file), so a
regenerated corpus can never be served from a stale index -- the path
changes and the index rebuilds.

The registered query `ann_ivf_topk_indexed` must produce BIT-IDENTICAL
results to `ann_ivf_topk` (same centroids, same probes, same scoring
expression); the driver certifies it against the very same DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from cassandra_sstable_tools_spark.llm.similarity import (
    _IVF_SQL,
    N_QUERIES,
    ORACLES as _SIM_ORACLES,
    TOP_K,
    _dot,
    _empty_topk,
    _first_k_cent_rows,
    _ivf_assign_probes,
    _pq_encoded,
    _pq_queries,
    _pq_scored,
    _pq_setup,
    _quantized,
    _sim,
)
from cassandra_sstable_tools_spark.operators.topn import top_n_per_group

INDEX_ROOT = os.environ.get(
    "SPARK_GRAFT_ANN_INDEX_DIR", "/tmp/spark_graft_ann_index"
)


# Bump when the on-disk layout or any index-defining expression changes
# incompatibly (carry schema, quantization scale, packing, probe rule).
_INDEX_LAYOUT_VERSION = "v2"


def _source_fingerprint(
    sf_dir: str, config: str, src_file: str = "embeddings.parquet"
) -> str:
    """Digest of (source data, index-defining config): nanosecond mtimes +
    sizes of the source parquet's part files (cheap, stat only -- changes
    whenever the driver regenerates the testdata) PLUS the layout version
    and every constant that shapes the index (K, NPROBE, PQ dims...), so a
    code change that alters index content also changes the path instead of
    silently serving a stale index built by the old code."""
    import hashlib

    src = os.path.join(sf_dir, src_file)
    parts = [_INDEX_LAYOUT_VERSION, config]
    if os.path.isdir(src):
        for name in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, name))
            parts.append(f"{name}:{st.st_mtime_ns}:{st.st_size}")
    else:
        st = os.stat(src)
        parts.append(f"{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:16]


def _index_path(
    sf_dir: str, kind: str, config: str, src_file: str = "embeddings.parquet"
) -> str:
    """Fingerprinted index dir; superseded fingerprints for the same
    (corpus slug, kind) are removed so /tmp does not accumulate one dead
    index per regeneration."""
    import shutil

    slug = sf_dir.strip("/").replace("/", "_")
    prefix = f"{slug}_{kind}_"
    current = prefix + _source_fingerprint(sf_dir, config, src_file)
    if os.path.isdir(INDEX_ROOT):
        for name in os.listdir(INDEX_ROOT):
            if name.startswith(prefix) and name != current:
                shutil.rmtree(os.path.join(INDEX_ROOT, name), ignore_errors=True)
    return os.path.join(INDEX_ROOT, current)


def ivf_index_path(sf_dir: str) -> str:
    from cassandra_sstable_tools_spark.llm.similarity import N_CENTROIDS, NPROBE

    return _index_path(
        sf_dir, "ivf", f"k={N_CENTROIDS};nprobe={NPROBE};q=1000"
    )


def build_ivf_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """ONE assignment scan (the shared literal-argmax fold) written
    list-partitioned with each vector's (qv, norm) stored IN its list row --
    the query path reads probed lists only and never joins back to the
    corpus. The ingest shuffle (partitionBy write) is the build cost,
    amortized over every subsequent query -- the same trade the bucketed
    cells layout makes for stats."""
    emb = _quantized(spark, sf_dir)
    cents = _first_k_cent_rows(emb)
    if not cents:
        # Fail loud: a partitioned write of zero rows leaves a directory
        # Spark cannot re-read (no schema footer). Query paths degrade to
        # empty results BEFORE calling ensure_*; direct builders get a
        # clear error instead of a poisoned index location.
        raise ValueError("cannot build IVF index over an empty corpus")
    assigned, _ = _ivf_assign_probes(emb, cents, carry=("qv", "norm"))
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def append_vectors_to_ivf_index(
    emb_subset: DataFrame, cent_rows, path: str
) -> None:
    """Incremental index maintenance: assign ONLY the new vectors (same
    literal-argmax scan, against the SAME frozen centroids the index was
    built with -- the coarse quantizer is immutable once lists exist) and
    append their rows to the existing list partitions. At 100 TB this is
    the streaming-ingest path: each micro-batch pays one assignment scan +
    a partitioned append; no existing list is rewritten. Equality with a
    from-scratch build is pinned in tests/test_ann_index_incremental.py.

    Production notes: (1) `path` is the caller's STABLE index location
    managed by the ingest pipeline -- the fingerprinted `ensure_*` paths
    are this repo's guard against the driver regenerating the fixture
    corpus, not a production path-resolution scheme (a production corpus
    mutates via this very append, it is not re-fingerprinted). (2) The
    append is not idempotent: deliver batches exactly-once (e.g. a
    Structured Streaming foreachBatch with checkpointing) or dedup on
    vec_id downstream; a blind retry appends duplicates. (3) Appends are
    single-writer, MECHANICALLY enforced (r06 VERDICT #6): a concurrent
    appender raises ``ConcurrentWriterError`` (sources/write_lock.py)
    instead of interleaving partition writes."""
    from cassandra_sstable_tools_spark.sources.write_lock import (
        index_writer_lock,
    )

    assigned, _ = _ivf_assign_probes(emb_subset, cent_rows, carry=("qv", "norm"))
    with index_writer_lock(path):
        assigned.write.mode("append").partitionBy("centroid_id").parquet(path)


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize-once accessor (fingerprinted path => stale-proof)."""
    path = ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_ivf_index(spark, sf_dir, path)
    return path


def compact_ivf_index(
    spark: SparkSession, path: str, max_files_per_list: int = 4
) -> int:
    """OPTIMIZE pass: rewrite over-fragmented list partitions.

    Every `append_vectors_to_ivf_index` leaves one new file in each touched
    list partition, so a continuously-ingesting index degrades toward
    one-file-per-batch-per-list -- probe latency then pays a file-open per
    tiny file. Compaction is SELECTIVE, the way production table formats do
    it: only partitions whose file count exceeds `max_files_per_list` are
    rewritten (read that list's rows, write them back as one file, swap the
    directory); healthy lists are not touched, so compaction cost tracks
    fragmentation, not index size. Returns the number of lists rewritten.

    Atomicity: the rewrite lands in a sibling temp dir first and replaces
    the partition dir only after the write completes, so readers before the
    swap see the old files and readers after see the new -- but the
    rmtree/rename pair itself is not transactional. Compaction takes the
    SAME writer lock as appends (sources/write_lock.py), so an append
    racing a compaction fails loud rather than landing files in a
    partition dir mid-swap; a transactional table format (Iceberg/Delta)
    is the drop-in upgrade when multi-writer compaction is needed."""
    from cassandra_sstable_tools_spark.sources.write_lock import (
        index_writer_lock,
    )

    with index_writer_lock(path):
        return _compact_locked(spark, path, max_files_per_list)


def _compact_locked(spark, path: str, max_files_per_list: int) -> int:
    import shutil

    rewritten = 0
    for name in sorted(os.listdir(path)):
        if not name.startswith("centroid_id="):
            continue
        pdir = os.path.join(path, name)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) <= max_files_per_list:
            continue
        rows = spark.read.parquet(pdir)  # partition col lives in the dirname
        # dot-prefixed temp dir: Spark's file index ignores dot/underscore
        # paths, so a reader listing the index root mid-compaction (or after
        # a crash between write and swap) never sees a phantom partition
        # value -- and the startswith("centroid_id=") scans here and in
        # ivf_index_file_counts skip it too.
        tmp = os.path.join(path, f".compacting.{name}")
        rows.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(pdir)
        os.replace(tmp, pdir)
        rewritten += 1
    return rewritten


def ivf_index_file_counts(path: str) -> dict[int, int]:
    """parquet-file count per list partition (fragmentation metric)."""
    out: dict[int, int] = {}
    for name in os.listdir(path):
        if name.startswith("centroid_id="):
            pdir = os.path.join(path, name)
            out[int(name.split("=", 1)[1])] = sum(
                1 for f in os.listdir(pdir) if f.endswith(".parquet")
            )
    return out


def ann_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_topk served from the DURABLE list-partitioned index.

    The probe set (<= N_QUERIES * NPROBE centroid ids) is collected --
    bounded, corpus-independent -- and applied as a LITERAL partition
    predicate, so the index scan opens only the probed lists' files
    (PartitionFilters, pinned in tests/test_plan_audit.py). Scoring and
    ranking are expression-identical to the scan path; the oracle is the
    same _IVF_SQL, so a green driver row proves index == scan."""
    emb = _quantized(spark, sf_dir)
    cents = _first_k_cent_rows(emb)
    if not cents:  # empty corpus slice: nothing to index (degrade)
        return _empty_topk(spark)
    path = ensure_ivf_index(spark, sf_dir)
    _, probes = _ivf_assign_probes(emb, cents)
    probe_rows = [(int(r.query_id), int(r.centroid_id)) for r in probes.collect()]
    probed_ids = sorted({cid for _, cid in probe_rows})

    index = spark.read.parquet(path).where(
        F.col("centroid_id").isin(probed_ids)
    )
    probes_df = spark.createDataFrame(
        probe_rows, "query_id long, centroid_id int"
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        index.join(broadcast(probes_df), "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(broadcast(queries), "query_id")
        .withColumn("dot", _dot(F.col("q_qv"), F.col("qv")))
        .withColumn(
            "sim_ppm",
            F.floor(_sim(F.col("dot"), F.col("q_norm"), F.col("norm")) * 1000000),
        )
    )
    return top_n_per_group(
        scored,
        ["query_id"],
        [F.desc("sim_ppm"), F.asc("vec_id")],
        TOP_K,
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "sim_ppm", "rank")


def ivfpq_index_path(sf_dir: str) -> str:
    from cassandra_sstable_tools_spark.llm.similarity import (
        N_CENTROIDS,
        NPROBE,
        PQ_K,
        PQ_M,
    )

    return _index_path(
        sf_dir, "pq",
        f"k={N_CENTROIDS};nprobe={NPROBE};m={PQ_M};pk={PQ_K};q=1000",
    )


def build_ivfpq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """IVF lists + PQ codes ON DISK: each list row holds exactly TWO
    bigints (packed 4-bit codes + reconstruction norm) instead of the raw
    vector -- the ~32x storage cut of PQ realized in the durable layout,
    composed with file-level list pruning from partitionBy(centroid_id).
    This is the standard billion-scale ANN disk format (coarse quantizer ->
    posting lists -> PQ codes) expressed as plain partitioned parquet."""
    emb = _quantized(spark, sf_dir)
    cents = _first_k_cent_rows(emb)
    if not cents:
        raise ValueError("cannot build IVF+PQ index over an empty corpus")
    assigned, _ = _ivf_assign_probes(emb, cents)
    cb_lit, cbnorm_lit, sub_d = _pq_setup(emb)
    encoded = _pq_encoded(emb, cb_lit, cbnorm_lit, sub_d)
    (
        assigned.join(encoded, "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    path = ivfpq_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_ivfpq_index(spark, sf_dir, path)
    return path


def ann_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivfpq_topk served from the durable codes-only index: probed
    lists' FILES only (literal partition predicate), candidates scored with
    M LUT reads off the broadcast query LUTs -- the corpus's raw vectors
    are never read at query time at all. Same oracle as the scan path."""
    emb = _quantized(spark, sf_dir)
    cents = _first_k_cent_rows(emb)
    if not cents:  # empty corpus slice: nothing to index (degrade)
        return _empty_topk(spark, "simq_ppm")
    path = ensure_ivfpq_index(spark, sf_dir)
    _, probes = _ivf_assign_probes(emb, cents)
    probe_rows = [(int(r.query_id), int(r.centroid_id)) for r in probes.collect()]
    probed_ids = sorted({cid for _, cid in probe_rows})

    index = spark.read.parquet(path).where(
        F.col("centroid_id").isin(probed_ids)
    )
    probes_df = spark.createDataFrame(
        probe_rows, "query_id long, centroid_id int"
    )
    cb_lit, _, sub_d = _pq_setup(emb)
    queries = _pq_queries(emb, cb_lit, sub_d)
    scored = _pq_scored(
        index.join(broadcast(probes_df), "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(broadcast(queries), "query_id")
    )
    return top_n_per_group(
        scored,
        ["query_id"],
        [F.desc("simq_ppm"), F.asc("vec_id")],
        TOP_K,
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "simq_ppm", "rank")


QUERIES = {
    "ann_ivf_topk_indexed": ann_ivf_topk_indexed,
    "ann_ivfpq_topk_indexed": ann_ivfpq_topk_indexed,
}
ORACLES = {
    "ann_ivf_topk_indexed": _IVF_SQL,
    "ann_ivfpq_topk_indexed": _SIM_ORACLES["ann_ivfpq_topk"],
}
