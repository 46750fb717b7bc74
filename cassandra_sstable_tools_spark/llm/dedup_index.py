"""Durable chunk-hash dedup index: the archive's duplicated-passage set as
parquet, plus the DELTA-processing query every continuously-ingesting corpus
needs -- "how much of today's batch is already in the archive?".

Exact-doc and chunk dedup (llm/dedup.py) are whole-corpus scans: correct,
but at 100 TB you do not rescan the archive per ingest batch. The
incremental formulation splits the work:

- BUILD once: the archive's distinct chunk hashes (``CHUNK_WORDS``-word
  chunks, the same grain as ``chunk_dedup_stats``/``source_overlap_matrix``)
  written to parquet. One scan + one distinct, amortized over every batch.
- Per BATCH: chunk ONLY the new documents (the delta is the only side that
  explodes), join their occurrences against the index on the hash, report
  per-source overlap, then APPEND the genuinely-new hashes. Per-batch cost
  is O(delta) + one shuffle join keyed on the hash -- the archive is never
  re-chunked and never re-shuffled beyond the join's index-side exchange
  (a bucketed-by-hash layout, `sources/bucketed.py`, elides even that; kept
  plain parquet here to stay on the driver-readable path).

The registered query ``incremental_chunk_overlap`` plays one round of that
loop deterministically: "archive" = documents whose md5(doc_id) nibble is
NOT in the test slice, "delta" = the test slice (the same e/f nibbles as
``dataset_split_stats``' test split), and the DuckDB oracle recomputes the
identical split + chunking + membership from scratch -- so the driver hash
certifies the durable index content, not just the join.

Staleness safety mirrors the ANN index: the index path embeds an
mtime+size fingerprint of documents.parquet plus every content-shaping
constant, so a regenerated corpus or changed chunking can never serve a
stale hash set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm.dedup import CHUNK_WORDS
from cassandra_sstable_tools_spark.llm.ann_index import _index_path
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

# Delta slice = the dataset_split_stats test split: the hex nibbles not
# claimed by curation's train/val splits.  Derived (not restated) so editing
# the split constants can never silently desynchronize this slice.
from cassandra_sstable_tools_spark.llm.curation import (  # noqa: E402
    SPLIT_TRAIN_NIBBLES,
    SPLIT_VAL_NIBBLES,
)

DELTA_NIBBLES = tuple(
    n for n in "0123456789abcdef"
    if n not in SPLIT_TRAIN_NIBBLES and n not in SPLIT_VAL_NIBBLES
)


def _chunk_occurrences(d: DataFrame, *keep_cols: str, cdc: bool = False) -> DataFrame:
    """(keep_cols..., h) rows: one md5 per chunk, built in-scan with array
    expressions (shared shape with chunk_dedup_stats -- no positional
    self-join, no Python).

    ``cdc=True`` switches to CONTENT-DEFINED boundaries (the
    chunk_dedup_cdc grain): shift-invariant chunking means a duplicated
    passage arriving at a different word offset in a later batch still
    collides with the archived hash -- the fixed grid misses exactly that
    case, so a production index should prefer CDC grain. The two grains
    produce disjoint hash universes; the index path fingerprint carries
    the grain so they can never mix in one index."""
    from cassandra_sstable_tools_spark.llm.dedup import chunk_occurrences

    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    normed = d.select(
        "doc_id",
        *[c for c in keep_cols if c != "doc_id"],
        norm.alias("norm"),
    )
    grain = "cdc" if cdc else "fixed"
    occ = chunk_occurrences(
        normed, grain, "doc_id", *[c for c in keep_cols if c != "doc_id"]
    )
    return occ.select(*keep_cols, "h") if keep_cols else occ.select("h")


def _delta_flag(doc_id):
    return F.substring(F.md5(doc_id.cast("string")), 1, 1).isin(*DELTA_NIBBLES)


def chunk_index_path(sf_dir: str, grain: str = "fixed") -> str:
    """Fingerprinted index dir; ``grain`` ('fixed' | 'cdc') is part of the
    config digest so the two chunkers' disjoint hash universes can never
    be served from one index."""
    return _index_path(
        sf_dir,
        "chunks",
        f"cw={CHUNK_WORDS};delta={''.join(DELTA_NIBBLES)};grain={grain}",
        src_file="documents.parquet",
    )


def build_chunk_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Distinct chunk hashes of the ARCHIVE slice (delta excluded -- the
    batch must not find itself in the index). One scan + one distinct."""
    d = load_table(spark, sf_dir, "documents").where(
        ~_delta_flag(F.col("doc_id"))
    )
    _chunk_occurrences(d).select("h").distinct().write.mode(
        "overwrite"
    ).parquet(path)


def append_chunks_to_index(new_hashes: DataFrame, path: str) -> None:
    """Incremental maintenance: append a batch's genuinely-new hashes.

    The index MUST stay hash-unique: the overlap query joins occurrences
    against it, and a duplicated index hash would fan that join out and
    overcount ``seen_chunks``. This function therefore anti-joins the
    batch against the existing index itself (one hash-keyed join per
    batch, same cost class as the overlap query), so uniqueness holds by
    construction -- a retried batch appends nothing the second time.
    Exactly-once delivery (foreachBatch + checkpoint, see the streaming
    ingest test) remains the cheaper production path because it skips the
    re-read entirely on replay.

    SINGLE WRITER, MECHANICALLY ENFORCED (r06 VERDICT #6): the anti-join
    reads a snapshot of the index and then appends to the same path, so
    two concurrent appends could each anti-join against the pre-append
    snapshot and both insert a shared hash, breaking the uniqueness
    invariant above. An exclusive lock file
    (sources/write_lock.py) makes the second appender raise
    ``ConcurrentWriterError`` instead; the streaming ingest path
    (foreachBatch, one batch at a time) acquires and releases it per
    batch with no contention."""
    from cassandra_sstable_tools_spark.sources.write_lock import (
        index_writer_lock,
    )

    spark = new_hashes.sparkSession
    with index_writer_lock(path):
        fresh = new_hashes.select("h").distinct()
        if os.path.exists(path):
            fresh = fresh.join(spark.read.parquet(path), "h", "left_anti")
        fresh.write.mode("append").parquet(path)


def ensure_chunk_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize-once accessor (fingerprinted path => stale-proof)."""
    path = chunk_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_chunk_index(spark, sf_dir, path)
    return path


def incremental_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source overlap report for one delta batch against the DURABLE
    archive index: documents, total chunk occurrences, occurrences whose
    hash already exists in the archive, and the overlap rate in ppm.

    Plan: chunk the DELTA only (the archive never re-explodes), LEFT join
    occurrences -> index hashes (the only corpus-scale exchange, keyed on
    the hash), roll up per (source, doc) then per source -- the two-level
    agg keeps doc counting exact without a countDistinct Expand over the
    occurrence frame.
    """
    path = ensure_chunk_index(spark, sf_dir)
    index = spark.read.parquet(path).withColumn("seen", F.lit(1))
    d = load_table(spark, sf_dir, "documents").where(
        _delta_flag(F.col("doc_id"))
    )
    occ = _chunk_occurrences(d, "doc_id", "source")
    per_doc = (
        occ.join(index, "h", "left")
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.sum(F.coalesce(F.col("seen"), F.lit(0))).alias("seen_chunks"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("delta_docs"),
        F.sum("chunks").alias("chunks"),
        F.sum("seen_chunks").alias("seen_chunks"),
        F.floor(
            F.sum("seen_chunks") * 1000000 / F.sum("chunks")
        ).alias("seen_ppm"),
    )


_NIBS = "', '".join(DELTA_NIBBLES)

ORACLES = {
    "incremental_chunk_overlap": rf"""
WITH n AS (
    SELECT doc_id, source,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('{_NIBS}')
               AS is_delta,
           regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
    FROM documents
),
w AS (SELECT doc_id, source, is_delta, string_split(norm, ' ') AS ws FROM n),
idx AS (
    SELECT doc_id, source, is_delta, ws,
           unnest(generate_series(
               0, CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS i
    FROM w
),
occ AS (
    SELECT doc_id, source, is_delta,
           md5(array_to_string(
               list_slice(ws, i * {CHUNK_WORDS} + 1,
                          i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')) AS h
    FROM idx
),
archive AS (SELECT DISTINCT h FROM occ WHERE NOT is_delta),
per_doc AS (
    SELECT o.source, o.doc_id, count(*) AS chunks,
           sum(CASE WHEN a.h IS NULL THEN 0 ELSE 1 END) AS seen_chunks
    FROM occ o LEFT JOIN archive a ON a.h = o.h
    WHERE o.is_delta
    GROUP BY 1, 2
)
SELECT source,
       count(*) AS delta_docs,
       CAST(sum(chunks) AS BIGINT) AS chunks,
       CAST(sum(seen_chunks) AS BIGINT) AS seen_chunks,
       CAST(floor(sum(seen_chunks) * 1000000.0 / sum(chunks)) AS BIGINT)
           AS seen_ppm
FROM per_doc
GROUP BY 1
""",
}
QUERIES = {
    "incremental_chunk_overlap": incremental_chunk_overlap,
}
