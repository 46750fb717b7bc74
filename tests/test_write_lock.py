"""Single-writer lock contract (r06 VERDICT #6): a simulated concurrent
append fails LOUD with the holder's identity instead of corrupting the
index's uniqueness invariant; normal sequential appends are unaffected
(append-equals-rebuild stays green in the incremental suites)."""

from __future__ import annotations

import os

import pytest

from cassandra_sstable_tools_spark.sources.write_lock import (
    ConcurrentWriterError,
    break_lock,
    index_writer_lock,
)


def test_lock_excludes_second_writer(tmp_path):
    idx = str(tmp_path / "index")
    with index_writer_lock(idx):
        with pytest.raises(ConcurrentWriterError, match="pid="):
            with index_writer_lock(idx):
                pass
    # released on exit: a new writer proceeds
    with index_writer_lock(idx):
        pass


def test_lock_released_on_exception(tmp_path):
    idx = str(tmp_path / "index")
    with pytest.raises(RuntimeError, match="boom"):
        with index_writer_lock(idx):
            raise RuntimeError("boom")
    with index_writer_lock(idx):
        pass


def test_dead_writer_lock_persists_until_broken(tmp_path):
    idx = str(tmp_path / "index")
    # simulate a crashed writer: lock file left behind, no process exit hook
    os.makedirs(tmp_path, exist_ok=True)
    with open(idx + ".writer.lock", "w") as f:
        f.write("pid=999999 host=deadbox t=0")
    with pytest.raises(ConcurrentWriterError, match="deadbox"):
        with index_writer_lock(idx):
            pass
    assert break_lock(idx) is True
    assert break_lock(idx) is False  # idempotent
    with index_writer_lock(idx):
        pass


def test_chunk_append_is_lock_guarded(spark, tmp_path):
    """The real append entry point raises under an active lock and leaves
    the index bytes untouched -- uniqueness can't be corrupted by a racing
    writer."""
    from cassandra_sstable_tools_spark.llm.dedup_index import (
        append_chunks_to_index,
    )

    path = str(tmp_path / "chunk_index")
    batch1 = spark.createDataFrame([("h1",), ("h2",)], "h string")
    append_chunks_to_index(batch1, path)
    with index_writer_lock(path):
        with pytest.raises(ConcurrentWriterError):
            append_chunks_to_index(
                spark.createDataFrame([("h2",), ("h3",)], "h string"), path
            )
    # after release the same batch lands, still hash-unique
    append_chunks_to_index(
        spark.createDataFrame([("h2",), ("h3",)], "h string"), path
    )
    got = sorted(r["h"] for r in spark.read.parquet(path).collect())
    assert got == ["h1", "h2", "h3"]


def test_ivf_append_and_compact_are_lock_guarded(spark, sf_dir, tmp_path):
    from cassandra_sstable_tools_spark.llm.ann_index import (
        _first_k_cent_rows,
        _quantized,
        append_vectors_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
    )

    path = str(tmp_path / "ivf_index")
    build_ivf_index(spark, sf_dir, path)
    emb = _quantized(spark, sf_dir).limit(5)
    cents = _first_k_cent_rows(_quantized(spark, sf_dir))
    with index_writer_lock(path):
        with pytest.raises(ConcurrentWriterError):
            append_vectors_to_ivf_index(emb, cents, path)
        with pytest.raises(ConcurrentWriterError):
            compact_ivf_index(spark, path)
    # lock released: both proceed
    append_vectors_to_ivf_index(emb, cents, path)
    compact_ivf_index(spark, path)
