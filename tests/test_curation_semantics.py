"""Planted-data semantic tests for the round-5 curation operators.

The oracle hash proves Spark == DuckDB on the same spec; these tests prove
the SPEC does what its name claims, on corpora engineered so the right
answer is known by construction (a shared spec misunderstanding would pass
the oracle and fail here)."""

from __future__ import annotations

import pytest

from cassandra_sstable_tools_spark.llm.dedup import CHUNK_WORDS


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source) -> a documents.parquet in a tmp
    sf_dir the (spark, sf_dir) query API can read directly."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


BOILER = " ".join(f"w{i}" for i in range(CHUNK_WORDS))  # one exact chunk
UNIQUE_A = " ".join(f"a{i}" for i in range(CHUNK_WORDS))
UNIQUE_B = " ".join(f"b{i}" for i in range(CHUNK_WORDS))


def test_overlap_matrix_counts_planted_boilerplate(spark, tmp_path):
    """One chunk planted in srcA+srcB (twice in srcA -- occurrence count
    must NOT inflate the matrix), nothing shared with srcC."""
    from cassandra_sstable_tools_spark.llm.dedup import source_overlap_matrix

    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, BOILER, "en", "srcA"),
            (2, BOILER, "en", "srcA"),  # duplicate occurrence, same source
            (3, BOILER, "en", "srcB"),
            (4, UNIQUE_A, "en", "srcC"),
        ],
    )
    rows = {
        (r.source_a, r.source_b): r.shared_chunks
        for r in source_overlap_matrix(spark, sf).collect()
    }
    assert rows == {("srcA", "srcB"): 1}


def test_split_is_exhaustive_and_disjoint(spark, tmp_path):
    """Every doc lands in exactly one split; totals reconstruct the corpus."""
    from cassandra_sstable_tools_spark.llm.curation import dataset_split_stats

    sf = _write_documents(
        spark,
        tmp_path,
        [(i, f"text {i}", "en", "s") for i in range(200)],
    )
    rows = dataset_split_stats(spark, sf).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.docs for r in rows) == 200
    # determinism: a second run assigns identically
    again = dataset_split_stats(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_incremental_overlap_flags_planted_archive_passage(spark, tmp_path):
    """A delta doc copying an archive passage must show seen chunks; a
    delta doc of fresh text must not. doc_ids are chosen by their md5
    nibble so membership in the delta slice is forced, not sampled."""
    from cassandra_sstable_tools_spark.llm.dedup_index import (
        DELTA_NIBBLES,
        _delta_flag,
        incremental_chunk_overlap,
    )
    import hashlib

    def nibble(i):
        return hashlib.md5(str(i).encode()).hexdigest()[0]

    archive_id = next(i for i in range(1000) if nibble(i) not in DELTA_NIBBLES)
    delta_ids = [i for i in range(1000) if nibble(i) in DELTA_NIBBLES][:2]
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (archive_id, BOILER, "en", "arch"),
            (delta_ids[0], BOILER, "en", "copies"),
            (delta_ids[1], UNIQUE_B, "en", "fresh"),
        ],
    )
    rows = {r.source: r for r in incremental_chunk_overlap(spark, sf).collect()}
    assert set(rows) == {"copies", "fresh"}
    assert rows["copies"].seen_chunks == rows["copies"].chunks == 1
    assert rows["copies"].seen_ppm == 1000000
    assert rows["fresh"].seen_chunks == 0 and rows["fresh"].seen_ppm == 0


def test_label_centroid_known_geometry(spark, sf_dir):
    """Hand-checkable invariants on the real fixture: mean-centroid norm can
    never exceed the mean per-vector norm (Jensen), and a label's stats are
    a pure function of its vectors (re-run identical)."""
    from cassandra_sstable_tools_spark.llm.similarity import (
        label_centroid_stats,
    )

    rows = label_centroid_stats(spark, sf_dir).collect()
    assert rows, "fixture has labels"
    for r in rows:
        assert 0 <= r.mean_centroid_sq_norm <= r.mean_norm + 1  # +1: floor slack
    again = label_centroid_stats(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
