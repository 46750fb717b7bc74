"""Golden end-to-end CLI transcripts for the five reference subcommands.

Byte-compares full stdout (section titles + TableBuilder layout + X1-X3
humanized values + display ordering) against checked-in expected output at
the pinned sf0.001 fixture -- the whole-report analog of the reference's
report structure (cli/ColumnFamilyStatisticsCollector.java:148-350,
TableBuilder.java:15-81). Regenerate after an intentional report change:

    python -m tests.regen_golden
"""

from __future__ import annotations

import io
import contextlib
import os

import pytest

from cassandra_sstable_tools_spark.__main__ import main

GOLDEN_SF = "/root/testdata/sf0.001"  # pinned: goldens are sf-specific
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize(
    "cmd,argv",
    [(c, [c]) for c in ["summary", "sstables", "pstats", "cfstats", "purge"]]
    + [("query_funnel", ["query", "funnel_stages"])]
    + [
        ("query_split_stats", ["query", "dataset_split_stats"]),
        ("query_overlap_matrix", ["query", "source_overlap_matrix"]),
        ("query_ivf_recall", ["query", "ann_ivf_recall"]),
        ("query_dashboard", ["query", "corpus_dashboard"]),
        ("query_quality_matrix", ["query", "source_quality_matrix"]),
        ("query_chunk_cdc", ["query", "chunk_dedup_cdc", "--max-rows", "15"]),
        ("query_index_binary",
         ["query", "index_binary_entries", "--max-rows", "15"]),
        ("query_media_neardup", ["query", "media_neardup_pairs"]),
        ("query_bpe", ["query", "bpe_encode_stats"]),
    ]
    + [("pstats_scoped",
        ["pstats", "--keyspace", "ks1", "--table", "tab_lcs"])]
    + [("pstats_bucketed", ["pstats", "--bucketed", "golden_bucketed_cells"])],
)
def test_cli_golden_transcript(cmd, argv, spark):
    if cmd == "pstats_bucketed":
        # stale catalog tables (another sf_dir, a previous code version)
        # would otherwise be silently reused by the materialize-once path
        from cassandra_sstable_tools_spark.sources.bucketed import (
            drop_bucketed_table,
        )

        drop_bucketed_table(spark, "golden_bucketed_cells")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([*argv, "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, f"{cmd}.txt")) as f:
        expected = f.read()
    assert buf.getvalue() == expected, (
        f"{cmd} transcript drifted from tests/golden/{cmd}.txt "
        "(regenerate with python -m tests.regen_golden if intentional)"
    )


def test_cli_golden_sstables_cassdir(spark):
    """Directory-derived FULL sstables listing (dynamic root, so not in
    the static parametrize above). Data.db mtimes feed the File Timestamp
    column and are pinned to the engine's NOW_SECONDS, same as regen."""
    from cassandra_sstable_tools_spark.constants import NOW_SECONDS
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    for dirpath, _, files in os.walk(root):
        for fname in files:
            if fname.endswith("-Data.db"):
                os.utime(os.path.join(dirpath, fname),
                         (NOW_SECONDS, NOW_SECONDS))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["sstables", "--cassandra-dir", root,
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "sstables_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "sstables_cassdir transcript drifted from "
            "tests/golden/sstables_cassdir.txt"
        )


def test_cli_golden_summary_cassdir(spark):
    """Directory-only summary report (r07: repair state from
    Statistics.db made this command possible in --cassandra-dir mode)."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["summary", "--cassandra-dir", root,
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "summary_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "summary_cassdir transcript drifted from "
            "tests/golden/summary_cassdir.txt"
        )


def test_cli_golden_sstables_cassdir_nostats(spark, tmp_path):
    """A directory with NO Statistics.db still lists the reduced column
    set (the honest Index/Data/CompressionInfo subset) instead of
    failing -- the pre-r07 transcript, byte-for-byte."""
    import shutil

    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    nostats = str(tmp_path / "tree")
    shutil.copytree(root, nostats)
    for dirpath, _, files in os.walk(nostats):
        for fname in files:
            if fname.endswith("-Statistics.db"):
                os.remove(os.path.join(dirpath, fname))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["sstables", "--cassandra-dir", nostats,
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "sstables_cassdir_nostats.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "sstables_cassdir_nostats transcript drifted from "
            "tests/golden/sstables_cassdir_nostats.txt"
        )


def test_cli_golden_cfstats_cassdir(spark):
    """cfstats off REAL Data.db cell streams (r08: the last reference
    command family gone directory-only), byte-for-byte -- AND single-scan:
    the whole 8-section report decodes the data files exactly ONCE (the
    reference's one-scanner-pass shape; re-decoding per section was a 4-5x
    read amplification, r08 VERDICT What's-wrong #1)."""
    from cassandra_sstable_tools_spark.sources import data_cells as dcm
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    calls = []
    real = dcm.data_cells

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    buf = io.StringIO()
    dcm.data_cells = counting
    try:
        with contextlib.redirect_stdout(buf):
            rc = main(["cfstats", "--cassandra-dir", root,
                       "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    finally:
        dcm.data_cells = real
    assert rc == 0
    assert len(calls) == 1, (
        f"cfstats --cassandra-dir built {len(calls)} decode plans; the "
        "report must feed every section from ONE shared decode pass"
    )
    with open(os.path.join(GOLDEN_DIR, "cfstats_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "cfstats_cassdir transcript drifted from "
            "tests/golden/cfstats_cassdir.txt"
        )


def test_cli_golden_lookup_cassdir(spark):
    """The point-read command: per-sstable records, the merged read-time
    view (LWW + partition-delete shadowing visible: key 000000000193
    carries partition deletes), the read-path audit with its bloom skips
    and window byte counts, and an absent key -- byte-for-byte."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["lookup", "--cassandra-dir", root,
                   "-k", "000000000193", "-k", "zzz_absent", "--merge",
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "lookup_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "lookup_cassdir transcript drifted from "
            "tests/golden/lookup_cassdir.txt"
        )


def test_cli_golden_lookup_range_cassdir(spark):
    """Range mode: records + the range-scan audit with its per-sstable
    selectivity counters, byte-for-byte."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["lookup", "--cassandra-dir", root,
                   "--from", "000000000190", "--to", "000000000230",
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "lookup_range_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "lookup_range_cassdir transcript drifted from "
            "tests/golden/lookup_range_cassdir.txt"
        )


def test_cli_lookup_requires_dir_and_keys(spark):
    """Misuse fails fast with rc=2 and a one-line reason."""
    assert main(["lookup", "-k", "x", "--sf-dir", GOLDEN_SF, "-b"],
                spark=spark) == 2
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    assert main(["lookup", "--cassandra-dir", root,
                 "--sf-dir", GOLDEN_SF, "-b"], spark=spark) == 2
    # --merge is a point-read view; range mode rejects it loudly rather
    # than silently dropping the flag (review finding)
    assert main(["lookup", "--cassandra-dir", root, "--from", "a",
                 "--to", "b", "--merge", "--sf-dir", GOLDEN_SF, "-b"],
                spark=spark) == 2
    # -k and range mode are mutually exclusive
    assert main(["lookup", "--cassandra-dir", root, "-k", "x",
                 "--from", "a", "--to", "b", "--sf-dir", GOLDEN_SF, "-b"],
                spark=spark) == 2


def test_cli_lookup_empty_string_lower_bound(spark, capsys):
    """'' is the legitimate inclusive minimum in byte order: the range
    validation must test `is not None`, not truthiness (review finding).
    A full-range scan from '' reaches every partition."""
    import io

    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["lookup", "--cassandra-dir", root,
                   "--from", "", "--to", "0000000000",
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    assert "Range-scan audit" in buf.getvalue()


def test_cli_golden_purge_cassdir(spark):
    """purge off REAL Data.db cell streams with real serialized sizes --
    the fifth and last reference command gone directory-only (r08)."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["purge", "--cassandra-dir", root,
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "purge_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "purge_cassdir transcript drifted from "
            "tests/golden/purge_cassdir.txt"
        )


def test_cli_golden_compression_cassdir(spark):
    """r12: the per-sstable compression report off the chunk maps,
    byte-for-byte (dynamic fixture root, so not in the static
    parametrize)."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = materialize_index_files(spark, GOLDEN_SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["compression", "--cassandra-dir", root,
                   "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
    assert rc == 0
    with open(os.path.join(GOLDEN_DIR, "compression_cassdir.txt")) as f:
        assert buf.getvalue() == f.read(), (
            "compression_cassdir transcript drifted from "
            "tests/golden/compression_cassdir.txt"
        )
