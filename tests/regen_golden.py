"""Regenerate the golden CLI transcripts (tests/golden/*.txt).

Run after an INTENTIONAL report-format change, then review the diff:

    python -m tests.regen_golden
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_sstable_tools_spark.__main__ import main  # noqa: E402
from cassandra_sstable_tools_spark.session import get_spark  # noqa: E402

GOLDEN_SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def regen() -> None:
    spark = get_spark(app_name="regen-golden", master="local[8]", shuffle_partitions=8)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    cases = [(c, [c]) for c in
             ["summary", "sstables", "pstats", "cfstats", "purge"]]
    # the generic escape hatch, pinned on a tiny deterministic query
    cases.append(("query_funnel", ["query", "funnel_stages"]))
    # r05/r06 report surfaces: split audit, provenance overlap, certified
    # recall, the one-row dashboard, and the CDC dedup rollup (truncated
    # display path) -- pins the presentation edge for each
    cases += [
        ("query_split_stats", ["query", "dataset_split_stats"]),
        ("query_overlap_matrix", ["query", "source_overlap_matrix"]),
        ("query_ivf_recall", ["query", "ann_ivf_recall"]),
        ("query_dashboard", ["query", "corpus_dashboard"]),
        ("query_quality_matrix", ["query", "source_quality_matrix"]),
        ("query_chunk_cdc", ["query", "chunk_dedup_cdc", "--max-rows", "15"]),
    ]
    # r07 report surfaces: binary Index.db ingestion, media perceptual
    # near-dup, BPE training certificate
    cases += [
        ("query_index_binary",
         ["query", "index_binary_entries", "--max-rows", "15"]),
        ("query_media_neardup", ["query", "media_neardup_pairs"]),
        ("query_bpe", ["query", "bpe_encode_stats"]),
    ]
    # reference-style single-table scoping (<keyspace> <table> positionals)
    cases.append(
        ("pstats_scoped", ["pstats", "--keyspace", "ks1", "--table", "tab_lcs"])
    )
    # bucketed zero-Exchange stats path; fresh table per regen
    from cassandra_sstable_tools_spark.sources.bucketed import (
        drop_bucketed_table,
    )

    drop_bucketed_table(spark, "golden_bucketed_cells")
    cases.append(
        ("pstats_bucketed", ["pstats", "--bucketed", "golden_bucketed_cells"])
    )
    # r07: directory-derived sstables listings off the planted binary dir.
    # Data.db mtimes feed the File Timestamp column, so pin them (the
    # golden test pins them the same way); the second case strips
    # Statistics.db to exercise the reduced-columns fallback.
    import shutil
    import tempfile

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
    nostats = os.path.join(tempfile.mkdtemp(prefix="golden_nostats"), "tree")
    shutil.copytree(root, nostats)
    for dirpath, _, files in os.walk(nostats):
        for fname in files:
            if fname.endswith("-Statistics.db"):
                os.remove(os.path.join(dirpath, fname))
    cases += [
        ("sstables_cassdir", ["sstables", "--cassandra-dir", root]),
        ("sstables_cassdir_nostats",
         ["sstables", "--cassandra-dir", nostats]),
        ("summary_cassdir", ["summary", "--cassandra-dir", root]),
        # r08: cfstats + purge off REAL Data.db cell streams
        # (sources/data_cells.py) -- all five reference commands
        ("cfstats_cassdir", ["cfstats", "--cassandra-dir", root]),
        ("purge_cassdir", ["purge", "--cassandra-dir", root]),
        # r08: the point-read path (bloom -> summary -> index window ->
        # data block) with the merged read-time view; one key carrying a
        # partition delete (shadowing visible), one absent key
        ("lookup_cassdir",
         ["lookup", "--cassandra-dir", root, "-k", "000000000193",
          "-k", "zzz_absent", "--merge"]),
        # r08 s2: range mode (summary-floored contiguous index+data span)
        ("lookup_range_cassdir",
         ["lookup", "--cassandra-dir", root,
          "--from", "000000000190", "--to", "000000000230"]),
        # r12: per-sstable compression report off the chunk maps
        ("compression_cassdir", ["compression", "--cassandra-dir", root]),
    ]
    for cmd, argv in cases:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main([*argv, "--sf-dir", GOLDEN_SF, "-b"], spark=spark)
        assert rc == 0, f"{cmd} failed"
        path = os.path.join(GOLDEN_DIR, f"{cmd}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    regen()
