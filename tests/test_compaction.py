"""Executed compaction (operators/compaction.py): read-equivalence,
zero-reclaimable output, idempotence, component integrity, CLI wiring."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.compaction import (
    compact_dir,
    compact_survivors,
)
from cassandra_sstable_tools_spark.sources.data_cells import data_cells
from cassandra_sstable_tools_spark.sources.sstable_binary import (
    materialize_index_files,
)

_IDENT = ["keyspace", "table_name", "sstable_id"]


@pytest.fixture(scope="module")
def cass_root(spark, sf_dir):
    return materialize_index_files(spark, sf_dir)


@pytest.fixture(scope="module")
def compacted(spark, cass_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compacted"))
    report = compact_dir(spark, cass_root, out).toPandas()
    return out, report


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_report_matches_the_trees(spark, cass_root, compacted):
    out, report = compacted
    from cassandra_sstable_tools_spark.sources.pyds import list_sstables

    n_in = len(list_sstables(cass_root))
    n_out = len(list_sstables(out))
    assert int(report["sstables_in"].sum()) == n_in
    assert int(report["sstables_out"].sum()) == n_out
    # major compaction default: at most sstables_per_table(=1) range
    # split per table, but identity-preserving tasks can straddle table
    # boundaries, so per-table counts are small, not exactly 1
    assert n_out <= 2 * len(report)
    assert bool((report["bytes_out"] > 0).all())
    assert bool(
        (report["bytes_reclaimed"]
         == report["bytes_in"] - report["bytes_out"]).all()
    )


def test_compacted_tree_decodes_to_the_survivor_set(
    spark, cass_root, compacted
):
    out, _ = compacted
    exp = _norm(compact_survivors(spark, cass_root).drop(
        "keyspace", "table_name").toPandas())
    # decode the compacted tree LOSSLESSLY: value_bytes must round-trip
    # byte-exactly (the r09 verdict's silent-EMPTY defect would fail here)
    got = _norm(
        data_cells(spark, out, with_values=True)
        .drop(*_IDENT, "phys_size").toPandas()
    )
    pd.testing.assert_frame_equal(exp, got)


def test_reads_cannot_tell_the_difference(spark, cass_root, compacted):
    """THE compaction invariant: the read-time merged view over the
    compacted tree equals the view over the original for EVERY partition
    key (winning_sstable excluded -- generations are fresh)."""
    from cassandra_sstable_tools_spark.sources.lookup import (
        partition_lookup_merged,
    )

    out, _ = compacted
    keys = sorted(
        r.partition_key
        for r in data_cells(spark, cass_root)
        .select("partition_key").distinct().collect()
    )
    a = partition_lookup_merged(spark, cass_root, keys).drop(
        "winning_sstable"
    )
    b = partition_lookup_merged(spark, out, keys).drop("winning_sstable")
    pd.testing.assert_frame_equal(
        _norm(a.toPandas()), _norm(b.toPandas())
    )


def test_compacted_tree_has_nothing_left_to_reclaim(spark, compacted):
    from cassandra_sstable_tools_spark.operators.purge import purge_stats
    from cassandra_sstable_tools_spark.sources.data_cells import (
        _decoded_purge_cells,
    )

    out, _ = compacted
    ps = purge_stats(_decoded_purge_cells(spark, out)).toPandas()
    assert len(ps) > 0
    # header-only partitions have NULL sizes (no stream bytes): NULL
    # reclaimable is the documented frame shape, not reclaimable space
    assert int((ps["reclaimable"].fillna(0) != 0).sum()) == 0
    assert bool((ps["tables"] <= 2).all())  # range splits, no overlap


def test_compaction_is_idempotent(spark, compacted, tmp_path):
    out, _ = compacted
    again = str(tmp_path / "again")
    compact_dir(spark, out, again).collect()
    a = data_cells(spark, out).drop(*_IDENT, "phys_size").toPandas()
    b = data_cells(spark, again).drop(*_IDENT, "phys_size").toPandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_compacted_components_pass_integrity_checks(spark, compacted):
    from cassandra_sstable_tools_spark.sources.bloom import bloom_checks
    from cassandra_sstable_tools_spark.sources.crc_db import crc_checks
    from cassandra_sstable_tools_spark.sources.data_db import digest_checks
    from cassandra_sstable_tools_spark.sources.lookup import summary_checks
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        toc_checks,
    )

    out, _ = compacted
    assert bool(toc_checks(spark, out).toPandas()["complete"].all())
    assert bool(digest_checks(spark, out).toPandas()["digest_ok"].all())
    assert bool(crc_checks(spark, out).toPandas()["crc_ok"].all())
    assert bool(summary_checks(spark, out).toPandas()["all_verified"].all())
    assert bool(bloom_checks(spark, out).toPandas()["all_present"].all())


def test_tombstones_within_gc_grace_survive(spark, cass_root, compacted):
    """A deletion marker younger than gc_grace must still exist in the
    compacted tree (it has replicas left to shadow); only DROPPABLE
    state disappears."""
    from cassandra_sstable_tools_spark.constants import GC_BEFORE

    out, _ = compacted
    src = data_cells(spark, cass_root)
    live_markers = src.where(
        F.col("kind").isin("ROW_DELETE", "PARTITION_DELETE")
        & (F.col("local_deletion_time") >= GC_BEFORE)
    ).count()
    kept_markers = data_cells(spark, out).where(
        F.col("kind").isin("ROW_DELETE", "PARTITION_DELETE")
        & (F.col("local_deletion_time") >= GC_BEFORE)
    ).count()
    assert live_markers > 0
    assert kept_markers > 0
    assert kept_markers <= live_markers  # LWW-collapsed, never grown
    # and every droppable one is GONE
    assert data_cells(spark, out).where(
        F.col("kind").isin(
            "ROW_DELETE", "PARTITION_DELETE", "RANGE_TOMBSTONE_MARKER",
            "COMPLEX_DELETE",
        )
        & (F.col("local_deletion_time") < GC_BEFORE)
    ).count() == 0


def test_sstables_per_table_controls_output_splits(
    spark, cass_root, tmp_path
):
    out = str(tmp_path / "split")
    report = compact_dir(
        spark, cass_root, out, sstables_per_table=3
    ).toPandas()
    assert int(report["sstables_out"].sum()) >= 3


def test_rejects_in_place_and_bad_args(spark, cass_root, tmp_path):
    with pytest.raises(ValueError, match="must differ"):
        compact_dir(spark, cass_root, cass_root)
    with pytest.raises(ValueError, match="sstables_per_table"):
        compact_dir(
            spark, cass_root, str(tmp_path / "x"), sstables_per_table=0
        )


def test_cli_compact(spark, sf_dir, cass_root, tmp_path, capsys):
    from cassandra_sstable_tools_spark.__main__ import main

    out = str(tmp_path / "cliout")
    rc = main(
        ["compact", "--cassandra-dir", cass_root, "--out", out,
         "--sf-dir", sf_dir],
        spark=spark,
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "Compaction" in text and "bytes_reclaimed" in text
    assert data_cells(spark, out).count() > 0
    # guard rails
    assert main(["compact", "--sf-dir", sf_dir], spark=spark) == 2
    rc2 = main(
        ["compact", "--cassandra-dir", cass_root, "--sf-dir", sf_dir],
        spark=spark,
    )
    assert rc2 == 2


# --------------------------------------------------------------------------
# r10: payload-safe compaction (variable-length values) + byte-derived
# output sizing
# --------------------------------------------------------------------------

_UTF8 = "org.apache.cassandra.db.marshal.UTF8Type"


def _plant_text_tree(spark, root, n_keys=40, payload=None):
    """A tree with a variable-length UTF8 regular column -- the schema
    shape the r09 verdict's silent-EMPTY defect ate."""
    from cassandra_sstable_tools_spark.sources.pyds_writer import (
        write_sstable,
    )

    rows = []
    for i in range(n_keys):
        body = payload(i) if payload else f"text payload #{i} {'x' * (i % 37)}"
        rows.append(dict(
            partition_key=f"k{i:04d}", kind="CELL", clustering="r0",
            column_name="body", cell_path=None, writetime=1000 + i,
            ttl=None, local_deletion_time=None, is_tombstone=False,
            is_expiring=False, is_counter=False, cell_value=None,
            range_start=None, range_end=None,
            value_len=len(body.encode() if isinstance(body, str) else body),
            value_bytes=body.encode() if isinstance(body, str) else body,
            value_marshal=_UTF8,
        ))
    half = len(rows) // 2
    write_sstable(rows[:half], f"{root}/tks/ttb", sstable_id="1")
    write_sstable(rows[half:], f"{root}/tks/ttb", sstable_id="2")
    return rows


def test_compact_preserves_text_payloads(spark, tmp_path):
    """decode(compact(tree)) keeps every UTF8 payload byte-exactly --
    the r09 verdict's Done criterion for What's-wrong #1."""
    src = str(tmp_path / "src")
    rows = _plant_text_tree(spark, src)
    out = str(tmp_path / "out")
    report = compact_dir(spark, src, out).toPandas()
    assert int(report["sstables_in"].sum()) == 2
    got = data_cells(spark, out, with_values=True).select(
        "partition_key", "value_bytes", "value_len"
    ).toPandas()
    exp = {r["partition_key"]: r["value_bytes"] for r in rows}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert bytes(r["value_bytes"]) == exp[r["partition_key"]]
        assert int(r["value_len"]) == len(exp[r["partition_key"]])


def test_compact_output_splits_scale_with_input_bytes(spark, tmp_path):
    """compact_dir's default output split count derives from input bytes
    (ceil(bytes_in / target_sstable_bytes)) so one task never
    materializes a whole table -- the r09 verdict's OOM-cliff fix; an
    explicit sstables_per_table still overrides."""
    src = str(tmp_path / "src")
    # ~2.6 MB of payloads -> 3 splits at the 1 MiB floor
    _plant_text_tree(
        spark, src, n_keys=60, payload=lambda i: ("p%04d" % i) * 9000
    )
    out = str(tmp_path / "out")
    report = compact_dir(
        spark, src, out, target_sstable_bytes=1 << 20
    ).toPandas()
    bytes_in = int(report["bytes_in"].sum())
    want = -(-bytes_in // (1 << 20))
    assert want >= 2
    assert int(report["sstables_out"].sum()) == want
    # explicit override: the old major-compaction shape
    out1 = str(tmp_path / "out1")
    report1 = compact_dir(
        spark, src, out1, sstables_per_table=1
    ).toPandas()
    assert int(report1["sstables_out"].sum()) == 1


def test_compact_auto_preserves_typed_clustering(spark, tmp_path):
    """A tree written with LongType clustering compacts WITHOUT any user
    flag into a tree whose header re-declares LongType clustering and
    whose displays round-trip -- the with_values frame carries the source
    header's clustering types (clustering_marshal) and the writer
    auto-discovers them (r09 verdict #5, the automatic leg)."""
    from cassandra_sstable_tools_spark.sources.data_cells import (
        _COLS_VALUES,
        scan_sstable_cell_rows,
    )
    from cassandra_sstable_tools_spark.sources.pyds_writer import (
        write_sstable,
    )
    from cassandra_sstable_tools_spark.sources.statistics_db import (
        parse_serialization_header,
    )

    _LONG = "org.apache.cassandra.db.marshal.LongType"
    src = str(tmp_path / "src")
    rows = [
        dict(
            partition_key=f"k{i}", kind="CELL", clustering=str(100 - i),
            column_name="c0", cell_path=None, writetime=1000 + i, ttl=None,
            local_deletion_time=None, is_tombstone=False, is_expiring=False,
            is_counter=False, cell_value=i, range_start=None,
            range_end=None, value_len=8,
            value_bytes=i.to_bytes(8, "big"), value_marshal=_LONG,
        )
        for i in range(8)
    ]
    write_sstable(rows, f"{src}/lks/ltb", sstable_id="1",
                  clustering_type="long")
    out = str(tmp_path / "out")
    compact_dir(spark, src, out)  # no clustering_type flag
    idx = sorted(
        __import__("glob").glob(f"{out}/lks/ltb/*-Index.db")
    )
    assert len(idx) == 1
    with open(idx[0][: -len("Index.db")] + "Statistics.db", "rb") as f:
        hdr = parse_serialization_header(f.read(), version="nb",
                                         source="stats")
    assert hdr.clustering_types == [_LONG]
    got = scan_sstable_cell_rows(idx[0], with_values=True)
    cl = sorted(r[_COLS_VALUES.index("clustering")] for r in got)
    assert cl == sorted(str(100 - i) for i in range(8))
    assert all(
        r[_COLS_VALUES.index("clustering_marshal")] == _LONG for r in got
    )
