"""Unit tests for operator A7 on tiny hand-built frames (SURVEY.md §5.1).

Covers the fidelity-critical edges:
- droppability boundary: ldt == gc_before is NOT droppable (strict <,
  reference PurgeStatisticBackend.java:208);
- last-writer-wins keeps exactly the newest duplicate;
- partition delete shadows older cells but not newer ones;
- row delete shadows only its clustering;
- range tombstone shadows only clusterings inside [start, end] with older wt;
- fully-shadowed partition reclaims everything except surviving markers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.purge import purge_stats

GC = 1000  # use a tiny gc_before for readable test data

COLS = (
    "keyspace string, table_name string, sstable_id string, partition_key string,"
    "clustering string, kind string, cell_name string, cell_size long,"
    "writetime long, ttl int, is_tombstone boolean, is_expiring boolean,"
    "is_counter boolean, local_deletion_time long, range_start string,"
    "range_end string, gc_grace_seconds int"
)


def _cell(pk, clustering, name, size, wt, sstable="s1", kind="CELL",
          tomb=False, ldt=None, rs=None, re=None):
    return ("ks", "t", sstable, pk, clustering, kind, name, size, wt,
            None, tomb, False, False, ldt, rs, re, 0)


def _run(spark, rows):
    df = spark.createDataFrame(rows, schema=COLS)
    return {
        r["partition_key"]: r.asDict()
        for r in purge_stats(df, gc_before=GC).collect()
    }


def test_lww_dedup(spark):
    out = _run(spark, [
        _cell("p1", "r1", "ca", 100, 10, sstable="s1"),
        _cell("p1", "r1", "ca", 60, 20, sstable="s2"),   # newer wins
        _cell("p1", "r1", "cb", 40, 10),
    ])
    assert out["p1"]["pre_size"] == 200
    assert out["p1"]["merged_size"] == 100  # 60 (winner ca) + 40 (cb)
    assert out["p1"]["reclaimable"] == 100
    assert out["p1"]["tables"] == 2


def test_droppable_boundary_strict(spark):
    out = _run(spark, [
        # ldt == GC -> NOT droppable, survives
        _cell("p1", "r1", "ca", 50, 10, tomb=True, ldt=GC),
        # ldt < GC -> droppable, purged
        _cell("p2", "r1", "ca", 50, 10, tomb=True, ldt=GC - 1),
    ])
    assert out["p1"]["merged_size"] == 50
    assert out["p2"]["merged_size"] == 0
    assert out["p2"]["reclaimable"] == 50


def test_partition_delete_shadowing(spark):
    out = _run(spark, [
        _cell("p1", "r1", "ca", 100, 10),                      # shadowed (wt 10 < 15)
        _cell("p1", "r2", "cb", 70, 20),                       # survives (wt 20 > 15)
        _cell("p1", "", None, 5, 15, kind="PARTITION_DELETE", ldt=GC + 1),
    ])
    # merged = cb(70) + surviving partition-delete marker (5)
    assert out["p1"]["merged_size"] == 75
    assert out["p1"]["reclaimable"] == 100


def test_partition_delete_purged_but_still_shadows(spark):
    out = _run(spark, [
        _cell("p1", "r1", "ca", 100, 10),
        _cell("p1", "", None, 5, 15, kind="PARTITION_DELETE", ldt=GC - 1),
    ])
    # marker is droppable (purged) AND its shadowing still removes the cell
    assert out["p1"]["merged_size"] == 0
    assert out["p1"]["reclaimable"] == 105


def test_row_delete_scope(spark):
    out = _run(spark, [
        _cell("p1", "r1", "ca", 100, 10),                      # shadowed by row delete
        _cell("p1", "r2", "ca", 80, 10),                       # other row: survives
        _cell("p1", "r1", None, 5, 15, kind="ROW_DELETE", ldt=GC + 1),
    ])
    assert out["p1"]["merged_size"] == 85  # 80 + marker 5


def test_range_tombstone_interval(spark):
    out = _run(spark, [
        _cell("p1", "b", "ca", 100, 10),   # in [a, c], older -> shadowed
        _cell("p1", "d", "ca", 80, 10),    # outside range -> survives
        _cell("p1", "b", "cb", 60, 30),    # in range but newer -> survives
        _cell("p1", "", None, 5, 20, kind="RANGE_TOMBSTONE_MARKER",
              ldt=GC + 1, rs="a", re="c"),
    ])
    assert out["p1"]["merged_size"] == 145  # 80 + 60 + marker 5


def test_marker_reconciliation_keeps_newest(spark):
    out = _run(spark, [
        _cell("p1", "", None, 5, 10, kind="PARTITION_DELETE", ldt=GC + 1),
        _cell("p1", "", None, 7, 20, kind="PARTITION_DELETE", ldt=GC + 2),
    ])
    # only the newest marker survives the merge
    assert out["p1"]["merged_size"] == 7
    assert out["p1"]["reclaimable"] == 5


def test_rtm_boundary_split_deviation_bound(spark):
    """Quantifies the DOCUMENTED deviation from the reference's boundary
    splitting (cassandra/PurgeStatisticBackend.java:233-256): when two
    adjacent range tombstones meet at a boundary and only ONE side is
    purgeable, the reference replaces the boundary marker with the
    unpurgeable side's bound marker -- i.e. part of the marker's bytes
    survive. This engine's declared-size model treats each RTM row
    atomically: fully purged (ldt < gcBefore) or fully kept.

    Fixture: r1=[a,c] droppable, r2=[c,e] not droppable -- the reference
    would merge their meeting point at 'c' into a boundary and keep r2's
    open side; both models keep r2 whole, and the models differ ONLY in
    whether r1's marker bytes survive. Hence per straddling boundary:

        0 <= engine_reclaimable - reference_reclaimable <= size(droppable RTM)

    The engine sits at the upper end (purges all of r1); the reference
    keeps the boundary-to-bound remnant. The test pins the engine value and
    asserts the deviation bound, keeping the trade-off on record."""
    rtm_size = 9
    out = _run(spark, [
        _cell("p1", "b", "ca", 100, 10),  # shadowed by r1 (older, in [a,c])
        _cell("p1", "", None, rtm_size, 20, kind="RANGE_TOMBSTONE_MARKER",
              ldt=GC - 1, rs="a", re="c"),   # droppable side of the boundary
        _cell("p1", "", None, rtm_size, 20, kind="RANGE_TOMBSTONE_MARKER",
              ldt=GC + 1, rs="c", re="e"),   # kept side of the boundary
    ])
    # engine: cell shadowed (100) + r1 purged whole (9); r2 survives whole
    assert out["p1"]["merged_size"] == rtm_size
    assert out["p1"]["reclaimable"] == 100 + rtm_size
    # reference split semantics would retain r1's close-bound remnant at the
    # boundary: reference_reclaimable in [100, 100 + rtm_size). The deviation
    # is bounded by the droppable marker's declared size.
    engine_reclaimable = out["p1"]["reclaimable"]
    reference_lower_bound = 100  # everything but the full droppable marker
    assert 0 <= engine_reclaimable - reference_lower_bound <= rtm_size


def test_reclaimable_bounded_by_size(spark, sf_dir):
    from cassandra_sstable_tools_spark.sources import tpch_adapter

    df = purge_stats(tpch_adapter.cells(spark, sf_dir))
    bad = df.where(
        (F.col("reclaimable") < 0) | (F.col("reclaimable") > F.col("pre_size"))
    ).count()
    assert bad == 0
