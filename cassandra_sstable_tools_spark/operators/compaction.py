"""Offline compaction: decode -> merge -> purge -> WRITE back real sstables.

The reference only SIMULATES compaction (``purge`` reports reclaimable
bytes per partition, `cassandra/PurgeStatisticBackend.java:70-257`); with
the sink (``sources/pyds_writer.py``) this engine can EXECUTE it: read a
table's sstables, reconcile every copy through the one shared merge
formulation (``operators/purge.merge_enriched``: LWW rank +
partition/row/range/complex tombstone shadowing + droppable-tombstone
purge at ``gc_before``), and write the surviving records back as fresh
sstables -- Cassandra's own major-compaction semantics, run by Spark.

What survives (exactly the ``survives`` column purge_stats aggregates):
- one LWW winner per merge identity (path-folded collection cells keep
  per-entry identities);
- cells not shadowed by a newer partition/row/range/complex deletion;
- tombstones and deletion markers whose local_deletion_time has NOT
  passed ``gc_before`` (they must keep shadowing other replicas);
- partition-deletion headers collapse to the strongest per partition
  (the writer's invariant).
A purged range tombstone is dropped whole -- the purge SIZE model's
boundary-remnant half-marker is an accounting rule for the reference's
report, not a record that exists to write.

Invariants pinned by tests/test_compaction.py:
- READ EQUIVALENCE: the read-time merged view (partition_lookup_merged)
  over the compacted tree equals the view over the original for every
  key -- compaction must be invisible to reads;
- ZERO RECLAIMABLE: purge_stats over the compacted tree (same gc_before)
  reports merged_size == pre_size everywhere;
- IDEMPOTENCE: compacting the compacted tree changes no records;
- the output passes every component-integrity check.

100 TB shape: the decode is the same index-driven one-pass scan the
cfstats family pays; the merge is the purge operator's zero-extra-
exchange broadcast-delete-map plan; the write streams one sstable per
output partition, sized by ``sstables_per_table`` range splits on
(keyspace, table, partition_key). Nothing corpus-sized touches the
driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import GC_BEFORE

_OUT_COLS = [
    "keyspace", "table_name", "partition_key", "kind", "clustering",
    "column_name", "cell_path", "writetime", "ttl", "local_deletion_time",
    "is_tombstone", "is_expiring", "is_counter", "cell_value",
    "range_start", "range_end", "value_len", "value_bytes", "value_marshal",
    "clustering_marshal",
]


def compact_survivors(
    spark: SparkSession,
    root: str,
    filenames=None,
    gc_before: int = GC_BEFORE,
) -> DataFrame:
    """The post-compaction record set of a Cassandra data directory, in
    writer column order: decoded cells merged through merge_enriched and
    filtered to the survivors. The decode is the LOSSLESS with_values
    frame -- the survivors carry their raw payload bytes and marshal
    types, so the rewrite preserves every value byte-exactly for ANY
    schema (r10; previously non-long payloads silently wrote as EMPTY).
    The decoded frame is eagerly checkpointed (the merge references it
    from several branches -- decode once)."""
    from cassandra_sstable_tools_spark.operators.purge import merge_enriched
    from cassandra_sstable_tools_spark.sources.data_cells import (
        data_cells,
        fold_cell_path,
    )

    decoded = data_cells(
        spark, root, filenames, with_values=True
    ).localCheckpoint(eager=True)
    shaped = fold_cell_path(decoded, drop=False).withColumnRenamed(
        "phys_size", "cell_size"
    )
    enriched, survives = merge_enriched(shaped, gc_before=gc_before)
    return enriched.where(survives).select(*_OUT_COLS)


def _dir_stats(
    root: str,
    filenames=None,
    keyspace: str | None = None,
    table: str | None = None,
) -> dict[tuple[str, str], tuple[int, int]]:
    """(ks, tb) -> (sstable count, Data.db bytes), driver-side listing,
    under the same -f/scope the compaction itself honors -- a scoped run
    must not report bytes it never read (review finding)."""
    from cassandra_sstable_tools_spark.sources.pyds import list_sstables

    out: dict[tuple[str, str], tuple[int, int]] = {}
    if not os.path.isdir(root):
        return out
    for r in list_sstables(root, filenames):
        if keyspace and r["keyspace"] != keyspace:
            continue
        if table and r["table_name"] != table:
            continue
        data = r["path"][: -len("Index.db")] + "Data.db"
        if not os.path.exists(data):
            continue
        k = (r["keyspace"], r["table_name"])
        n, b = out.get(k, (0, 0))
        out[k] = (n + 1, b + os.path.getsize(data))
    return out


def compact_dir(
    spark: SparkSession,
    src_root: str,
    out_root: str,
    filenames=None,
    gc_before: int = GC_BEFORE,
    sstables_per_table: int | None = None,
    key_type: str | None = None,
    compression: str = "none",
    keyspace: str | None = None,
    table: str | None = None,
    target_sstable_bytes: int = 256 << 20,
    clustering_type: str | None = None,
) -> DataFrame:
    """Run the compaction and return the per-table report:
    (keyspace, table_name, sstables_in, sstables_out, bytes_in,
    bytes_out, bytes_reclaimed). Writes into ``out_root`` (never the
    source -- the sink is append-only and a live dir is never rewritten
    in place); ``keyspace``/``table`` scope both the compaction and the
    report (the CLI's table-only scope, which root narrowing cannot
    express). A non-empty out_root is allowed (append semantics): the
    report counts only THIS run's output.

    Output sizing: the writer holds ONE sstable's records in task memory,
    so the split count must track input volume. By default each table
    plans ``ceil(bytes_in / target_sstable_bytes)`` output range splits
    (the write-side mirror of the reader's byte-bounded
    ``target_split_bytes`` -- r09 verdict: the old one-sstable-per-table
    default materialized a whole table's survivors in one task, an OOM
    cliff at 100x). An explicit ``sstables_per_table`` overrides."""
    from cassandra_sstable_tools_spark.sources.pyds import register

    if os.path.abspath(out_root) == os.path.abspath(src_root):
        raise ValueError(
            "compact_dir writes a NEW tree: out_root must differ from "
            "src_root (point Cassandra at the output, or move it back "
            "after verification)"
        )
    if sstables_per_table is not None and sstables_per_table < 1:
        raise ValueError("sstables_per_table must be >= 1")
    if target_sstable_bytes < 1 << 20:
        raise ValueError("target_sstable_bytes must be >= 1 MiB")
    before = _dir_stats(src_root, filenames, keyspace, table)
    out_pre = _dir_stats(out_root)
    surv = compact_survivors(spark, src_root, filenames, gc_before)
    if keyspace:
        surv = surv.where(F.col("keyspace") == keyspace)
    if table:
        surv = surv.where(F.col("table_name") == table)
    register(spark)
    if sstables_per_table is not None:
        num = max(1, len(before) * sstables_per_table)
    else:
        # byte-derived: survivors can only shrink vs input, so input
        # bytes bound each output split under the target
        num = max(1, sum(
            -(-b // target_sstable_bytes) for _n, b in before.values()
        ))
    writer = (
        surv.repartitionByRange(
            num, "keyspace", "table_name", "partition_key"
        )
        .write.format("cassandra-sstable")
        .mode("append")
    )
    if key_type:
        writer = writer.option("key_type", key_type)
    if clustering_type:
        writer = writer.option("clustering_type", clustering_type)
    if compression != "none":
        writer = writer.option("compression", compression)
    writer.save(out_root)
    after = _dir_stats(out_root)
    rows = []
    for k in sorted(set(before) | (set(after) - set(out_pre))):
        n_in, b_in = before.get(k, (0, 0))
        n_all, b_all = after.get(k, (0, 0))
        n_pre, b_pre = out_pre.get(k, (0, 0))
        n_out, b_out = n_all - n_pre, b_all - b_pre
        rows.append(
            (k[0], k[1], n_in, n_out, b_in, b_out, b_in - b_out)
        )
    return spark.createDataFrame(
        rows,
        "keyspace string, table_name string, sstables_in int, "
        "sstables_out int, bytes_in bigint, bytes_out bigint, "
        "bytes_reclaimed bigint",
    )
