"""Operator A7 -- compaction simulation (merge -> purge -> measure).

Reference: cassandra/PurgeStatisticBackend.java:70-257 -- per partition key:
measure every SSTable copy's serialized size (pre-merge), merge all copies
with last-writer-wins reconciliation + tombstone shadowing
(UnfilteredRowIterators.merge, :129), purge droppable tombstones
(PurgeFunction, predicate ``localDeletionTime < gcBefore`` strict, :208),
measure the merged size; ``reclaimable = pre_size - merged_size`` (:139).

Merge semantics on the `cells` event model:

1. LWW: among duplicate (partition_key, clustering, cell_name) cells across
   sstables, only the max-writetime copy survives (writetimes are unique per
   duplicate group -> deterministic). ROW_MARKERs dedup per (pk, clustering).
2. Shadowing (deletes remove older data, regardless of their own
   purgeability -- purge only decides whether the *marker itself* is kept):
   - PARTITION_DELETE with writetime W shadows everything in the partition
     with writetime < W;
   - ROW_DELETE shadows cells of its (pk, clustering) with writetime < W;
   - RANGE_TOMBSTONE_MARKER shadows cells with clustering in
     [range_start, range_end] and writetime < W.
3. Marker reconciliation: per scope only the max-writetime marker survives;
   a marker older than the partition-delete watermark is itself superseded.
4. Purge: surviving tombstone cells and delete markers with
   ``local_deletion_time < gcBefore`` are dropped. Expired expiring cells
   (ldt <= now) act as tombstones: droppable once ldt < gcBefore.

Deviation from the reference (documented, SURVEY.md A7): sizes are the
declared ``cell_size`` bytes of surviving records, not Cassandra's
serialization format; STATIC_CELLs merge like regular cells keyed by their
clustering; range-tombstone boundary splitting (:233-256) is out of scope for
the declared-size model.

Spark shape -- expression-only, NO Python in the hot path:
- one `row_number` window for LWW (shuffle on pk, the natural key);
- watermark frames (partition-delete / row-delete / RTM maxima) are small
  aggregates joined back on the SAME pk-based keys -> co-partitioned joins,
  no extra shuffle pattern beyond pk;
- the RTM interval check is an equi-join on pk + range post-filter via
  left_anti -- skew-safe because RTMs are rare and AQE handles hot keys.
At 100 TB everything keys on partition_key: linearly scalable, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import GC_BEFORE

_PK = ["keyspace", "table_name", "partition_key"]


def purge_stats(cells: DataFrame, gc_before: int = GC_BEFORE) -> DataFrame:
    """Per-partition (pre_size, merged_size, reclaimable, tables)."""
    pre = cells.groupBy(*_PK).agg(
        F.sum("cell_size").alias("pre_size"),
        F.countDistinct("sstable_id").alias("tables"),
    )

    # --- deletion watermarks ------------------------------------------------
    pd_wt = (
        cells.where(F.col("kind") == "PARTITION_DELETE")
        .groupBy(*_PK)
        .agg(F.max("writetime").alias("pd_wt"))
    )
    rd_wt = (
        cells.where(F.col("kind") == "ROW_DELETE")
        .groupBy(*_PK, "clustering")
        .agg(F.max("writetime").alias("rd_wt"))
    )
    rtm = cells.where(F.col("kind") == "RANGE_TOMBSTONE_MARKER").select(
        F.col("keyspace").alias("t_keyspace"),
        F.col("table_name").alias("t_table_name"),
        F.col("partition_key").alias("t_partition_key"),
        F.col("range_start").alias("t_range_start"),
        F.col("range_end").alias("t_range_end"),
        F.col("writetime").alias("rtm_wt"),
    )

    # --- cell-grain merge: LWW -> shadowing -> purge ------------------------
    cell_like = cells.where(F.col("kind").isin("CELL", "STATIC_CELL", "ROW_MARKER"))
    lww = Window.partitionBy(
        *_PK, "clustering", F.coalesce(F.col("cell_name"), F.lit("<marker>"))
    ).orderBy(F.desc("writetime"))
    winners = (
        cell_like.withColumn("rn", F.row_number().over(lww))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    winners = (
        winners.join(pd_wt, _PK, "left")
        .where(F.col("pd_wt").isNull() | (F.col("writetime") > F.col("pd_wt")))
        .join(rd_wt, _PK + ["clustering"], "left")
        .where(F.col("rd_wt").isNull() | (F.col("writetime") > F.col("rd_wt")))
    )
    winners = winners.join(
        rtm,
        on=[
            F.col("keyspace") == F.col("t_keyspace"),
            F.col("table_name") == F.col("t_table_name"),
            F.col("partition_key") == F.col("t_partition_key"),
            F.col("clustering") >= F.col("t_range_start"),
            F.col("clustering") <= F.col("t_range_end"),
            F.col("writetime") < F.col("rtm_wt"),
        ],
        how="left_anti",
    )
    expired_tomb = F.col("is_tombstone") | (
        F.col("is_expiring") & (F.col("local_deletion_time") < gc_before)
    )
    surviving_cells = winners.where(
        ~(expired_tomb & (F.col("local_deletion_time") < gc_before))
    ).select(*_PK, "cell_size")

    # --- marker reconciliation + purge --------------------------------------
    pd_surv = (
        cells.where(F.col("kind") == "PARTITION_DELETE")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy(*_PK).orderBy(F.desc("writetime")))
        )
        .where((F.col("rn") == 1) & (F.col("local_deletion_time") >= gc_before))
        .select(*_PK, "cell_size")
    )
    rd_surv = (
        cells.where(F.col("kind") == "ROW_DELETE")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*_PK, "clustering").orderBy(F.desc("writetime"))
            ),
        )
        .where((F.col("rn") == 1) & (F.col("local_deletion_time") >= gc_before))
        .join(pd_wt, _PK, "left")
        .where(F.col("pd_wt").isNull() | (F.col("writetime") > F.col("pd_wt")))
        .select(*_PK, "cell_size")
    )
    rtm_surv = (
        cells.where(F.col("kind") == "RANGE_TOMBSTONE_MARKER")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*_PK, "range_start", "range_end").orderBy(
                    F.desc("writetime")
                )
            ),
        )
        .where((F.col("rn") == 1) & (F.col("local_deletion_time") >= gc_before))
        .join(pd_wt, _PK, "left")
        .where(F.col("pd_wt").isNull() | (F.col("writetime") > F.col("pd_wt")))
        .select(*_PK, "cell_size")
    )

    survivors = surviving_cells.unionByName(pd_surv).unionByName(rd_surv).unionByName(
        rtm_surv
    )
    merged = survivors.groupBy(*_PK).agg(F.sum("cell_size").alias("merged_size"))

    return (
        pre.join(merged, _PK, "left")
        .withColumn("merged_size", F.coalesce(F.col("merged_size"), F.lit(0)))
        .withColumn("reclaimable", F.col("pre_size") - F.col("merged_size"))
    )


def purge_stats_sql(gc_before: int = GC_BEFORE) -> str:
    """DuckDB mirror of ``purge_stats`` over the adapter's `cells` CTE.

    Returns a CTE chain ending in ``purge_per_partition``; append a SELECT."""
    return f"""
pre AS (
    SELECT keyspace, table_name, partition_key,
           CAST(sum(cell_size) AS BIGINT) AS pre_size,
           count(DISTINCT sstable_id) AS tables
    FROM cells GROUP BY 1, 2, 3
),
pd_wt AS (
    SELECT keyspace, table_name, partition_key, max(writetime) AS pd_wt
    FROM cells WHERE kind = 'PARTITION_DELETE' GROUP BY 1, 2, 3
),
rd_wt AS (
    SELECT keyspace, table_name, partition_key, clustering, max(writetime) AS rd_wt
    FROM cells WHERE kind = 'ROW_DELETE' GROUP BY 1, 2, 3, 4
),
lww AS (
    SELECT *, row_number() OVER (
        PARTITION BY keyspace, table_name, partition_key, clustering,
                     coalesce(cell_name, '<marker>')
        ORDER BY writetime DESC) AS rn
    FROM cells WHERE kind IN ('CELL', 'STATIC_CELL', 'ROW_MARKER')
),
surviving_cells AS (
    SELECT w.keyspace, w.table_name, w.partition_key, w.cell_size
    FROM lww w
    LEFT JOIN pd_wt p USING (keyspace, table_name, partition_key)
    LEFT JOIN rd_wt r USING (keyspace, table_name, partition_key, clustering)
    WHERE w.rn = 1
      AND (p.pd_wt IS NULL OR w.writetime > p.pd_wt)
      AND (r.rd_wt IS NULL OR w.writetime > r.rd_wt)
      AND NOT EXISTS (
          SELECT 1 FROM cells t
          WHERE t.kind = 'RANGE_TOMBSTONE_MARKER'
            AND t.keyspace = w.keyspace AND t.table_name = w.table_name
            AND t.partition_key = w.partition_key
            AND w.clustering >= t.range_start AND w.clustering <= t.range_end
            AND w.writetime < t.writetime)
      AND NOT ((w.is_tombstone OR (w.is_expiring AND w.local_deletion_time < {gc_before}))
               AND w.local_deletion_time < {gc_before})
),
pd_surv AS (
    SELECT keyspace, table_name, partition_key, cell_size FROM (
        SELECT *, row_number() OVER (
            PARTITION BY keyspace, table_name, partition_key
            ORDER BY writetime DESC) AS rn
        FROM cells WHERE kind = 'PARTITION_DELETE')
    WHERE rn = 1 AND local_deletion_time >= {gc_before}
),
rd_surv AS (
    SELECT d.keyspace, d.table_name, d.partition_key, d.cell_size FROM (
        SELECT *, row_number() OVER (
            PARTITION BY keyspace, table_name, partition_key, clustering
            ORDER BY writetime DESC) AS rn
        FROM cells WHERE kind = 'ROW_DELETE') d
    LEFT JOIN pd_wt p USING (keyspace, table_name, partition_key)
    WHERE d.rn = 1 AND d.local_deletion_time >= {gc_before}
      AND (p.pd_wt IS NULL OR d.writetime > p.pd_wt)
),
rtm_surv AS (
    SELECT d.keyspace, d.table_name, d.partition_key, d.cell_size FROM (
        SELECT *, row_number() OVER (
            PARTITION BY keyspace, table_name, partition_key, range_start, range_end
            ORDER BY writetime DESC) AS rn
        FROM cells WHERE kind = 'RANGE_TOMBSTONE_MARKER') d
    LEFT JOIN pd_wt p USING (keyspace, table_name, partition_key)
    WHERE d.rn = 1 AND d.local_deletion_time >= {gc_before}
      AND (p.pd_wt IS NULL OR d.writetime > p.pd_wt)
),
survivors AS (
    SELECT * FROM surviving_cells
    UNION ALL SELECT * FROM pd_surv
    UNION ALL SELECT * FROM rd_surv
    UNION ALL SELECT * FROM rtm_surv
),
merged AS (
    SELECT keyspace, table_name, partition_key,
           CAST(sum(cell_size) AS BIGINT) AS merged_size
    FROM survivors GROUP BY 1, 2, 3
),
purge_per_partition AS (
    SELECT pre.keyspace, pre.table_name, pre.partition_key, pre.pre_size,
           pre.tables,
           coalesce(m.merged_size, 0) AS merged_size,
           pre.pre_size - coalesce(m.merged_size, 0) AS reclaimable
    FROM pre
    LEFT JOIN merged m USING (keyspace, table_name, partition_key)
)"""
