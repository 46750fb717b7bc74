"""Operator A7 -- compaction simulation (merge -> purge -> measure).

Reference: cassandra/PurgeStatisticBackend.java:70-257 -- per partition key:
measure every SSTable copy's serialized size (pre-merge), merge all copies
with last-writer-wins reconciliation + tombstone shadowing
(UnfilteredRowIterators.merge, :129), purge droppable tombstones
(PurgeFunction, predicate ``localDeletionTime < gcBefore`` strict, :208),
measure the merged size; ``reclaimable = pre_size - merged_size`` (:139).

Merge semantics on the `cells` event model:

1. LWW: among duplicate (partition_key, clustering, cell_name) records across
   sstables only the max-writetime copy survives; markers reconcile per scope
   (partition deletes per pk; row deletes per (pk, clustering); range
   tombstones per (pk, range)).
2. Shadowing (deletes remove older data, regardless of their own
   purgeability -- purge only decides whether the *marker itself* is kept):
   - PARTITION_DELETE with writetime W shadows everything in the partition
     with writetime < W;
   - ROW_DELETE shadows cells of its (pk, clustering) with writetime < W;
   - RANGE_TOMBSTONE_MARKER shadows cells with clustering in
     [range_start, range_end] and writetime < W.
3. Purge: surviving tombstone cells and delete markers with
   ``local_deletion_time < gcBefore`` are dropped. Expired expiring cells
   act as tombstones: droppable once ldt < gcBefore.

Deviation from the reference (documented, SURVEY.md A7): sizes are declared
``cell_size`` bytes, not Cassandra serialization; STATIC_CELLs merge like
regular cells.

Range-tombstone boundary splitting (reference :233-256) in the declared-size
model: where a droppable RTM's bound coincides with an opposite-type bound of
a surviving RTM (its ``range_end`` == the survivor's ``range_start`` or vice
versa -- a boundary marker in the reference's merged stream), the reference
replaces the boundary with the surviving side's bound marker instead of
dropping the whole marker (``createCorrespondingOpenMarker`` /
``createCorrespondingCloseMarker``). The declared-size analog: a marker's
size covers its two bounds, so the purged marker retains ``cell_size / 2``
(integer floor) per shared boundary (at most its two bounds). Both-sides
droppable -> whole boundary purged (reference returns null), no remnant.

Spark shape -- single-partitioning design, NO Python in the hot path:
the input is repartitioned ONCE on (keyspace, table_name, partition_key);
every subsequent operator -- the LWW ``row_number`` window, the
partition-delete / row-delete watermark windows (conditional ``max() over``),
the RTM anti-join (pk-equi + range post-filter), the pre-size aggregation and
the merged-size aggregation -- keys on a superset of that partitioning, so
Spark's ClusteredDistribution check elides every further exchange: ONE
shuffle total for the whole simulation. Windows add only intra-partition
sorts. At 100 TB this is shuffle-minimal and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import GC_BEFORE

_PK = ["keyspace", "table_name", "partition_key"]
_CELLISH = ("CELL", "STATIC_CELL", "ROW_MARKER")


def purge_stats(cells: DataFrame, gc_before: int = GC_BEFORE) -> DataFrame:
    """Per-partition (pre_size, merged_size, reclaimable, tables)."""
    # ONE shuffle: everything below reuses this partitioning.
    c = cells.repartition(*[F.col(k) for k in _PK])

    # Scope-aware dedup key: partition deletes reconcile per pk, row deletes
    # per (pk, clustering), RTMs per (pk, range), cells per (pk, clustering,
    # cell_name), row markers per (pk, clustering).
    dedup_clustering = F.when(
        F.col("kind").isin("PARTITION_DELETE", "RANGE_TOMBSTONE_MARKER"), F.lit("")
    ).otherwise(F.col("clustering"))
    dedup_name = (
        F.when(F.col("kind") == "ROW_DELETE", F.lit("<rd>"))
        .when(F.col("kind") == "PARTITION_DELETE", F.lit("<pd>"))
        .when(
            F.col("kind") == "RANGE_TOMBSTONE_MARKER",
            F.concat(F.lit("<rtm>"), "range_start", F.lit("|"), "range_end"),
        )
        .otherwise(F.coalesce(F.col("cell_name"), F.lit("<marker>")))
    )

    w_lww = Window.partitionBy(
        *_PK, dedup_clustering, dedup_name
    ).orderBy(F.desc("writetime"))
    w_pk = Window.partitionBy(*_PK)
    w_row = Window.partitionBy(*_PK, "clustering")

    enriched = (
        c.withColumn("rn", F.row_number().over(w_lww))
        .withColumn(
            "pd_wt",
            F.max(
                F.when(F.col("kind") == "PARTITION_DELETE", F.col("writetime"))
            ).over(w_pk),
        )
        .withColumn(
            "rd_wt",
            F.max(
                F.when(F.col("kind") == "ROW_DELETE", F.col("writetime"))
            ).over(w_row),
        )
    )

    is_cellish = F.col("kind").isin(*_CELLISH)
    not_pd_shadowed = F.col("pd_wt").isNull() | (F.col("writetime") > F.col("pd_wt"))
    not_rd_shadowed = F.col("rd_wt").isNull() | (F.col("writetime") > F.col("rd_wt"))
    acts_as_tombstone = F.col("is_tombstone") | (
        F.col("is_expiring") & (F.col("local_deletion_time") < gc_before)
    )
    not_purged_cell = ~(acts_as_tombstone & (F.col("local_deletion_time") < gc_before))
    marker_not_purged = F.col("local_deletion_time") >= gc_before

    keep = (F.col("rn") == 1) & (
        F.when(is_cellish, not_pd_shadowed & not_rd_shadowed & not_purged_cell)
        .when(F.col("kind") == "PARTITION_DELETE", marker_not_purged)
        .otherwise(not_pd_shadowed & marker_not_purged)  # ROW_DELETE / RTM
    )
    survivors = enriched.where(keep)

    # RTM interval shadowing: pk-equi anti-join with range + kind predicates
    # inside the condition so markers are never eliminated by it.
    rtm = c.where(F.col("kind") == "RANGE_TOMBSTONE_MARKER").select(
        F.col("keyspace").alias("t_keyspace"),
        F.col("table_name").alias("t_table_name"),
        F.col("partition_key").alias("t_partition_key"),
        F.col("range_start").alias("t_range_start"),
        F.col("range_end").alias("t_range_end"),
        F.col("writetime").alias("rtm_wt"),
    )
    survivors = survivors.join(
        rtm,
        on=[
            F.col("keyspace") == F.col("t_keyspace"),
            F.col("table_name") == F.col("t_table_name"),
            F.col("partition_key") == F.col("t_partition_key"),
            F.col("kind").isin(*_CELLISH),
            F.col("clustering") >= F.col("t_range_start"),
            F.col("clustering") <= F.col("t_range_end"),
            F.col("writetime") < F.col("rtm_wt"),
        ],
        how="left_anti",
    )

    # RTM boundary splitting (docstring above): melt each live RTM into its
    # two bounds; a purged marker's bound that coincides with an OPPOSITE-type
    # bound of a kept marker is a reference boundary -> half the purged
    # marker's declared size survives per such bound. Rare-rows only: every
    # frame below holds exclusively RTM rows, so the extra exchange is tiny.
    rtm_live = enriched.where(
        (F.col("kind") == "RANGE_TOMBSTONE_MARKER")
        & (F.col("rn") == 1)
        & not_pd_shadowed
    )
    bounds = F.explode(
        F.array(
            F.struct(F.col("range_start").alias("pos"), F.lit("open").alias("typ")),
            F.struct(F.col("range_end").alias("pos"), F.lit("close").alias("typ")),
        )
    )
    purged_bounds = (
        rtm_live.where(F.col("local_deletion_time") < gc_before)
        .select(*_PK, "range_start", "range_end", "cell_size", bounds.alias("b"))
        .select(*_PK, "range_start", "range_end", "cell_size", "b.pos", "b.typ")
    )
    kept_bounds = (
        rtm_live.where(F.col("local_deletion_time") >= gc_before)
        .select(
            *[F.col(k).alias(f"k_{k}") for k in _PK], bounds.alias("b")
        )
        .select("k_keyspace", "k_table_name", "k_partition_key",
                F.col("b.pos").alias("k_pos"), F.col("b.typ").alias("k_typ"))
    )
    remnants = (
        purged_bounds.join(
            kept_bounds,
            on=[
                F.col("keyspace") == F.col("k_keyspace"),
                F.col("table_name") == F.col("k_table_name"),
                F.col("partition_key") == F.col("k_partition_key"),
                F.col("pos") == F.col("k_pos"),
                F.col("typ") != F.col("k_typ"),
            ],
            how="left_semi",
        )
        # one remnant per (marker, bound position), even if several kept
        # markers share the position
        .select(*_PK, "range_start", "range_end", "cell_size", "pos")
        .distinct()
        .groupBy(*_PK)
        .agg(F.sum(F.floor(F.col("cell_size") / 2)).alias("remnant"))
    )

    pre = c.groupBy(*_PK).agg(
        F.sum("cell_size").alias("pre_size"),
        F.countDistinct("sstable_id").alias("tables"),
    )
    merged = survivors.groupBy(*_PK).agg(F.sum("cell_size").alias("merged_size"))

    return (
        pre.join(merged, _PK, "left")
        .join(remnants, _PK, "left")
        .withColumn(
            "merged_size",
            F.coalesce(F.col("merged_size"), F.lit(0))
            + F.coalesce(F.col("remnant"), F.lit(0)),
        )
        .drop("remnant")
        .withColumn("reclaimable", F.col("pre_size") - F.col("merged_size"))
    )


def purge_stats_sql(gc_before: int = GC_BEFORE) -> str:
    """DuckDB mirror of ``purge_stats`` over the adapter's `cells` CTE.

    Returns a CTE chain ending in ``purge_per_partition``; append a SELECT.
    (Different physical formulation -- per-branch CTEs -- but identical
    semantics; the hash comparison is the proof.)"""
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
rtm_live AS (
    SELECT d.* FROM (
        SELECT *, row_number() OVER (
            PARTITION BY keyspace, table_name, partition_key, range_start, range_end
            ORDER BY writetime DESC) AS rn
        FROM cells WHERE kind = 'RANGE_TOMBSTONE_MARKER') d
    LEFT JOIN pd_wt p USING (keyspace, table_name, partition_key)
    WHERE d.rn = 1 AND (p.pd_wt IS NULL OR d.writetime > p.pd_wt)
),
rtm_surv AS (
    SELECT keyspace, table_name, partition_key, cell_size
    FROM rtm_live WHERE local_deletion_time >= {gc_before}
),
-- boundary splitting (declared-size model, reference
-- PurgeStatisticBackend.java:233-256): a purged marker's bound meeting an
-- opposite-type bound of a kept marker retains floor(cell_size / 2)
rtm_remnant AS (
    SELECT keyspace, table_name, partition_key,
           CAST(sum(CAST(floor(cell_size / 2) AS BIGINT)) AS BIGINT) AS cell_size
    FROM (
        SELECT DISTINCT pb.keyspace, pb.table_name, pb.partition_key,
               pb.range_start, pb.range_end, pb.cell_size, pb.pos
        FROM (
            SELECT keyspace, table_name, partition_key, range_start, range_end,
                   cell_size, range_start AS pos, 'open' AS typ
            FROM rtm_live WHERE local_deletion_time < {gc_before}
            UNION ALL
            SELECT keyspace, table_name, partition_key, range_start, range_end,
                   cell_size, range_end, 'close'
            FROM rtm_live WHERE local_deletion_time < {gc_before}
        ) pb
        JOIN (
            SELECT keyspace, table_name, partition_key,
                   range_start AS pos, 'open' AS typ
            FROM rtm_live WHERE local_deletion_time >= {gc_before}
            UNION ALL
            SELECT keyspace, table_name, partition_key, range_end, 'close'
            FROM rtm_live WHERE local_deletion_time >= {gc_before}
        ) kb
          ON pb.keyspace = kb.keyspace AND pb.table_name = kb.table_name
         AND pb.partition_key = kb.partition_key
         AND pb.pos = kb.pos AND pb.typ <> kb.typ
    ) GROUP BY 1, 2, 3
),
survivors AS (
    SELECT * FROM surviving_cells
    UNION ALL SELECT * FROM pd_surv
    UNION ALL SELECT * FROM rd_surv
    UNION ALL SELECT * FROM rtm_surv
    UNION ALL SELECT * FROM rtm_remnant
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
