"""DuckDB-dialect mirrors of the adapter derivation + per-query oracle SQL.

MUST stay in lockstep with ``sources/tpch_adapter.py`` (the mapping spec lives
in that module's docstring). Dialect notes:
- DuckDB ``cast(double as bigint)`` ROUNDS -> always ``floor()`` first;
- decimal literals are DECIMAL-typed in DuckDB -> integer-multiply/divide only;
- ``int / int`` is double division in both DuckDB and Spark.

Every oracle string is self-contained: ``with_adapter(body)`` prepends the
shared CTE block so the driver can run it verbatim against the pre-registered
TPC-H views.
"""

from __future__ import annotations

from cassandra_sstable_tools_spark.constants import (
    GC_BEFORE,
    GC_GRACE_SECONDS,
    LDT_SENTINEL,
)

ADAPTER_CTE = f"""
cells AS (
    SELECT
        'ks1' AS keyspace,
        CASE
            WHEN l_orderkey % 5 = 0 THEN 'tab_twcs'
            WHEN l_orderkey % 5 IN (1, 2) THEN 'tab_lcs'
            ELSE 'tab_stcs'
        END AS table_name,
        (CAST(l_linenumber AS BIGINT) % 4) + 1 AS sstable_seq,
        lpad(CAST((CAST(l_linenumber AS BIGINT) % 4) + 1 AS VARCHAR), 5, '0') AS sstable_id,
        lpad(CAST(l_orderkey AS VARCHAR), 12, '0') AS partition_key,
        lpad(CAST(l_partkey % 50 AS VARCHAR), 4, '0') AS clustering,
        CASE
            WHEN l_quantity < 2 THEN 'ROW_DELETE'
            WHEN l_quantity < 3 THEN 'RANGE_TOMBSTONE_MARKER'
            WHEN l_quantity < 4 THEN 'PARTITION_DELETE'
            WHEN l_quantity < 5 THEN 'ROW_MARKER'
            WHEN l_quantity >= 49 THEN 'STATIC_CELL'
            ELSE 'CELL'
        END AS kind,
        CASE
            WHEN l_quantity >= 5 AND l_quantity < 49 THEN concat('c', CAST(l_suppkey % 5 AS VARCHAR))
            WHEN l_quantity >= 49 THEN concat('c', CAST(l_suppkey % 5 AS VARCHAR))
        END AS cell_name,
        CAST(floor(l_extendedprice) AS BIGINT) % 32768 + 64 AS cell_size,
        CAST(year(l_shipdate) * 10000 + month(l_shipdate) * 100 + day(l_shipdate) AS BIGINT)
            * 1000000 + l_linenumber AS writetime,
        CASE
            WHEN (l_quantity >= 5) AND l_returnflag <> 'R' AND l_linestatus = 'O' THEN
                CAST(CASE l_suppkey % 3 WHEN 0 THEN 3600 WHEN 1 THEN 86400 ELSE 604800 END AS INT)
        END AS ttl,
        (l_quantity >= 5) AND l_returnflag = 'R' AS is_tombstone,
        (l_quantity >= 5) AND l_returnflag <> 'R' AND l_linestatus = 'O' AS is_expiring,
        (l_quantity >= 5 AND l_quantity < 49) AND l_returnflag <> 'R'
            AND NOT (l_returnflag <> 'R' AND l_linestatus = 'O')
            AND l_partkey % 97 = 0 AS is_counter,
        CASE
            WHEN ((l_quantity >= 5) AND l_returnflag = 'R') OR l_quantity < 4 THEN
                CAST(1698986000 + (l_orderkey * 7919 + l_linenumber * 104729) % 300000 AS BIGINT)
            WHEN (l_quantity >= 5) AND l_returnflag <> 'R' AND l_linestatus = 'O' THEN
                CAST(1699850000 + (l_orderkey * 7919 + l_linenumber * 104729) % 300000 AS BIGINT)
        END AS local_deletion_time,
        CASE WHEN l_quantity >= 2 AND l_quantity < 3
             THEN lpad(CAST(l_partkey % 50 AS VARCHAR), 4, '0') END AS range_start,
        CASE WHEN l_quantity >= 2 AND l_quantity < 3
             THEN lpad(CAST(l_partkey % 50 + 5 AS VARCHAR), 4, '0') END AS range_end,
        {GC_GRACE_SECONDS} AS gc_grace_seconds
    FROM lineitem
),
per_part AS (
    SELECT keyspace, table_name, sstable_seq, sstable_id, partition_key,
           sum(cell_size) AS psize,
           count(*) AS pcells,
           min(writetime) AS mn_wt,
           max(writetime) AS mx_wt,
           min(local_deletion_time) AS mn_ldt,
           max(local_deletion_time) AS mx_ldt
    FROM cells
    GROUP BY 1, 2, 3, 4, 5
),
sstables_meta AS (
    SELECT m.*,
           d.droppable_ppm,
           concat('nb-', m.sstable_id, '-big-Data.db') AS filename,
           CASE m.table_name WHEN 'tab_twcs' THEN 'TWCS' WHEN 'tab_lcs' THEN 'LCS'
                ELSE 'STCS' END AS compaction_strategy,
           {GC_GRACE_SECONDS} AS gc_grace_seconds,
           CAST(floor(m.uncompressed_length * 3 / 5) AS BIGINT) AS disk_length,
           m.sstable_seq % 2 = 0 AS is_repaired,
           CASE WHEN m.sstable_seq % 2 = 0
                THEN CAST(1700000000000 AS BIGINT) + m.sstable_seq * 1000
                ELSE CAST(0 AS BIGINT) END AS repaired_at,
           CASE WHEN m.table_name = 'tab_lcs' THEN CAST(m.sstable_seq % 5 AS INT)
                ELSE 0 END AS level,
           CAST(1690000000000 AS BIGINT) + m.sstable_seq * 86400000 AS file_timestamp
    FROM (
        SELECT keyspace, table_name, sstable_seq, sstable_id,
               count(*) AS keys,
               CAST(sum(psize) AS BIGINT) AS uncompressed_length,
               CAST(max(psize) AS BIGINT) AS max_row_size,
               CAST(floor(sum(psize) / count(*)) AS BIGINT) AS avg_row_size,
               max(pcells) AS max_column_count,
               CAST(floor(sum(pcells) / count(*)) AS BIGINT) AS avg_column_count,
               min(mn_wt) AS min_timestamp,
               max(mx_wt) AS max_timestamp,
               coalesce(min(mn_ldt), {LDT_SENTINEL}) AS min_local_deletion_time,
               coalesce(max(mx_ldt), {LDT_SENTINEL}) AS max_local_deletion_time
        FROM per_part
        GROUP BY 1, 2, 3, 4
    ) m
    JOIN (
        SELECT keyspace, table_name, sstable_id,
               CAST(floor(sum(CASE WHEN is_tombstone AND local_deletion_time < {GC_BEFORE}
                                   THEN 1 ELSE 0 END) * 1000000 / count(*)) AS BIGINT)
                   AS droppable_ppm
        FROM cells
        GROUP BY 1, 2, 3
    ) d USING (keyspace, table_name, sstable_id)
),
index_entries AS (
    SELECT keyspace, table_name, sstable_id, partition_key,
           CAST(coalesce(sum(psize) OVER (
               PARTITION BY keyspace, table_name, sstable_id
               ORDER BY partition_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS position
    FROM per_part
)"""


def with_adapter(body: str) -> str:
    """Wrap a query body with the shared adapter CTE block."""
    return f"WITH {ADAPTER_CTE}\n{body}"
