"""Derive SSTable-shaped tables from the driver's TPC-H parquet.

The driver materialized only the TPC-H-ish tables (TESTDATA.md); the
SSTable-shaped fixtures of FIXTURES.md were not generated. This module derives
them *deterministically* from ``lineitem`` with pure arithmetic/string
expressions, so the exact same derivation can be (and is) expressed in the
DuckDB oracle (see ``oracles.py`` -- the two MUST stay in lockstep; any change
here requires the mirrored change there).

Derived tables (schemas per FIXTURES.md / SURVEY.md §1.2):

- ``cells``          -- Data.db analog, one row per cell-level event.
- ``sstables``       -- per-SSTable metadata component analog.
- ``index_entries``  -- Index.db analog: (sstable, partition_key, position).

Shared-dialect discipline (Spark vs DuckDB):
- never ``cast(double as bigint)`` directly (DuckDB rounds, Spark truncates)
  -> always ``floor()`` first;
- no decimal literals in arithmetic (DuckDB treats ``0.6`` as DECIMAL) ->
  integer-multiply-then-divide (``x * 3 / 5``: int*int is exact, int/int is
  double division in BOTH dialects);
- ``int % int``, ``lpad``, ``concat``, ``year/month/day`` agree in both.

Mapping spec (mirrored in oracles.ADAPTER_CTE):

  bucket      = l_orderkey % 5
  table_name  = bucket=0 -> 'tab_twcs' | bucket in (1,2) -> 'tab_lcs'
                | else 'tab_stcs'      (a partition key lives in ONE table)
  sstable_seq = (l_linenumber % 4) + 1          -> 4 sstables per table
  sstable_id  = lpad(seq, 5, '0')               (sortable, generation order)
  partition_key = lpad(l_orderkey, 12, '0')     (keys span multiple sstables)
  clustering  = lpad(l_partkey % 50, 4, '0')
  kind        = q<2 ROW_DELETE | q<3 RANGE_TOMBSTONE_MARKER
                | q<4 PARTITION_DELETE | q<5 ROW_MARKER
                | q>=49 STATIC_CELL | else CELL      (q = l_quantity)
  cell_name   = 'c' || (l_suppkey % 5)   for CELL/STATIC_CELL else null
  cell_size   = floor(l_extendedprice) % 32768 + 64
  writetime   = (yyyymmdd(l_shipdate) * 1000000) + l_linenumber   [us, unique
                per (partition_key, clustering, cell_name) -> deterministic LWW]
  is_tombstone = kind in (CELL, STATIC_CELL) and l_returnflag = 'R'
  ttl         = for live CELL/STATIC_CELL with l_linestatus='O':
                suppkey%3 -> 3600 | 86400 | 604800 ; else null
  is_counter  = live no-ttl CELL with l_partkey % 97 = 0
  ldt_mod     = (l_orderkey*7919 + l_linenumber*104729) % 300000
  local_deletion_time =
      tombstones & delete markers: 1698986000 + ldt_mod   (straddles GC_BEFORE
          = 1699136000 -> both droppable and non-droppable exist)
      expiring cells:              1699850000 + ldt_mod   (straddles NOW
          = 1700000000 -> both live and expired expiring cells exist)
      else null
  range_start/range_end = clustering .. lpad(l_partkey%50 + 5, 4, '0') for RTMs
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import GC_GRACE_SECONDS

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Active `-f` restriction (reference cli/PartitionSizeStatisticsCollector
# .java:54-59 parse, cassandra/ColumnFamilyBackend.java:80-89 apply): when
# set, the derived cell/metadata frames only see the named Data.db files.
# Applied at the ROOT of the derivation chain (`cells`) so every downstream
# frame (partition_sizes, sstables, index_entries, collates) inherits it,
# exactly like the reference's file-list restriction at open time.
_FILENAME_FILTER: tuple[str, ...] | None = None


@contextmanager
def filename_filter(names: list[str] | None):
    """Scope a `-f` Data.db filename restriction over the derived frames.

    On exit, cache entries keyed by this filter are unpersisted and evicted:
    each distinct `-f` combination would otherwise leak a persisted
    cells/partition_sizes pair for the life of the session."""
    global _FILENAME_FILTER
    prev = _FILENAME_FILTER
    cur = tuple(sorted(names)) if names else None
    _FILENAME_FILTER = cur
    try:
        yield
    finally:
        _FILENAME_FILTER = prev
        if cur is not None and cur != prev:
            for key in [k for k in _DERIVED_CACHE if k[3] == cur]:
                _evict(key)


# Active keyspace/table scope (reference parity: every reference command
# takes `<keyspace> <table>` positionals and analyzes ONE table --
# cli/ColumnFamilyStatisticsCollector.java:50,
# cli/PartitionSizeStatisticsCollector.java:47). Like `-f`, applied at the
# ROOT of the derivation chain so every derived frame inherits it. In a
# real deployment keyspace/table are directory levels of the SSTable layout,
# so this filter would be partition pruning (never opening other tables'
# files); on the lineitem-derived fixture Catalyst constant-folds the CASE
# defining table_name into a direct predicate over the source scan
# (pinned in tests/test_plan_audit.py).
_TABLE_SCOPE: tuple[str | None, str | None] = (None, None)


@contextmanager
def table_scope(keyspace: str | None = None, table: str | None = None):
    """Scope analysis to one keyspace and/or table, reference-style.

    On exit, cache entries keyed by this scope are unpersisted and evicted
    (same lifecycle as `filename_filter`: distinct scopes must not leak
    persisted frames for the life of the session)."""
    global _TABLE_SCOPE
    prev = _TABLE_SCOPE
    cur = (keyspace, table)
    _TABLE_SCOPE = cur
    try:
        yield
    finally:
        _TABLE_SCOPE = prev
        if cur != (None, None) and cur != prev:
            for key in [k for k in _DERIVED_CACHE if k[4] == cur]:
                _evict(key)


# The derived frames stand in for tables that would be *materialized* in a
# real deployment (they are the engine's inputs, not part of its queries).
# Persisting them avoids re-deriving from lineitem inside every query plan
# (self-referencing plans would otherwise re-scan the source per branch).
_DERIVED_CACHE: dict[tuple, DataFrame] = {}
# Hard bound for a long-lived embedded session (many sf_dirs / sessions /
# filters): beyond this, the oldest entry is unpersisted and evicted (FIFO --
# dict preserves insertion order). The harness needs ~2 sf_dirs x 4 frames.
_DERIVED_CACHE_MAX = 32


def _evict(key: tuple) -> None:
    df = _DERIVED_CACHE.pop(key)
    try:
        df.unpersist()
    except Exception:
        pass  # owning session already stopped; entry is gone either way


def _cached(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build,
    part_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    key = (id(spark), sf_dir, name, _FILENAME_FILTER, _TABLE_SCOPE)
    df = _DERIVED_CACHE.get(key)
    if df is None:
        while len(_DERIVED_CACHE) >= _DERIVED_CACHE_MAX:
            _evict(next(iter(_DERIVED_CACHE)))
        df = build()
        if part_cols:
            # Hash-partition the cache on its natural key, for two reasons:
            # (1) scan parallelism -- the source parquet arrives in ~3 input
            # splits at sf0.1, and a cache that narrow serializes every
            # downstream scan to 3 tasks (profiled: purge's side-table
            # builds burned ~400ms each on 3-task scans; 32-way they are
            # ~50ms); (2) clustering -- downstream windows/groupBys keyed on
            # a superset of part_cols satisfy ClusteredDistribution straight
            # off the cache, eliding their exchange. Deliberately NOT a
            # blind round-robin: that widens the scan but destroys
            # co-location (measured: corpus_keep_list 1.4s -> 3.7s when
            # doc_shingles lost its clustering). One exchange at build time.
            df = df.repartition(*[F.col(c) for c in part_cols])
        df = df.persist()
        _DERIVED_CACHE[key] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- testdata schema tripwire (r03 advice #4) -------------------------------
# The driver regenerates its parquet between rounds and has silently changed
# column types before (events.ts: int64-nanos in one round, timestamp[us] in
# another -- the r03 burn). This table records every dtype the adapter and
# query modules ASSUME; entry() and the test session fixture assert it up
# front so drift fails fast with the drifted column named, instead of as a
# baffling DATATYPE_MISMATCH (or worse, a silent 1000x unit error) downstream.
# A set per column = dtypes the code genuinely handles, not a wish list.
_TS_OK = {"timestamp", "timestamp_ntz", "bigint"}  # ts_seconds_col dispatches
_DATE_OK = {"timestamp", "timestamp_ntz", "date"}
EXPECTED_TESTDATA_SCHEMA: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"},
               "n_regionkey": {"int"}},
    "customer": {"c_custkey": {"bigint"}, "c_name": {"string"},
                 "c_nationkey": {"int"}, "c_acctbal": {"double"},
                 "c_mktsegment": {"string"}},
    "supplier": {"s_suppkey": {"bigint"}, "s_name": {"string"},
                 "s_nationkey": {"int"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"bigint"}, "p_name": {"string"},
             "p_brand": {"string"}, "p_type": {"string"},
             "p_size": {"int"}, "p_retailprice": {"double"}},
    "orders": {"o_orderkey": {"bigint"}, "o_custkey": {"bigint"},
               "o_orderstatus": {"string"}, "o_totalprice": {"double"},
               "o_orderdate": _DATE_OK, "o_orderpriority": {"string"}},
    "lineitem": {"l_orderkey": {"bigint"}, "l_partkey": {"bigint"},
                 "l_suppkey": {"bigint"}, "l_linenumber": {"int"},
                 "l_quantity": {"double"}, "l_extendedprice": {"double"},
                 "l_discount": {"double"}, "l_tax": {"double"},
                 "l_returnflag": {"string"}, "l_linestatus": {"string"},
                 "l_shipdate": _DATE_OK},
    "events": {"event_id": {"bigint"}, "ts": _TS_OK, "user_id": {"bigint"},
               "event_type": {"string"}, "value": {"double"},
               "props": {"string"}},
    "documents": {"doc_id": {"bigint"}, "text": {"string"},
                  "lang": {"string"}, "source": {"string"},
                  "n_chars": {"bigint"}},
    "embeddings": {"vec_id": {"bigint"}, "embedding": {"array<float>"},
                   "label": {"int"}},
}


def assert_testdata_schema(spark: SparkSession, sf_dir: str) -> None:
    """Fail fast (with the drifted column NAMED) if the driver testdata's
    parquet dtypes no longer match what this codebase assumes. Footer-only
    reads -- costs milliseconds, saves a round."""
    _enable_nanos_as_long(spark)
    problems: list[str] = []
    for table, cols in EXPECTED_TESTDATA_SCHEMA.items():
        try:
            actual = dict(load_table(spark, sf_dir, table).dtypes)
        except Exception as exc:  # noqa: BLE001 -- report unreadable table, keep scanning
            problems.append(f"{table}: unreadable ({type(exc).__name__}: {exc})")
            continue
        for col, allowed in cols.items():
            dt = actual.get(col)
            if dt is None:
                problems.append(f"{table}.{col}: column missing")
            elif dt not in allowed:
                problems.append(
                    f"{table}.{col}: dtype {dt!r} not in supported {sorted(allowed)}"
                )
    if problems:
        raise AssertionError(
            "driver testdata schema drifted from adapter assumptions:\n  "
            + "\n  ".join(problems)
        )


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable as bigint nanos.

    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime SQLConf, so setting
    it here works even on a caller-provided SparkSession that was built
    without this repo's session factory (the driver contract passes its own
    session). Must run before any read that touches `events.parquet`. Only
    affects TIMESTAMP(NANOS) columns -- harmless otherwise."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamp math below assumes UTC wall-clock == epoch instants; the
    # repo session factory already sets this, but the driver contract may
    # hand us a foreign session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def ts_seconds_col(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-seconds expression for a time column of WHATEVER dtype the
    parquet actually has -- introspected, never assumed (the driver testdata
    has shipped this column as int64-nanos in one round and timestamp[us] in
    another; r03 burned 9 queries on the assumption).

    - timestamp / timestamp_ntz: ``unix_seconds(cast(ts as timestamp))``
      (session TZ pinned to UTC, so NTZ wall-clock == epoch instant -- exact
      match for the DuckDB oracle ``CAST(floor(epoch_ms(ts)/1000) AS BIGINT)``,
      verified min/max/sum-identical on the driver parquet).
    - bigint (nanos via nanosAsLong): exact integer ``div`` -- nanos exceed
      2^53 so double division would lose precision.
    """
    dt = dict(df.dtypes).get(col)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_seconds(F.col(col).cast("timestamp"))
    if dt == "bigint":
        return F.expr(f"{col} div 1000000000")
    raise TypeError(
        f"events.{col}: unsupported dtype {dt!r} (expected timestamp, "
        "timestamp_ntz, or bigint nanos) -- driver testdata schema drifted?"
    )


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` with a canonical epoch-seconds column ``ts_s``, derived from
    the *loaded* dtype of ``ts`` (see ``ts_seconds_col``). The DuckDB oracle
    mirror is ``CAST(floor(epoch_ms(ts) / 1000) AS BIGINT)`` (exact: ms < 2^53)."""
    _enable_nanos_as_long(spark)
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("ts_s", ts_seconds_col(e))


def cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data.db analog at cell grain (SURVEY.md §1.2 `cells` table). Honors
    the active `filename_filter` (F1) -- a plain predicate on the derived
    filename, so Catalyst folds it into the scan."""

    def build() -> DataFrame:
        df = _cells_uncached(spark, sf_dir)
        if _FILENAME_FILTER:
            fname = F.concat(F.lit("nb-"), F.col("sstable_id"), F.lit("-big-Data.db"))
            df = df.where(fname.isin(list(_FILENAME_FILTER)))
        ks, tbl = _TABLE_SCOPE
        if ks is not None:
            df = df.where(F.col("keyspace") == ks)
        if tbl is not None:
            df = df.where(F.col("table_name") == tbl)
        return df

    # part_cols deliberately EXCLUDES keyspace: the column is a constant
    # (F.lit("ks1")), so a repartition on it plans as
    # hashpartitioning('ks1-literal', tb, pk) -- and a literal is not
    # semantically equal to the keyspace ATTRIBUTE downstream operators
    # cluster on, so HashPartitioning.satisfies(ClusteredDistribution)
    # failed and EVERY pk-grain window/groupBy over this cache silently
    # re-shuffled the whole corpus (measured: purge_top moved 59.7 MB of
    # shuffle across 7 job barriers where the doctrine said zero; 0.04 MB
    # across 3 jobs after this fix). Partitioning on (table_name,
    # partition_key) places rows identically (ks is constant) and, being
    # a SUBSET of every downstream clustering key, actually satisfies
    # their distributions straight off the cache.
    return _cached(
        spark, sf_dir, "cells", build,
        part_cols=("table_name", "partition_key"),
    )


def _cells_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.col("l_orderkey") % 5
    q = F.col("l_quantity")
    seq = (F.col("l_linenumber").cast("bigint") % 4) + 1
    kind = (
        F.when(q < 2, "ROW_DELETE")
        .when(q < 3, "RANGE_TOMBSTONE_MARKER")
        .when(q < 4, "PARTITION_DELETE")
        .when(q < 5, "ROW_MARKER")
        .when(q >= 49, "STATIC_CELL")
        .otherwise("CELL")
    )
    clustering = F.lpad((F.col("l_partkey") % 50).cast("string"), 4, "0")
    is_cellkind = kind.isin("CELL", "STATIC_CELL")
    is_tombstone = is_cellkind & (F.col("l_returnflag") == "R")
    ttl = F.when(
        is_cellkind & (F.col("l_returnflag") != "R") & (F.col("l_linestatus") == "O"),
        F.when(F.col("l_suppkey") % 3 == 0, 3600)
        .when(F.col("l_suppkey") % 3 == 1, 86400)
        .otherwise(604800),
    ).cast("int")
    date_num = (
        F.year("l_shipdate") * 10000 + F.month("l_shipdate") * 100 + F.dayofmonth("l_shipdate")
    ).cast("bigint")
    ldt_mod = (F.col("l_orderkey") * 7919 + F.col("l_linenumber") * 104729) % 300000
    ldt = F.when(
        is_tombstone | kind.isin("ROW_DELETE", "RANGE_TOMBSTONE_MARKER", "PARTITION_DELETE"),
        F.lit(1698986000).cast("bigint") + ldt_mod,
    ).when(ttl.isNotNull(), F.lit(1699850000).cast("bigint") + ldt_mod)
    return li.select(
        F.lit("ks1").alias("keyspace"),
        F.when(bucket == 0, "tab_twcs")
        .when(bucket.isin(1, 2), "tab_lcs")
        .otherwise("tab_stcs")
        .alias("table_name"),
        seq.alias("sstable_seq"),
        F.lpad(seq.cast("string"), 5, "0").alias("sstable_id"),
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0").alias("partition_key"),
        clustering.alias("clustering"),
        kind.alias("kind"),
        F.when(is_cellkind, F.concat(F.lit("c"), (F.col("l_suppkey") % 5).cast("string")))
        .alias("cell_name"),
        (F.floor(F.col("l_extendedprice")).cast("bigint") % 32768 + 64).alias("cell_size"),
        (date_num * 1000000 + F.col("l_linenumber")).alias("writetime"),
        ttl.alias("ttl"),
        is_tombstone.alias("is_tombstone"),
        ttl.isNotNull().alias("is_expiring"),
        (
            (kind == "CELL")
            & (F.col("l_returnflag") != "R")
            & ttl.isNull()
            & (F.col("l_partkey") % 97 == 0)
        ).alias("is_counter"),
        ldt.cast("bigint").alias("local_deletion_time"),
        F.when(kind == "RANGE_TOMBSTONE_MARKER", clustering).alias("range_start"),
        F.when(
            kind == "RANGE_TOMBSTONE_MARKER",
            F.lpad((F.col("l_partkey") % 50 + 5).cast("string"), 4, "0"),
        ).alias("range_end"),
        F.lit(GC_GRACE_SECONDS).alias("gc_grace_seconds"),
    )


def partition_sizes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached per-(table, sstable, partition) rollup for this sf_dir."""
    return _cached(
        spark, sf_dir, "partition_sizes",
        lambda: partition_sizes(cells(spark, sf_dir)),
    )


def partition_sizes(cells_df: DataFrame) -> DataFrame:
    """Per (table, sstable, partition) size/cell rollup -- shared by
    `sstables` metadata derivation and `index_entries` positions."""
    return cells_df.groupBy(
        "keyspace", "table_name", "sstable_seq", "sstable_id", "partition_key"
    ).agg(
        F.sum("cell_size").alias("psize"),
        F.count(F.lit(1)).alias("pcells"),
        F.min("writetime").alias("mn_wt"),
        F.max("writetime").alias("mx_wt"),
        F.min("local_deletion_time").alias("mn_ldt"),
        F.max("local_deletion_time").alias("mx_ldt"),
    )


def sstables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SSTable metadata analog (reference SSTableMetadata.java:47-84)."""
    from cassandra_sstable_tools_spark.constants import GC_BEFORE, LDT_SENTINEL

    c = cells(spark, sf_dir)
    per_part = partition_sizes_cached(spark, sf_dir)
    meta = per_part.groupBy("keyspace", "table_name", "sstable_seq", "sstable_id").agg(
        F.count(F.lit(1)).alias("keys"),
        F.sum("psize").alias("uncompressed_length"),
        F.max("psize").alias("max_row_size"),
        F.floor(F.sum("psize") / F.count(F.lit(1))).alias("avg_row_size"),
        F.max("pcells").alias("max_column_count"),
        F.floor(F.sum("pcells") / F.count(F.lit(1))).alias("avg_column_count"),
        F.min("mn_wt").alias("min_timestamp"),
        F.max("mx_wt").alias("max_timestamp"),
        F.coalesce(F.min("mn_ldt"), F.lit(LDT_SENTINEL)).alias("min_local_deletion_time"),
        F.coalesce(F.max("mx_ldt"), F.lit(LDT_SENTINEL)).alias("max_local_deletion_time"),
    )
    drop_stats = c.groupBy("keyspace", "table_name", "sstable_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(
            F.when(F.col("is_tombstone") & (F.col("local_deletion_time") < GC_BEFORE), 1)
            .otherwise(0)
        ).alias("n_droppable"),
    )
    strategy = (
        F.when(F.col("table_name") == "tab_twcs", "TWCS")
        .when(F.col("table_name") == "tab_lcs", "LCS")
        .otherwise("STCS")
    )
    return (
        meta.join(drop_stats, ["keyspace", "table_name", "sstable_id"])
        .withColumn("filename", F.concat(F.lit("nb-"), "sstable_id", F.lit("-big-Data.db")))
        .withColumn("compaction_strategy", strategy)
        .withColumn("gc_grace_seconds", F.lit(GC_GRACE_SECONDS))
        .withColumn("disk_length", F.floor(F.col("uncompressed_length") * 3 / 5))
        .withColumn("is_repaired", F.col("sstable_seq") % 2 == 0)
        .withColumn(
            "repaired_at",
            F.when(
                F.col("is_repaired"),
                F.lit(1700000000000).cast("bigint") + F.col("sstable_seq") * 1000,
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .withColumn(
            "level",
            F.when(strategy == "LCS", (F.col("sstable_seq") % 5).cast("int"))
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "file_timestamp",
            F.lit(1690000000000).cast("bigint") + F.col("sstable_seq") * 86400000,
        )
        .withColumn(
            "droppable_ppm",
            F.floor(F.col("n_droppable") * 1000000 / F.col("n_records")),
        )
        .drop("n_records", "n_droppable")
    )


def index_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index.db analog: (sstable, partition_key, position); position is the
    running sum of preceding partition sizes in key order
    (reference IndexReader.java:77-113 derives size from position deltas --
    our pstats query must invert this with a window, operator W1)."""
    from pyspark.sql import Window

    per_part = partition_sizes_cached(spark, sf_dir)
    w = (
        Window.partitionBy("keyspace", "table_name", "sstable_id")
        .orderBy("partition_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_part.select(
        "keyspace",
        "table_name",
        "sstable_id",
        "partition_key",
        F.coalesce(F.sum("psize").over(w), F.lit(0)).cast("bigint").alias("position"),
    )
