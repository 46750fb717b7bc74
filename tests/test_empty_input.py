"""Degenerate-input CERTIFICATION sweeps: every registered query, three
regimes no driver fixture reaches, each compared against its DuckDB oracle.

At 100 TB these regimes are routine, not edge cases:

- ZERO rows: a predicate that matches nothing (new source with no documents
  yet, a date slice before ingest started). A query that crashes here --
  ``.first()[0]`` on no rows, a model init that collects fewer rows than K,
  ``sequence(min, max)`` over NULL bounds -- is a pipeline outage.
- TWO rows: the sub-seed regime -- fewer vectors than IVF centroids, fewer
  than the PQ codebook (forcing its pad-by-repetition path), and cross-table
  FK dangles (joins must shrink, not crash).
- NULL rows: dirty data -- a decode failure upstream, a missing embedding,
  an unset lang tag. SQL NULL semantics (three-valued predicates,
  null-skipping aggregates, NULL grouping keys, engine-specific concat /
  NULLS-ordering quirks) are exactly where two hand-mirrored formulations
  drift apart silently; a review pass found six such divergences the
  NULL-free fixtures were masking, and this sweep makes that class
  mechanical.

Each sweep runs the FULL oracle comparison (not just crash-freedom): Spark
and DuckDB must produce identical results in every regime. Queries without
an oracle fall back to a rows-execute check, same as the driver's.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from conftest import SF_DIR, assert_matches_oracle

# the slowest suite tier (~3 x 170 oracle comparisons): excluded from the
# default run by pytest.ini addopts; the round-exit gate runs it once per
# round with -m "degenerate or not degenerate" (see pytest.ini)
pytestmark = pytest.mark.degenerate

from cassandra_sstable_tools_spark.queries import registry
from cassandra_sstable_tools_spark.sources.tpch_adapter import TPCH_TABLES

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()

# Key-ish columns a real ingest pipeline enforces NOT NULL on (join keys,
# event time for watermarks); every other column goes NULL in the nulls sweep.
_KEEP_NON_NULL = {
    "doc_id", "vec_id", "event_id", "ts", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey", "ps_partkey",
}


def _ddb_for(d: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, t)}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory):
    """Ten tables, real sf0.001 schemas, zero rows."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TPCH_TABLES:
        schema = pq.read_schema(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def tiny_dir(tmp_path_factory):
    """Ten tables, real sf0.001 rows, but only the FIRST TWO of each."""
    d = tmp_path_factory.mktemp("sf_tiny")
    for t in TPCH_TABLES:
        tbl = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 2), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def nulls_dir(tmp_path_factory):
    """Two real rows per table plus one row whose every non-key column is
    NULL."""
    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TPCH_TABLES:
        tbl = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        head = tbl.slice(0, 2)
        third = tbl.slice(2, 1) if tbl.num_rows > 2 else tbl.slice(0, 1)
        cols = []
        for i, f in enumerate(third.schema):
            if f.name in _KEEP_NON_NULL:
                cols.append(third.column(i))
            else:
                cols.append(pa.array([None], type=f.type))
        nulled = pa.table(dict(zip(third.schema.names, cols)))
        pq.write_table(
            pa.concat_tables([head, nulled]), str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="session")
def empty_ddb(empty_dir):
    con = _ddb_for(empty_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def tiny_ddb(tiny_dir):
    con = _ddb_for(tiny_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def nulls_ddb(nulls_dir):
    con = _ddb_for(nulls_dir)
    yield con
    con.close()


def _check(spark, name, d, con):
    df = _QUERIES[name](spark, d)
    # a well-formed schema must come back even with no rows -- downstream
    # writers key on it
    assert len(df.columns) > 0
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(df, _ORACLES[name], con)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle_on_empty_tables(name, spark, empty_dir, empty_ddb):
    _check(spark, name, empty_dir, empty_ddb)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle_on_two_row_tables(name, spark, tiny_dir, tiny_ddb):
    _check(spark, name, tiny_dir, tiny_ddb)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle_on_null_rows(name, spark, nulls_dir, nulls_ddb):
    _check(spark, name, nulls_dir, nulls_ddb)
