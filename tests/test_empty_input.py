"""Degenerate-input sweep: every registered query must survive ZERO-row tables.

At 100 TB a predicate that matches nothing is routine (a new source with no
documents yet, a date slice before ingest started, a keyspace filter that
excludes every sstable). A query that crashes on an empty slice --
``.first()[0]`` on no rows, a model init that collects fewer rows than K, a
``sequence(min, max)`` over NULL bounds -- is a pipeline outage, not an edge
case. This sweep runs the full registry against a fixture directory whose ten
tables carry the REAL schemas (read from the driver's sf0.001 parquet) and
zero rows, asserting every query plans, executes, and returns a well-formed
(usually empty) result.

Queries whose semantics genuinely require data (trained-model paths that
must collect K seed rows) are expected to DEGRADE -- return an empty frame --
rather than raise; the operators gained explicit empty guards for this test.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from conftest import SF_DIR

from cassandra_sstable_tools_spark.queries import registry
from cassandra_sstable_tools_spark.sources.tpch_adapter import TPCH_TABLES

_QUERIES = registry.queries()


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
    """Ten tables, real sf0.001 rows, but only the FIRST TWO of each.

    The sub-seed regime the zero-row sweep can't reach: a 2-vector corpus
    gives IVF one-to-two centroids (fewer than N_CENTROIDS) and forces the
    PQ codebook's pad-by-repetition path (2 < PQ_K codes). Cross-table FK
    dangles (a lineitem row whose order didn't make the cut) are the point,
    not a bug -- joins must shrink, not crash."""
    d = tmp_path_factory.mktemp("sf_tiny")
    for t in TPCH_TABLES:
        tbl = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(tbl.slice(0, 2), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_empty_tables(name, spark, empty_dir):
    df = _QUERIES[name](spark, empty_dir)
    rows = df.count()
    assert rows >= 0
    # A well-formed schema must come back even with no rows -- downstream
    # writers key on it.
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_two_row_tables(name, spark, tiny_dir):
    df = _QUERIES[name](spark, tiny_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


# Key-ish columns a real ingest pipeline enforces NOT NULL on (join keys,
# event time for watermarks); every other column goes NULL in the sweep.
_KEEP_NON_NULL = {
    "doc_id", "vec_id", "event_id", "ts", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey", "ps_partkey",
}


@pytest.fixture(scope="session")
def nulls_dir(tmp_path_factory):
    """Two real rows per table plus one row whose every non-key column is
    NULL -- the dirty-data regime: a decode failure upstream, a missing
    embedding, an unset lang tag. Queries must propagate/skip NULLs, not
    crash (the classic failure is a driver-side seed collect doing
    len(row.embedding) on None)."""
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


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_survives_null_rows(name, spark, nulls_dir):
    df = _QUERIES[name](spark, nulls_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.fixture(scope="session")
def nulls_ddb(nulls_dir):
    import duckdb

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(nulls_dir, t)}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle_on_null_rows(name, spark, nulls_dir, nulls_ddb):
    """Dirty-data CERTIFICATION, not just crash-freedom: Spark and DuckDB
    must agree on NULL-bearing tables too. SQL NULL semantics (three-valued
    predicates, null-skipping aggregates, NULL grouping keys) are exactly
    where two hand-mirrored formulations drift apart silently -- a review
    pass found six such divergences that the fixtures' NULL-free data had
    been masking; this sweep makes that class mechanical."""
    from conftest import assert_matches_oracle

    from cassandra_sstable_tools_spark.queries import registry as _reg

    oracles = _reg.oracle_sql()
    df = _QUERIES[name](spark, nulls_dir)
    if name not in oracles:
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracles[name], nulls_ddb)
