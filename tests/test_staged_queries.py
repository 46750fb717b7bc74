"""Staged queries must already match their DuckDB oracles locally.

Staging convention (SURVEY §2.9): a new query that would displace a
certificate from the driver's 50-slot window is built fully, given a
module-level STAGED_QUERIES/STAGED_ORACLES pair, and proven here before
it is registered in a later round. The r09 round flipped the r08 staged
cohort live (they now flow through queries/registry.py and are covered
by tests/test_core_queries.py); this file scans the package for any
CURRENT staged modules so the convention keeps working without edits.
"""

import importlib
import pkgutil

import pytest
from conftest import assert_matches_oracle

import cassandra_sstable_tools_spark as _pkg


def _staged_modules():
    mods = []
    for info in pkgutil.walk_packages(_pkg.__path__, _pkg.__name__ + "."):
        if info.ispkg:
            continue
        mod = importlib.import_module(info.name)
        if getattr(mod, "STAGED_QUERIES", None):
            mods.append(mod)
    return mods


_QUERIES = {}
_ORACLES = {}
for _m in _staged_modules():
    for _name in _m.STAGED_QUERIES:
        assert _name not in _QUERIES, f"duplicate staged query {_name}"
    _QUERIES.update(_m.STAGED_QUERIES)
    _ORACLES.update(getattr(_m, "STAGED_ORACLES", {}))


def test_staged_names_not_registered():
    """Staging discipline: a name must never be live and staged at once."""
    from cassandra_sstable_tools_spark.queries import registry

    live = set(registry.queries())
    assert not live & set(_QUERIES)


def test_every_staged_query_has_an_oracle():
    assert set(_QUERIES) == set(_ORACLES)


@pytest.mark.parametrize("name", sorted(_QUERIES) or ["<none-staged>"])
def test_staged_query_matches_oracle(name, spark, sf_dir, ddb):
    if name == "<none-staged>":
        pytest.skip("no queries currently staged")
    assert_matches_oracle(_QUERIES[name](spark, sf_dir), _ORACLES[name], ddb)


# -- degenerate-regime sweeps (r09 s2) -------------------------------------
# Registered queries face tests/test_empty_input.py's three regimes; a
# staged query must prove the same BEFORE registration, or its first
# driver sweep after going live is a surprise. Same synthesis, scoped to
# the staged set.

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from conftest import SF_DIR, assert_matches_oracle as _match

from cassandra_sstable_tools_spark.sources.tpch_adapter import TPCH_TABLES

_KEEP_NON_NULL = {
    "doc_id", "vec_id", "event_id", "ts", "user_id",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey", "ps_partkey",
}


def _mk_regime(tmp_path_factory, kind: str) -> str:
    import os

    d = str(tmp_path_factory.mktemp(f"staged_{kind}"))
    for t in TPCH_TABLES:
        tbl = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        if kind == "empty":
            out = tbl.schema.empty_table()
        elif kind == "tiny":
            out = tbl.slice(0, 2)
        else:  # nulls
            head = tbl.slice(0, 2)
            third = tbl.slice(2, 1) if tbl.num_rows > 2 else tbl.slice(0, 1)
            cols = [
                third.column(i)
                if f.name in _KEEP_NON_NULL
                else pa.array([None], type=f.type)
                for i, f in enumerate(third.schema)
            ]
            out = pa.concat_tables(
                [head, pa.table(dict(zip(third.schema.names, cols)))]
            )
        pq.write_table(out, os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="session", params=["empty", "tiny", "nulls"])
def staged_regime_dir(request, tmp_path_factory):
    return _mk_regime(tmp_path_factory, request.param)


@pytest.mark.parametrize("name", sorted(_QUERIES) or ["<none-staged>"])
def test_staged_query_survives_degenerate_regimes(
    name, spark, staged_regime_dir
):
    if name == "<none-staged>":
        pytest.skip("no queries currently staged")
    con = duckdb.connect()
    try:
        import os

        for t in TPCH_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(staged_regime_dir, t)}.parquet')"
            )
        _match(_QUERIES[name](spark, staged_regime_dir), _ORACLES[name], con)
    finally:
        con.close()
