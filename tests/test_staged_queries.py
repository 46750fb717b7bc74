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
