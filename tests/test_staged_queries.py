"""Staged r09 queries must already match their DuckDB oracles locally.

These are fully built, oracle-backed queries deliberately NOT collected by
``queries/registry.py`` this round: the r08 driver window sits at exactly
its >=42-r05-recertification floor (r07 VERDICT #2), so any new
registration would displace a certificate the verdict ordered kept. r09
flips them live by moving each module's STAGED_QUERIES/STAGED_ORACLES
into QUERIES/ORACLES (and adding the module to registry._modules());
this test is the proof they'll pass the driver on arrival.
"""

import pytest
from conftest import assert_matches_oracle

from cassandra_sstable_tools_spark.sources import (
    bloom,
    crc_db,
    lookup,
    summary_db,
)

_STAGED_MODULES = (summary_db, bloom, crc_db, lookup)

_QUERIES = {}
_ORACLES = {}
for _m in _STAGED_MODULES:
    for _name in _m.STAGED_QUERIES:
        assert _name not in _QUERIES, f"duplicate staged query {_name}"
    _QUERIES.update(_m.STAGED_QUERIES)
    _ORACLES.update(_m.STAGED_ORACLES)


def test_staged_names_not_registered():
    """Staging discipline: a name must never be live and staged at once."""
    from cassandra_sstable_tools_spark.queries import registry

    live = set(registry.queries())
    assert not live & set(_QUERIES)


def test_every_staged_query_has_an_oracle():
    assert set(_QUERIES) == set(_ORACLES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_staged_query_matches_oracle(name, spark, sf_dir, ddb):
    assert_matches_oracle(_QUERIES[name](spark, sf_dir), _ORACLES[name], ddb)
