"""Every registered query must match its DuckDB oracle (the driver's check)."""

import pytest
from conftest import assert_matches_oracle

from cassandra_sstable_tools_spark.queries import registry

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(df, _ORACLES[name], ddb)
