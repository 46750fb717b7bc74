from conftest import assert_matches_oracle

from cassandra_sstable_tools_spark.queries import summary as m


def test_summary_matches_oracle(spark, sf_dir, ddb):
    df = m.summary(spark, sf_dir)
    assert_matches_oracle(df, m.ORACLE_SUMMARY, ddb)


def test_summary_shape(spark, sf_dir):
    rows = m.summary(spark, sf_dir).collect()
    assert len(rows) == 3  # tab_twcs, tab_lcs, tab_stcs
    for r in rows:
        assert 0 <= r["repair_pct"] <= 100
        assert r["sstable_count"] == 4
