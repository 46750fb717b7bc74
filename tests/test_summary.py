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


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    """Partitioned write -> read-back preserves rows and enables pruning."""
    import pandas as pd
    from conftest import normalize

    from cassandra_sstable_tools_spark.llm.pipeline import corpus_keep_list
    from cassandra_sstable_tools_spark.sources.parquet_sink import (
        write_clean_corpus,
    )

    out = str(tmp_path / "clean_corpus")
    readback = write_clean_corpus(spark, sf_dir, out)
    direct = corpus_keep_list(spark, sf_dir)
    pd.testing.assert_frame_equal(
        normalize(readback.toPandas()),
        normalize(direct.toPandas()),
        check_dtype=False,
        check_exact=True,
    )
    # hive partition dirs exist per language
    import os

    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 1
    # partition filter prunes to a single directory's rows
    one = sorted(langs)[0].split("=", 1)[1]
    pruned = readback.where(readback["lang"] == one)
    assert 0 < pruned.count() < max(2, readback.count())
