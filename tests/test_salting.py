"""Salted two-phase aggregation must equal the plain one-phase answer."""

from __future__ import annotations

import pandas as pd
from conftest import normalize
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.salting import salted_agg
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_int", F.floor("l_quantity").cast("bigint")
    )
    aggs = {
        "total_qty": ("sum", "qty_int"),
        "n_rows": ("count", "qty_int"),
        "min_qty": ("min", "qty_int"),
        "max_qty": ("max", "qty_int"),
    }
    salted = salted_agg(li, ["l_returnflag"], aggs, salt_buckets=7)
    plain = li.groupBy("l_returnflag").agg(
        F.sum("qty_int").alias("total_qty"),
        F.count("qty_int").alias("n_rows"),
        F.min("qty_int").alias("min_qty"),
        F.max("qty_int").alias("max_qty"),
    )
    pd.testing.assert_frame_equal(
        normalize(salted.toPandas()),
        normalize(plain.toPandas()),
        check_dtype=False,
        check_exact=True,
    )


def test_salted_agg_single_hot_key(spark):
    """Degenerate skew: every row shares one key -- the salted plan still
    produces the single correct row."""
    df = spark.range(0, 10000).select(
        F.lit("hot").alias("k"), F.col("id").cast("bigint").alias("v")
    )
    out = salted_agg(df, ["k"], {"s": ("sum", "v"), "c": ("count", "v")},
                     salt_buckets=32).collect()
    assert len(out) == 1
    assert out[0]["s"] == sum(range(10000))
    assert out[0]["c"] == 10000


def test_approx_percentiles_track_exact(spark, sf_dir):
    """The 100 TB percentile mode (percentile_approx sketch) must stay within
    1% relative error of the exact mode it replaces at scale."""
    from pyspark.sql import functions as F

    from cassandra_sstable_tools_spark.operators.percentiles import (
        percentile_cols,
    )
    from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice")).cast("bigint").alias("v")
    )
    exact = li.agg(*percentile_cols("v", approx=False)).collect()[0].asDict()
    approx = li.agg(*percentile_cols("v", approx=True)).collect()[0].asDict()
    assert set(exact) == set(approx)
    for k, ev in exact.items():
        av = approx[k]
        assert abs(av - ev) <= max(1, 0.01 * ev), (k, ev, av)
