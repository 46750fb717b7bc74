"""Randomized differential tests: asof_join_last and the bucketed range
join vs brute-force Python models on generated data. Complements the
hand-built-fixture tests (tests/test_asof.py) and the DuckDB oracle hash
checks with adversarial coverage of tie/boundary cases: duplicate
timestamps, points exactly on interval edges, keys with empty sides."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _gen(seed: int, n_keys: int, n_left: int, n_right: int):
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(n_keys)]
    # Small time domain on purpose: forces equal-timestamp collisions.
    left = [
        (i, rng.choice(keys), rng.randrange(0, 40)) for i in range(n_left)
    ]
    right = [
        (rng.choice(keys), rng.randrange(0, 40), 100 + i, rng.randrange(0, 1000))
        for i in range(n_right)
    ]
    return left, right


def test_asof_differential(spark):
    for seed in range(5):
        left, right = _gen(seed, n_keys=4, n_left=40, n_right=60)
        ldf = spark.createDataFrame(left, "id int, key string, t bigint")
        rdf = spark.createDataFrame(right, "key string, t bigint, rid int, rv int")
        from cassandra_sstable_tools_spark.operators.asof import asof_join_last

        got = {
            r.id: (r.rid, r.rv)
            for r in asof_join_last(
                ldf, rdf, keys=["key"], time_col="t",
                payload_cols=["rid", "rv"], tiebreak_col="rid",
            ).collect()
        }
        # model: latest right (t <= left.t), ties -> max rid
        for lid, lkey, lt in left:
            cands = [(t, rid, rv) for (k, t, rid, rv) in right
                     if k == lkey and t <= lt]
            want = (None, None)
            if cands:
                t, rid, rv = max(cands, key=lambda c: (c[0], c[1]))
                want = (rid, rv)
            assert got[lid] == want, (seed, lid, got[lid], want)


def test_bucketed_range_join_differential(spark):
    """The bucketing trick in clicks_near_purchases, checked generically:
    equi-join on (key, bucket) with exploded interval buckets + exact
    post-filter == the naive range join, including points exactly on both
    interval edges."""
    W = 10
    for seed in range(5):
        left, right = _gen(seed + 100, n_keys=3, n_left=30, n_right=50)
        # left rows become intervals [t-W, t]; right rows are points.
        ldf = spark.createDataFrame(left, "id int, key string, t bigint")
        rdf = spark.createDataFrame(
            [(k, t) for (k, t, _, _) in right], "key string, ct bigint"
        )
        lb = ldf.withColumn(
            "bucket",
            F.explode(
                F.sequence(F.floor((F.col("t") - W) / W), F.floor(F.col("t") / W))
            ),
        )
        rb = rdf.select(
            F.col("key").alias("rkey"), "ct", F.floor(F.col("ct") / W).alias("bucket")
        )
        counts = {
            r.id: r.n
            for r in lb.join(
                rb,
                on=[
                    lb["key"] == rb["rkey"],
                    lb["bucket"] == rb["bucket"],
                    rb["ct"] >= lb["t"] - W,
                    rb["ct"] <= lb["t"],
                ],
            )
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for lid, lkey, lt in left:
            want = sum(
                1 for (k, t, _, _) in right if k == lkey and lt - W <= t <= lt
            )
            assert counts.get(lid, 0) == want, (seed, lid)
