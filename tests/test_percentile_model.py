"""The exact-percentile aggregate vs a pure-Python interpolation model:
pins that the single-buffer array-percentage form computes rank
pos = p*(n-1) with linear interpolation (Spark's definition, which the
DuckDB quantile_cont oracles share) on random integer populations
including ties, singletons, and two-element groups."""

from __future__ import annotations

import math
import random

from cassandra_sstable_tools_spark.constants import REPORT_PERCENTILES
from cassandra_sstable_tools_spark.operators.percentiles import percentile_cols


def model(values, p):
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = math.floor(pos)
    hi = math.ceil(pos)
    frac = pos - lo
    return math.floor(s[lo] + (s[hi] - s[lo]) * frac)


def test_percentiles_match_interpolation_model(spark):
    rng = random.Random(20260814)
    groups = {
        "singleton": [7],
        "pair": [10, 20],
        "ties": [5] * 40 + [6] * 3,
        "uniform": [rng.randrange(1000) for _ in range(257)],
        "skewed": [int(1.5 ** k) for k in range(30)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, size long")
    got = {
        r["g"]: r.asDict()
        for r in df.groupBy("g").agg(*percentile_cols("size")).collect()
    }
    for g, vs in groups.items():
        for p in REPORT_PERCENTILES:
            name = "p" + f"{p * 100:g}".replace(".", "")
            assert got[g][name] == model(vs, p), (g, p)
