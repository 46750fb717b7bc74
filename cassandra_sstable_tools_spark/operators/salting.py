"""Skew handling: salted two-phase aggregation.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py), but a pathologically hot GROUP BY key (one key holding 10% of
100 TB) still funnels its partial aggregates to a single reducer. Salting
splits the hot key across ``salt_buckets`` reducers:

    phase 1: groupBy(key, salt=hash(row)%B) -> partial aggregates (B rows/key)
    phase 2: groupBy(key) over the B partials  -> final aggregates

Correct for any decomposable aggregate (sum/count/min/max); the second
shuffle moves only B rows per key, so the hot key's cost drops from
O(rows_of_key) on one task to O(rows_of_key / B) per task + O(B) final.
This is a deliberate 2-exchange plan -- the trade is documented, not hidden:
use it when a profile (or AQE metrics) shows reducer-side skew, not by
default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16

# (pyspark aggregate fn, re-combine fn) per decomposable aggregate kind
_COMBINE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (kind, input column), kind in
    {sum, count, min, max}. Result equals the plain one-phase
    ``df.groupBy(key_cols).agg(...)`` for these decomposable aggregates
    (asserted in tests), with the hot-key reducer cost split B ways.
    """
    salt: Column = F.pmod(
        F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    ).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *[
            _COMBINE[kind][0](col).alias(out)
            for out, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            _COMBINE[kind][1](out).alias(out)
            for out, (kind, _col) in aggs.items()
        ]
    )
