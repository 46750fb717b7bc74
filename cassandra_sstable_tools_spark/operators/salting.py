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

# (pyspark aggregate fn, re-combine fn) per decomposable aggregate kind.
# count_star ignores its input column and counts rows (phase 1
# count(lit(1)), phase 2 sum) -- use it wherever the oracle says count(*);
# a "count" over a proxy column silently undercounts if a dirty feed NULLs
# that column (r06 ADVICE).
_COMBINE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "count_star": (lambda _col: F.count(F.lit(1)), F.sum),
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


def salted_returnflag_totals(spark, sf_dir: str) -> DataFrame:
    """Driver-certified salted aggregation: lineitem totals by l_returnflag
    (3 keys over the whole fact table -- exactly the hot-key shape salting
    exists for) computed through the two-phase salted plan. The oracle is
    the PLAIN one-phase GROUP BY, so a green row certifies the salted
    decomposition is value-identical, not just that it runs. 100 TB: the
    hot key's reducer cost drops B ways; the extra exchange moves only
    B rows per key."""
    from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_int", F.floor("l_quantity").cast("bigint")
    ).withColumn("price_cents", F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
    return salted_agg(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("sum", "qty_int"),
            # true count(*): counts the row regardless of any NULL column
            "n_rows": ("count_star", "*"),
            "min_qty": ("min", "qty_int"),
            "max_qty": ("max", "qty_int"),
            "total_price_cents": ("sum", "price_cents"),
        },
    )


QUERIES = {"salted_returnflag_totals": salted_returnflag_totals}
ORACLES = {
    "salted_returnflag_totals": """
SELECT l_returnflag,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
       count(*) AS n_rows,
       CAST(min(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS min_qty,
       CAST(max(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS max_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS total_price_cents
FROM lineitem
GROUP BY 1
"""
}
