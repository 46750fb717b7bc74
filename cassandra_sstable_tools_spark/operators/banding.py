"""Bucket-capped LSH band self-join -- bounded candidate generation for
every banded near-dup operator (MinHash, SimHash, sign-LSH, projected
bands).

The problem this solves
-----------------------
Every banded scheme melts items into (band_id, band_key) rows and
self-joins on the key: candidate pairs per bucket = C(f, 2) for a bucket
of f members. That is quadratic IN THE BUCKET, and fixture-sized corpora
hide it completely: measured max bucket occupancy on the driver fixtures
is 12 (minhash), 20 (raw sign bands), 19 (projected bands) at sf0.1 --
but one mass-duplicated boilerplate page at 100 TB puts a million
near-identical docs into ONE bucket and the "never all-pairs" join quietly
plans 10^12 rows. SimHash shows the failure mode in miniature TODAY: its
8-bit bands concentrate real text so heavily that sf0.1 already has a
3253-doc bucket (= 5.3M candidate pairs from a 60k-doc corpus).

The fix (standard production shape)
-----------------------------------
Cap the per-bucket join. Buckets with f <= cap emit all C(f, 2) pairs --
bit-identical to the uncapped join. Buckets with f > cap emit STAR edges
instead: every member pairs with the bucket's minimum id (f - 1 rows).
Work is bounded by cap^2 per bucket and ~N * cap globally, making the
operator linear at any duplication level.

Semantics of the trade: an over-cap bucket is almost always mass
duplication, and its members remain CONNECTED through the representative,
so downstream exact verification + connected-components clustering see
the same clusters. What is given up is completeness of the raw PAIR list
inside over-cap buckets (two non-representative members are no longer
enumerated as a direct pair) -- for SimHash this also relaxes the
pigeonhole exactness guarantee inside over-cap buckets, which is the
documented price of bounded work (Manku et al.'s production design makes
the same trade by widening tables until buckets are small).

Both engines run the same rule: `capped_band_pairs` is the Spark side,
`capped_band_pairs_sql` emits the equivalent DuckDB CTE pair for the
oracles, so the cap branch is hash-certified too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capped_band_pairs(
    long: DataFrame,
    id_col: str,
    out_a: str,
    out_b: str,
    cap: int,
    key_col: str = "bk",
) -> DataFrame:
    """Distinct candidate pairs from melted band rows with per-bucket cap.

    ``long`` holds one row per (item, band): (id_col, band_id, key_col).
    Returns (out_a, out_b) with out_a < out_b.

    PRECONDITION (load-bearing): ``long`` must contain EXACTLY ONE row per
    (item, band). Bucket size ``_bsz`` is a raw row count on that grain; a
    caller that emits duplicate (id, band_id, key) rows inflates ``_bsz``,
    spuriously flips buckets into the star-edge branch, and silently drops
    true pairs. All in-repo callers melt signatures with one posexplode /
    one row per band (enforced by tests/test_banding_cap.py); if a new
    caller cannot guarantee this, it must ``.distinct()`` its melted frame
    first (an extra exchange -- which is why the operator does not pay it
    unconditionally, and a countDistinct here would likewise force a
    per-bucket distinct aggregation on the hot path).

    Plan shape -- ONE band self-join, same exchange count as the uncapped
    join. Bucket stats come from a partially-aggregated groupBy on the
    same (band_id, key) grain, so its exchange is the self-join's own
    exchange reused. The LEFT side of the join is pre-filtered to
    "in-cap rows plus over-cap representatives" and the cap rule rides
    the join predicate:

      in-cap bucket (f <= cap): every member on the left, a < b pairs
        -- identical to the uncapped join, <= cap^2 probe work;
      over-cap bucket: ONLY the representative (min id) survives on the
        left, paired with every other member -- O(f) probe work, f - 1
        star edges, never f^2.

    The pre-filter is what bounds the work: the hash-join probe of a hot
    bucket walks the bucket once per LEFT row, and over-cap buckets keep
    exactly one left row.
    """
    keys = ["band_id", key_col]
    rows = long.select(id_col, *keys)
    stats = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_bsz"), F.min(id_col).alias("_rep")
    )
    left = (
        rows.join(stats, keys)
        .where((F.col("_bsz") <= cap) | (F.col(id_col) == F.col("_rep")))
        .select(F.col(id_col).alias(out_a), *keys, "_bsz")
    )
    right = rows.select(F.col(id_col).alias(out_b), *keys)
    return (
        left.join(right, keys)
        .where(
            ((F.col("_bsz") <= cap) & (F.col(out_a) < F.col(out_b)))
            | ((F.col("_bsz") > cap) & (F.col(out_a) != F.col(out_b)))
        )
        .select(out_a, out_b)
        .distinct()
    )


def capped_band_pairs_sql(
    long_cte: str,
    id_col: str,
    out_a: str,
    out_b: str,
    cap: int,
    key_col: str = "bk",
    sized_cte: str = "bsized",
    pairs_cte: str = "cands",
) -> str:
    """DuckDB CTE pair mirroring ``capped_band_pairs`` exactly.

    Emits ``{sized_cte}`` (band rows + window size/representative) and
    ``{pairs_cte}`` ({out_a}, {out_b}); append after the melted band CTE
    named ``long_cte``.

    The in-cap/star UNION is wrapped in a subquery so the CTE body is a
    plain SELECT: DuckDB's WITH RECURSIVE (used by the cluster oracles
    that compose this chain) gives anchor/iterate semantics to any CTE
    whose body is a top-level UNION, silently changing its result.
    """
    return f"""{sized_cte} AS (
    SELECT {id_col}, band_id, {key_col},
           count(*) OVER (PARTITION BY band_id, {key_col}) AS bsz,
           min({id_col}) OVER (PARTITION BY band_id, {key_col}) AS rep
    FROM {long_cte}
),
{pairs_cte} AS (
    SELECT {out_a}, {out_b} FROM (
        SELECT a.{id_col} AS {out_a}, b.{id_col} AS {out_b}
        FROM {sized_cte} a
        JOIN {sized_cte} b
          ON b.band_id = a.band_id AND b.{key_col} = a.{key_col}
         AND a.{id_col} < b.{id_col}
        WHERE a.bsz <= {cap}
        UNION
        SELECT rep, {id_col} FROM {sized_cte}
        WHERE bsz > {cap} AND {id_col} <> rep
    ) u
)"""
