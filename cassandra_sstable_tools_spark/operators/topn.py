"""Bounded top-N ranking (reference operator T1).

Reference keeps ``MinMaxPriorityQueue.maximumSize(n)`` heaps (default n=10)
per ranking (cli/ColumnFamilyStatisticsCollector.java:92-115). Distributed
equivalents:

- global top-N: ``df.orderBy(...).limit(n)`` -> Catalyst plans
  ``TakeOrderedAndProject`` (per-partition bounded heap + driver merge --
  the same algorithm, distributed; O(n) memory per task).
- per-group top-N: ``row_number()`` window. Spark's WindowExec sorts within
  each group partition; with group cardinality >> n this is the standard
  scalable pattern (shuffle on group key only -- no global sort).

Ordering columns must end in a unique key (e.g. partition_key) so the
selected set is deterministic under ties -- required for oracle hash-matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    n: int = 10,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-n rows per group, deterministically ordered by ``order_by``."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def top_n_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n: int = 10,
    salt_col: str | Column | None = None,
    salt_buckets: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-n per group with BOUNDED window partitions -- the skewed /
    corpus-grain formulation of ``top_n_per_group``.

    A plain per-group ``row_number`` sorts each group inside ONE task; when
    a group is a whole crawl source (billions of rows at 100 TB) that task
    is the straggler. Two phases fix it without approximation:

    1. rank within (group, salt) where salt = a deterministic hash of the
       row's unique key into ``salt_buckets`` buckets -> every window
       partition holds ~group/buckets rows; keep rank <= n. The true
       per-group top-n is a subset of the union of per-salt top-n (each
       survivor beats everything in its own bucket), so nothing exact is
       lost -- at most ``salt_buckets * n`` rows per group survive.
    2. rank the survivors within the group -> window partitions are now
       <= salt_buckets * n rows by construction, independent of corpus
       size; keep rank <= n.

    ``order_cols`` are ascending column names whose trailing column is a
    unique key (deterministic under ties -- same contract as
    ``top_n_per_group``). The salt must be a pure function of the row (NOT
    ``rand()``): retries and speculative tasks then rank identically, and
    the result equals the unsalted formulation bit-for-bit.
    """
    if salt_col is None:
        salt_col = F.pmod(F.xxhash64(*order_cols), F.lit(salt_buckets))
    order = [F.col(c).asc() for c in order_cols]
    w1 = Window.partitionBy(*group_cols, salt_col).orderBy(*order)
    survivors = (
        df.withColumn("_local_rank", F.row_number().over(w1))
        .where(F.col("_local_rank") <= n)
        .drop("_local_rank")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= n)
    )


def ranked_global_topk(
    df: DataFrame, order_by: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Global top-k with a 1..k rank column, ONE ordering definition.

    orderBy().limit(k) plans TakeOrderedAndProject (bounded per-task heap);
    the k-row survivor set is then ranked by a window over the SAME
    ordering expressions -- sharing the list is what keeps the limit and
    the rank consistent (a drifted copy of the ordering between the two
    steps would silently mis-rank ties)."""
    w = Window.orderBy(*order_by)
    return (
        df.orderBy(*order_by)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(w))
    )
