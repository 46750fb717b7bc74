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
