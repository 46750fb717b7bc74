"""As-of join -- for each left row, the latest right row at-or-before it.

The reference has no join surface at all (SURVEY.md §2.4); this is part of
the engine's relational extension, and one of the classic time-series
operators Spark lacks as a built-in.

Implementation: the UNION + single-window formulation, not a range join.
A naive range join (`l JOIN r ON key AND r.t <= l.t` + argmax) materializes
O(|matches|) pairs -- per-key quadratic, fatal at 100 TB of events. Instead,
both sides are unioned with a side tag, sorted once per key by
(t, tag, tiebreak), and a running `last(payload_struct, ignorenulls)` carries
the most recent right payload forward onto every left row:

- ONE shuffle (hash on the keys) + ONE intra-partition sort, linear in
  |left| + |right| -- the plan you'd want on a 1000-executor cluster;
- right rows sort BEFORE left rows at equal t (tag 0 < 1), giving `<=`
  as-of semantics; among equal-t right rows the max tiebreak wins;
- the payload travels as a single struct, so all its fields come atomically
  from the SAME right row (per-column last(ignorenulls) could mix rows if a
  payload field were legitimately null).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    time_col: str,
    payload_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Left as-of join: every left row, plus `payload_cols` of the latest
    right row with equal `keys` and right.time_col <= left.time_col
    (ties: max `tiebreak_col`); payload columns are null when no right row
    qualifies. `tiebreak_col` must be one of `payload_cols`."""
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *keys,
        time_col,
        payload_struct.alias("__p"),
        F.col(tiebreak_col).alias("__tie"),
        F.lit(0).alias("__tag"),
    )
    l = left.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType)) \
            .withColumn("__tie", F.lit(None).cast(r.schema["__tie"].dataType)) \
            .withColumn("__tag", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc(), F.col("__tag").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = carried.where(F.col("__tag") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col("__last")[c])
    return out.drop("__p", "__tie", "__tag", "__last")
