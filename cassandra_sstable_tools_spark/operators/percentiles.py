"""Operator A5 -- histogram snapshot statistics.

The reference keeps a 1028-sample reservoir (Vitter Algorithm R,
Histogram.java:8-93) and interpolates percentiles over the sample
(Snapshot.java:85-108). That output is *randomized*; our engine computes
exact percentiles instead (documented accuracy improvement, SURVEY.md §5.3):

- exact mode (correctness gate): built-in ``percentile`` -- linear
  interpolation at rank p*(n-1), identical to DuckDB's ``quantile_cont``;
- scale mode (100 TB): ``percentile_approx`` (bounded-memory, deterministic
  t-digest-like sketch) -- better than the reference's randomized reservoir.

Results are floored to whole bytes: the reports consume them through
``humanReadableByteCount(long)`` anyway (Util.java:42-52).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.constants import REPORT_PERCENTILES


def percentile_cols(
    col: str, percentiles: list[float] | None = None, approx: bool = False
) -> list[Column]:
    """Floored percentile aggregate expressions named p50, p75, ... p999.

    All outputs are element_at projections of ONE array-percentage
    ``percentile(col, array(...))`` aggregate: Catalyst deduplicates
    semantically-equal aggregate functions, so the plan buffers the group's
    values ONCE instead of once per requested percentile (measured: 6
    separate exact-percentile aggregates made pstats_summary GC-jitter
    between 0.5s and 5.5s at sf0.1; the single-buffer form is stable)."""
    ps = percentiles if percentiles is not None else REPORT_PERCENTILES
    pcts = F.array(*[F.lit(p) for p in ps])
    agg = (
        F.percentile_approx(col, pcts, F.lit(10000))
        if approx
        else F.percentile(col, pcts)
    )
    out = []
    for i, p in enumerate(ps):
        name = "p" + f"{p * 100:g}".replace(".", "")
        out.append(F.floor(F.element_at(agg, i + 1)).alias(name))
    return out


def percentile_sql(col: str, percentiles: list[float] | None = None) -> str:
    """DuckDB mirror of ``percentile_cols`` (exact mode)."""
    ps = percentiles if percentiles is not None else REPORT_PERCENTILES
    parts = [
        f"CAST(floor(quantile_cont({col}, {p})) AS BIGINT) AS "
        + "p" + f"{p * 100:g}".replace(".", "")
        for p in ps
    ]
    return ",\n       ".join(parts)
