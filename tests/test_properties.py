"""Property-based invariants (SURVEY.md §5.5) via hypothesis.

Small randomized cell sets -> purge_stats must always satisfy:
  0 <= reclaimable <= pre_size, merged_size = pre_size - reclaimable,
  survivors never exceed inputs, and a partition wholly shadowed by a newer
  partition-delete reclaims every older byte.
Examples are kept few (Spark job per example) but each is adversarial:
duplicate keys, marker pileups, boundary ldt values.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_sstable_tools_spark.operators.purge import purge_stats
from tests.test_purge_semantics import COLS

GC = 1000

_KINDS = st.sampled_from(
    ["CELL"] * 6 + ["ROW_DELETE", "PARTITION_DELETE", "RANGE_TOMBSTONE_MARKER", "ROW_MARKER"]
)


@st.composite
def cell_rows(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        kind = draw(_KINDS)
        pk = draw(st.sampled_from(["p1", "p2", "p3"]))
        clustering = draw(st.sampled_from(["a", "b", "c"]))
        name = (
            draw(st.sampled_from(["c1", "c2"]))
            if kind in ("CELL", "STATIC_CELL")
            else None
        )
        tomb = kind == "CELL" and draw(st.booleans())
        has_ldt = tomb or kind in (
            "ROW_DELETE", "PARTITION_DELETE", "RANGE_TOMBSTONE_MARKER"
        )
        # boundary-heavy ldt values around gc_before
        ldt = draw(st.sampled_from([GC - 2, GC - 1, GC, GC + 1])) if has_ldt else None
        rs, re = (("a", draw(st.sampled_from(["a", "b", "c"])))
                  if kind == "RANGE_TOMBSTONE_MARKER" else (None, None))
        rows.append((
            "ks", "t", f"s{draw(st.integers(1, 3))}", pk, clustering, kind,
            name, draw(st.integers(1, 100)), i + 1,  # unique writetime
            None, tomb, False, False, ldt, rs, re, 0,
        ))
    return rows


@pytest.mark.slow
@given(rows=cell_rows())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_purge_invariants(spark, rows):
    df = spark.createDataFrame(rows, schema=COLS)
    out = purge_stats(df, gc_before=GC).collect()
    total_input = sum(r[7] for r in rows)
    assert sum(o["pre_size"] for o in out) == total_input
    for o in out:
        assert 0 <= o["reclaimable"] <= o["pre_size"]
        assert o["merged_size"] == o["pre_size"] - o["reclaimable"]
        assert o["tables"] >= 1


def test_full_partition_delete_reclaims_all_older(spark):
    rows = [
        ("ks", "t", "s1", "p1", "a", "CELL", "c1", 10, 1, None, False, False,
         False, None, None, None, 0),
        ("ks", "t", "s2", "p1", "b", "CELL", "c2", 20, 2, None, False, False,
         False, None, None, None, 0),
        # newest: partition delete, itself purgeable
        ("ks", "t", "s3", "p1", "", "PARTITION_DELETE", None, 5, 3, None,
         False, False, False, GC - 1, None, None, 0),
    ]
    out = purge_stats(spark.createDataFrame(rows, schema=COLS), gc_before=GC).collect()
    assert out[0]["reclaimable"] == 35  # everything reclaimed


def test_top_n_per_group_matches_sorted_model(spark):
    """T1 on random data incl. heavy metric ties: exactly the first N rows
    of each group under the full deterministic ordering, ranks 1..N."""
    import random

    from cassandra_sstable_tools_spark.operators.topn import top_n_per_group
    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    rows = [
        (rng.choice(["g1", "g2", "g3"]), f"k{i}", rng.randrange(4))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "grp string, key string, metric long")
    got = {
        (r["grp"], r["rank"]): (r["key"], r["metric"])
        for r in top_n_per_group(
            df, ["grp"], [F.desc("metric"), F.asc("key")], 5
        ).collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        members = sorted(
            (r for r in rows if r[0] == g), key=lambda r: (-r[2], r[1])
        )
        for rank, (_, k, m) in enumerate(members[:5], start=1):
            want[(g, rank)] = (k, m)
    assert got == want


def test_sessionize_gap_boundary_is_strict(spark, tmp_path):
    """A gap of EXACTLY SESSION_GAP_SECONDS keeps the session open (the
    break predicate is strict >); one second more splits it."""
    import pandas as pd

    from cassandra_sstable_tools_spark.queries.events import (
        SESSION_GAP_SECONDS,
        sessionize,
    )

    def write(name, gap):
        sf = tmp_path / name
        sf.mkdir()
        ts = [1000, 1000 + gap]
        pd.DataFrame(
            {
                "event_id": [0, 1],
                "ts": pd.to_datetime(ts, unit="s"),
                "user_id": [1, 1],
                "event_type": ["click", "click"],
                "value": [1.0, 1.0],
                "props": ["{}", "{}"],
            }
        ).to_parquet(sf / "events.parquet")
        return str(sf)

    at_gap = sessionize(spark, write("at", SESSION_GAP_SECONDS)).collect()
    assert len(at_gap) == 1 and at_gap[0]["events"] == 2

    over_gap = sessionize(spark, write("over", SESSION_GAP_SECONDS + 1)).collect()
    assert len(over_gap) == 2 and all(r["events"] == 1 for r in over_gap)


def test_salted_topk_equals_plain_window(spark):
    """The salted two-phase top-k must be BIT-IDENTICAL to the single-window
    formulation on random tie-heavy data, for several (n, buckets) configs
    including buckets=1 (degenerates to two stacked windows) and n larger
    than some groups (whole small groups survive)."""
    import random

    from pyspark.sql import functions as F

    from cassandra_sstable_tools_spark.operators.topn import (
        top_n_per_group,
        top_n_per_group_salted,
    )

    rng = random.Random(20260814)
    rows = [
        (rng.choice(["g1", "g2", "g3", "g4"]), rng.randrange(7), f"k{i}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, metric long, key string")
    for n, buckets in [(1, 16), (5, 16), (5, 1), (200, 4)]:
        plain = top_n_per_group(
            df, ["grp"], [F.col("metric").asc(), F.col("key").asc()], n=n
        )
        salted = top_n_per_group_salted(
            df, ["grp"], ["metric", "key"], n=n, salt_buckets=buckets
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), f"diverged at n={n} buckets={buckets}"
