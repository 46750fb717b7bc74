"""sessionize_bucketed == sessionize, bit-for-bit.

The hierarchical (bounded-window) formulation must produce EXACTLY the
single-window answer -- session identity is a sum of the same break
indicators, so any divergence is a bug, not an approximation. Two checks:

1. the full fixture corpus (10k-ish events, organic session structure);
2. a planted corpus engineered around the day-bucket boundary, the only
   place the two plans differ structurally: sessions continuing across
   midnight (gap <= 30 min spanning the bucket edge), breaks exactly at a
   bucket's first event, multi-day dormancy (the level-2 lag must skip
   EMPTY buckets, not assume adjacency), same-timestamp ties, and a
   single-event user.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_sstable_tools_spark.queries.events import (
    SESSION_GAP_SECONDS,
    SESSIONIZE_BUCKET_S,
    sessionize,
    sessionize_bucketed,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucketed_equals_single_window_on_fixture(spark, sf_dir):
    assert _rows(sessionize_bucketed(spark, sf_dir)) == _rows(
        sessionize(spark, sf_dir)
    )


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_boundary")
    B, G = SESSIONIZE_BUCKET_S, SESSION_GAP_SECONDS
    rows = []  # (event_id, ts_s, user_id)

    def add(user, *tss):
        for t in tss:
            rows.append((len(rows), t, user))

    # user 1: session CONTINUES across midnight (gap 20s over the edge)
    add(1, B - 10, B + 10, B + 30)
    # user 2: break lands exactly on a bucket's FIRST event (gap > G over
    # the edge) and again inside the next bucket
    add(2, 2 * B - 5, 2 * B + G + 100, 2 * B + 2 * G + 300)
    # user 3: multi-day dormancy -- empty buckets between activity; the
    # level-2 lag must reach back to the last ACTIVE bucket
    add(3, 10, 5 * B + 20, 5 * B + 25)
    # user 4: same-timestamp ties within one bucket + a tie pair whose
    # next event continues the session
    add(4, 100, 100, 100 + G, 100 + G + 1)
    # user 5: single event
    add(5, 3 * B + 7)
    # user 6: dense activity straddling several midnights, all one session
    add(6, *[B * 4 - 2 * G + i * (G // 2) for i in range(10)])

    epoch = dt.datetime(1970, 1, 1)
    base = dt.datetime(2024, 1, 1)  # keep ts values fixture-plausible
    shift = int((base - epoch).total_seconds())
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(r[1] + shift) * 1_000_000 for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.5] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_bucketed_equals_single_window_on_boundaries(spark, boundary_dir):
    got = _rows(sessionize_bucketed(spark, boundary_dir))
    exp = _rows(sessionize(spark, boundary_dir))
    assert got == exp, f"\nbucketed={got}\nsingle  ={exp}"
    # sanity: the planted corpus really exercises both behaviors
    users = {}
    for user_id, *_ in exp:
        users[user_id] = users.get(user_id, 0) + 1
    assert users[1] == 1  # cross-midnight session stayed whole
    assert users[2] == 3  # boundary + internal breaks both split
    assert users[3] == 2  # dormancy split across empty buckets
    assert users[6] == 1  # dense multi-midnight run stayed whole
