"""Sequential-model differentials for the time-series family, driven
end-to-end over SYNTHESIZED events.parquet corpora (tmp sf_dir) -- covers
hour-boundary ties, single-hour corpora, and gap patterns the fixture's
dense uniform stream can't."""

from __future__ import annotations

import math
import random
from collections import Counter

import pandas as pd

from cassandra_sstable_tools_spark.queries.timeseries import (
    MOVING_WINDOW_S,
    events_anomaly,
    events_gapfill,
    events_moving_avg,
)

TYPES = ["click", "view"]


def _write_events(tmp_path, name, rows):
    """rows: (event_id, ts_s, user_id, event_type, value)."""
    sf = tmp_path / name
    sf.mkdir()
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ['{"k": 1}'] * len(rows),
        }
    ).to_parquet(sf / "events.parquet")
    return str(sf)


def _gen(rng, n):
    # sparse hours with deliberate gaps: cluster timestamps around a few
    # hour buckets spread over several days
    hours = sorted(rng.sample(range(0, 200), rng.randrange(3, 9)))
    rows = []
    for i in range(n):
        h = rng.choice(hours)
        ts = h * 3600 + rng.randrange(3600)
        rows.append((i, ts, rng.randrange(5), rng.choice(TYPES), 1.0))
    return rows


def hourly(rows):
    return Counter(((r[1] // 3600) * 3600, r[3]) for r in rows)


def test_gapfill_matches_model(spark, tmp_path):
    rng = random.Random(20260814)
    rows = _gen(rng, 300)
    sf = _write_events(tmp_path, "gf", rows)
    c = hourly(rows)
    lo = min(h for h, _ in c)
    hi = max(h for h, _ in c)
    types = {r[3] for r in rows}
    want = {
        (h, t): c.get((h, t), 0)
        for h in range(lo, hi + 1, 3600)
        for t in types
    }
    got = {
        (r["hour_start"], r["event_type"]): r["events"]
        for r in events_gapfill(spark, sf).collect()
    }
    assert got == want


def test_moving_avg_and_anomaly_match_model(spark, tmp_path):
    rng = random.Random(99)
    rows = _gen(rng, 400)
    sf = _write_events(tmp_path, "ma", rows)
    c = hourly(rows)
    per_type = {}
    for (h, t), n in c.items():
        per_type.setdefault(t, {})[h] = n

    got_ma = {
        (r["hour_start"], r["event_type"]): (r["events_3h_sum"], r["moving_avg_milli"])
        for r in events_moving_avg(spark, sf).collect()
    }
    got_an = {
        (r["hour_start"], r["event_type"]): (r["prev_sum"], r["prev_hours"], r["is_anomaly"])
        for r in events_anomaly(spark, sf).collect()
    }
    for t, hs in per_type.items():
        for h, n in hs.items():
            frame = [hs[g] for g in hs if h - MOVING_WINDOW_S <= g <= h]
            assert got_ma[(h, t)] == (
                sum(frame),
                math.floor(sum(frame) * 1000 / len(frame)),
            )
            prev = [hs[g] for g in hs if h - 7200 <= g <= h - 3600]
            want_flag = bool(prev) and n * len(prev) > 2 * sum(prev)
            assert got_an[(h, t)] == (sum(prev), len(prev), want_flag)
