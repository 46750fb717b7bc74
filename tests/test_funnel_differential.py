"""Randomized differential test: the distributed funnel chain vs a plain
sequential Python model. The fixture corpus exercises one event
distribution; random streams cover the edge cases it can't (users stalled
at every stage, equal timestamps, stage events before the prior stage,
empty stages)."""

from __future__ import annotations

import random

from cassandra_sstable_tools_spark.queries.timeseries import (
    FUNNEL_STAGES,
    funnel_over,
)

TYPES = ["view", "click", "purchase", "signup", "error"]


def sequential_funnel(events: list[tuple[int, str, int]]) -> list[int]:
    """Per-stage user counts by literal replay: stage N time = min ts of a
    stage-N event STRICTLY after the user's stage-(N-1) time."""
    by_user: dict[int, list[tuple[int, str, int]]] = {}
    for ev in events:
        by_user.setdefault(ev[0], []).append(ev)
    counts = [0] * len(FUNNEL_STAGES)
    for evs in by_user.values():
        t_prev = None
        for i, stage in enumerate(FUNNEL_STAGES):
            ts = [t for (_u, typ, t) in evs
                  if typ == stage and (t_prev is None or t > t_prev)]
            if not ts:
                break
            t_prev = min(ts)
            counts[i] += 1
    return counts


def test_funnel_matches_sequential_model(spark):
    rng = random.Random(20260814)
    for trial in range(4):
        n_users = rng.choice([3, 10, 25])
        events = [
            (
                rng.randrange(n_users),
                rng.choice(TYPES),
                rng.randrange(50),  # small ts range -> frequent ties
            )
            for _ in range(rng.choice([20, 150, 400]))
        ]
        df = spark.createDataFrame(
            events, schema="user_id long, event_type string, ts_s long"
        )
        got = {r["stage"]: r["users"] for r in funnel_over(df).collect()}
        want = sequential_funnel(events)
        assert [got[i + 1] for i in range(len(FUNNEL_STAGES))] == want, (
            f"trial {trial}: {got} vs {want}"
        )
