"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The windowed aggregations in ``events_stream.py`` are what built-in
Structured Streaming state can express; sessionization (a session ends after
> 30 min of inactivity) is the canonical operator it CANNOT -- session
boundaries depend on the previous event's time, so the state is per-user
(last_ts, open-session accumulator), not a fixed window. This module keeps
that state explicitly via the Arrow-batched stateful API.

Semantics contract: identical to the batch ``queries/events.sessionize``
(lag + running-sum formulation). Each micro-batch emits, per user, every
session CLOSED within the batch plus the still-open session (flagged
``open = 1``); downstream consumers upsert by (user_id, session_seq), so the
open session's row is replaced when it either extends (next batch) or
closes. When the stream is drained to the end (availableNow), the union of
closed + open rows equals the batch answer exactly -- asserted in tests.

Scale posture: state is O(1) per active user (five longs -- the open
session's accumulator), partitioned by user_id across executors; Arrow
batches keep the Python boundary amortized. At 100 TB of events the state
store holds |active users| entries regardless of history length, which is
the whole point of the stateful formulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

# the ONE session-gap definition: this kernel is certified against the
# batch sessionize oracle rendered from queries/events.py, so the gap must
# be the same object, not a numerically-equal copy
from cassandra_sstable_tools_spark.queries.events import SESSION_GAP_SECONDS
from cassandra_sstable_tools_spark.streaming.events_stream import events_stream_source

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("events", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("duration_s", LongType()),
        StructField("value_cents", LongType()),
        StructField("open", LongType()),
    ]
)

# (session_seq, session_start, last_ts, events, value_cents) of the open session
STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Vectorized kernel: session breaks via a shifted-diff comparison and a
    cumulative sum, per-session stats via a C-path pandas groupby -- no
    per-event Python loop. Cross-batch semantics are identical to the
    row-at-a-time formulation (carry-in accumulator merged into the first
    session when it continues, emitted closed when the batch opens anew)."""
    import numpy as np

    (user_id,) = key
    if state.exists:
        seq0, start0, last_ts0, n0, cents0 = state.get
    else:
        seq0, start0, last_ts0, n0, cents0 = 0, None, None, 0, 0

    cols = [f.name for f in OUTPUT_SCHEMA.fields]
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if pdf.empty:
        if last_ts0 is not None:
            state.update((seq0, start0, last_ts0, n0, cents0))
            yield pd.DataFrame(
                [(user_id, seq0, n0, start0, last_ts0, last_ts0 - start0,
                  cents0, 1)],
                columns=cols,
            )
        return

    pdf = pdf.sort_values(["ts_s", "event_id"])
    ts = pdf["ts_s"].to_numpy(np.int64)
    # fillna first: a NULL value (dirty row) arrives as NaN, and a bare
    # to_numpy(int64) cast turns NaN into INT64_MIN garbage; SQL SUM
    # null-skipping == summing 0, matching the batch sessionize oracle
    cents = pdf["value_cents"].fillna(0).to_numpy(np.int64)
    prev = np.empty_like(ts)
    prev[1:] = ts[:-1]
    prev[0] = last_ts0 if last_ts0 is not None else ts[0]
    seq = seq0 + np.cumsum((ts - prev) > SESSION_GAP_SECONDS)

    g = (
        pd.DataFrame({"seq": seq, "ts": ts, "cents": cents})
        .groupby("seq", sort=True)
        .agg(events=("ts", "size"), start=("ts", "min"),
             end=("ts", "max"), cents=("cents", "sum"))
        .reset_index()
    )

    out: list[tuple] = []
    if last_ts0 is not None:
        if int(g.iloc[0]["seq"]) == seq0:
            # batch continues the open session: fold the carried accumulator in
            g.loc[g.index[0], "events"] += n0
            g.loc[g.index[0], "cents"] += cents0
            g.loc[g.index[0], "start"] = start0
        else:
            # batch starts past the gap: the carried session closes as-is
            out.append((user_id, seq0, n0, start0, last_ts0,
                        last_ts0 - start0, cents0, 0))

    last_i = len(g) - 1
    for i in range(len(g)):
        r = g.iloc[i]
        out.append(
            (user_id, int(r["seq"]), int(r["events"]), int(r["start"]),
             int(r["end"]), int(r["end"] - r["start"]), int(r["cents"]),
             1 if i == last_i else 0)
        )
    o = g.iloc[last_i]
    state.update((int(o["seq"]), int(o["start"]), int(o["end"]),
                  int(o["events"]), int(o["cents"])))
    yield pd.DataFrame(out, columns=cols)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-sessionization; returns the (unstarted) stateful stream."""
    stream, ts_s = events_stream_source(spark, sf_dir, with_event_time=False)
    prepared = stream.select(
        "user_id",
        "event_id",
        ts_s.alias("ts_s"),
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DRAIN_COUNTER = [0]


def stream_sessionize_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface: drain the stateful stream to completion and return
    the sessions (closed + final open = exactly the batch answer; the batch
    ``sessionize`` oracle SQL verifies it)."""
    _DRAIN_COUNTER[0] += 1
    out = run_update_available_now(
        stream_sessionize(spark, sf_dir),
        f"t_reg_stateful_sessions_{_DRAIN_COUNTER[0]}",
    )
    return out.drop("open")


def run_update_available_now(df: DataFrame, table_name: str) -> DataFrame:
    """Drain a stateful stream (update mode) into a memory sink; returns the
    materialized rows (all emits; single-batch availableNow emits each
    (user, session) exactly once). Delegates to the shared drain helper
    (state-partition scoping included)."""
    from cassandra_sstable_tools_spark.streaming.events_stream import (
        run_available_now,
    )

    return run_available_now(df, table_name, mode="update")


# Oracle: the batch sessionize formulation (lag + running sum) -- the stateful
# stream drained with availableNow must produce exactly this.
from cassandra_sstable_tools_spark.queries.events import ORACLES as _EVENT_ORACLES

ORACLES = {
    "stream_sessionize_sessions": _EVENT_ORACLES["sessionize"],
}

QUERIES = {
    "stream_sessionize_sessions": stream_sessionize_sessions,
}
