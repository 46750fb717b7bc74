"""JSON-lines ingest: parquet-equivalence round trip + corrupt-line policy."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.sources.jsonl import (
    CORRUPT_COL,
    read_events_jsonl,
    split_quarantine,
)
from cassandra_sstable_tools_spark.sources.tpch_adapter import events_table


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """The same events serialized as JSONL read back row-identical to the
    parquet path (both normalized to canonical ts_s) -- downstream queries
    are source-agnostic."""
    e = events_table(spark, sf_dir).select(
        "event_id", "ts_s", "user_id", "event_type", "value", "props"
    )
    rows = e.collect()
    path = tmp_path / "events.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")

    got = read_events_jsonl(spark, str(path))
    clean, quarantine = split_quarantine(got)
    assert quarantine.count() == 0
    a = {tuple(r) for r in clean.collect()}
    b = {tuple(r) for r in rows}
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    """Malformed lines land in the quarantine frame verbatim; clean rows
    still parse. Neither job failure (FAILFAST) nor silent drop."""
    path = tmp_path / "mixed.jsonl"
    good = {"event_id": 1, "ts_s": 1000, "user_id": 7,
            "event_type": "click", "value": 1.5, "props": "{}"}
    with open(path, "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(good | {"event_id": 2}) + "\n")

    df = read_events_jsonl(spark, str(path))
    clean, quarantine = split_quarantine(df)
    assert clean.count() == 2
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("{this")
    # corrupted rows have every contract column null
    nulls = df.where(F.col(CORRUPT_COL).isNotNull()).select("event_id").collect()
    assert nulls[0]["event_id"] is None
