"""asof_join_last semantics on a hand-built fixture: <= inclusion, tie
resolution (max tiebreak), no-match nulls, and atomic payload structs."""

from __future__ import annotations

from cassandra_sstable_tools_spark.operators.asof import asof_join_last


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            # (id, key, t)
            (1, "a", 100),   # right rows at 90, 100 -> equal-t INCLUDED, tie -> max rid
            (2, "a", 95),    # only t=90 qualifies
            (3, "a", 50),    # nothing at-or-before -> nulls
            (4, "b", 10),    # key with no right rows at all -> nulls
        ],
        "id int, key string, t bigint",
    )
    right = spark.createDataFrame(
        [
            # (key, t, rid, rv)
            ("a", 90, 7, 700),
            ("a", 100, 8, 800),
            ("a", 100, 9, 900),  # same t as rid=8 -> tiebreak picks rid 9
            ("a", 120, 10, 1000),  # in the future of every left row
        ],
        "key string, t bigint, rid int, rv int",
    )
    out = {
        r.id: (r.rid, r.rv)
        for r in asof_join_last(
            left, right, keys=["key"], time_col="t",
            payload_cols=["rid", "rv"], tiebreak_col="rid",
        ).collect()
    }
    assert out[1] == (9, 900)     # <= includes equal t; max rid wins the tie
    assert out[2] == (7, 700)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_payload_atomic(spark):
    """Payload fields must come from the SAME right row even when a field
    is legitimately null on a later row."""
    left = spark.createDataFrame([(1, "k", 100)], "id int, key string, t bigint")
    right = spark.createDataFrame(
        [("k", 50, 1, 11), ("k", 60, 2, None)],
        "key string, t bigint, rid int, rv int",
    )
    (row,) = asof_join_last(
        left, right, keys=["key"], time_col="t",
        payload_cols=["rid", "rv"], tiebreak_col="rid",
    ).collect()
    # latest right row is (rid=2, rv=None): rv must be None, NOT 11 from
    # the older row.
    assert (row.rid, row.rv) == (2, None)
