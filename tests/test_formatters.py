"""X1-X3 + TableBuilder: literal expected strings (SURVEY.md §5.2) --
quirks replicated from /root/reference Util.java:42-98, TableBuilder.java."""

from cassandra_sstable_tools_spark.functions.humanize import (
    format_deletion_time,
    format_timestamp_ms,
    format_timestamp_us,
    human_bytes,
    human_date_diff,
)
from cassandra_sstable_tools_spark.report.table import TableBuilder


def test_human_bytes():
    assert human_bytes(0) == "0 B"
    assert human_bytes(999) == "999 B"
    assert human_bytes(1000) == "1.0 kB"
    assert human_bytes(1500) == "1.5 kB"
    assert human_bytes(123_456_789) == "123.5 MB"
    assert human_bytes(5_000_000_000) == "5.0 GB"
    assert human_bytes(1024, si=False) == "1.0 KiB"
    # Java HALF_UP: 1250/1000 = 1.25 -> "1.3" (Python %.1f would say 1.2)
    assert human_bytes(1250) == "1.3 kB"


def test_timestamps():
    assert format_timestamp_ms(0) == "1970-01-01 00:00:00.000"
    assert format_timestamp_ms(1_700_000_000_123) == "2023-11-14 22:13:20.123"
    assert format_timestamp_us(1_700_000_000_123_456) == "2023-11-14 22:13:20.123"
    assert format_deletion_time(2_147_483_647) == ""
    assert format_deletion_time(1_700_000_000) == "2023-11-14 22:13:20.000"


def test_date_diff_quirks():
    # minutes+seconds always present
    assert human_date_diff(0, 5_000) == "0m 5s"
    assert human_date_diff(0, 3_600_000) == "1h 0m 0s"
    assert human_date_diff(0, 90_061_000) == "1d 1h 1m 1s"
    # days with zero hours: hours omitted entirely (reference quirk)
    assert human_date_diff(0, 86_400_000 + 61_000) == "1d 1m 1s"
    # ceil seconds: 59.001s -> "0m 60s" (reference quirk)
    assert human_date_diff(0, 59_001) == "0m 60s"


def test_table_builder_alignment():
    tb = TableBuilder()
    tb.set_header("Name", "Size")
    tb.add_row("alpha", "10")
    tb.add_row("b", "2000")
    expected = (
        "+-------+------+\n"
        "| Name  | Size |\n"
        "+-------+------+\n"
        "| alpha |   10 |\n"
        "| b     | 2000 |\n"
        "+-------+------+\n"
    )
    assert str(tb) == expected


def test_table_builder_short_row():
    tb = TableBuilder()
    tb.set_header("A", "B")
    tb.add_row("x")
    assert str(tb) == (
        "+---+---+\n"
        "| A | B |\n"
        "+---+---+\n"
        "| x |\n"
        "+---+---+\n"
    )
