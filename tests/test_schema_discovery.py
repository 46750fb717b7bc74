"""On-disk schema discovery: read system_schema.columns sstables through
the engine's own codec and derive per-table key validators (reference
parity: CassandraBackend.java:36-39 boots the schema from disk,
ColumnFamilyBackend.java:164-166 renders keys via the validator)."""

from __future__ import annotations

import io
import contextlib
import struct

import pytest

from cassandra_sstable_tools_spark.sources import data_cells as dc
from cassandra_sstable_tools_spark.sources.data_db import (
    encode_partition_header,
)
from cassandra_sstable_tools_spark.sources.schema_discovery import (
    discover_key_types,
    discovered_key_type,
)
from cassandra_sstable_tools_spark.sources.statistics_db import (
    UTF8_TYPE,
    SerializationHeaderInfo,
    SSTableStats,
    encode_statistics_db,
)

_INT32 = "org.apache.cassandra.db.marshal.Int32Type"
_BYTES = "org.apache.cassandra.db.marshal.BytesType"

_COLUMNS_REGULARS = sorted([
    ("clustering_order", UTF8_TYPE),
    ("column_name_bytes", _BYTES),
    ("kind", UTF8_TYPE),
    ("position", _INT32),
    ("type", UTF8_TYPE),
])


def _columns_header() -> SerializationHeaderInfo:
    return SerializationHeaderInfo(
        min_timestamp=1_600_000_000_000_000,
        min_local_deletion_time=1_600_000_000,
        min_ttl=0,
        key_type=UTF8_TYPE,
        clustering_types=[UTF8_TYPE, UTF8_TYPE],
        static_columns=[],
        regular_columns=_COLUMNS_REGULARS,
    )


def _column_row(h, table: str, column: str, kind: str, position: int,
                cql_type: str, generation: int = 1) -> bytes:
    """One system_schema.columns row: clustering (table, column), cells
    kind/position/type sharing the row timestamp."""
    codec = dc._Codec(h)
    idx = {n: i for i, (n, _) in enumerate(h.regular_columns)}
    present = sorted([idx["kind"], idx["position"], idx["type"]])
    vals = {
        idx["kind"]: kind.encode(),
        idx["position"]: struct.pack(">i", position),
        idx["type"]: cql_type.encode(),
    }
    body = bytearray()
    body += codec.enc_ts(1_600_000_000_000_005 + generation)
    body += dc._enc_subset(present, len(h.regular_columns))
    for i in present:
        name, ctype = h.regular_columns[i]
        v = vals[i]
        body += bytes([dc.CELL_USE_ROW_TIMESTAMP])
        if ctype == _INT32:
            body += v  # fixed 4-byte
        else:
            body += dc.write_unsigned_vint(len(v)) + v
    row = bytearray([dc.HAS_TIMESTAMP])
    row += dc._enc_clustering_values(
        [table.encode(), column.encode()], h.clustering_types
    )
    row += dc.write_unsigned_vint(len(body))
    row += dc.write_unsigned_vint(0)
    row += body
    return bytes(row)


def plant_schema_tables(root, defs: list[tuple], generation: int = 1) -> None:
    """Write a real system_schema/columns-1f2e/ sstable under ``root``.
    ``defs``: (keyspace, table, column, kind, position, cql_type).
    ``generation`` numbers the sstable (flush generations) and scales the
    planted writetimes so later generations win LWW."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        encode_index_db,
    )

    h = _columns_header()
    by_ks: dict[str, list[tuple]] = {}
    for d in defs:
        by_ks.setdefault(d[0], []).append(d)
    blocks: list[bytes] = []
    entries: list[tuple[bytes, int]] = []
    pos = 0
    for ks in sorted(by_ks):
        body = encode_partition_header(ks.encode())
        for _ks, table, column, kind, position, cql in sorted(by_ks[ks]):
            body += _column_row(h, table, column, kind, position, cql,
                                generation=generation)
        body += b"\x01"  # END_OF_PARTITION
        entries.append((ks.encode(), pos))
        blocks.append(body)
        pos += len(body)
    d = root / "system_schema" / "columns-1f2e"
    d.mkdir(parents=True, exist_ok=True)
    base = str(d / f"nb-{generation:05d}-big-")
    with open(base + "Index.db", "wb") as f:
        f.write(encode_index_db(entries))
    with open(base + "Statistics.db", "wb") as f:
        f.write(encode_statistics_db(
            SSTableStats(min_timestamp=1), version="nb", header=h,
        ))
    with open(base + "Data.db", "wb") as f:
        f.write(b"".join(blocks))


_DEFS = [
    ("app", "events_by_id", "id", "partition_key", 0, "bigint"),
    ("app", "events_by_id", "ts", "clustering", 0, "timeuuid"),
    ("app", "events_by_id", "payload", "regular", -1, "text"),
    ("app", "users", "org", "partition_key", 0, "text"),
    ("app", "users", "uid", "partition_key", 1, "uuid"),
    ("app", "users", "name", "regular", -1, "text"),
    ("app", "blobs", "k", "partition_key", 0, "blob"),  # unmappable
    ("other", "t1", "pk", "partition_key", 0, "int"),
]


def test_discover_key_types(tmp_path):
    plant_schema_tables(tmp_path, _DEFS)
    types = discover_key_types(str(tmp_path))
    assert types == {
        ("app", "events_by_id"): "long",
        ("app", "users"): "composite(string,uuid)",
        ("other", "t1"): "int",
    }  # blobs omitted: unmappable -> heuristic fallback


def test_discovered_key_type_scoping(tmp_path):
    plant_schema_tables(tmp_path, _DEFS)
    root = str(tmp_path)
    assert discovered_key_type(root, "app", "events_by_id") == "long"
    assert discovered_key_type(root, "app", "blobs") is None
    # unscoped with mixed types: ambiguous -> None
    assert discovered_key_type(root, None, None) is None
    # keyspace-scoped with one shared type
    assert discovered_key_type(root, "other", None) == "int"


def test_discovery_absent_schema_is_silent(tmp_path):
    assert discover_key_types(str(tmp_path)) == {}
    assert discovered_key_type(str(tmp_path), "a", "b") is None


def test_cli_renders_discovered_long_keys(spark, tmp_path, capsys):
    """End-to-end: a long-keyed user table + planted schema tables; the
    lookup CLI renders the key numerically WITHOUT --key-type, from
    discovery alone (and an explicit --key-type string overrides)."""
    from test_lookup import _plant_sstable

    from cassandra_sstable_tools_spark.__main__ import main

    keys = [(300 + i).to_bytes(8, "big", signed=True) for i in range(6)]
    _plant_sstable(
        tmp_path, "org.apache.cassandra.dht.ByteOrderedPartitioner",
        deleted_key=keys[2], keys=keys,
    )
    plant_schema_tables(
        tmp_path, [("mks", "mtab", "id", "partition_key", 0, "bigint")]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            ["lookup", "--cassandra-dir", str(tmp_path), "-k", "302",
             "--keyspace", "mks", "--table", "mtab",
             "--sf-dir", "/root/testdata/sf0.001", "-b"],
            spark=spark,
        )
    assert rc == 0
    out = buf.getvalue()
    assert "302" in out
    assert "0x" not in out.split("Read-path audit")[0]  # typed, not hex


def test_keep_values_off_by_default():
    """The record frame never carries raw bytes: keep_values is a
    tooling-path opt-in."""
    h = _columns_header()
    block = (
        encode_partition_header(b"ks1")
        + _column_row(h, "t", "c", "regular", -1, "text")
        + b"\x01"
    )
    _, recs = dc.decode_partition_block(block, h, source="t")
    assert all(r.value_bytes is None and r.clustering_vals is None
               for r in recs)
    _, recs2 = dc.decode_partition_block(
        block, h, source="t", keep_values=True
    )
    assert any(r.value_bytes is not None for r in recs2)
    assert all(
        r.clustering_vals == (b"t", b"c") for r in recs2
    )


del pytest


def test_multi_sstable_dedup_and_lww(tmp_path):
    """A schema keyspace normally holds SEVERAL sstables (flush
    generations) repeating the same column defs: discovery must LWW-merge
    per column, never fabricate composite(long,long) from a duplicated
    bigint component -- and an ALTERed type in a newer generation wins."""
    defs = [("app", "t", "pk", "partition_key", 0, "bigint")]
    plant_schema_tables(tmp_path, defs, generation=1)
    plant_schema_tables(tmp_path, defs, generation=2)  # same def, flushed again
    assert discover_key_types(str(tmp_path)) == {("app", "t"): "long"}
    # generation 3 re-creates the table with a text key: newest wins
    plant_schema_tables(
        tmp_path, [("app", "t", "pk", "partition_key", 0, "text")],
        generation=3,
    )
    assert discover_key_types(str(tmp_path)) == {("app", "t"): "string"}
