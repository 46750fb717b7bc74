"""CRC.db codec: round-trip, chunk math, corruption loudness, and the
flip-one-byte differential proving damage is LOCALIZED to one chunk
(SURVEY §5 binary-format playbook)."""

import os
import shutil
import struct
import zlib

import pytest

from cassandra_sstable_tools_spark.sources.crc_db import (
    crc_checks,
    encode_crc_db,
    parse_crc_db,
)


def _write(tmp_path, name, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


@pytest.mark.parametrize("size", [0, 1, 99, 100, 101, 250])
def test_round_trip_chunk_math(tmp_path, size):
    data = bytes((i * 7) % 256 for i in range(size))
    path = _write(tmp_path, f"d{size}.db", data)
    chunk_length, crcs = parse_crc_db(
        encode_crc_db(path, chunk_length=100), source="rt"
    )
    assert chunk_length == 100
    assert len(crcs) == (size + 99) // 100
    for i, stored in enumerate(crcs):
        assert stored == zlib.crc32(data[i * 100 : (i + 1) * 100]) & 0xFFFFFFFF


def test_corruption_is_loud(tmp_path):
    path = _write(tmp_path, "d.db", b"x" * 10)
    buf = encode_crc_db(path, chunk_length=4)
    with pytest.raises(ValueError, match="header needs 4 bytes"):
        parse_crc_db(buf[:3], source="short")
    with pytest.raises(ValueError, match="implausible chunk length"):
        parse_crc_db(struct.pack(">i", 0) + buf[4:], source="zero")
    with pytest.raises(ValueError, match="not a\n?.*multiple of 4|not a multiple"):
        parse_crc_db(buf + b"\x00", source="ragged")


def test_chunk_count_mismatch_is_loud(spark, tmp_path):
    d = tmp_path / "ks" / "tb"
    d.mkdir(parents=True)
    data = bytes(range(200))
    (d / "nb-00001-big-Data.db").write_bytes(data)
    data_path = str(d / "nb-00001-big-Data.db")
    crc = encode_crc_db(data_path, chunk_length=64)
    # drop the last CRC: claims fewer chunks than the Data.db length needs
    (d / "nb-00001-big-CRC.db").write_bytes(crc[:-4])
    with pytest.raises(Exception, match="expected"):
        crc_checks(spark, str(tmp_path)).collect()


def test_crc_without_data_is_loud(spark, tmp_path):
    d = tmp_path / "ks" / "tb"
    d.mkdir(parents=True)
    scratch = _write(tmp_path, "scratch", b"abc")
    (d / "nb-00001-big-CRC.db").write_bytes(encode_crc_db(scratch))
    with pytest.raises(Exception, match="sibling Data.db"):
        crc_checks(spark, str(tmp_path)).collect()


def test_flip_one_byte_localizes_to_one_chunk(spark, sf_dir, tmp_path):
    """The property Digest.crc32 cannot give: exactly ONE chunk of the
    damaged sstable mismatches, every other sstable stays fully ok."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = str(tmp_path / "tree")
    shutil.copytree(materialize_index_files(spark, sf_dir), root)
    base = crc_checks(spark, root).collect()
    assert base and all(r["crc_ok"] for r in base)
    assert all(r["matched"] == r["chunks"] for r in base)
    # damage one uncompressed Data.db that HAS a CRC.db sibling
    victim = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in sorted(fs)
        if f.endswith("-CRC.db")
    )
    data_path = victim[: -len("CRC.db")] + "Data.db"
    with open(data_path, "r+b") as f:
        f.seek(os.path.getsize(data_path) // 2)
        b = f.read(1)
        f.seek(-1, os.SEEK_CUR)
        f.write(bytes([b[0] ^ 0xFF]))
    got = {(r["table_name"], r["sstable_id"]): r
           for r in crc_checks(spark, root).collect()}
    vic_tb = os.path.basename(os.path.dirname(victim))
    vic_id = os.path.basename(victim).split("-")[1]
    vic = got.pop((vic_tb, vic_id))
    assert not vic["crc_ok"]
    assert vic["matched"] == vic["chunks"] - 1
    assert all(r["crc_ok"] for r in got.values())
