"""Summary.db codec: round-trip fuzz, corruption loudness, byte-order
tripwires, and the planted differential proving scanned values come from
the files (SURVEY §5 binary-format playbook)."""

import os
import random
import shutil
import struct

import pytest

from cassandra_sstable_tools_spark.sources.summary_db import (
    BASE_SAMPLING_LEVEL,
    encode_summary_db,
    parse_summary_db,
    summary_entries,
)


def _random_index(rng, n):
    """File-ordered (key, position) entries; keys include non-UTF-8."""
    entries = []
    pos = 0
    for i in range(n):
        if i == 0:
            key = b"\x00first"  # control byte: exercises hex rendering paths
        else:
            key = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 24)))
        entries.append((key, pos))
        pos += rng.randrange(1, 10_000)
    return entries


def test_round_trip_fuzz():
    rng = random.Random(0x5E55)
    for trial in range(300):
        n = rng.randrange(1, 40)
        mii = rng.choice([1, 2, 4, 128])
        entries = _random_index(rng, n)
        buf = encode_summary_db(entries, min_index_interval=mii)
        parsed = parse_summary_db(buf, source=f"trial{trial}")
        assert parsed.min_index_interval == mii
        assert parsed.sampling_level == BASE_SAMPLING_LEVEL
        assert parsed.entries == entries[::mii]
        assert parsed.first_key == entries[0][0]
        assert parsed.last_key == entries[-1][0]
        assert parsed.size_at_full_sampling == len(parsed.entries)


def test_empty_index_rejected():
    with pytest.raises(ValueError, match="empty index"):
        encode_summary_db([])


def test_truncation_is_loud_at_every_byte():
    entries = [(b"alpha", 0), (b"beta", 100), (b"gamma", 222), (b"delta", 301)]
    buf = encode_summary_db(entries, min_index_interval=2)
    parse_summary_db(buf)
    for cut in range(len(buf)):
        with pytest.raises(ValueError, match="corrupt Summary.db"):
            parse_summary_db(buf[:cut], source="cut")


def test_trailing_garbage_is_loud():
    buf = encode_summary_db([(b"k", 0)], min_index_interval=1)
    with pytest.raises(ValueError, match="trailing bytes"):
        parse_summary_db(buf + b"\x00")


def test_byte_swapped_offsets_trip_the_first_offset_check():
    """The documented format-risk tripwire: if a real file stored offsets
    little-endian, entry 0's offset would not read back as 4*size."""
    entries = [(b"aa", 0), (b"bb", 10), (b"cc", 20)]
    buf = bytearray(encode_summary_db(entries, min_index_interval=1))
    n = 3
    for i in range(n):
        off = 24 + 4 * i
        buf[off : off + 4] = buf[off : off + 4][::-1]
    with pytest.raises(ValueError, match="entry 0 offset"):
        parse_summary_db(bytes(buf), source="swapped")


def test_non_monotonic_positions_are_loud():
    buf = bytearray(encode_summary_db([(b"aa", 0), (b"bb", 64)], 1))
    # entry 1's position is the last 8 bytes before the trailer; overwrite
    # with a value below entry 0's
    hdr = struct.unpack_from(">iiqii", buf, 0)
    entries_end = 24 + hdr[2]
    struct.pack_into(">q", buf, entries_end - 8, -5)
    with pytest.raises(ValueError, match="non-decreasing/non-negative"):
        parse_summary_db(bytes(buf), source="mono")


def test_tampered_trailer_first_key_is_loud():
    buf = bytearray(encode_summary_db([(b"aa", 0), (b"bb", 64)], 1))
    hdr = struct.unpack_from(">iiqii", buf, 0)
    entries_end = 24 + hdr[2]
    buf[entries_end + 4] ^= 0xFF  # first byte of the first trailer key
    with pytest.raises(ValueError, match="trailer first key"):
        parse_summary_db(bytes(buf), source="trailer")


def test_planted_position_differential(spark, sf_dir, tmp_path):
    """Scanned values must come from the FILES: rewriting one Summary.db
    with one sampled position nudged moves exactly that row of the scan."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
    )

    root = str(tmp_path / "tree")
    shutil.copytree(materialize_index_files(spark, sf_dir), root)
    victim = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in sorted(fs)
        if f.endswith("-Summary.db")
    )
    with open(victim, "rb") as f:
        parsed = parse_summary_db(f.read(), source=victim)
    if len(parsed.entries) < 2:
        pytest.skip("victim summary too small to nudge a non-first entry")
    base = {
        (r["table_name"], r["sstable_id"], r["summary_idx"]): r["index_position"]
        for r in summary_entries(spark, root).collect()
    }
    entries = list(parsed.entries)
    entries[-1] = (entries[-1][0], entries[-1][1] + 7)
    # re-encode at interval 1 over the SAMPLED entries: same sampled set
    with open(victim, "wb") as f:
        f.write(encode_summary_db(entries, min_index_interval=1))
    got = {
        (r["table_name"], r["sstable_id"], r["summary_idx"]): r["index_position"]
        for r in summary_entries(spark, root).collect()
    }
    moved = {k for k in base if base[k] != got.get(k)}
    vic_tb = os.path.basename(os.path.dirname(victim))
    vic_id = os.path.basename(victim).split("-")[1]
    assert moved == {(vic_tb, vic_id, len(entries) - 1)}
    assert got[(vic_tb, vic_id, len(entries) - 1)] == base[
        (vic_tb, vic_id, len(entries) - 1)
    ] + 7
