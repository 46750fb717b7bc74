"""Filter.db codec + Cassandra-variant murmur3: quirk pins, round-trip,
no-false-negative + FP-rate bounds, cleared-bit differential, corruption
loudness (SURVEY §5 binary-format playbook)."""

import os
import random
import shutil
import struct

import pytest

from cassandra_sstable_tools_spark.sources.bloom import (
    BloomFilterData,
    bloom_checks,
    bloom_indexes,
    build_filter,
    encode_filter_db,
    murmur3_x64_128,
    parse_filter_db,
)


def _canonical_unsigned_tail(key: bytes, seed: int = 0):
    """Reference murmur3 x64 128 with the CANONICAL unsigned tail, used to
    prove the Cassandra sign-extension quirk is live in our variant."""
    from cassandra_sstable_tools_spark.sources import bloom as B

    mask = (1 << 64) - 1
    length = len(key)
    nblocks = length // 16
    h1 = h2 = seed & mask
    for b in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", key, b * 16)
        k1 = (k1 * B._C1) & mask
        k1 = B._rotl64(k1, 31)
        k1 = (k1 * B._C2) & mask
        h1 ^= k1
        h1 = B._rotl64(h1, 27)
        h1 = (h1 + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        k2 = (k2 * B._C2) & mask
        k2 = B._rotl64(k2, 33)
        k2 = (k2 * B._C1) & mask
        h2 ^= k2
        h2 = B._rotl64(h2, 31)
        h2 = (h2 + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask
    tail = key[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    for i in range(t - 1, 7, -1):
        k2 ^= tail[i] << ((i - 8) * 8)  # UNSIGNED byte
    if t > 8:
        k2 = (k2 * B._C2) & mask
        k2 = B._rotl64(k2, 33)
        k2 = (k2 * B._C1) & mask
        h2 ^= k2
    for i in range(min(t, 8) - 1, -1, -1):
        k1 ^= tail[i] << (i * 8)  # UNSIGNED byte
    if t > 0:
        k1 = (k1 * B._C1) & mask
        k1 = B._rotl64(k1, 31)
        k1 = (k1 * B._C2) & mask
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = B._fmix64(h1)
    h2 = B._fmix64(h2)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    return B._signed64(h1), B._signed64(h2)


def test_murmur_deterministic_and_sensitive():
    rng = random.Random(7)
    for _ in range(200):
        key = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 48)))
        assert murmur3_x64_128(key) == murmur3_x64_128(key)
        if key:
            i = rng.randrange(len(key))
            flipped = key[:i] + bytes([key[i] ^ 0x01]) + key[i + 1 :]
            assert murmur3_x64_128(flipped) != murmur3_x64_128(key)
    assert murmur3_x64_128(b"") != murmur3_x64_128(b"\x00")


def test_signed64_range():
    rng = random.Random(8)
    for _ in range(100):
        key = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        h1, h2 = murmur3_x64_128(key)
        assert -(1 << 63) <= h1 < (1 << 63)
        assert -(1 << 63) <= h2 < (1 << 63)


def test_cassandra_signed_tail_quirk_is_live():
    """A high-bit byte in the TAIL must hash differently from canonical
    murmur3 (Cassandra sign-extends); a body-only input (length % 16 == 0)
    must hash identically (the quirk is tail-only)."""
    tail_key = b"\x80" * 3  # 3-byte tail, high bits set
    assert murmur3_x64_128(tail_key) != _canonical_unsigned_tail(tail_key)
    body_key = bytes(range(240, 256))  # 16 bytes: no tail at all
    assert murmur3_x64_128(body_key) == _canonical_unsigned_tail(body_key)
    low_key = b"\x01\x02\x03"  # tail bytes < 0x80: sign extension is a no-op
    assert murmur3_x64_128(low_key) == _canonical_unsigned_tail(low_key)


def test_bloom_indexes_java_semantics():
    # base advances by inc with signed-64 wraparound; indexes in range
    idx = bloom_indexes((1 << 62), (1 << 62), 5, 1000)
    assert all(0 <= i < 1000 for i in idx)
    # negative base: truncated-remainder abs, e.g. -7 % 5 -> 2 in Java
    assert bloom_indexes(-7, 0, 1, 5) == [2]
    assert bloom_indexes(7, 0, 1, 5) == [2]


def test_round_trip_and_no_false_negatives():
    rng = random.Random(0xB100)
    keys = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 32)))
        for _ in range(2000)
    ]
    f = build_filter(keys, hash_count=5, bits_per_key=10)
    parsed = parse_filter_db(encode_filter_db(f), source="rt")
    assert parsed.hash_count == f.hash_count
    assert parsed.words == f.words
    assert all(parsed.might_contain(k) for k in keys)


def test_false_positive_rate_bounded():
    rng = random.Random(0xFB)
    keys = [b"present-%d" % i for i in range(10_000)]
    f = build_filter(keys, hash_count=5, bits_per_key=10)
    absent = [b"absent-%d" % i for i in range(10_000)]
    fp = sum(f.might_contain(k) for k in absent)
    # theoretical ~0.9% at 10 bits/key, 5 hashes; 3% is a generous ceiling
    assert fp / len(absent) < 0.03, fp
    del rng


def test_cleared_bit_loses_the_key():
    keys = [b"k%d" % i for i in range(100)]
    f = build_filter(keys, hash_count=5, bits_per_key=10)
    victim = keys[37]
    h1, h2 = murmur3_x64_128(victim)
    bit = bloom_indexes(h1, h2, f.hash_count, f.num_bits)[0]
    f.words[bit >> 6] &= ~(1 << (bit & 63))
    assert not f.might_contain(victim)
    reparsed = parse_filter_db(encode_filter_db(f), source="cleared")
    assert not reparsed.might_contain(victim)


def test_corruption_is_loud():
    f = build_filter([b"a", b"b"], hash_count=5)
    buf = encode_filter_db(f)
    with pytest.raises(ValueError, match="header needs 8 bytes"):
        parse_filter_db(buf[:7], source="short")
    bad = struct.pack(">ii", 0, len(f.words)) + buf[8:]
    with pytest.raises(ValueError, match="implausible hashCount"):
        parse_filter_db(bad, source="hc")
    bad = struct.pack(">ii", 5, len(f.words) + 1) + buf[8:]
    with pytest.raises(ValueError, match="wordCount"):
        parse_filter_db(bad, source="wc")
    with pytest.raises(ValueError, match="wordCount"):
        parse_filter_db(buf + b"\x00" * 3, source="tail")


def test_bloom_checks_cleared_bit_differential(spark, sf_dir, tmp_path):
    """Scan-level proof values come from the files: clearing one set bit
    of one sstable's filter makes THAT sstable (and only that one) lose
    at least one key."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        materialize_index_files,
        stream_parse_index_db,
    )

    root = str(tmp_path / "tree")
    shutil.copytree(materialize_index_files(spark, sf_dir), root)
    base = bloom_checks(spark, root).collect()
    assert base and all(r["all_present"] for r in base)
    victim = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in sorted(fs)
        if f.endswith("-Filter.db")
    )
    with open(victim, "rb") as fh:
        filt = parse_filter_db(fh.read(), source=victim)
    index_path = victim[: -len("Filter.db")] + "Index.db"
    ver = os.path.basename(victim).split("-")[0]
    with open(index_path, "rb") as fh:
        first_key = next(iter(stream_parse_index_db(fh, version=ver,
                                                    source=index_path)))[0]
    h1, h2 = murmur3_x64_128(first_key)
    bit = bloom_indexes(h1, h2, filt.hash_count, filt.num_bits)[0]
    filt.words[bit >> 6] &= ~(1 << (bit & 63))
    with open(victim, "wb") as fh:
        fh.write(encode_filter_db(filt))
    got = {(r["table_name"], r["sstable_id"]): r
           for r in bloom_checks(spark, root).collect()}
    vic_tb = os.path.basename(os.path.dirname(victim))
    vic_id = os.path.basename(victim).split("-")[1]
    vic = got.pop((vic_tb, vic_id))
    assert not vic["all_present"]
    assert vic["present_count"] < vic["key_count"]
    assert all(r["all_present"] for r in got.values())


def test_filter_without_index_is_loud(spark, tmp_path):
    d = tmp_path / "ks" / "tb"
    d.mkdir(parents=True)
    f = build_filter([b"a"], hash_count=5)
    (d / "nb-00001-big-Filter.db").write_bytes(encode_filter_db(f))
    with pytest.raises(Exception, match="sibling Index.db"):
        bloom_checks(spark, str(tmp_path)).collect()


def test_scale_note_word_count():
    """The 100 TB sanity in numbers: 1e9 keys at 10 bits/key is ~1.2 GB of
    words — one task's budget, as the module docstring claims."""
    f = BloomFilterData(5, [0])
    assert f.num_bits == 64
    words = -(-(10**9 * 10) // 64)
    assert words * 8 < 1.3 * 2**30


def test_batch_murmur_matches_scalar():
    """The numpy murmur3 lanes must be BIT-identical to the scalar path:
    every length class 0..40 (block boundaries at 16/32, the 8-byte tail
    split), high-bit bytes (the sign-extended-tail quirk), random content."""
    import random

    import numpy as np

    from cassandra_sstable_tools_spark.sources.bloom import (
        murmur3_x64_128,
        murmur3_x64_128_batch,
    )

    rng = random.Random(42)
    keys = [bytes(rng.randrange(256) for _ in range(n)) for n in range(41)]
    keys += [bytes([0xFF] * n) for n in (1, 7, 8, 9, 15, 16, 17, 31, 33)]
    keys += [rng.randbytes(rng.randrange(64)) for _ in range(200)]
    got = murmur3_x64_128_batch(keys)
    exp = np.array([murmur3_x64_128(k) for k in keys], dtype=np.int64)
    assert (got == exp).all()


def test_batch_might_contain_matches_scalar():
    import random

    from cassandra_sstable_tools_spark.sources.bloom import (
        build_filter,
        might_contain_batch,
    )

    rng = random.Random(7)
    members = [rng.randbytes(rng.randrange(1, 32)) for _ in range(500)]
    f = build_filter(members, hash_count=5)
    probes = members + [rng.randbytes(rng.randrange(1, 32)) for _ in range(500)]
    got = might_contain_batch(f, probes)
    exp = [f.might_contain(k) for k in probes]
    assert got.tolist() == exp
    # no false negatives by construction
    assert got[: len(members)].all()
