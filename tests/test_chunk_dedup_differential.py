"""Randomized differential: the distributed chunk-dedup rollup vs a literal
Python replay (chunking, corpus-wide copy counts, per-doc dup fraction).
Random corpora cover what the fixture can't: docs shorter than one chunk,
exact-length multiples, corpus-wide repeated chunks across many docs."""

from __future__ import annotations

import math
import random
from collections import Counter

from cassandra_sstable_tools_spark.llm.dedup import CHUNK_WORDS, chunk_dedup_over

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def chunks_of(norm: str) -> list[str]:
    ws = norm.split(" ")
    n = math.ceil(len(ws) / CHUNK_WORDS)
    return [" ".join(ws[i * CHUNK_WORDS:(i + 1) * CHUNK_WORDS]) for i in range(n)]


def sequential_model(docs: dict[int, str]) -> dict[int, tuple[int, int, int]]:
    freq = Counter(c for t in docs.values() for c in chunks_of(t))
    out = {}
    for doc_id, t in docs.items():
        cs = chunks_of(t)
        dup = sum(1 for c in cs if freq[c] > 1)
        out[doc_id] = (len(cs), dup, dup * 1_000_000 // len(cs))
    return out


def test_chunk_dedup_matches_sequential_model(spark):
    rng = random.Random(20260814)
    for trial in range(3):
        docs = {}
        for doc_id in range(rng.choice([5, 15, 30])):
            # sample with repetition-heavy vocabulary so chunks collide;
            # occasionally duplicate a previous doc verbatim
            if docs and rng.random() < 0.3:
                docs[doc_id] = docs[rng.choice(list(docs))]
            else:
                n = rng.choice([3, CHUNK_WORDS, CHUNK_WORDS + 7, 4 * CHUNK_WORDS])
                docs[doc_id] = " ".join(rng.choice(WORDS) for _ in range(n))
        frame = spark.createDataFrame(
            list(docs.items()), "doc_id long, norm string"
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_ppm"])
            for r in chunk_dedup_over(frame).collect()
        }
        assert got == sequential_model(docs), f"trial {trial}"


# --- content-defined chunking ------------------------------------------------

import hashlib

from cassandra_sstable_tools_spark.llm.dedup import (
    CDC_BOUNDARY_NIBBLES,
    chunk_dedup_cdc_over,
)


def cdc_chunks_of(norm: str) -> list[str]:
    ws = norm.split(" ")
    out, start = [], 0
    for i, w in enumerate(ws):
        last = i == len(ws) - 1
        if last or hashlib.md5(w.encode()).hexdigest()[0] in CDC_BOUNDARY_NIBBLES:
            out.append(" ".join(ws[start:i + 1]))
            start = i + 1
    return out


def cdc_sequential_model(docs: dict[int, str]) -> dict[int, tuple[int, int, int]]:
    freq = Counter(c for t in docs.values() for c in cdc_chunks_of(t))
    out = {}
    for doc_id, t in docs.items():
        cs = cdc_chunks_of(t)
        dup = sum(1 for c in cs if freq[c] > 1)
        out[doc_id] = (len(cs), dup, dup * 1_000_000 // len(cs))
    return out


# vocabulary wide enough that boundary nibbles occur but runs of
# non-boundary words exist too (md5 first nibble in ('0','1') has P=1/8)
CDC_WORDS = [f"tok{i}" for i in range(40)]


def test_cdc_chunk_dedup_matches_sequential_model(spark):
    rng = random.Random(20260814)
    for trial in range(3):
        docs = {}
        for doc_id in range(rng.choice([5, 15, 30])):
            if docs and rng.random() < 0.25:
                docs[doc_id] = docs[rng.choice(list(docs))]
            else:
                n = rng.choice([1, 3, 12, 45])
                docs[doc_id] = " ".join(rng.choice(CDC_WORDS) for _ in range(n))
        frame = spark.createDataFrame(
            list(docs.items()), "doc_id long, norm string"
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_ppm"])
            for r in chunk_dedup_cdc_over(frame).collect()
        }
        assert got == cdc_sequential_model(docs), f"trial {trial}"


def test_cdc_catches_shifted_duplicates_fixed_grid_misses(spark):
    """The reason CDC exists: the same passage planted at DIFFERENT word
    offsets in two documents. Fixed-grid chunks never align, so
    chunk_dedup_over sees zero duplicated chunks; CDC boundaries re-derive
    from content, so every interior CDC chunk of the passage collides."""
    rng = random.Random(7)
    # passage long enough to contain interior CDC chunks with high
    # probability (mean chunk ~8 words -> 60 words ≈ 7 chunks)
    passage = " ".join(rng.choice(CDC_WORDS) for _ in range(60))
    # distinct prefixes of CO-PRIME lengths so the fixed grid misaligns
    pre_a = " ".join(rng.choice(CDC_WORDS) for _ in range(3))
    pre_b = " ".join(rng.choice(CDC_WORDS) for _ in range(7))
    docs = {0: f"{pre_a} {passage}", 1: f"{pre_b} {passage}"}
    frame = spark.createDataFrame(list(docs.items()), "doc_id long, norm string")

    fixed = {r["doc_id"]: r["dup_chunks"] for r in chunk_dedup_over(frame).collect()}
    cdc = {r["doc_id"]: r["dup_chunks"] for r in chunk_dedup_cdc_over(frame).collect()}

    assert fixed == {0: 0, 1: 0}, "fixed grid unexpectedly aligned"
    assert cdc[0] >= 3 and cdc[1] >= 3, f"CDC missed the shifted passage: {cdc}"
    # both sides still match their sequential models on this corpus
    assert cdc == {k: v[1] for k, v in cdc_sequential_model(docs).items()}


def test_cdc_long_document_linear(spark):
    """Scale tripwire for the CDC chunker: ONE 20k-word document must
    chunk correctly and promptly. The array-lambda formulation this
    replaced was O(words^2) per document -- interpreted HOF lambdas
    re-evaluate inlined subexpressions per element -- and took >300s at
    2,000 words; the row-grain plan handles 128k words in under a second.
    A correct-but-quadratic refactor fails this test by wall-clock (the
    suite-level timeout), and the value assertions pin exactness."""
    rng = random.Random(99)
    docs = {0: " ".join(rng.choice(CDC_WORDS) for _ in range(20000))}
    frame = spark.createDataFrame(list(docs.items()), "doc_id long, norm string")
    import time

    t0 = time.monotonic()
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_ppm"])
        for r in chunk_dedup_cdc_over(frame).collect()
    }
    elapsed = time.monotonic() - t0
    assert got == cdc_sequential_model(docs)
    assert elapsed < 60, f"CDC chunker took {elapsed:.0f}s on one 20k-word doc"

    # same tripwire for the FIXED grain (its array formulation was also
    # quadratic, factor ~1/CHUNK_WORDS: 7s at 32k words, timeout at 64k)
    t0 = time.monotonic()
    got_fixed = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_ppm"])
        for r in chunk_dedup_over(frame).collect()
    }
    elapsed = time.monotonic() - t0
    assert got_fixed == sequential_model(docs)
    assert elapsed < 60, f"fixed chunker took {elapsed:.0f}s on one 20k-word doc"
