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
