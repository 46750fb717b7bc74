"""Full cleaning-pipeline differential: corpus_keep_list replayed through a
literal Python model of all three stages (quality gate -> exact dedup ->
minhash-LSH near-dup drop with exact-Jaccard verification), on corpora
engineered to exercise every stage: low-quality docs, verbatim duplicates,
word-substitution near-duplicates, and shingle-less short docs."""

from __future__ import annotations

import hashlib
import random
import re

import pandas as pd

from cassandra_sstable_tools_spark.llm.dedup import (
    BAND_SIZE,
    JACCARD_THRESHOLD_PPM,
    N_BANDS,
    N_HASHES,
)
from cassandra_sstable_tools_spark.llm.pipeline import (
    MAX_PUNCT_PPM,
    MIN_CHARS,
    MIN_WORDS,
    corpus_keep_list,
)

VOCAB = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
         "adipiscing", "elit", "sed", "do", "eiusmod", "tempor"]


def _write_docs(tmp_path, name, texts):
    sf = tmp_path / name
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def sequential_pipeline(texts):
    # stage 1: quality
    def ok(t):
        n = len(t)
        words = len(t.strip().split()) if t.strip() else 0
        punct = len(re.findall(r"[^A-Za-z0-9\s]", t))
        return n >= MIN_CHARS and words >= MIN_WORDS and (
            punct * 1000000 // n < MAX_PUNCT_PPM
        )

    quality = [d for d, t in enumerate(texts) if ok(t)]
    # stage 2: exact dedup on normalized text, keep min doc_id
    by_norm = {}
    for d in quality:
        norm = re.sub(r"\s+", " ", texts[d].lower())
        by_norm.setdefault(norm, []).append(d)
    exact = sorted(min(ds) for ds in by_norm.values())
    # stage 3: minhash-LSH candidates + exact-Jaccard verify, drop doc_b
    def shingles(t):
        ws = t.strip().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)} \
            if len(ws) >= 3 else set()

    sh = {d: shingles(texts[d]) for d in exact}
    sigs = {}
    for d in exact:
        if not sh[d]:
            continue  # no shingle rows -> absent from the signature frame
        mh = [min(_md5(f"{j}#" + s) for s in sh[d]) for j in range(N_HASHES)]
        sigs[d] = [
            _md5("|".join(mh[b * BAND_SIZE + r] for r in range(BAND_SIZE)))
            for b in range(N_BANDS)
        ]
    buckets = {}
    for d, bands in sigs.items():
        for b, key in enumerate(bands):
            buckets.setdefault((b, key), []).append(d)
    cands = set()
    for ds in buckets.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                a, b = sorted((ds[i], ds[j]))
                cands.add((a, b))
    drops = set()
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        if union and inter * 1000000 // union >= JACCARD_THRESHOLD_PPM:
            drops.add(b)
    return sorted(set(exact) - drops)


def test_corpus_keep_list_matches_sequential_model(spark, tmp_path):
    rng = random.Random(20260814)
    texts = []
    # base pool of quality docs (>=100 chars, >=20 words)
    for _ in range(25):
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(rng.randrange(22, 60))))
    texts.append("short low quality !!!")                      # fails quality
    texts.append("%% " * 40)                                   # punct-heavy
    texts.append(texts[0])                                     # verbatim dup
    texts.append(texts[1].upper())                             # case-only dup
    near = texts[2].split()                                    # near-dup: one word swapped
    near[len(near) // 2] = "changed"
    texts.append(" ".join(near))
    sf = _write_docs(tmp_path, "pipe", texts)
    got = sorted(r["doc_id"] for r in corpus_keep_list(spark, sf).collect())
    want = sequential_pipeline(texts)
    assert got == want
