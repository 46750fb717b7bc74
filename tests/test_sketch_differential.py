"""Third-implementation differentials for the sketch family: the registered
queries run end-to-end on SYNTHESIZED documents.parquet corpora (tmp sf_dir)
and must match a plain-Python replay of the sketch definitions (hashlib md5)
-- independent of both the Spark expressions and the DuckDB oracles."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pandas as pd

from cassandra_sstable_tools_spark.llm.corpus import (
    CMS_DEPTH,
    CMS_TOP_K,
    heavy_hitters_cms,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]


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


def python_cms(texts):
    counts = Counter(w for t in texts for w in t.strip().split())
    sketch = Counter()
    for w, c in counts.items():
        h = hashlib.md5(w.encode()).hexdigest()
        for i in range(CMS_DEPTH):
            sketch[(i, h[2 * i:2 * i + 2])] += c
    rows = []
    for w, c in counts.items():
        h = hashlib.md5(w.encode()).hexdigest()
        est = min(sketch[(i, h[2 * i:2 * i + 2])] for i in range(CMS_DEPTH))
        rows.append((w, c, est, est - c))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:CMS_TOP_K]


def test_cms_matches_python_model(spark, tmp_path):
    rng = random.Random(20260814)
    for trial in range(2):
        texts = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randrange(3, 40)))
            for _ in range(rng.choice([20, 120]))
        ]
        sf = _write_docs(tmp_path, f"cms{trial}", texts)
        got = [tuple(r) for r in heavy_hitters_cms(spark, sf).collect()]
        want = python_cms(texts)
        assert sorted(got) == sorted(want), f"trial {trial}"
        assert all(r[3] >= 0 for r in got)  # one-sided error invariant


def python_bloom(texts):
    from cassandra_sstable_tools_spark.llm.curation import (
        BLOOM_K,
        BLOOM_WORD,
        CONTAM_NGRAM,
        EVAL_NIBBLE,
    )

    def doc_grams(t):
        ws = t.strip().split()
        if len(ws) < CONTAM_NGRAM:
            return set()
        return {
            " ".join(ws[i:i + CONTAM_NGRAM])
            for i in range(len(ws) - CONTAM_NGRAM + 1)
        }

    def is_eval(d):
        return hashlib.md5(str(d).encode()).hexdigest()[0] == EVAL_NIBBLE

    def positions(ng):
        h = hashlib.md5(ng.encode()).hexdigest()
        return [int(h[4 * j:4 * j + 4], 16) for j in range(BLOOM_K)]

    grams = {d: doc_grams(t) for d, t in enumerate(texts)}
    eval_grams = set()
    for d, g in grams.items():
        if is_eval(d):
            eval_grams |= g
    # packed-word filter exactly as the engine builds it
    words = Counter()
    for ng in eval_grams:
        for p in positions(ng):
            words[p // BLOOM_WORD] |= 1 << (p % BLOOM_WORD)
    rows = []
    for d, g in grams.items():
        if is_eval(d):
            continue
        hits = sum(
            1
            for ng in g
            if all(
                words.get(p // BLOOM_WORD, 0) & (1 << (p % BLOOM_WORD))
                for p in positions(ng)
            )
        )
        exact = int(bool(g & eval_grams))
        rows.append((d, int(hits > 0), hits, exact, int(hits > 0) >= exact))
    return rows


def test_bloom_matches_python_model(spark, tmp_path):
    from cassandra_sstable_tools_spark.llm.curation import decontaminate_bloom

    rng = random.Random(20260814)
    texts = []
    for i in range(120):
        texts.append(
            " ".join(rng.choice(WORDS) for _ in range(rng.randrange(4, 30)))
        )
    # plant exact contamination: copy a few (soon-to-be-eval) docs verbatim
    evals = [d for d in range(120)
             if hashlib.md5(str(d).encode()).hexdigest()[0] == "f"]
    assert evals, "need at least one eval doc for the test to bite"
    for j, d in enumerate(evals[:3]):
        texts[(d + 1) % 120] = texts[d]
    sf = _write_docs(tmp_path, "bloom", texts)
    got = sorted(tuple(r) for r in decontaminate_bloom(spark, sf).collect())
    want = sorted(python_bloom(texts))
    assert got == want
    assert all(r[4] for r in got)  # no false negatives, ever


def test_exact_decontaminate_matches_python_model(spark, tmp_path):
    """The exact (broadcast-set) decontamination path against the same
    replay: per-doc overlapping-gram counts and flags."""
    from cassandra_sstable_tools_spark.llm.curation import (
        CONTAM_NGRAM,
        EVAL_NIBBLE,
        decontaminate_flags,
    )

    rng = random.Random(7)
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randrange(4, 30)))
        for _ in range(120)
    ]
    evals = [d for d in range(120)
             if hashlib.md5(str(d).encode()).hexdigest()[0] == EVAL_NIBBLE]
    for d in evals[:3]:
        texts[(d + 1) % 120] = texts[d]
    sf = _write_docs(tmp_path, "exact_decon", texts)

    def doc_grams(t):
        ws = t.strip().split()
        return {
            " ".join(ws[i:i + CONTAM_NGRAM])
            for i in range(len(ws) - CONTAM_NGRAM + 1)
        } if len(ws) >= CONTAM_NGRAM else set()

    grams = {d: doc_grams(t) for d, t in enumerate(texts)}
    eval_grams = set()
    for d in evals:
        eval_grams |= grams[d]
    want = {}
    for d, g in grams.items():
        if d in evals:
            continue
        hits = len(g & eval_grams)
        want[d] = (hits, int(hits > 0))
    got = {
        r["doc_id"]: (r["contaminated_ngrams"], r["contaminated"])
        for r in decontaminate_flags(spark, sf).collect()
    }
    assert got == want
