"""Sequential-model differential for per-language token budgeting: random
corpora where cumulative sums land EXACTLY on the budget boundary (the tie
the fixture never hits) plus quality-flag orderings."""

from __future__ import annotations

import random
import re

import pandas as pd

from cassandra_sstable_tools_spark.llm.curation import (
    MIXTURE_TOKEN_BUDGET,
    mixture_budget,
)
from cassandra_sstable_tools_spark.llm.text import _TOKEN_RE


def _write_docs(tmp_path, name, docs):
    sf = tmp_path / name
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[2] for d in docs],
            "lang": [d[1] for d in docs],
            "source": ["s0"] * len(docs),
            "n_chars": [len(d[2]) for d in docs],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


def _keep(text):
    n = len(text)
    words = len(text.strip().split()) if text.strip() else 0
    punct = len(re.findall(r"[^A-Za-z0-9\s]", text))
    return int(n >= 100 and words >= 20 and punct * 1000000 // n < 300000)


def sequential_model(docs):
    out = {}
    by_lang = {}
    for doc_id, lang, text in docs:
        by_lang.setdefault(lang, []).append((doc_id, text))
    for lang, ds in by_lang.items():
        scored = [
            (doc_id, len(re.findall(_TOKEN_RE, text)), _keep(text))
            for doc_id, text in ds
        ]
        scored.sort(key=lambda r: (-r[2], r[0]))
        cum = 0
        sel_docs = sel_tokens = 0
        for _, tokens, _k in scored:
            cum += tokens
            if cum <= MIXTURE_TOKEN_BUDGET:
                sel_docs += 1
                sel_tokens += tokens
        out[lang] = (
            len(scored),
            sum(t for _, t, _k in scored),
            sel_docs,
            sel_tokens,
        )
    return out


def test_mixture_budget_matches_model_incl_exact_boundary(spark, tmp_path):
    rng = random.Random(20260814)
    word = "tok"
    docs = []
    doc_id = 0
    for lang in ("aa", "bb"):
        # engineered boundary: first doc exactly consumes the whole budget
        # (cum == budget is SELECTED -- the <= tie), second doc overflows by 1
        docs.append((doc_id, lang, " ".join([word] * MIXTURE_TOKEN_BUDGET))); doc_id += 1
        docs.append((doc_id, lang, " ".join([word] * 1))); doc_id += 1
        for _ in range(6):
            docs.append(
                (doc_id, lang, " ".join([word] * rng.randrange(10, 5000)))
            ); doc_id += 1
    sf = _write_docs(tmp_path, "mix", docs)
    got = {
        r["lang"]: (
            r["total_docs"], r["total_tokens"],
            r["selected_docs"], r["selected_tokens"],
        )
        for r in mixture_budget(spark, sf).collect()
    }
    assert got == sequential_model(docs)
    # the boundary doc itself must be IN (cum == budget selects)
    for lang in ("aa", "bb"):
        assert got[lang][2] >= 1 and got[lang][3] >= MIXTURE_TOKEN_BUDGET
