"""BPE trainer differentials: the distributed trainer must equal (a) its
DuckDB chained-CTE oracle on the fixture corpus and (b) a plain-Python
sequential replay of the textbook algorithm (Sennrich et al. 2016) on a
synthesized corpus -- a third implementation independent of both engines.
Also pins the encoder: applying the trained merge list via
``bpe_apply_expr`` must reproduce the trainer's final corpus token count.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm import bpe
from tests.conftest import assert_matches_oracle


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


def _greedy_merge(toks, left, right):
    """Textbook Sennrich merge: left-to-right, non-overlapping, whole
    tokens only -- the sequential loop the engines' sentinel-wrapped
    replace must reproduce exactly."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _wrap(left, right):
    return f"\x1f{left}\x1f \x1f{right}\x1f"


def python_bpe(texts, rounds):
    """Sequential textbook BPE over TOKEN LISTS (no string representation
    at all -- independent of the engines' sentinel encoding).  Pair counts
    are overlap-counted (adjacent positions, the trainer's documented
    selection rule); merges apply via the greedy left-to-right loop.
    Returns pairs in the trainer's wrapped form; ties break by the wrapped
    string ASC, the engines' ORDER BY collation."""
    vocab = Counter(
        w for t in texts for w in t.strip().split() if w and "\x1f" not in w
    )
    state = {w: list(w) for w in vocab}
    out = []
    for rank in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, freq in vocab.items():
            toks = state[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max by (occ DESC, wrapped-pair ASC) -- the trainer's tie rule
        (left, right), occ = min(
            pairs.items(), key=lambda kv: (-kv[1], _wrap(*kv[0]))
        )
        state = {w: _greedy_merge(s, left, right) for w, s in state.items()}
        total = sum(freq * len(state[w]) for w, freq in vocab.items())
        out.append((rank, _wrap(left, right), occ, total))
    return out


def test_bpe_matches_oracle_on_fixture(spark, sf_dir, ddb):
    assert_matches_oracle(
        bpe.bpe_encode_stats(spark, sf_dir),
        bpe.ORACLES["bpe_encode_stats"],
        ddb,
    )


def test_bpe_matches_python_replay(spark, tmp_path):
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "lower lowest low slower slowest slow",
        "newer newest new wider widest wide",
        "aaaa aaab aaba abaa baaa aaaa",  # overlap-counting stressor
        "the the the lower newer",
    ] * 3
    sf = _write_docs(tmp_path, "bpe_sf", texts)
    got = bpe.train_bpe_merges(spark, sf, rounds=6)
    exp = python_bpe(texts, rounds=6)
    assert got == exp


def test_bpe_apply_reproduces_trained_state(spark, tmp_path):
    """Encoding with the trained merge list must land on exactly the
    trainer's final corpus_tokens -- the encoder and trainer share one
    definition of 'apply a merge'."""
    texts = ["banana bandana ban and sand banana", "and sand band banana"] * 4
    sf = _write_docs(tmp_path, "bpe_apply_sf", texts)
    rows = bpe.train_bpe_merges(spark, sf, rounds=5)
    assert rows, "trainer produced no merges"
    merges = [pair for _, pair, _, _ in rows]
    df = spark.read.parquet(f"{sf}/documents.parquet")
    total = df.select(
        F.sum(bpe.bpe_token_count_expr(F.col("text"), merges)).alias("n")
    ).first()["n"]
    assert int(total) == rows[-1][3]


def test_pack_chunks_bpe_matches_oracle_and_differs_from_regex(
    spark, sf_dir, ddb
):
    """The BPE-counted packing matches its train-replay oracle AND is
    non-trivially different from the regex-proxy packing (same schema,
    different token integers) -- the flag really swaps the counter."""
    got = bpe.pack_chunks_bpe(spark, sf_dir)
    assert_matches_oracle(got, bpe.ORACLES["pack_chunks_bpe"], ddb)
    from cassandra_sstable_tools_spark.llm.packing import pack_chunks

    n_diff = (
        got.alias("b")
        .join(pack_chunks(spark, sf_dir).alias("r"), "doc_id")
        .where(F.col("b.tokens") != F.col("r.tokens"))
        .count()
    )
    assert n_diff > 0, "BPE token counts identical to regex proxy -- vacuous flag"


def test_bpe_merge_respects_token_boundaries(spark, tmp_path):
    """r07 ADVICE #3 regression: after merging (t,h), the word 'other' is
    in state [o, th, e, r]; a later merge (h,e) must NOT fire inside it
    (the unwrapped substring replace matched 'h e' across the 'th'/'e'
    boundary and produced [o, the, r]).  Frequencies force (t,h) first,
    then (h,e); the boundary-correct python replay is the arbiter.  Also
    covers the self-overlapping run case (l,l) in 'hello'-like words."""
    texts = [
        "th th th th th th",  # forces (t,h) at rank 1
        "he he he he",      # forces (h,e) at rank 2
        "other other",      # the boundary trap: 'o th e r' contains 'h e'
        "hello llll",       # (l,l) run: greedy merges leftmost-first
    ]
    sf = _write_docs(tmp_path, "bpe_boundary_sf", texts)
    got = bpe.train_bpe_merges(spark, sf, rounds=4)
    exp = python_bpe(texts, rounds=4)
    assert got == exp
    ranked = [bpe.display_pair(p) for _, p, _, _ in got]
    assert ranked[0] == "t h" and ranked[1] == "h e"


def test_bpe_single_char_words_do_not_crash(spark, tmp_path):
    """Single-token words contribute no pairs but must stay in the corpus
    count (the sequence(1, 0) ANSI trap the trainer filters around)."""
    texts = ["a b c d e f", "a a b b", "ab ab"]
    sf = _write_docs(tmp_path, "bpe_one_sf", texts)
    got = bpe.train_bpe_merges(spark, sf, rounds=3)
    exp = python_bpe(texts, rounds=3)
    assert got == exp
