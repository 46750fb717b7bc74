"""BPE tokenizer: iterative merge TRAINING and merge APPLICATION.

``bpe_pair_counts`` (llm/corpus.py) computes the counting statistic of one
merge round; until r07 the engine could not TRAIN a merge list or APPLY
one -- token counts elsewhere are regex/whitespace proxies (r06 VERDICT
#7). This module closes that: a bounded-round trainer whose per-round
plan is the certified iterative-operator shape (vocabulary-grain
aggregation + 1-row argmax collect + a codegen string rewrite), and an
encoder that applies a trained merge list to any text column.

Semantics (standard BPE, Sennrich et al. 2016 -- public knowledge):
- a word starts as its character sequence, carried as a space-joined
  string of SENTINEL-WRAPPED tokens: "hello" ->
  "\\x1fh\\x1f \\x1fe\\x1f \\x1fl\\x1f \\x1fl\\x1f \\x1fo\\x1f" (U+001F
  unit separator around every token);
- training round r: count adjacent token pairs across the vocabulary
  weighted by word frequency, pick the most frequent (ties: pair ASC,
  deterministic), merge every non-overlapping occurrence left-to-right;
- applying merge (l, r) IS ``replace(s, '\\x1fl\\x1f \\x1fr\\x1f',
  '\\x1flr\\x1f')``. The sentinels make the plain substring replace
  token-boundary-EXACT (r07 ADVICE #3: the unwrapped form merged pairs
  matching INSIDE longer tokens, e.g. ('h','e') inside 'th e'): the
  leading sentinel pins l to a token START, the trailing one pins it to
  the token END, so a match is precisely two whole adjacent tokens.
  Because each token carries its OWN delimiters and the pattern has no
  trailing separator, adjacent occurrences share no characters -- a
  left-to-right non-overlapping scan (both Spark's UTF8String.replace and
  DuckDB's replace) therefore replays Sennrich's greedy merge order
  exactly, including self-overlapping runs like 'l l' in "hello". (The
  advice suggested regex lookarounds; DuckDB's RE2 silently matches
  nothing on lookbehind, so the sentinel representation is the form both
  engines can actually execute.) Words containing U+001F itself are
  excluded from the vocabulary and the token counter (both engines), the
  one reserved codepoint of the representation.

Scale posture: everything runs at the VOCABULARY grain (sublinear in
corpus size; the corpus scan collapses to (word, freq) once, with
map-side combine). Per round: one pair-explode aggregation (rows =
total tokens across vocab, shrinking every round), one 1-row argmax
collect (a K-row seed in the k-means sense, not a driver loop over
data), and one whole-stage-codegen replace. Rounds are a fixed budget
(BPE_MERGE_ROUNDS), like pagerank's -- the result is bit-exact and
SQL-unrollable. Encoding with a trained list is a pure per-row
expression chain (R nested replaces) -- no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

BPE_MERGE_ROUNDS = 8

# U+001F unit separator: the token-boundary sentinel. SEP never appears in
# admissible words (they are filtered), so "\x1ftok\x1f" delimits tokens
# unambiguously and substring replace cannot cross a boundary.
SEP = "\x1f"


def _wrap_chars(col: Column) -> Column:
    """word -> space-joined sentinel-wrapped character tokens."""
    return F.array_join(
        F.transform(
            F.split(col, ""),
            lambda c: F.concat(F.lit(SEP), c, F.lit(SEP)),
        ),
        " ",
    )


def merge_target(pair: str) -> str:
    """The replacement token for a wrapped pair: '\\x1fl\\x1f \\x1fr\\x1f'
    -> '\\x1flr\\x1f' (drop the inner boundary)."""
    return pair.replace(f"{SEP} {SEP}", "")


def display_pair(pair: str) -> str:
    """Sentinel-free human form of a wrapped pair ('\\x1ft\\x1f \\x1fh\\x1f'
    -> 't h') -- the registered certificate's pair column."""
    return pair.replace(SEP, "")


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, s) with s = space-joined sentinel-wrapped char tokens.
    Words containing the sentinel codepoint are excluded (they would
    corrupt the boundary encoding); the oracle applies the same filter."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).where((F.length("word") >= 1) & ~F.col("word").contains(SEP))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("s", _wrap_chars(F.col("word")))
    )


def train_bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_MERGE_ROUNDS
) -> list[tuple[int, str, int, int]]:
    """Train ``rounds`` merges; returns [(rank, pair, occurrences,
    corpus_tokens_after)] where ``pair`` is the space-joined
    SENTINEL-WRAPPED token pair chosen at that rank (strip with
    ``display_pair`` for humans), ``occurrences`` its (overlap-counted)
    frequency at selection time, and ``corpus_tokens_after`` the
    freq-weighted total token count across the corpus AFTER applying
    merges 1..rank -- a cumulative certificate: rank r's count is only
    right if every earlier replace was."""
    vocab = _vocab(spark, sf_dir).persist()
    out: list[tuple[int, str, int, int]] = []
    cur = vocab
    try:
        for rank in range(1, rounds + 1):
            # single-token words first: sequence(1, 0) would DESCEND and
            # element_at(_, 0) errors under ANSI -- filter, don't guard
            pairs = (
                cur.where(F.size(F.split(F.col("s"), " ")) >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(split(s, ' ')) - 1), "
                            "i -> concat(element_at(split(s, ' '), i), ' ', "
                            "element_at(split(s, ' '), i + 1)))"
                        )
                    ).alias("pair"),
                    "freq",
                )
            )
            best = (
                pairs.groupBy("pair")
                .agg(F.sum("freq").alias("occ"))
                .orderBy(F.desc("occ"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair, occ = best[0]["pair"], int(best[0]["occ"])
            cur = cur.withColumn(
                "s", F.replace(F.col("s"), F.lit(pair), F.lit(merge_target(pair)))
            ).localCheckpoint(eager=True)
            tokens_after = int(
                cur.agg(
                    F.sum(F.col("freq") * F.size(F.split(F.col("s"), " ")))
                ).first()[0]
            )
            out.append((rank, pair, occ, tokens_after))
    finally:
        vocab.unpersist()
    return out


def bpe_apply_expr(col: Column, merges: list[str]) -> Column:
    """Token string (sentinel-wrapped form) after applying a trained merge
    list to a word column: wrapped chars joined by space, then each
    merge's boundary-exact replace IN RANK ORDER -- one nested codegen
    expression, no shuffle, no Python. ``merges`` holds the wrapped
    space-joined pairs from ``train_bpe_merges``."""
    s = _wrap_chars(col)
    for pair in merges:
        s = F.replace(s, F.lit(pair), F.lit(merge_target(pair)))
    return s


def bpe_token_count_expr(col: Column, merges: list[str]) -> Column:
    """BPE token count of a whitespace-tokenized TEXT column under a
    trained merge list: per word, tokens = chars - merges applied;
    summed via the same split/transform shape as the trainer.  Empty
    words are filtered exactly like the trainer's vocab (so all-space
    text counts 0, and NULL text stays NULL -- every HOF propagates the
    NULL array).  Per-element work depends only on the lambda variable,
    so the r06 inlined-subexpression quadratic cannot apply.  Used by
    sequence packing's opt-in BPE counter (`pack_chunks_bpe`)."""
    words = F.filter(
        F.split(F.trim(col), r"\s+"),
        lambda w: (F.length(w) >= 1) & ~w.contains(SEP),
    )
    word_counts = F.transform(
        words,
        lambda w: F.size(F.split(bpe_apply_expr(w, merges), " ")),
    )
    return F.aggregate(
        word_counts, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered training+application certificate: one row per merge
    rank with the chosen pair, its selection-time frequency, and the
    corpus token count after applying merges 1..rank. The DuckDB oracle
    replays the identical sequential recurrence as chained CTEs (argmax
    scalar subqueries + the same left-to-right replace), so a hash match
    proves the distributed trainer equals the sequential definition --
    the pagerank-unrolled-SQL pattern applied to tokenizer training."""
    rows = [
        (rank, display_pair(pair), occ, toks)
        for rank, pair, occ, toks in train_bpe_merges(spark, sf_dir)
    ]
    return spark.createDataFrame(
        rows, "rank int, pair string, occurrences bigint, corpus_tokens bigint"
    )


def _oracle_ctes(rounds: int) -> str:
    """The WITH-clause body replaying training rounds 1..``rounds``:
    v0 (vocab), then per round p{r} (pair counts), best{r} (argmax),
    v{r} (state after the merge).  Shared by the stats oracle and the
    packing oracle so the training replay has ONE SQL definition.

    MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and v{r}
    references BOTH v{r-1} and best{r} (which re-derives v{r-1} via
    p{r}), so un-materialized expansion is exponential in rounds --
    the sf0.001 oracle ran past 300s at rounds=8.  Materialized, each
    CTE evaluates once and the replay is linear."""
    parts = [
        r"""v0 AS MATERIALIZED (
    SELECT word, count(*) AS freq,
           array_to_string(list_transform(string_split(word, ''),
                                          c -> chr(31) || c || chr(31)),
                           ' ') AS s
    FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents WHERE text IS NOT NULL
    ) w
    WHERE length(word) >= 1 AND NOT contains(word, chr(31))
    GROUP BY 1
)"""
    ]
    # merge_target in SQL: drop the inner boundary '\x1f \x1f' of the pair
    for r in range(1, rounds + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
    SELECT pr.pair, CAST(sum(freq) AS BIGINT) AS occ
    FROM v{r - 1} v,
         LATERAL (
             SELECT ws[i] || ' ' || ws[i + 1] AS pair
             FROM (SELECT string_split(v.s, ' ') AS ws) t,
                  LATERAL (SELECT unnest(range(1, len(ws))) AS i) u
         ) pr
    GROUP BY 1
),
best{r} AS MATERIALIZED (SELECT pair, occ FROM p{r} ORDER BY occ DESC, pair ASC LIMIT 1),
v{r} AS MATERIALIZED (
    SELECT word, freq,
           replace(s, (SELECT pair FROM best{r}),
                   replace((SELECT pair FROM best{r}),
                           chr(31) || ' ' || chr(31), '')) AS s
    FROM v{r - 1}
)""")
    return ",\n".join(parts)


def _bpe_oracle(rounds: int = BPE_MERGE_ROUNDS) -> str:
    selects = [
        # EXISTS guard = the trainer's break: an empty pair frame ends
        # training (and stays empty in every later round, so per-branch
        # guards equal a stop-at-first-empty)
        f"""SELECT {r} AS rank,
       (SELECT replace(pair, chr(31), '') FROM best{r}) AS pair,
       (SELECT occ FROM best{r}) AS occurrences,
       (SELECT CAST(sum(freq * len(string_split(s, ' '))) AS BIGINT)
        FROM v{r}) AS corpus_tokens
WHERE EXISTS (SELECT 1 FROM best{r})"""
        for r in range(1, rounds + 1)
    ]
    return (
        "WITH "
        + _oracle_ctes(rounds)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY rank"
    )


def pack_chunks_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing with a TRAINED tokenizer: train the merge list on
    the corpus, then pack with ``bpe_token_count_expr`` in place of the
    regex proxy -- the full train->tokenize->pack pipeline as one
    certified query.  The packing plan (hierarchical prefix sum) is
    byte-identical to ``pack_chunks``; only the scan-level token
    expression changes, so the 100 TB argument carries over unchanged.
    Training cost is vocabulary-grain and amortizes over the corpus
    scan it saves nothing to skip (a real pipeline trains once and
    reuses; the query retrains so the certificate covers training)."""
    from cassandra_sstable_tools_spark.llm.packing import pack_chunks

    merges = [pair for _, pair, _, _ in train_bpe_merges(spark, sf_dir)]
    return pack_chunks(
        spark, sf_dir, token_expr=lambda c: bpe_token_count_expr(c, merges)
    )


def _pack_bpe_oracle(rounds: int = BPE_MERGE_ROUNDS) -> str:
    """Training replay CTEs + a per-ROW list-lambda token counter (no
    doc_id grouping, mirroring Spark's pure-expression counter exactly --
    a groupBy-based oracle would merge NULL-doc_id dirty rows) + the
    shared packing window tail."""
    from cassandra_sstable_tools_spark.llm.packing import PACK_ORACLE_TAIL

    # replace chain over an outer-column pair list: r_i(x) = replace(x,
    # p_i, merge_target(p_i)); bests is a 1-row frame cross-joined to
    # documents.
    chain = (
        "array_to_string(list_transform(string_split(w, ''), "
        "c -> chr(31) || c || chr(31)), ' ')"
    )
    for r in range(1, rounds + 1):
        chain = (
            f"replace({chain}, p{r}, "
            f"replace(p{r}, chr(31) || ' ' || chr(31), ''))"
        )
    bests = ", ".join(
        f"(SELECT pair FROM best{r}) AS p{r}" for r in range(1, rounds + 1)
    )
    return f"""WITH {_oracle_ctes(rounds)},
bests AS MATERIALIZED (SELECT {bests}),
scored AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.text IS NULL THEN NULL
              ELSE coalesce(CAST(list_sum(list_transform(
                  list_filter(string_split_regex(trim(d.text), '\\s+'),
                              w -> length(w) >= 1
                                   AND NOT contains(w, chr(31))),
                  w -> len(string_split({chain}, ' '))
              )) AS BIGINT), 0) END AS tokens
  FROM documents d CROSS JOIN bests
),
{PACK_ORACLE_TAIL}"""


QUERIES = {
    "bpe_encode_stats": bpe_encode_stats,
    "pack_chunks_bpe": pack_chunks_bpe,
}
ORACLES = {
    "bpe_encode_stats": _bpe_oracle(),
    "pack_chunks_bpe": _pack_bpe_oracle(),
}
