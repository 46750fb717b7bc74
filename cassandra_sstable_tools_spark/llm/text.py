"""Text-analysis operators for LLM training-data pipelines.

All hot-path logic is built-in JVM expressions (regexp_count, split, length)
-- no Python UDFs -- so each query is a single whole-stage-codegen'd scan +
(at most) one small aggregation. At 100 TB: embarrassingly parallel per-doc
maps; ratios are emitted as integer ppm (exact, hash-stable across engines).

Operators:
- text_stats:    char/word/distinct-word counts per document
- token_count:   BPE-ish tokenization count (word-or-punct regex)
- text_quality:  punctuation / digit / uppercase / stopword ratios (ppm)
                 + composite quality flag
- lang_id:       stopword-vote language guesser (en/de/fr/es) with
                 deterministic tie-breaking
- fingerprint:   whitespace-normalized md5 document fingerprint
- doc_repetition: Gopher-style intra-document repetition signals
                 (duplicate-word / duplicate-bigram fractions, ppm)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

# BPE-ish: runs of alphanumerics OR single non-space punctuation.
_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Stopword vote sets per language (tiny, deterministic heuristic).
_LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|a)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "fr": r"\b(le|la|les|et|est|un|une)\b",
    "es": r"\b(el|la|los|las|y|es|un|una)\b",
}


def _word_count(col):
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc structural stats: char length, word and distinct-word counts,
    integer avg word span -- single codegen scan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("char_len"),
        _word_count(F.col("text")).alias("word_count"),
        F.size(F.array_distinct(words)).alias("distinct_words"),
        F.floor(F.length("text") / _word_count(F.col("text"))).alias("avg_word_span"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens AND a BPE-ish regex token count per doc (the
    pre-tokenization budget estimate) -- pure regexp_count expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_TOKEN_RE)).alias("token_count"),
        F.regexp_count("text", F.lit(r"[A-Za-z0-9]+")).alias("word_tokens"),
        F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).alias("punct_tokens"),
    )


# Composite keep-predicate thresholds, shared by text_quality,
# source_quality_matrix and their oracles -- tighten them in ONE place.
KEEP_MIN_CHARS = 100
KEEP_MIN_WORDS = 20
KEEP_MAX_PUNCT_PPM = 300000


def _keep_flag(char_len, word_count, punct_ppm):
    """The composite keep predicate as a Column (nonempty text assumed:
    punct_ppm divides by char_len, and char_len >= KEEP_MIN_CHARS already
    excludes empty rows from ever keeping). Coalesced to false so a NULL
    text (dirty row -> every signal NULL -> three-valued predicate NULL)
    is DROPPED, matching every oracle's CASE ... ELSE 0."""
    return F.coalesce(
        (char_len >= KEEP_MIN_CHARS)
        & (word_count >= KEEP_MIN_WORDS)
        & (punct_ppm < KEEP_MAX_PUNCT_PPM),
        F.lit(False),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals as exact integer ppm of char_len; composite keep-flag."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]"))
    digit = F.regexp_count("text", F.lit(r"[0-9]"))
    upper = F.regexp_count("text", F.lit(r"[A-Z]"))
    stop = F.regexp_count(F.lower("text"), F.lit(_LANG_STOPWORDS["en"]))
    wc = _word_count(F.col("text"))
    out = d.select(
        "doc_id",
        n.alias("char_len"),
        F.floor(punct * 1000000 / n).alias("punct_ppm"),
        F.floor(digit * 1000000 / n).alias("digit_ppm"),
        F.floor(upper * 1000000 / n).alias("upper_ppm"),
        stop.alias("stopword_hits"),
        wc.alias("word_count"),
    )
    return out.withColumn(
        "keep",
        _keep_flag(
            F.col("char_len"), F.col("word_count"), F.col("punct_ppm")
        ).cast("int"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID; deterministic argmax (score desc, code asc)."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    scores = [
        F.struct(
            F.regexp_count(lowered, F.lit(pat)).alias("score"),
            F.lit(code).alias("code"),
        )
        for code, pat in sorted(_LANG_STOPWORDS.items())
    ]
    # array_max on struct compares (score, code) lexicographically; to get
    # "highest score, ties -> alphabetically first code" invert the code order
    # via sort + element_at after sorting desc by (score, -code) is messy;
    # instead pick via array_sort with custom comparator-free trick:
    # max on (score, negcode) where negcode sorts reversed strings.
    arr = F.array(*scores)
    best = F.array_max(arr)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best["code"].alias("guessed_lang"),
        best["score"].alias("vote_score"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized md5 fingerprint (doc identity for exact dedup)."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.substring(F.md5(normalized), 1, 16).alias("fingerprint16"),
    )


def _ppm(num, den):
    """Exact integer parts-per-million with a zero-denominator guard."""
    return F.when(den > 0, F.floor(num * 1000000 / den)).otherwise(
        F.lit(0)
    ).cast("bigint")


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher/MassiveText repetition rules'
    shape): fraction of duplicate words and duplicate word-bigrams per doc,
    as exact integer ppm.

    Scale posture: computed ENTIRELY with array expressions
    (split / array_distinct / transform+slice) inside one whole-stage-codegen
    scan -- no explode, no shuffle, no Python. A 100 TB corpus runs this as
    an embarrassingly parallel map."""
    d = load_table(spark, sf_dir, "documents")
    empty = F.length(F.trim(F.col("text"))) == 0
    w = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select(
        "doc_id",
        F.when(empty, F.expr("CAST(array() AS array<string>)"))
        .otherwise(w)
        .alias("w"),
    )
    # Bigrams via the same 1-based slice construction as the decontamination
    # n-grams (llm/curation.py) so Spark and DuckDB index identically.
    staged = base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("words"),
        F.size(F.array_distinct("w")).cast("bigint").alias("distinct_words"),
        F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2),"
            " i -> array_join(slice(w, i + 1, 2), ' ')) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("bg"),
    )
    return staged.select(
        "doc_id",
        "words",
        "distinct_words",
        _ppm(F.col("words") - F.col("distinct_words"), F.col("words")).alias(
            "dup_word_ppm"
        ),
        F.size("bg").cast("bigint").alias("bigrams"),
        F.size(F.array_distinct("bg")).cast("bigint").alias("distinct_bigrams"),
        _ppm(
            F.size("bg") - F.size(F.array_distinct("bg")), F.size("bg")
        ).alias("dup_bigram_ppm"),
    )


_WC_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)

ORACLES = {
    "text_stats": f"""
SELECT doc_id, lang, source,
       length(text) AS char_len,
       {_WC_SQL} AS word_count,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS distinct_words,
       CAST(floor(length(text) / ({_WC_SQL})) AS BIGINT) AS avg_word_span
FROM documents
""",
    "token_count": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS token_count,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS word_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS punct_tokens
FROM documents
""",
    "text_quality": rf"""
SELECT doc_id,
       length(text) AS char_len,
       CAST(floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000
                  / length(text)) AS BIGINT) AS punct_ppm,
       CAST(floor(len(regexp_extract_all(text, '[0-9]')) * 1000000
                  / length(text)) AS BIGINT) AS digit_ppm,
       CAST(floor(len(regexp_extract_all(text, '[A-Z]')) * 1000000
                  / length(text)) AS BIGINT) AS upper_ppm,
       len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b'))
           AS stopword_hits,
       {_WC_SQL} AS word_count,
       CASE WHEN length(text) >= {KEEP_MIN_CHARS} AND ({_WC_SQL}) >= {KEEP_MIN_WORDS}
                 AND floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000
                           / length(text)) < {KEEP_MAX_PUNCT_PPM}
            THEN 1 ELSE 0 END AS keep
FROM documents
""",
    "fingerprint": r"""
SELECT doc_id,
       md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
       substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fingerprint16
FROM documents
""",
    # argmax(score, code): highest score wins, ties -> lexicographically
    # largest code (mirrors Spark's struct array_max ordering).
    "lang_id": r"""
WITH scores AS (
    SELECT doc_id, lang AS labeled_lang, 'de' AS code,
           len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein)\b')) AS score
    FROM documents
    UNION ALL
    SELECT doc_id, lang, 'en',
           len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b'))
    FROM documents
    UNION ALL
    SELECT doc_id, lang, 'es',
           len(regexp_extract_all(lower(text), '\b(el|la|los|las|y|es|un|una)\b'))
    FROM documents
    UNION ALL
    SELECT doc_id, lang, 'fr',
           len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|un|une)\b'))
    FROM documents
)
SELECT doc_id, labeled_lang, code AS guessed_lang, score AS vote_score
FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, code DESC) AS rn
      FROM scores)
WHERE rn = 1
""",
    # Explode-based formulation (different physical shape, same integers).
    "doc_repetition": r"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS w
  FROM documents
),
wstats AS (
  SELECT doc_id, len(w) AS words, len(list_distinct(w)) AS distinct_words
  FROM docs
),
bg AS (
  SELECT d.doc_id, array_to_string(w[i:i+1], ' ') AS gram
  FROM docs d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
bstats AS (
  SELECT doc_id, count(*) AS bigrams, count(DISTINCT gram) AS distinct_bigrams
  FROM bg GROUP BY 1
)
SELECT s.doc_id,
       CAST(s.words AS BIGINT) AS words,
       CAST(s.distinct_words AS BIGINT) AS distinct_words,
       CASE WHEN s.words > 0
            THEN CAST(floor((s.words - s.distinct_words) * 1000000 / s.words)
                 AS BIGINT) ELSE 0 END AS dup_word_ppm,
       CAST(coalesce(b.bigrams, 0) AS BIGINT) AS bigrams,
       CAST(coalesce(b.distinct_bigrams, 0) AS BIGINT) AS distinct_bigrams,
       CASE WHEN coalesce(b.bigrams, 0) > 0
            THEN CAST(floor((b.bigrams - b.distinct_bigrams) * 1000000
                            / b.bigrams) AS BIGINT) ELSE 0 END AS dup_bigram_ppm
FROM wstats s LEFT JOIN bstats b USING (doc_id)
""",
}

QUERIES = {
    "text_stats": text_stats,
    "token_count": token_count,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "fingerprint": fingerprint,
    "doc_repetition": doc_repetition,
}


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality matrix: labeled lang x guessed lang doc counts.
    The evaluation view of ``lang_id`` (e.g. 'zh' documents can only land in
    a wrong cell -- the guesser votes over en/de/fr/es stopwords only).
    Aggregate of an aggregate: one extra narrow shuffle over lang_id's
    per-doc output."""
    return (
        lang_id(spark, sf_dir)
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


ORACLES["lang_confusion"] = (
    "WITH li AS (" + ORACLES["lang_id"] + ")\n"
    "SELECT labeled_lang, guessed_lang, count(*) AS docs\n"
    "FROM li GROUP BY 1, 2"
)
QUERIES["lang_confusion"] = lang_confusion


def source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation view of the ``text_quality`` signals: document
    count, kept-document count/rate, and floored mean word count and
    punctuation ppm -- the table a corpus owner reads to decide which crawl
    sources to downweight (the per-source complement of the per-lang
    ``mixture_budget`` and the global ``corpus_dashboard``).

    Plan: the quality expressions re-evaluate IN the same scan that carries
    `source` (one codegen pass + one groupBy(source) -- no corpus-grain
    join back to documents, which a compose-from-text_quality formulation
    would need since that frame drops the source column)."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]"))
    wc = _word_count(F.col("text"))
    punct_ppm = F.floor(punct * 1000000 / n)
    keep = _keep_flag(n, wc, punct_ppm).cast("long")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(keep).alias("kept_docs"),
        F.floor(F.sum(keep) * 1000000 / F.count(F.lit(1))).alias("keep_ppm"),
        F.floor(F.sum(wc) / F.count(F.lit(1))).alias("mean_word_count"),
        F.floor(F.sum(punct_ppm) / F.count(F.lit(1))).alias("mean_punct_ppm"),
    )


ORACLES["source_quality_matrix"] = rf"""
WITH q AS (
    SELECT source,
           length(text) AS char_len,
           floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000
                 / length(text)) AS punct_ppm,
           {_WC_SQL} AS word_count
    FROM documents
),
flags AS (
    SELECT source, punct_ppm, word_count,
           CASE WHEN char_len >= {KEEP_MIN_CHARS} AND word_count >= {KEEP_MIN_WORDS}
                     AND punct_ppm < {KEEP_MAX_PUNCT_PPM}
                THEN 1 ELSE 0 END AS keep
    FROM q
)
SELECT source,
       count(*) AS docs,
       CAST(sum(keep) AS BIGINT) AS kept_docs,
       CAST(floor(sum(keep) * 1000000.0 / count(*)) AS BIGINT) AS keep_ppm,
       CAST(floor(sum(word_count) * 1.0 / count(*)) AS BIGINT)
           AS mean_word_count,
       CAST(floor(sum(punct_ppm) * 1.0 / count(*)) AS BIGINT)
           AS mean_punct_ppm
FROM flags
GROUP BY 1
"""
QUERIES["source_quality_matrix"] = source_quality_matrix


# --------------------------------------------------------------------------
# STAGED for r12 (SURVEY §2.9 convention): BM25 keyword relevance -- the
# retrieval-shaped selection a targeted-training-data pipeline runs against
# a crawl ("give me the top documents about X" as a corpus filter).
# Robertson/Sparck Jones BM25 (public formula, Lucene's +1 idf smoothing).
# --------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "filter")  # fixed query, like the ANN seeds
BM25_TOPK = 100


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K documents by BM25 over a fixed query-term set.

    Plan shape (the 100 TB story): one codegen scan computes per-doc
    length and per-term tf via JVM higher-order functions (F.filter over
    the token array -- no explode, no corpus x words blow-up); one 1-row
    aggregate (N, avgdl, per-term df) broadcasts back over the scan; the
    top-K is TakeOrderedAndProject (bounded per-task heaps), ranked by
    the shared-ordering window of ranked_global_topk over K rows only.
    Nothing corpus-sized shuffles; the only exchange feeds the 1-row agg.

    FLOAT-ORDER CONTRACT: the BM25 score itself is a double built from
    ln(); libm last-ulp differences between engines could flip an order
    only if two scores differed by ~1e-15 relative, which distinct
    integer (tf, dl) inputs cannot produce -- and IDENTICAL inputs give
    bit-identical scores, broken deterministically by doc_id. The
    certified frame therefore carries the integer inputs and the RANK,
    not the raw double."""
    from cassandra_sstable_tools_spark.operators.topn import (
        ranked_global_topk,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def eq_term(t: str):
        # a 1-arg closure per term: F.filter treats a 2-parameter lambda
        # as (element, index) and would silently bind the INDEX column
        # over a `t=t` default argument
        return lambda x: x == F.lit(t)

    base = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, eq_term(t))).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for t in BM25_TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        part = idf * (tf * F.lit(BM25_K1 + 1.0)) / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
        score = part if score is None else score + part
    ranked = ranked_global_topk(
        scored.select(
            "doc_id", "dl",
            *[F.col(f"tf_{t}") for t in BM25_TERMS],
            score.alias("score"),
        ),
        [F.col("score").desc(), F.col("doc_id").asc()],
        BM25_TOPK,
    )
    return ranked.select(
        "doc_id", "dl", *[F.col(f"tf_{t}") for t in BM25_TERMS], "rank"
    )


def _bm25_oracle() -> str:
    tf_cols = ",\n           ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ",\n           ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    score = "\n         + ".join(
        f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * (CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0})"
        f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B}"
        f" + {BM25_B} * dl / avgdl))"
        for t in BM25_TERMS
    )
    tf_names = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
base AS (
    SELECT doc_id, len(w) AS dl,
           {tf_cols}
    FROM toks
),
stats AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl,
           {df_cols}
    FROM base
),
scored AS (
    SELECT b.doc_id, b.dl, {tf_names},
           {score} AS score
    FROM base b, stats
)
SELECT doc_id, dl, {tf_names},
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {BM25_TOPK}
"""


QUERIES["bm25_topk"] = bm25_topk
ORACLES["bm25_topk"] = _bm25_oracle()
