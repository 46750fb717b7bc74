"""Composed training-data cleaning pipeline: quality filter -> exact dedup ->
near-dup pruning, as one declarative plan.

This is the operator the individual pieces (text_quality, dedup_exact,
minhash_lsh_pairs) exist to serve: a corpus goes in, a keep-list of clean,
unique documents comes out. Every stage is the SAME semantics as the
standalone operator, so the pipeline is literally their composition:

1. quality:  keep docs with char_len >= 100, word_count >= 20 and
             punctuation < 30% of characters (text_quality's keep flag);
2. exact:    among survivors, keep the lowest doc_id per normalized-text
             md5 (dedup_exact's canonical choice);
3. near-dup: among the remaining docs, find minhash-LSH candidate pairs,
             verify exact trigram-Jaccard >= threshold, and drop any doc
             that near-duplicates a LOWER-numbered survivor (one-pass
             greedy -- deterministic and shuffle-local; a union-find pass
             would need iteration and buys little: transitive chains are
             rare at a 0.3 Jaccard threshold).

Scale posture: stages 1-2 are a scan + one hash aggregation on the text
hash. Stage 3 shuffles only (band_id, band_hash) keys and verifies only
candidate pairs -- the standard LSH bound. Nothing here is quadratic and
nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm.dedup import (
    _CAND_SQL,
    _SIG_SQL,
    JACCARD_THRESHOLD_PPM,
    _band_candidates,
    _shingles,
    _signatures,
)
import pandas as pd

from cassandra_sstable_tools_spark.llm.curation import _WC_SQL
from cassandra_sstable_tools_spark.llm.text import (
    KEEP_MAX_PUNCT_PPM as MAX_PUNCT_PPM,
    KEEP_MIN_CHARS as MIN_CHARS,
    KEEP_MIN_WORDS as MIN_WORDS,
    _TOKEN_RE,
    _word_count,
)
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table


def _exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids surviving stage 1 (quality) + stage 2 (exact dedup)."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    punct_ppm = F.floor(
        F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")) * 1000000 / n
    )
    qdocs = d.where(
        (n >= MIN_CHARS)
        & (_word_count(F.col("text")) >= MIN_WORDS)
        & (punct_ppm < MAX_PUNCT_PPM)
    )
    norm_hash = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        qdocs.groupBy(norm_hash.alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def _neardup_drops(spark: SparkSession, sf_dir: str, edocs: DataFrame) -> DataFrame:
    """Stage 3: doc_b of every verified near-dup pair among ``edocs``."""
    sh = _shingles(spark, sf_dir).join(edocs, "doc_id").cache()
    sig = _signatures(sh).cache()
    cands = _band_candidates(sig)

    sizes = sig.select("doc_id", "n_shingles")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "nb"), "doc_b")
        .where(
            F.floor(F.col("inter") * 1000000 / (F.col("na") + F.col("nb") - F.col("inter")))
            >= JACCARD_THRESHOLD_PPM
        )
    )
    return jac.select(F.col("doc_b").alias("doc_id")).distinct()


def corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus: one row per kept document with its size stats."""
    edocs = _exact_survivors(spark, sf_dir)
    drops = _neardup_drops(spark, sf_dir, edocs)
    final = edocs.join(drops, "doc_id", "left_anti")
    d = load_table(spark, sf_dir, "documents")
    return final.join(d, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("char_len"),
        _word_count(F.col("text")).alias("word_count"),
        F.regexp_count("text", F.lit(_TOKEN_RE)).alias("token_count"),
    )


def corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row funnel report: how many docs (and tokens) survive each stage."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    punct_ppm = F.floor(
        F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")) * 1000000 / n
    )
    quality = d.where(
        (n >= MIN_CHARS)
        & (_word_count(F.col("text")) >= MIN_WORDS)
        & (punct_ppm < MAX_PUNCT_PPM)
    )
    edocs = _exact_survivors(spark, sf_dir)
    kept = corpus_keep_list(spark, sf_dir)
    totals = d.agg(F.count(F.lit(1)).alias("n_total"))
    q = quality.agg(F.count(F.lit(1)).alias("n_quality"))
    e = edocs.agg(F.count(F.lit(1)).alias("n_exact"))
    k = kept.agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("token_count").alias("tokens_final"),
    )
    return totals.crossJoin(q).crossJoin(e).crossJoin(k)


_QUALITY_PRED = (
    f"length(text) >= {MIN_CHARS} AND ({_WC_SQL}) >= {MIN_WORDS} "
    "AND floor(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1000000 "
    f"/ length(text)) < {MAX_PUNCT_PPM}"
)

# Stage CTEs shared by both oracle queries. `words` is restricted to exact-
# dedup survivors so the downstream shingle/signature CTEs (reused verbatim
# from dedup.py) operate on the surviving subset only.
_PIPELINE_CTES = f"""
qdocs AS (SELECT doc_id, text FROM documents WHERE {_QUALITY_PRED}),
edocs AS (
    SELECT min(doc_id) AS doc_id
    FROM (SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h
          FROM qdocs)
    GROUP BY h
),
words AS (
    SELECT d.doc_id,
           generate_subscripts(string_split_regex(trim(d.text), '\\s+'), 1) - 1 AS pos,
           unnest(string_split_regex(trim(d.text), '\\s+')) AS word
    FROM documents d JOIN edocs e ON e.doc_id = d.doc_id
),
shingles AS (
    SELECT DISTINCT w1.doc_id,
           concat(w1.word, ' ', w2.word, ' ', w3.word) AS shingle
    FROM words w1
    JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
    JOIN words w3 ON w1.doc_id = w3.doc_id AND w3.pos = w1.pos + 2
),
{_SIG_SQL},
{_CAND_SQL},
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY 1),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter
    FROM cands c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
),
drops AS (
    SELECT DISTINCT i.doc_b AS doc_id
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE floor(i.inter * 1000000 / (za.n_shingles + zb.n_shingles - i.inter))
          >= {JACCARD_THRESHOLD_PPM}
),
final AS (
    SELECT doc_id FROM edocs e
    WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = e.doc_id)
)"""

ORACLES = {
    "corpus_keep_list": rf"""
WITH {_PIPELINE_CTES.lstrip()}
SELECT f.doc_id, d.lang, d.source,
       length(d.text) AS char_len,
       CASE WHEN length(trim(d.text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(d.text), '\s+')) END AS word_count,
       len(regexp_extract_all(d.text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
           AS token_count
FROM final f JOIN documents d ON d.doc_id = f.doc_id
""",
    "corpus_clean_stats": rf"""
WITH {_PIPELINE_CTES.lstrip()}
SELECT (SELECT count(*) FROM documents) AS n_total,
       (SELECT count(*) FROM qdocs) AS n_quality,
       (SELECT count(*) FROM edocs) AS n_exact,
       (SELECT count(*) FROM final) AS n_final,
       (SELECT CAST(sum(len(regexp_extract_all(d.text,
                    '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
        FROM final f JOIN documents d ON d.doc_id = f.doc_id) AS tokens_final
""",
}

QUERIES = {
    "corpus_keep_list": corpus_keep_list,
    "corpus_clean_stats": corpus_clean_stats,
}


# --- composite quality score (the "model-based filter" stand-in) ------------
# Fixed integer weights over the certified per-doc signals; sums to 1e6 ppm.
QS_W_KEEP = 400_000        # heuristic quality gate (length/words/punct)
QS_W_WORD_REP = 300_000    # 1 - duplicate-word fraction
QS_W_BIGRAM_REP = 200_000  # 1 - duplicate-bigram fraction
QS_W_LANG = 100_000        # language ID agrees with the label
QS_KEEP_THRESHOLD = 700_000


def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc composite quality score: a fixed-integer-weight linear model
    over the engine's certified signals (quality gate, Gopher repetition
    ppms, language agreement) -- the deterministic stand-in for the learned
    quality classifier a production pipeline would drop in here (swap this
    scoring expression for a model UDF; the plumbing is identical).

    Composition-by-join of the certified component frames (all keyed on
    doc_id -- three linear joins, no new scans' worth of semantics to
    re-prove); score arithmetic is exact ppm integers, so the oracle (the
    component oracles composed as CTEs) hashes identically."""
    from cassandra_sstable_tools_spark.llm.curation import _keep_flag
    from cassandra_sstable_tools_spark.llm.text import doc_repetition, lang_id

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _keep_flag(F.col("text")).alias("keep")
    )
    rep = doc_repetition(spark, sf_dir).select(
        "doc_id", "dup_word_ppm", "dup_bigram_ppm"
    )
    li = lang_id(spark, sf_dir).select(
        "doc_id",
        # coalesce: a NULL label (dirty row) matches nothing -- the
        # oracle's CASE WHEN guessed = labeled THEN 1 ELSE 0
        F.coalesce(
            (F.col("guessed_lang") == F.col("labeled_lang")).cast("int"),
            F.lit(0),
        ).alias("lang_match"),
    )
    score = (
        F.col("keep") * QS_W_KEEP
        + F.expr(f"({QS_W_WORD_REP} * (1000000 - dup_word_ppm)) div 1000000")
        + F.expr(f"({QS_W_BIGRAM_REP} * (1000000 - dup_bigram_ppm)) div 1000000")
        + F.col("lang_match") * QS_W_LANG
    ).cast("bigint")
    return (
        d.join(rep, "doc_id")
        .join(li, "doc_id")
        .select(
            "doc_id",
            score.alias("score_ppm"),
            (score >= QS_KEEP_THRESHOLD).alias("keep_verdict"),
        )
    )


def _quality_scores_oracle() -> str:
    from cassandra_sstable_tools_spark.llm.text import (
        KEEP_MAX_PUNCT_PPM,
        KEEP_MIN_CHARS,
        KEEP_MIN_WORDS,
        ORACLES as TEXT_ORACLES,
    )

    return f"""
WITH rep AS ({TEXT_ORACLES["doc_repetition"]}),
li AS ({TEXT_ORACLES["lang_id"]}),
k AS (
    SELECT doc_id,
           CASE WHEN length(text) >= {KEEP_MIN_CHARS} AND ({_WC_SQL}) >= {KEEP_MIN_WORDS}
                     AND floor(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                               * 1000000 / length(text)) < {KEEP_MAX_PUNCT_PPM}
                THEN 1 ELSE 0 END AS keep
    FROM documents
),
scored AS (
    SELECT k.doc_id,
           CAST(k.keep * {QS_W_KEEP}
                + ({QS_W_WORD_REP} * (1000000 - rep.dup_word_ppm)) // 1000000
                + ({QS_W_BIGRAM_REP} * (1000000 - rep.dup_bigram_ppm)) // 1000000
                + (CASE WHEN li.guessed_lang = li.labeled_lang
                        THEN 1 ELSE 0 END) * {QS_W_LANG}
             AS BIGINT) AS score_ppm
    FROM k
    JOIN rep ON rep.doc_id = k.doc_id
    JOIN li ON li.doc_id = k.doc_id
)
SELECT doc_id, score_ppm, score_ppm >= {QS_KEEP_THRESHOLD} AS keep_verdict
FROM scored
"""


ORACLES["doc_quality_scores"] = _quality_scores_oracle()
QUERIES["doc_quality_scores"] = doc_quality_scores


# --- batched model-inference slot -------------------------------------------
# doc_quality_scores' docstring promises "swap this scoring expression for a
# model UDF; the plumbing is identical" -- this query IS that plumbing, kept
# live so the pattern real users will copy (Arrow-batched pandas_udf over
# JVM-extracted features) exists, runs, and is plan-audited. The "model" is
# a deterministic integer two-layer stub (clip -> linear -> relu -> scale):
# bit-reproducible, so the DuckDB oracle certifies the whole path end to
# end. Swapping in a real classifier = replacing _stub_model_fn's body with
# e.g. an ONNX session.run over the same feature batch; everything else
# (feature extraction in codegen, Arrow transfer, batch shape) stays put.
#
# Scale shape: features (3 small ints/doc) are computed JVM-side in the
# scan, so only ~24 bytes/doc cross the Arrow boundary -- NOT the text.
# ArrowEvalPython vectorizes the python work per-batch (10k rows/batch by
# default); the plan audit pins Arrow (vectorized) vs BatchEvalPython
# (per-row pickling, the 10-100x-slower trap).


def _stub_model_fn(char_len, word_count, punct_ppm):
    """Deterministic integer 'forward pass' on numpy int64 arrays."""
    h = (
        char_len.clip(0, 2000) * 3
        + word_count.clip(0, 500) * 7
        - punct_ppm // 1000
    )
    return h.clip(lower=0) * 1000 // 7


def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality score from a BATCHED python model UDF over
    JVM-extracted integer features (the learned-classifier slot)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def model(char_len: pd.Series, word_count: pd.Series,
              punct_ppm: pd.Series) -> pd.Series:
        return _stub_model_fn(char_len, word_count, punct_ppm)

    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    # features coalesced to 0 JVM-side: NULL text must reach the model as
    # zero-signal features, not as NaN through the Arrow boundary (the
    # oracle coalesces identically)
    feats = d.select(
        "doc_id",
        F.coalesce(n, F.lit(0)).alias("char_len"),
        F.coalesce(_word_count(F.col("text")), F.lit(0)).alias("word_count"),
        F.coalesce(
            F.floor(
                F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")) * 1000000 / n
            ),
            F.lit(0),
        ).alias("punct_ppm"),
    )
    return feats.select(
        "doc_id",
        model("char_len", "word_count", "punct_ppm").alias("model_score"),
    )


ORACLES["quality_model_scores"] = rf"""
WITH feats AS (
    SELECT doc_id,
           coalesce(length(text), 0) AS char_len,
           coalesce({_WC_SQL}, 0) AS word_count,
           CAST(coalesce(floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                               * 1000000 / length(text)), 0)
                AS BIGINT) AS punct_ppm
    FROM documents
)
SELECT doc_id,
       CAST(greatest(least(char_len, 2000) * 3
                     + least(word_count, 500) * 7
                     - punct_ppm // 1000, 0) * 1000 // 7
            AS BIGINT) AS model_score
FROM feats
"""
QUERIES["quality_model_scores"] = quality_model_scores


# --- one-row corpus health dashboard ----------------------------------------
def corpus_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first query a corpus owner runs: one row of corpus-level health
    KPIs -- document/source/language counts, total characters, the
    held-out-eval slice size, and the global duplicated-passage rate
    (chunk-grain, from the same chunker every dedup operator shares).

    Scale shape: each cardinality reduces at ITS OWN grain first (groupBy
    source -> count of groups, etc. -- no countDistinct Expand over the
    corpus scan), the chunk stats aggregate `chunk_dedup_stats`' per-doc
    output, and the 1-row frames compose via broadcast crossJoins (the
    established scalar-join pattern, never a corpus-side shuffle)."""
    from cassandra_sstable_tools_spark.llm.curation import _is_eval
    from cassandra_sstable_tools_spark.llm.dedup import chunk_dedup_stats

    d = load_table(spark, sf_dir, "documents")
    base = d.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("total_chars"),
        # count(when), not sum(flag): sum over an empty corpus is NULL
        # while the oracle's count yields 0
        F.count(F.when(_is_eval(F.col("doc_id")), F.lit(1))).alias("eval_docs"),
    )
    # isNotNull first: the oracle's count(DISTINCT col) excludes NULL per
    # SQL semantics, but a groupBy would count the NULL group as a value
    sources = (
        d.where(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.lit(1))
        .agg(F.count(F.lit(1)).alias("sources"))
    )
    langs = (
        d.where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.lit(1))
        .agg(F.count(F.lit(1)).alias("langs"))
    )
    chunks = chunk_dedup_stats(spark, sf_dir).agg(
        F.sum("n_chunks").alias("chunks"),
        F.sum("dup_chunks").alias("dup_chunks"),
    )
    return (
        base.crossJoin(sources)
        .crossJoin(langs)
        .crossJoin(chunks)
        .withColumn(
            "dup_chunk_ppm",
            F.floor(F.col("dup_chunks") * 1000000 / F.col("chunks")),
        )
    )


def _dashboard_oracle() -> str:
    from cassandra_sstable_tools_spark.llm.curation import EVAL_NIBBLE
    from cassandra_sstable_tools_spark.llm.dedup import ORACLES as _DORACLES

    return f"""
WITH chunk_stats AS ({_DORACLES["chunk_dedup_stats"]}),
chunk_tot AS (
    SELECT CAST(sum(n_chunks) AS BIGINT) AS chunks,
           CAST(sum(dup_chunks) AS BIGINT) AS dup_chunks
    FROM chunk_stats
)
SELECT (SELECT count(*) FROM documents) AS docs,
       (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS total_chars,
       (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{EVAL_NIBBLE}')
           AS eval_docs,
       (SELECT count(DISTINCT source) FROM documents) AS sources,
       (SELECT count(DISTINCT lang) FROM documents) AS langs,
       chunks, dup_chunks,
       CAST(floor(dup_chunks * 1000000.0 / chunks) AS BIGINT)
           AS dup_chunk_ppm
FROM chunk_tot
"""


ORACLES["corpus_dashboard"] = _dashboard_oracle()
QUERIES["corpus_dashboard"] = corpus_dashboard
