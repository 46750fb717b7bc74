"""Corpus curation operators: benchmark decontamination + mixture budgeting.

Two pipeline stages every large-scale training-data run needs after
cleaning/dedup (no analog in the reference — extension surface):

- decontaminate_flags: flags training documents that share at least one
  word-``CONTAM_NGRAM``-gram with a held-out evaluation split (the classic
  benchmark-decontamination pass). The eval split here is a deterministic
  md5-keyed ~1/16 slice of the corpus standing in for an external benchmark
  suite; swapping in a real eval-set table changes one input frame, not the
  plan.
- mixture_budget: per-language token budgeting — rank documents by quality
  (the `text_quality` keep flag), take documents in rank order until the
  per-language token budget is spent, report selected vs total docs/tokens.
  This is the "data mixing weights" primitive: the budget constant is the
  per-language sampling knob.

Scale posture (100 TB):
- Decontamination joins the corpus' exploded n-grams against the EVAL
  side's distinct n-grams. An eval suite is a few thousand documents ->
  a few million distinct n-grams -> always broadcast (explicit hint); the
  training side stays a single codegen'd scan + explode with NO corpus
  shuffle. The per-doc hit aggregation shuffles only matched rows (a tiny
  fraction of the corpus). Zero Python in the plan.
- Mixture budgeting is one window (cumulative token sum per language;
  shuffle on lang — low cardinality, but each partition carries only
  (lang, keep, doc_id, tokens) — 4 narrow columns, not text) + one
  aggregation. With heavily skewed language sizes the window sort is the
  cost; at 100 TB pre-aggregate tokens per (lang, quality-tier) when exact
  per-doc cutoff is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm.text import (
    KEEP_MAX_PUNCT_PPM,
    KEEP_MIN_CHARS,
    KEEP_MIN_WORDS,
    _TOKEN_RE,
    _word_count,
)
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

# Word-n-gram size for contamination matching. 8 is the common published
# choice (matches are then near-certain verbatim overlap, not phrase reuse).
CONTAM_NGRAM = 8
# Deterministic pseudo-eval split: docs whose md5(doc_id) starts with this
# nibble (~1/16 of the corpus) play the benchmark suite.
EVAL_NIBBLE = "f"
# Per-language token budget for the mixture pass (test-scale knob; the
# 100 TB value is a per-language config vector).
MIXTURE_TOKEN_BUDGET = 20_000


def _is_eval(doc_id):
    return F.substring(F.md5(doc_id.cast("string")), 1, 1) == EVAL_NIBBLE


def _contam_grams(d: DataFrame) -> DataFrame:
    """Distinct word-CONTAM_NGRAM-grams per document (single scan, no join)."""
    grams = F.when(
        F.size("w") >= CONTAM_NGRAM,
        F.expr(
            f"transform(sequence(0, size(w) - {CONTAM_NGRAM}),"
            f" i -> array_join(slice(w, i + 1, {CONTAM_NGRAM}), ' '))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return (
        d.withColumn("w", F.split(F.trim(F.col("text")), r"\s+"))
        .select("doc_id", F.explode(grams).alias("ngram"))
        .distinct()
    )


def decontaminate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per TRAINING doc: distinct eval-overlapping n-grams + flag."""
    d = load_table(spark, sf_dir, "documents")
    grams = _contam_grams(d)
    gram_is_eval = _is_eval(F.col("doc_id"))
    eval_grams = grams.where(gram_is_eval).select("ngram").distinct()
    train_grams = grams.where(~gram_is_eval)
    # (doc_id, ngram) is unique on both sides of the join -> plain count.
    hits = (
        train_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    train_docs = d.where(~_is_eval(F.col("doc_id"))).select("doc_id")
    n_hits = F.coalesce("contaminated_ngrams", F.lit(0))
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        n_hits.cast("bigint").alias("contaminated_ngrams"),
        (n_hits > 0).cast("int").alias("contaminated"),
    )


def _keep_flag(text_col):
    """The text_quality composite keep flag over a raw text column:
    computes the three feature columns and delegates the PREDICATE to
    llm.text._keep_flag, so both the thresholds and the predicate's shape
    have exactly one definition."""
    from cassandra_sstable_tools_spark.llm.text import _keep_flag as _pred

    n = F.length(text_col)
    punct = F.regexp_count(text_col, F.lit(r"[^A-Za-z0-9\s]"))
    return _pred(
        n, _word_count(text_col), F.floor(punct * 1000000 / n)
    ).cast("int")


def mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixture report: docs/tokens selected under the budget
    when documents are taken quality-first (keep desc, doc_id asc)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        "doc_id",
        F.regexp_count("text", F.lit(_TOKEN_RE)).alias("tokens"),
        _keep_flag(F.col("text")).alias("keep"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("keep"), F.asc("doc_id"))
    cum = scored.withColumn("cum_tokens", F.sum("tokens").over(w))
    sel = F.col("cum_tokens") <= MIXTURE_TOKEN_BUDGET
    return cum.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("tokens").alias("total_tokens"),
        # coalesce: NULL cum_tokens (dirty text) selects nothing, like the
        # oracle's CASE ... ELSE 0
        F.sum(F.coalesce(sel.cast("int"), F.lit(0)))
        .cast("bigint")
        .alias("selected_docs"),
        F.sum(F.when(sel, F.col("tokens")).otherwise(0)).alias("selected_tokens"),
    )


_GRAMS_SQL = rf"""
docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+{CONTAM_NGRAM - 1}], ' ') AS ngram
  FROM docs, UNNEST(generate_series(1, len(w) - {CONTAM_NGRAM - 1})) AS t(i)
  WHERE len(w) >= {CONTAM_NGRAM}
)"""

_WC_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)

ORACLES = {
    "decontaminate_flags": f"""
WITH {_GRAMS_SQL.lstrip()},
eval_grams AS (
  SELECT DISTINCT ngram FROM grams
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{EVAL_NIBBLE}'
),
hits AS (
  SELECT g.doc_id, count(*) AS contaminated_ngrams
  FROM grams g JOIN eval_grams e USING (ngram)
  WHERE substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 1) <> '{EVAL_NIBBLE}'
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.contaminated_ngrams, 0) AS BIGINT) AS contaminated_ngrams,
       CASE WHEN coalesce(h.contaminated_ngrams, 0) > 0 THEN 1 ELSE 0 END
           AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '{EVAL_NIBBLE}'
""",
    "mixture_budget": rf"""
WITH scored AS (
  SELECT lang, doc_id,
         len(regexp_extract_all(text, '{_TOKEN_RE}')) AS tokens,
         CASE WHEN length(text) >= {KEEP_MIN_CHARS} AND ({_WC_SQL}) >= {KEEP_MIN_WORDS}
                   AND floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                             * 1000000 / length(text)) < {KEEP_MAX_PUNCT_PPM}
              THEN 1 ELSE 0 END AS keep
  FROM documents
),
cum AS (
  SELECT lang, tokens,
         sum(tokens) OVER (PARTITION BY lang
                           ORDER BY keep DESC, doc_id ASC) AS cum_tokens
  FROM scored
)
SELECT lang,
       count(*) AS total_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN cum_tokens <= {MIXTURE_TOKEN_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS selected_docs,
       CAST(sum(CASE WHEN cum_tokens <= {MIXTURE_TOKEN_BUDGET} THEN tokens ELSE 0 END)
            AS BIGINT) AS selected_tokens
FROM cum GROUP BY 1
""",
}

QUERIES = {
    "decontaminate_flags": decontaminate_flags,
    "mixture_budget": mixture_budget,
}


# --- Bloom-filter decontamination (the beyond-broadcast scale path) ---------
# decontaminate_flags broadcasts the eval n-gram SET exactly -- right while
# the suite fits in memory. When it doesn't (stacked benchmark suites at
# 100 TB), the shippable summary is a Bloom filter: fixed-size bit array,
# merge = bitwise OR, no false negatives, tunable false-positive rate.
BLOOM_BITS = 65536     # 16 bits per position = 4 md5 hex chars (2048 words;
#   sized so ~1.4k eval grams give a per-doc FP rate around 1% -- a 4096-bit
#   filter saturates at this gram count and flags nearly everything)
BLOOM_WORD = 32        # bits per packed word -> masks stay < 2^31
BLOOM_K = 2            # hash functions = disjoint hex quadruplets


def _bloom_positions(ngram_col):
    """K bit positions per n-gram from disjoint md5 hex QUADRUPLETS
    (substring length 4; weights 4096/256/16/1 -> 16-bit positions,
    matching BLOOM_BITS=65536) -- deterministic, engine-portable (the
    oracle recomputes the same quadruplets via strpos arithmetic)."""
    h = F.md5(ngram_col)
    return [
        F.conv(F.substring(h, 1 + 4 * j, 4), 16, 10).cast("int")
        for j in range(BLOOM_K)
    ]


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc contamination via a 65536-bit Bloom filter of the
    eval n-grams, WITH the exact answer alongside certifying the sketch:
    `no_false_negative` (bloom >= exact, the Bloom guarantee) is emitted
    per row, and the whole frame is deterministic, so the oracle recomputes
    the identical filter and the hash match proves the distributed build
    (groupBy(word) + bit_or) equals the sequential definition.

    Scale shape: the filter is <=2048 ints REGARDLESS of eval-set size --
    that's the point; it broadcasts into the probe join at any scale. Build
    = one groupBy over eval gram positions; probe = the training gram scan
    joined against the broadcast words, then two narrow aggregations
    (gram-level AND over the K probes, doc-level ANY)."""
    d = load_table(spark, sf_dir, "documents")
    grams = _contam_grams(d)
    gram_is_eval = _is_eval(F.col("doc_id"))
    eval_grams = grams.where(gram_is_eval).select("ngram").distinct()
    train_grams = grams.where(~gram_is_eval)

    def melt(df: DataFrame, keep_cols: list[str]) -> DataFrame:
        pos = _bloom_positions(F.col("ngram"))
        probes = F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (p / BLOOM_WORD).cast("int").alias("word_idx"),
                    (p % BLOOM_WORD).alias("bit"),
                )
                for j, p in enumerate(pos)
            ])
        ).alias("p")
        return df.select(*keep_cols, probes).select(
            *keep_cols,
            "p.j",
            "p.word_idx",
            F.expr("shiftleft(cast(1 as bigint), p.bit)").alias("mask"),
        )

    bloom = (
        melt(eval_grams, ["ngram"])
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bf_word"))
    )
    probed = (
        melt(train_grams, ["doc_id", "ngram"])
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "probe_hit",
            (F.coalesce(F.col("bf_word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0)
            .cast("int"),
        )
        .groupBy("doc_id", "ngram")
        .agg(F.min("probe_hit").alias("gram_hit"))  # AND over the K probes
    )
    per_doc = probed.groupBy("doc_id").agg(
        F.max("gram_hit").alias("bloom_contaminated"),
        F.sum("gram_hit").alias("bloom_hit_ngrams"),
    )
    exact = (
        train_grams.join(F.broadcast(eval_grams), "ngram")
        .select("doc_id").distinct()
        .withColumn("exact_contaminated", F.lit(1))
    )
    train_docs = d.where(~_is_eval(F.col("doc_id"))).select("doc_id")
    return (
        train_docs.join(per_doc, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_contaminated", F.lit(0)).cast("int")
                .alias("bloom_contaminated"),
            F.coalesce("bloom_hit_ngrams", F.lit(0)).cast("bigint")
                .alias("bloom_hit_ngrams"),
            F.coalesce("exact_contaminated", F.lit(0)).cast("int")
                .alias("exact_contaminated"),
            (
                F.coalesce("bloom_contaminated", F.lit(0))
                >= F.coalesce("exact_contaminated", F.lit(0))
            ).alias("no_false_negative"),
        )
    )


# hex digit -> int, oracle-side: strpos arithmetic over the hex alphabet
# (composed into 4-char quadruplets by _pos_sql, mirroring _bloom_positions)
def _hexval_sql(expr: str) -> str:
    return f"(strpos('0123456789abcdef', {expr}) - 1)"


def _pos_sql(j: int) -> str:
    c = [f"substr(md5(ngram), {1 + 4 * j + i}, 1)" for i in range(4)]
    return (f"({_hexval_sql(c[0])} * 4096 + {_hexval_sql(c[1])} * 256"
            f" + {_hexval_sql(c[2])} * 16 + {_hexval_sql(c[3])})")


_BLOOM_MELT_SQL = "\n    UNION ALL\n".join(
    f"    SELECT *, {j} AS j, CAST({_pos_sql(j)} // {BLOOM_WORD} AS INT)"
    f" AS word_idx,"
    f" CAST(1::BIGINT << ({_pos_sql(j)} % {BLOOM_WORD}) AS BIGINT) AS mask"
    " FROM {src}"
    for j in range(BLOOM_K)
)

ORACLES["decontaminate_bloom"] = f"""
WITH words AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(w[i + 1 : i + {CONTAM_NGRAM}], ' ') AS ngram
    FROM (SELECT doc_id, w,
                 unnest(range(len(w) - {CONTAM_NGRAM} + 1)) AS i
          FROM words WHERE len(w) >= {CONTAM_NGRAM})
),
eval_grams AS (
    SELECT DISTINCT ngram FROM grams
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{EVAL_NIBBLE}'
),
train_grams AS (
    SELECT * FROM grams
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '{EVAL_NIBBLE}'
),
eval_melt AS (
{_BLOOM_MELT_SQL.format(src="eval_grams")}
),
bloom AS (
    SELECT word_idx, bit_or(mask) AS bf_word FROM eval_melt GROUP BY 1
),
train_melt AS (
{_BLOOM_MELT_SQL.format(src="train_grams")}
),
probed AS (
    SELECT m.doc_id, m.ngram,
           min(CASE WHEN (coalesce(b.bf_word, 0) & m.mask) != 0
                    THEN 1 ELSE 0 END) AS gram_hit
    FROM train_melt m LEFT JOIN bloom b USING (word_idx)
    GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id, max(gram_hit) AS bloom_contaminated,
           sum(gram_hit) AS bloom_hit_ngrams
    FROM probed GROUP BY 1
),
exact AS (
    SELECT DISTINCT t.doc_id, 1 AS exact_contaminated
    FROM train_grams t JOIN eval_grams e USING (ngram)
),
train_docs AS (
    SELECT doc_id FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '{EVAL_NIBBLE}'
)
SELECT d.doc_id,
       CAST(coalesce(p.bloom_contaminated, 0) AS INT) AS bloom_contaminated,
       CAST(coalesce(p.bloom_hit_ngrams, 0) AS BIGINT) AS bloom_hit_ngrams,
       CAST(coalesce(e.exact_contaminated, 0) AS INT) AS exact_contaminated,
       coalesce(p.bloom_contaminated, 0) >= coalesce(e.exact_contaminated, 0)
           AS no_false_negative
FROM train_docs d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN exact e USING (doc_id)
"""
QUERIES["decontaminate_bloom"] = decontaminate_bloom


# --- deterministic train/val/test split ------------------------------------
# Split assignment is a pure function of doc_id (first md5 nibble), so any
# re-run, retry, or cross-cluster execution assigns every document to the
# same split -- the reproducibility property a training pipeline needs from
# its split step. Fractions: train 12/16 (75%), val 2/16, test 2/16; the
# test slice contains the EVAL_NIBBLE ('f') pseudo-benchmark slice used by
# the decontamination passes, so "held out" is consistent across operators.
SPLIT_TRAIN_NIBBLES = tuple("0123456789ab")
SPLIT_VAL_NIBBLES = ("c", "d")


def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, lang) audit of the deterministic hash split.

    Scale shape: ONE codegen'd scan + one partial-aggregated groupBy on
    (split, lang) -- no joins, no windows, no per-row Python. The min/max
    doc_id columns make the certified row a content contract, not just a
    count: a drifted hash function moves ids across splits and changes them.
    """
    d = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*SPLIT_TRAIN_NIBBLES), "train")
        .when(nib.isin(*SPLIT_VAL_NIBBLES), "val")
        .otherwise("test")
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_SPLIT_CASE_SQL = f"""CASE
    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
         {SPLIT_TRAIN_NIBBLES} THEN 'train'
    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
         {SPLIT_VAL_NIBBLES} THEN 'val'
    ELSE 'test' END"""

ORACLES["dataset_split_stats"] = f"""
SELECT {_SPLIT_CASE_SQL} AS split,
       lang,
       count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1, 2
"""
QUERIES["dataset_split_stats"] = dataset_split_stats


# --------------------------------------------------------------------------
# STAGED for r12 (SURVEY §2.9 convention): stratified per-source sampling
# -- the per-source cap a mixture pipeline applies before training (keep a
# bounded, DETERMINISTIC sample from every crawl source; rand() would
# break retries, speculation, and the oracle).
# --------------------------------------------------------------------------

STRATA_SAMPLE_K = 5


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K documents per source, selected deterministically by md5 of the
    doc id (a uniform, reproducible pseudo-order) -- the exact sample a
    retry or a different cluster layout reproduces bit-for-bit.

    Plan shape: top_n_per_group_salted (operators/topn.py) -- at 100 TB
    a 'source' is a whole crawl (billions of rows), so the naive
    per-group window would sort one source inside ONE task; the salted
    two-phase rank bounds every window partition at ~group/buckets rows
    and stays exact (each survivor beats its own bucket)."""
    from cassandra_sstable_tools_spark.operators.topn import (
        top_n_per_group_salted,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.md5(F.col("doc_id").cast("string")).alias("pick_h"),
    )
    return top_n_per_group_salted(
        d, ["source"], ["pick_h", "doc_id"], n=STRATA_SAMPLE_K,
        rank_col="pick_rank",
    ).select("source", "doc_id", "pick_rank")


QUERIES["stratified_sample"] = stratified_sample
ORACLES["stratified_sample"] = f"""
SELECT source, doc_id,
       CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS INT) AS pick_rank
FROM documents
QUALIFY pick_rank <= {STRATA_SAMPLE_K}
"""
