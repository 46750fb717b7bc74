"""Corpus-level analytics for LLM training-data pipelines.

Complements the per-document ops in ``llm/text.py`` with the corpus-wide
passes a data-curation run needs before/after cleaning:

- ngram_topk:             global top-K word bigrams (content drift /
                          boilerplate detector).
- pii_scan:               per-doc counts of email / long-digit / URL
                          patterns + a redaction-needed flag.
- length_histogram:       document-length distribution in fixed buckets.
- stratified_sample_rates: deterministic md5-keyed subsampling audited per
                          source stratum (the reproducible "take X% of
                          each source" primitive; the keep decision is a
                          pure function of (doc_id, source), so re-runs
                          and retries pick the identical sample).

Scale posture: every op is a single codegen'd scan + one aggregation.
``ngram_topk`` aggregates (bigram -> count) with map-side partial combine,
then takes the global top-K via orderBy+limit (TakeOrderedAndProject: a
bounded heap per task + driver merge of K rows -- never a global sort of
the distinct-bigram table); the rank column is added on the K collected
rows. ``pii_scan`` is pure per-row regex counting in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.topn import ranked_global_topk
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

NGRAM_TOP_K = 20
LENGTH_BUCKET = 200
# keep a doc when the first hex nibble of md5(doc_id|source) is 0..3 (25%)
SAMPLE_KEEP_NIBBLES = ("0", "1", "2", "3")

_EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
_LONG_DIGIT_RE = r"[0-9]{6,}"
_URL_RE = r"https?://[^\s]+"


def ngram_topk(spark: SparkSession, sf_dir: str, k: int = NGRAM_TOP_K) -> DataFrame:
    """Global top-K word bigrams (count desc, bigram asc tiebreak)."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.when(
        F.size("w") >= 2,
        F.expr("transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"),
    ).otherwise(F.expr("array()").cast("array<string>"))
    counts = (
        d.withColumn("w", F.split(F.trim(F.col("text")), r"\s+"))
        .select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    return ranked_global_topk(
        counts, [F.desc("occurrences"), F.asc("ngram")], k
    )


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII-ish pattern counts; flag docs needing redaction."""
    d = load_table(spark, sf_dir, "documents")
    email = F.regexp_count("text", F.lit(_EMAIL_RE))
    long_digit = F.regexp_count("text", F.lit(_LONG_DIGIT_RE))
    url = F.regexp_count("text", F.lit(_URL_RE))
    return d.select(
        "doc_id",
        email.alias("email_hits"),
        long_digit.alias("long_digit_hits"),
        url.alias("url_hits"),
        # coalesce: NULL text makes every regexp_count NULL; the oracle's
        # CASE ... ELSE 0 says a text-less doc needs no redaction
        F.coalesce(((email + long_digit) > 0).cast("int"), F.lit(0)).alias(
            "needs_redaction"
        ),
    )


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution in LENGTH_BUCKET-char buckets."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.length("text") / LENGTH_BUCKET) * LENGTH_BUCKET).cast("bigint")
    return d.groupBy(bucket.alias("length_bucket")).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
    )


def _keep(doc_id, source):
    nibble = F.substring(F.md5(F.concat(doc_id.cast("string"), F.lit("|"), source)), 1, 1)
    return nibble.isin(*SAMPLE_KEEP_NIBBLES)


def stratified_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the deterministic 25% subsample per source stratum."""
    d = load_table(spark, sf_dir, "documents")
    # coalesce: a NULL source makes the md5 keep-hash NULL; the oracle's
    # CASE ... ELSE 0 treats that stratum as never-kept, not NULL-kept
    kept = F.coalesce(
        _keep(F.col("doc_id"), F.col("source")).cast("int"), F.lit(0)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(kept).alias("kept_docs"),
        F.floor(F.sum(kept) * 1000000 / F.count(F.lit(1))).alias("kept_ppm"),
    )


BPE_TOP_K = 30
VOCAB_TOP_K = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str, k: int = BPE_TOP_K) -> DataFrame:
    """Top-K adjacent character-pair frequencies, weighted by word frequency
    -- the counting step of one BPE merge iteration (the statistic a
    tokenizer-training pipeline computes over the corpus each round).

    Scale posture: the corpus scan reduces to the VOCABULARY grain first
    (groupBy(word) with map-side combine -- vocabulary is sublinear in corpus
    size), pairs explode off vocabulary rows only (len(word)-1 each), and the
    global top-K is orderBy+limit = TakeOrderedAndProject (bounded per-task
    heap + driver merge of K rows, never a global sort)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).where(F.length("word") >= 2)
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("occurrences"))
    return ranked_global_topk(
        counts, [F.desc("occurrences"), F.asc("pair")], k
    )


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K) -> DataFrame:
    """Vocabulary statistics: top-K words by document frequency, with term
    frequency and an integer-exact inverse-document-frequency
    (idf_ppm = floor(N_docs * 1e6 / doc_freq) -- a ratio, not a log, so both
    engines compute it bit-identically). The stopword/boilerplate-vocabulary
    detector a curation pipeline runs before filtering.

    Scale posture: two-level aggregation -- (doc_id, word) partials collapse
    per-document repetition before the per-word aggregate, so doc_freq is an
    exact count WITHOUT countDistinct's Expand; top-K via orderBy+limit."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    words = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).where(F.length("word") >= 1)
    dw = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    agg = dw.groupBy("word").agg(
        F.sum("cnt").alias("occurrences"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    enriched = (
        agg.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf_ppm",
            F.floor(F.col("n_docs") * 1000000 / F.col("doc_freq")).cast("bigint"),
        )
        .drop("n_docs")
    )
    return ranked_global_topk(
        enriched, [F.desc("doc_freq"), F.asc("word")], k
    )


_BIGRAMS_SQL = r"""
words AS (
    SELECT doc_id,
           generate_subscripts(string_split_regex(trim(text), '\s+'), 1) - 1 AS pos,
           unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
),
bigrams AS (
    SELECT concat(w1.word, ' ', w2.word) AS ngram
    FROM words w1
    JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
)"""

ORACLES = {
    "ngram_topk": f"""
WITH {_BIGRAMS_SQL.lstrip()}
SELECT ngram, occurrences, rank FROM (
    SELECT ngram, count(*) AS occurrences,
           row_number() OVER (ORDER BY count(*) DESC, ngram ASC) AS rank
    FROM bigrams GROUP BY 1
) WHERE rank <= {NGRAM_TOP_K}
""",
    "pii_scan": rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS email_hits,
       len(regexp_extract_all(text, '{_LONG_DIGIT_RE}')) AS long_digit_hits,
       len(regexp_extract_all(text, '{_URL_RE}')) AS url_hits,
       CASE WHEN len(regexp_extract_all(text, '{_EMAIL_RE}'))
                 + len(regexp_extract_all(text, '{_LONG_DIGIT_RE}')) > 0
            THEN 1 ELSE 0 END AS needs_redaction
FROM documents
""",
    "length_histogram": f"""
SELECT CAST(floor(length(text) / {LENGTH_BUCKET}) * {LENGTH_BUCKET} AS BIGINT)
           AS length_bucket,
       count(*) AS docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(length(text)) AS min_len,
       max(length(text)) AS max_len
FROM documents
GROUP BY 1
""",
    "stratified_sample_rates": f"""
SELECT source,
       count(*) AS total_docs,
       CAST(sum(CASE WHEN substr(md5(concat(CAST(doc_id AS VARCHAR), '|', source)), 1, 1)
                          IN {SAMPLE_KEEP_NIBBLES} THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_docs,
       CAST(floor(sum(CASE WHEN substr(md5(concat(CAST(doc_id AS VARCHAR), '|', source)), 1, 1)
                                IN {SAMPLE_KEEP_NIBBLES} THEN 1 ELSE 0 END)
                  * 1000000 / count(*)) AS BIGINT) AS kept_ppm
FROM documents
GROUP BY 1
""",
}

ORACLES["bpe_pair_counts"] = rf"""
WITH words AS (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents
),
wf AS (
    SELECT word, count(*) AS freq FROM words WHERE length(word) >= 2 GROUP BY 1
),
pairs AS (
    SELECT substring(word, CAST(i AS INT), 2) AS pair, freq
    FROM (SELECT word, freq,
                 unnest(generate_series(1, length(word) - 1)) AS i
          FROM wf)
)
SELECT pair, occurrences, rank FROM (
    SELECT pair, CAST(sum(freq) AS BIGINT) AS occurrences,
           row_number() OVER (ORDER BY sum(freq) DESC, pair ASC) AS rank
    FROM pairs GROUP BY 1
) WHERE rank <= {BPE_TOP_K}
"""

ORACLES["vocab_topk"] = rf"""
WITH words AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
),
dw AS (
    SELECT doc_id, word, count(*) AS cnt FROM words
    WHERE length(word) >= 1 GROUP BY 1, 2
),
agg AS (
    SELECT word, CAST(sum(cnt) AS BIGINT) AS occurrences,
           count(*) AS doc_freq
    FROM dw GROUP BY 1
)
SELECT word, occurrences, doc_freq, idf_ppm, rank FROM (
    SELECT word, occurrences, doc_freq,
           CAST(floor((SELECT count(*) FROM documents) * 1000000 / doc_freq)
                AS BIGINT) AS idf_ppm,
           row_number() OVER (ORDER BY doc_freq DESC, word ASC) AS rank
    FROM agg
) WHERE rank <= {VOCAB_TOP_K}
"""

QUERIES = {
    "ngram_topk": ngram_topk,
    "pii_scan": pii_scan,
    "length_histogram": length_histogram,
    "stratified_sample_rates": stratified_sample_rates,
    "bpe_pair_counts": bpe_pair_counts,
    "vocab_topk": vocab_topk,
}


def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length outliers: docs whose length deviates from
    their source's mean by more than 2 standard deviations -- computed
    EXACTLY in integers. |len - mean| > 2*sigma is cross-multiplied to
    (n*len - sum)^2 > 4 * (n*sumsq - sum^2) (both sides integer), so Spark
    and DuckDB agree bit-for-bit with no float mean/stddev anywhere. The
    squares are evaluated in decimal(38,0) (Spark) / HUGEINT (DuckDB):
    exact through ~1e38, far past any per-source corpus this runs on.
    Shape: one groupBy(source) for the 3 moments (aggregate-sized),
    broadcast back against the doc scan -- one corpus shuffle total."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        # squared terms accumulate in decimal(38,0): a BIGINT sum of squares
        # wraps once a source exceeds ~9.2e18 total squared chars, exactly
        # the regime the stated ~1e38 bound targets (DuckDB's sum over
        # BIGINT widens to HUGEINT on its own)
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars")).alias("sq"),
    )
    # operands cast to decimal BEFORE multiplying: computing n*sq or s*s in
    # 64-bit first would silently wrap at ~3e9 total chars per source (well
    # inside 100 TB corpora) and only then widen -- the exactness bound must
    # hold for the PRODUCTS, not just the final comparison
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dev = dec("n") * F.col("n_chars").cast("decimal(38,0)") - dec("s")
    var_term = dec("n") * dec("sq") - dec("s") * dec("s")
    return (
        d.join(F.broadcast(stats), "source")
        .where(dev * dev > 4 * var_term)
        .select("doc_id", "source", "n_chars", F.col("n").alias("source_docs"))
    )


ORACLES["doc_length_outliers"] = """
WITH stats AS (
    SELECT source, count(*) AS n, sum(n_chars) AS s,
           sum(n_chars * n_chars) AS sq
    FROM documents GROUP BY 1
)
SELECT d.doc_id, d.source, d.n_chars, CAST(stats.n AS BIGINT) AS source_docs
FROM documents d JOIN stats USING (source)
WHERE (stats.n::HUGEINT * d.n_chars - stats.s)
      * (stats.n::HUGEINT * d.n_chars - stats.s)
      > 4 * (stats.n::HUGEINT * stats.sq - stats.s::HUGEINT * stats.s)
"""
QUERIES["doc_length_outliers"] = doc_length_outliers


# --- count-min sketch heavy hitters -----------------------------------------
CMS_DEPTH = 4     # independent hash rows
CMS_WIDTH = 256   # buckets per row = one md5 hex byte
CMS_TOP_K = 20


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus words with their count-min-sketch estimate, certifying
    the sketch math itself: `cms_overestimate` (est - exact) is >= 0 by the
    CMS one-sided-error invariant, and the oracle recomputes the identical
    sketch, so a hash match proves the distributed sketch equals the
    sequential definition.

    Hash family: row i buckets word w by md5 hex byte i (2 hex chars) --
    byte-exact in both engines, no int conversion. Scale shape: the token
    stream reduces to VOCABULARY grain first (map-side combined groupBy);
    the 4 x 256-cell sketch and the per-word estimates are all vocab-grain
    or smaller, and the sketch side of the estimate join is 1024 rows ->
    broadcast. At 100 TB the sketch is what you SHIP (merge = cell-wise
    sum, size independent of corpus) -- the exact counts exist here only to
    certify the estimate."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .withColumn("h", F.md5("word"))
    )
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("i"),
                F.substring("h", 2 * i + 1, 2).alias("bucket"),
            )
            for i in range(CMS_DEPTH)
        ])
    ).alias("r")
    melted = vocab.select("word", "exact_cnt", rows).select(
        "word", "exact_cnt", F.col("r.i").alias("i"), F.col("r.bucket").alias("bucket")
    )
    sketch = melted.groupBy("i", "bucket").agg(
        F.sum("exact_cnt").alias("cell_sum")
    )
    est = (
        melted.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cell_sum").alias("cms_est"))
    )
    return (
        est.orderBy(F.desc("exact_cnt"), F.asc("word"))
        .limit(CMS_TOP_K)
        .select(
            "word",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("cms_overestimate"),
        )
    )


_CMS_ROWS_SQL = "\n    UNION ALL\n".join(
    f"    SELECT word, exact_cnt, {i} AS i, substr(h, {2 * i + 1}, 2) AS bucket"
    " FROM vocab"
    for i in range(CMS_DEPTH)
)

ORACLES["heavy_hitters_cms"] = f"""
WITH vocab AS (
    SELECT word, count(*) AS exact_cnt, md5(word) AS h
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    GROUP BY 1
),
melted AS (
{_CMS_ROWS_SQL}
),
sketch AS (
    SELECT i, bucket, sum(exact_cnt) AS cell_sum FROM melted GROUP BY 1, 2
),
est AS (
    SELECT m.word, m.exact_cnt, min(s.cell_sum) AS cms_est
    FROM melted m JOIN sketch s ON s.i = m.i AND s.bucket = m.bucket
    GROUP BY 1, 2
)
SELECT word, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS cms_overestimate
FROM est
ORDER BY exact_cnt DESC, word ASC
LIMIT {CMS_TOP_K}
"""
QUERIES["heavy_hitters_cms"] = heavy_hitters_cms


# --- exact per-source sample (salted top-k) ---------------------------------
SAMPLE_TOP_K = 5


def per_source_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ``SAMPLE_TOP_K`` documents per source, selected by
    deterministic md5 order -- the "pull k inspection samples from every
    stratum" primitive (human eval, quality spot checks) where the selection
    must be reproducible across re-runs AND exact-k (the hash-threshold
    sampler ``stratified_sample_rates`` gives a rate, not a count).

    Runs on ``top_n_per_group_salted``: ranking within (source, salt bucket)
    first bounds every window partition at ~source/16, then re-ranks the
    <= 16*k survivors -- no single task ever sorts a whole source (at 100 TB
    a source is billions of rows; the plain per-group window is the
    straggler this operator exists to avoid). Salt is a pure row hash, so
    the result is bit-identical to the unsalted formulation the oracle
    spells out.
    """
    from cassandra_sstable_tools_spark.operators.topn import (
        top_n_per_group_salted,
    )

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        # concat_ws, not concat: Spark concat NULLs out on any NULL arg
        # while DuckDB concat skips NULLs -- concat_ws skips NULL args in
        # BOTH engines, so a NULL-source dirty row keys identically
        F.md5(
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("source"))
        ).alias("sample_key"),
    )
    return top_n_per_group_salted(
        keyed, ["source"], ["sample_key", "doc_id"], n=SAMPLE_TOP_K
    )


ORACLES["per_source_sample_topk"] = f"""
SELECT doc_id, source, sample_key, rank FROM (
    SELECT doc_id, source, sample_key,
           row_number() OVER (PARTITION BY source
                              ORDER BY sample_key, doc_id) AS rank
    FROM (SELECT doc_id, source,
                 md5(concat_ws('#', CAST(doc_id AS VARCHAR), source))
                     AS sample_key
          FROM documents)
) WHERE rank <= {SAMPLE_TOP_K}
"""
QUERIES["per_source_sample_topk"] = per_source_sample_topk


def doc_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram-LM-style quality signal: how CORPUS-TYPICAL a
    document's word bigrams are. The CCNet-style LM-perplexity filter's
    exact-arithmetic surrogate: instead of mean log P(w2|w1) (floats the
    driver hash cannot certify), the report carries the integer sums the
    probability is made of -- per doc, the number of bigrams, the summed
    corpus frequency of its bigrams, the summed corpus frequency of their
    LEFT words, and typicality_ppm = (sum_bf * 1e6) DIV sum_uf, an
    integer-DIV ratio in [0, 1e6] (bf(w1 w2) <= uf(w1) per row).
    Boilerplate/repeated text scores high; gibberish or rare-token soup
    scores low. Docs with < 2 words carry no bigrams and drop out
    (documented; the oracle mirrors).

    Scale posture: ONE bigram-grain explode (linear in corpus tokens);
    bigram/unigram counts are map-side-combined aggregates; the two
    frequency joins key on token strings (many-to-one: no fan-out; the
    stopword-skew path is AQE's skew-join case); final agg at doc grain.
    No windows, no driver-side state, nothing corpus-bounded in one task.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    pair = (
        "transform(sequence(0, size(w) - 2), "
        "i -> struct(w[i] AS w1, concat_ws(' ', w[i], w[i+1]) AS bigram))"
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.when(F.size("w") >= 2, F.expr(pair)).otherwise(
                F.expr("array()").cast(
                    "array<struct<w1:string,bigram:string>>"
                )
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.bigram")
    bf = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("bf"))
    uni = (
        docs.select(F.explode("w").alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("uf"))
        .withColumnRenamed("word", "w1")
    )
    return (
        bg.join(bf, "bigram")
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("bf").cast("bigint").alias("sum_bigram_freq"),
            F.sum("uf").cast("bigint").alias("sum_left_freq"),
        )
        .withColumn(
            "typicality_ppm",
            F.expr("(sum_bigram_freq * 1000000) DIV sum_left_freq").cast(
                "bigint"
            ),
        )
    )


STAGED_QUERIES = {"doc_bigram_typicality": doc_bigram_typicality}
STAGED_ORACLES = {
    "doc_bigram_typicality": r"""
WITH words AS (
    SELECT doc_id,
           generate_subscripts(string_split_regex(trim(text), '\s+'), 1) - 1
               AS pos,
           unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
),
uni AS (
    SELECT word, count(*) AS uf FROM words
    WHERE length(word) >= 1 GROUP BY 1
),
bg AS (
    SELECT w1.doc_id, w1.word AS w1, concat(w1.word, ' ', w2.word) AS bigram
    FROM words w1
    JOIN words w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
),
bf AS (SELECT bigram, count(*) AS bf FROM bg GROUP BY 1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(f.bf) AS BIGINT) AS sum_bigram_freq,
       CAST(sum(u.uf) AS BIGINT) AS sum_left_freq,
       CAST((CAST(sum(f.bf) AS BIGINT) * 1000000)
            // CAST(sum(u.uf) AS BIGINT) AS BIGINT) AS typicality_ppm
FROM bg g
JOIN bf f USING (bigram)
JOIN uni u ON u.word = g.w1
GROUP BY g.doc_id
"""
}
