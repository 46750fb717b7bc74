"""Sequence packing for LLM training batches (concat-and-chunk).

`pack_chunks` assigns every document a position in the GPT-style packed
token stream: per language, documents are concatenated in doc_id order and
cut into fixed ``PACK_CHUNK_TOKENS``-token chunks; a document's ``chunk_id``
is the chunk containing its first token and ``chunk_offset`` its position
inside that chunk (documents may straddle chunk boundaries -- the pair
(chunk_id, chunk_offset) plus `tokens` fully determines the materialized
packing). No analog in the reference -- extension surface.

Scale posture (100 TB): the naive formulation is a per-language running
token sum -- `sum() OVER (PARTITION BY lang ORDER BY doc_id)` -- which
plans ONE window partition per language: a single task sorts an entire
language's documents (petabytes for English). This implementation is a
HIERARCHICAL PREFIX SUM instead:

1. bucket docs by ``doc_id div PACK_BUCKET_DOCS`` -- deterministic, no
   sampling, no spark_partition_id;
2. per-(lang, bucket) token sums (map-side combinable aggregation);
3. the per-language running sum runs over BUCKET sums -- a frame
   PACK_BUCKET_DOCS times smaller than the corpus (tiny: #buckets rows of
   3 narrow columns), so the per-lang window partition is bounded;
4. doc-level running sums restart per (lang, bucket) -- thousands of small
   window partitions instead of one per language -- and the broadcast
   bucket offsets shift them into global positions.

Every stage is built-in codegen'd DataFrame ops; no Python in the plan.
The DuckDB oracle is the naive single-window formulation -- same integers,
different physical plan; the hash match is the proof of equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm.text import _TOKEN_RE
from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table

# Tokens per packed training chunk (test-scale knob; 100 TB value is the
# model's sequence length, e.g. 4096/8192).
PACK_CHUNK_TOKENS = 4096
# doc_ids per prefix-sum bucket: bounds BOTH the per-(lang,bucket) window
# partition (<= this many docs) and the per-lang bucket window
# (#docs / this many rows).  sqrt(N)-ish at deployment scale.
PACK_BUCKET_DOCS = 64


def pack_chunks(spark: SparkSession, sf_dir: str, token_expr=None) -> DataFrame:
    """(doc_id, lang, tokens, chunk_id, chunk_offset) for every document.

    ``token_expr``: optional Column-builder ``text_col -> token_count``
    swapping the default regex proxy counter for a real tokenizer --
    `pack_chunks_bpe` (llm/bpe.py) passes a trained BPE merge list here.
    The packing plan is identical either way; only the one scan-level
    expression changes."""
    d = load_table(spark, sf_dir, "documents")
    tokens = (
        token_expr(F.col("text"))
        if token_expr is not None
        else F.regexp_count("text", F.lit(_TOKEN_RE))
    )
    scored = d.select(
        "doc_id",
        "lang",
        tokens.cast("bigint").alias("tokens"),
        F.expr(f"doc_id div {PACK_BUCKET_DOCS}").alias("bucket"),
    )
    # Level 1: per-(lang, bucket) totals -- partial-aggregated map-side.
    bucket_sums = scored.groupBy("lang", "bucket").agg(
        F.sum("tokens").alias("bucket_tokens")
    )
    # Level 2: running sum over buckets (tiny frame; per-lang partition is
    # #buckets rows, never #docs).
    w_buckets = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias(
            "bucket_start"
        ),
    )
    # Level 3: doc-level running sum WITHIN each (lang, bucket) -- bounded
    # window partitions -- shifted by the broadcast bucket offsets.
    w_docs = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("tokens").over(w_docs), F.lit(0)) + F.col("bucket_start")
    # eqNullSafe on lang: the oracle's PARTITION BY lang treats NULL as a
    # group, but a plain equi-join would silently DROP every NULL-lang
    # dirty row (NULL never equals NULL)
    off = offsets.withColumnRenamed("lang", "_lang").withColumnRenamed(
        "bucket", "_bucket"
    )
    return (
        scored.join(
            F.broadcast(off),
            F.col("lang").eqNullSafe(F.col("_lang"))
            & (F.col("bucket") == F.col("_bucket")),
        )
        .drop("_lang", "_bucket")
        .withColumn("start", start)
        .select(
            "doc_id",
            "lang",
            "tokens",
            F.expr(f"start div {PACK_CHUNK_TOKENS}").alias("chunk_id"),
            (F.col("start") % PACK_CHUNK_TOKENS).alias("chunk_offset"),
        )
    )


# Naive single-window formulation: the semantics spec.  Shared by every
# packing oracle -- callers prepend a `scored(doc_id, lang, tokens)` CTE
# holding their token counter and append this tail, so the packing
# recurrence has exactly ONE SQL definition.
PACK_ORACLE_TAIL = f"""cum AS (
  SELECT doc_id, lang, tokens,
         coalesce(sum(tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM scored
)
SELECT doc_id, lang, tokens,
       CAST(start // {PACK_CHUNK_TOKENS} AS BIGINT) AS chunk_id,
       CAST(start % {PACK_CHUNK_TOKENS} AS BIGINT) AS chunk_offset
FROM cum
"""

ORACLES = {
    "pack_chunks": f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS tokens
  FROM documents
),
{PACK_ORACLE_TAIL}""",
}

QUERIES = {
    "pack_chunks": pack_chunks,
}
