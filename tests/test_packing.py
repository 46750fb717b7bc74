"""Differential test: the hierarchical two-level prefix sum in pack_chunks
must agree with a plain sequential model on randomized inputs (bucket
boundaries, empty buckets, chunk straddles, multi-language interleave are
all exercised by the random draw)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm import packing


def _naive_model(rows, chunk_tokens):
    """Sequential concat-and-chunk per language in doc_id order."""
    out = {}
    by_lang: dict = {}
    for lang, doc_id, tokens in sorted(rows, key=lambda r: (r[0], r[1])):
        start = by_lang.get(lang, 0)
        out[doc_id] = (start // chunk_tokens, start % chunk_tokens)
        by_lang[lang] = start + tokens
    return out


def test_pack_chunks_matches_sequential_model(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice(["en", "de", "fr"]), doc_id, rng.randrange(0, 3000))
        for doc_id in rng.sample(range(10_000), 400)  # sparse ids: empty buckets
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id bigint, tokens bigint")
    scored = df.withColumn(
        "bucket", F.expr(f"doc_id div {packing.PACK_BUCKET_DOCS}")
    )
    # Reuse the production plan from the bucketed frame onward.
    from pyspark.sql import Window

    w_buckets = (
        Window.partitionBy("lang").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_sums = scored.groupBy("lang", "bucket").agg(
        F.sum("tokens").alias("bucket_tokens")
    )
    offsets = bucket_sums.select(
        "lang", "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias("bucket_start"),
    )
    w_docs = (
        Window.partitionBy("lang", "bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        r.doc_id: (r.chunk_id, r.chunk_offset)
        for r in scored.join(F.broadcast(offsets), ["lang", "bucket"])
        .withColumn(
            "start",
            F.coalesce(F.sum("tokens").over(w_docs), F.lit(0)) + F.col("bucket_start"),
        )
        .select(
            "doc_id",
            F.expr(f"start div {packing.PACK_CHUNK_TOKENS}").alias("chunk_id"),
            (F.col("start") % packing.PACK_CHUNK_TOKENS).alias("chunk_offset"),
        )
        .collect()
    }
    expected = _naive_model(rows, packing.PACK_CHUNK_TOKENS)
    assert got == expected
