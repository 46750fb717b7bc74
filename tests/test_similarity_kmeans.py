"""k-means IVF (ann_ivf_kmeans_topk): determinism, recall, and list balance
vs the first-K demo seeding -- for BOTH the bounded-sample driver-side
seeding (kmeans_centroids) and the distributed integer-exact Lloyd
refinement (kmeans_centroids_spark) the registry operator now uses.

Fixture caveat baked into the bounds: the synthetic embeddings are
near-orthogonal (max cosine ~0.5), so averaged k-means centroids sit
~equidistant from everything and probe recall is modest; the first-K
seeding's higher recall here is an artifact (queries 0..15 ARE its
centroids, so each query trivially probes its own list where its true
neighbors co-assign). The durable k-means win this test pins is BALANCE:
bounded inverted-list spread is what keeps per-query work predictable at
100 TB.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.llm import similarity as S
from cassandra_sstable_tools_spark.operators.topn import top_n_per_group


def _list_sizes(emb, cents):
    csim = (
        emb.join(F.broadcast(cents))
        .withColumn("cdot", S._dot(F.col("qv"), F.col("c_qv")))
        .withColumn("csim", S._sim(F.col("cdot"), F.col("norm"), F.col("c_norm")))
    )
    assigned = top_n_per_group(
        csim, ["vec_id"], [F.desc("csim"), F.asc("centroid_id")], 1
    )
    return [
        r.n
        for r in assigned.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    ]


def _kmeans_cents(spark, sf_dir):
    C = S.kmeans_centroids(spark, sf_dir)
    rows = [
        (cid, [int(q) for q in np.floor(v * 1000).astype("int64")])
        for cid, v in enumerate(C)
    ]
    km = spark.createDataFrame(rows, "centroid_id int, c_qv array<bigint>")
    norm = F.aggregate(F.col("c_qv"), F.lit(0).cast("bigint"), lambda a, x: a + x * x)
    return km.select("centroid_id", "c_qv", norm.alias("c_norm"))


def test_kmeans_seeding_deterministic(spark, sf_dir):
    """Hash-based sampling + first-max argmax: two runs, identical output."""
    a = sorted(map(tuple, S.ann_ivf_kmeans_topk(spark, sf_dir).collect()))
    b = sorted(map(tuple, S.ann_ivf_kmeans_topk(spark, sf_dir).collect()))
    assert a == b and len(a) == S.N_QUERIES * S.TOP_K


def test_kmeans_recall_beats_random_probing(spark, sf_dir):
    """Recall@K must clearly beat blind probing (NPROBE/K = 2/16 = 0.125
    expected under random assignment) even on the near-orthogonal fixture.
    (Measured: ~0.67 at sf0.01 with distributed Lloyd, vs ~0.39 for the
    sampled seeding it replaced -- bound kept loose for fixture drift.)"""
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_ivf_kmeans_topk(spark, sf_dir).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.35, f"kmeans IVF recall {recall:.3f} below bound"


def test_kmeans_lists_at_least_as_balanced(spark, sf_dir):
    """The point of Lloyd refinement: inverted-list spread (max-min) must not
    be worse than the first-K seeding's, and every list must be non-empty --
    for both the sampled seeding and the distributed Lloyd centroids."""
    emb = S._quantized(spark, sf_dir)
    firstk = emb.where(F.col("vec_id") < S.N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("qv").alias("c_qv"),
        F.col("norm").alias("c_norm"),
    )
    base = _list_sizes(emb, firstk)
    for label, cents in [
        ("sampled", _kmeans_cents(spark, sf_dir)),
        ("distributed", S._cents_frame(spark, S.kmeans_centroids_spark(spark, sf_dir))),
    ]:
        km = _list_sizes(emb, cents)
        assert len(km) == S.N_CENTROIDS, (
            f"{label}: empty inverted lists: {len(km)} of {S.N_CENTROIDS}"
        )
        assert max(km) - min(km) <= max(base) - min(base), (
            f"{label}: spread {max(km)}-{min(km)} worse than "
            f"first-K {max(base)}-{min(base)}"
        )


def test_distributed_lloyd_is_deterministic(spark, sf_dir):
    """Integer fixed-point member sums: two full runs must produce
    bit-identical centroids regardless of partitioning/row order."""
    a = S.kmeans_centroids_spark(spark, sf_dir)
    b = S.kmeans_centroids_spark(spark, sf_dir)
    assert a == b
