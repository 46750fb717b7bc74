"""Banded multi-probe sign-LSH (ann_lsh_topk): band-width derivation,
recall vs bruteforce, and the bounded k-means sample math.

Fixture caveat (same as test_similarity_kmeans): the synthetic embeddings
are near-orthogonal, so any sign-LSH recall is modest; the bound pins
"clearly better than the candidate-fraction baseline", not real-corpus
recall (~0.9+ on clustered data).
"""

from __future__ import annotations

from cassandra_sstable_tools_spark.llm import similarity as S


def test_lsh_bits_tracks_corpus_size():
    # E[candidates/query] = B * N / 2^bits ~= LSH_TARGET_CANDIDATES
    assert S._lsh_bits(500) == 4       # fixture sf0.001/sf0.01
    assert S._lsh_bits(5000) == 8      # fixture sf0.1
    assert S._lsh_bits(10**9) == S.LSH_MAX_BITS  # clamped; 100 TB regime
    assert S._lsh_bits(1) == S.LSH_MIN_BITS
    widths = [S._lsh_bits(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
    assert widths == sorted(widths), "band width must be monotone in N"


def test_kmeans_sample_bounded_at_any_scale():
    """Driver collect is O(k * KMEANS_SAMPLE_PER_CENTROID) for ANY corpus
    size: expected sample n/mod stays under 2x target (and a limit(2*target)
    hard-caps skew besides)."""
    target = S.N_CENTROIDS * S.KMEANS_SAMPLE_PER_CENTROID
    for n in (1, 500, target, 2 * target, 10**6, 10**9, 10**12):
        mod = max(1, n // target)
        assert n / mod <= 2 * target


def test_lsh_full_topk_and_recall(spark, sf_dir):
    """Multi-probe must fill all K slots per query on the fixture and beat
    the single-band candidate-fraction baseline with margin."""
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    got = S.ann_lsh_topk(spark, sf_dir).collect()
    assert len(got) == S.N_QUERIES * S.TOP_K, "a query came back short of top-K"
    recall = len(truth & {(r.query_id, r.neighbor_id) for r in got}) / len(truth)
    assert recall >= 0.30, f"multi-probe LSH recall {recall:.3f} below bound"
