"""The bucket-capped band join (operators/banding.py), exercised where the
fixtures can't reach it: buckets BIGGER than the cap.

Fixture corpora are near-unique, so the driver's certification only ever
runs the in-cap branch. These tests plant mass-duplicated corpora (the
actual 100 TB hazard: thousands of copies of one boilerplate page / one
embedding) and prove:

1. unit semantics of the helper (in-cap all-pairs, over-cap star edges);
2. Spark == DuckDB on planted corpora WITH the cap branch active, for the
   registered minhash / simhash / embedding near-dup queries -- i.e. the
   capped rule is certified, not just the easy path;
3. connectivity survives the cap: every copy lands in ONE dedup cluster
   through the representative, while the pair list stays LINEAR in the
   number of copies (the whole point of the cap).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from conftest import assert_matches_oracle

from cassandra_sstable_tools_spark.llm import dedup, similarity
from cassandra_sstable_tools_spark.operators.banding import capped_band_pairs

N_COPIES = 1100  # > SIMHASH_MAX_BUCKET (1024) > MINHASH_MAX_BUCKET (256)
N_DISTINCT = 20
N_VEC_COPIES = 300  # > NEARDUP_MAX_BUCKET (256)


def test_helper_unit_semantics(spark):
    rows = [(i, 0, "hot") for i in range(6)] + [(10, 0, "cold"), (11, 0, "cold")]
    long = spark.createDataFrame(rows, "id bigint, band_id int, bk string")
    got = {
        (r.a, r.b)
        for r in capped_band_pairs(long, "id", "a", "b", cap=3).collect()
    }
    star = {(0, i) for i in range(1, 6)}  # over-cap: representative edges
    assert got == star | {(10, 11)}, got


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_planted")
    rng = np.random.default_rng(7)
    boiler = "the quick brown fox jumps over the lazy dog again and again today"
    texts, srcs = [], []
    for i in range(N_COPIES):
        texts.append(boiler)
        srcs.append("boiler")
    words = ["alpha", "bravo", "carol", "delta", "echo", "fox", "golf",
             "hotel", "india", "julia", "kilo", "lima"]
    for i in range(N_DISTINCT):
        # distinct docs: shuffled vocabularies, no shared trigrams w.h.p.
        perm = rng.permutation(words)
        texts.append(" ".join(f"{w}{i}" for w in perm))
        srcs.append("unique")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))

    base = rng.normal(size=64).astype(np.float32)
    vecs = [base] * N_VEC_COPIES + [
        rng.normal(size=64).astype(np.float32) for _ in range(N_DISTINCT)
    ]
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(emb, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def planted_ddb(planted_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(planted_dir, t)}.parquet')"
        )
    yield con
    con.close()


def test_minhash_capped_matches_oracle(spark, planted_dir, planted_ddb):
    df = dedup.minhash_lsh_pairs(spark, planted_dir)
    # over-cap bucket: star edges only -> linear in copies, never C(f, 2)
    n = df.count()
    assert N_COPIES - 1 <= n < 3 * N_COPIES, n
    assert_matches_oracle(df, dedup.ORACLES["minhash_lsh_pairs"], planted_ddb)


def test_simhash_capped_matches_oracle(spark, planted_dir, planted_ddb):
    df = dedup.simhash_neardup_pairs(spark, planted_dir)
    n = df.count()
    assert N_COPIES - 1 <= n < 3 * N_COPIES, n
    assert_matches_oracle(
        df, dedup.ORACLES["simhash_neardup_pairs"], planted_ddb
    )


def test_embedding_capped_matches_oracle(spark, planted_dir, planted_ddb):
    df = similarity.embedding_neardup_pairs(spark, planted_dir)
    n = df.count()
    assert N_VEC_COPIES - 1 <= n < 3 * N_VEC_COPIES, n
    assert_matches_oracle(
        df, similarity.ORACLES["embedding_neardup_pairs"], planted_ddb
    )


def test_connectivity_survives_cap(spark, planted_dir):
    """All copies form ONE cluster through the representative."""
    clusters = dedup.dedup_clusters(spark, planted_dir).collect()
    comp = {r.doc_id: r.cluster_id for r in clusters}
    copy_components = {comp[i] for i in range(N_COPIES) if i in comp}
    assert copy_components == {0}, copy_components
