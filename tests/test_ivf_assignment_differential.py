"""Randomized differential for the IVF literal-argmax assignment
(_ivf_assign_probes): the r05 rewrite replaced a join+window ranking with a
per-row array fold, so assignment AND probe selection semantics -- including
the ties -> lowest-centroid-id rule -- are re-proven here against a pure
Python model computing the identical IEEE expression
(dot / sqrt(float(norm * c_norm))).

Tie pressure is engineered: duplicated centroids (every vector ties between
them) and corpus vectors equal to a centroid (perfect-match ties).
"""

from __future__ import annotations

import math
import random

from cassandra_sstable_tools_spark.llm import similarity as S


def _model(vectors, cent_rows, n_queries, nprobe):
    """(assigned, probes) the sequential way: score each (vec, centroid)
    with the exact expression the Spark fold evaluates; rank by
    (-score, centroid_id)."""
    cent_rows = sorted(cent_rows)
    assigned = {}
    probes = {}
    for vid, vec in vectors:
        norm = sum(v * v for v in vec)
        ranked = []
        for cid, cvec in cent_rows:
            dot = sum(a * b for a, b in zip(vec, cvec))
            cnorm = sum(v * v for v in cvec)
            score = dot / math.sqrt(float(norm * cnorm))
            ranked.append((-score, cid))
        ranked.sort()
        assigned[vid] = ranked[0][1]
        if vid < n_queries:
            probes[vid] = [cid for _, cid in ranked[:nprobe]]
    return assigned, probes


def test_ivf_assignment_matches_python_model(spark):
    rng = random.Random(20260814)
    for trial in range(4):
        dims = rng.choice([4, 8])
        n = rng.choice([30, 80])
        k = rng.choice([3, 5])
        vectors = []
        for vid in range(n):
            vec = [rng.randrange(-50, 51) for _ in range(dims)]
            if all(v == 0 for v in vec):
                vec[0] = 1  # zero-norm vectors are out of contract
            vectors.append((vid, vec))
        cent_rows = [(cid, list(vectors[cid][1])) for cid in range(k)]
        # tie pressure: duplicate centroid 0 as an extra centroid, and
        # clone centroid 1's vector into a non-centroid corpus row
        cent_rows.append((k, list(cent_rows[0][1])))
        vectors[k + 1] = (k + 1, list(cent_rows[1][1]))

        emb = spark.createDataFrame(
            [(vid, vec, sum(v * v for v in vec)) for vid, vec in vectors],
            "vec_id long, qv array<bigint>, norm bigint",
        )
        assigned_df, probes_df = S._ivf_assign_probes(emb, cent_rows)
        got_assign = {r.vec_id: r.centroid_id for r in assigned_df.collect()}
        got_probes = {}
        for r in probes_df.collect():
            got_probes.setdefault(r.query_id, []).append(r.centroid_id)

        want_assign, want_probes = _model(
            vectors, cent_rows, S.N_QUERIES, S.NPROBE
        )
        assert got_assign == want_assign, f"trial {trial}: assignment diverged"
        # probe ORDER within a query is not part of the contract (explode
        # order is, but the join consumes them as a set) -- compare sets
        assert {q: sorted(v) for q, v in got_probes.items()} == {
            q: sorted(v) for q, v in want_probes.items()
        }, f"trial {trial}: probes diverged"
        # the duplicated centroid (id k, same vector as id 0) must NEVER
        # win an assignment: ties go to the lowest centroid id
        assert k not in set(got_assign.values()), "tie-break violated"
