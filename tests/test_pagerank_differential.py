"""Randomized differential: distributed fixed-round PageRank vs a literal
Python replay of the same integer recurrence (random directed graphs cover
dangling nodes, self-loops, multi-in-degree hubs the trade graph may not)."""

from __future__ import annotations

import random
from collections import defaultdict

from cassandra_sstable_tools_spark.operators.graph import (
    PR_BASE,
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_INIT,
    PR_ROUNDS,
    pagerank,
)


def sequential_pagerank(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = {n for e in edges for n in e}
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    rank = {n: PR_INIT for n in nodes}
    for _ in range(PR_ROUNDS):
        incoming = defaultdict(int)
        for s, dsts in out.items():
            for d in dsts:
                incoming[d] += rank[s] * PR_DAMP_NUM // (PR_DAMP_DEN * len(dsts))
        rank = {n: PR_BASE + incoming.get(n, 0) for n in nodes}
    return rank


def test_pagerank_matches_sequential_model(spark):
    rng = random.Random(20260814)
    for trial in range(3):
        n = rng.choice([4, 12, 40])
        edges = {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.choice([6, 30, 120]))
        }
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
        assert got == sequential_pagerank(edges), f"trial {trial}"
