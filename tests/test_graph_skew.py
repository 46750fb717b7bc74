"""Power-law hub skew proof for the graph operators (r06 VERDICT #4).

pagerank's per-round ``groupBy(dst)`` and star-CC's ``groupBy(src)`` meet a
hub node head-on at 100 TB (one page linked by half the web). These tests
plant a hub holding ~half of all edges at a size where a quadratic or
single-reducer pathology is visible in wall-clock, assert bit-exact
agreement with a sequential replay, and record a generous timing bound so
a skew regression fails loudly rather than silently burning cluster time.

Why groupBy skew is survivable by design: Spark's hash aggregation runs
map-side partial aggregation before the exchange, so the hub's per-round
in-mass sum arrives at the reducer as ONE partial row per map task (~tasks
rows, not ~|E|/2 rows). The hot-reducer risk is the JOIN on the hub key;
AQE skew-join splitting (enabled in session.py, on by default in the
driver's Spark 4 session) covers that. If either assumption breaks, the
timing bound here trips and `salted_agg` (operators/salting.py) is the
documented fallback route for the contribution sum.
"""

from __future__ import annotations

import time
from collections import defaultdict

from pyspark.sql import functions as F

from cassandra_sstable_tools_spark.operators.graph import (
    connected_components_star,
    pagerank,
)
from tests.test_pagerank_differential import sequential_pagerank

N_EDGES = 120_000
N_NODES = 8_000
HUB = 0
_MIX = 2_654_435_761  # Knuth multiplicative hash, deterministic both sides

# one generous wall-clock ceiling per operator: ~10x the healthy local[8]
# runtime, far under what a single-reducer O(|E|^2/buckets) pathology costs
PAGERANK_HUB_BOUND_S = 120.0
CC_HUB_BOUND_S = 120.0


def _hub_edges() -> set[tuple[int, int]]:
    """Deterministic edge set: every even i points AT the hub (half of all
    edges); odd i lands on a mixed pseudo-random node. Python mirror of the
    Spark-side generation below, so the differential has no I/O step."""
    edges = set()
    for i in range(N_EDGES):
        src = i % N_NODES
        dst = HUB if i % 2 == 0 else (i * _MIX % (1 << 32)) % N_NODES
        edges.add((src, dst))
    return edges


def _hub_edges_df(spark):
    return spark.range(N_EDGES).select(
        (F.col("id") % N_NODES).alias("src"),
        F.when(F.col("id") % 2 == 0, F.lit(HUB))
        .otherwise(
            F.pmod(F.pmod(F.col("id") * _MIX, F.lit(1 << 32)), F.lit(N_NODES))
        )
        .cast("long")
        .alias("dst"),
    )


def test_pagerank_hub_graph_exact_and_bounded(spark):
    edges = _hub_edges()
    df = _hub_edges_df(spark)
    # the Spark-side generator must be the same graph the model replays
    assert {(r["src"], r["dst"]) for r in df.distinct().collect()} == edges

    t0 = time.monotonic()
    got = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
    elapsed = time.monotonic() - t0
    want = sequential_pagerank(edges)
    assert got == want, "hub-graph pagerank diverged from sequential replay"
    # the hub's rank must actually reflect the skew (sanity: it absorbed
    # half the graph's edges, so it dwarfs a typical node)
    assert want[HUB] > 100 * sorted(want.values())[len(want) // 2]
    assert elapsed < PAGERANK_HUB_BOUND_S, (
        f"hub pagerank took {elapsed:.1f}s -- skew pathology "
        f"(bound {PAGERANK_HUB_BOUND_S}s)"
    )
    print(f"\nhub pagerank: {elapsed:.1f}s over {len(edges)} edges")


def test_star_cc_hub_graph_exact_and_bounded(spark):
    """Star CC on a hub graph: the hub makes every (large-star) groupBy see
    one giant adjacency. All nodes reachable from/to the hub collapse to
    component 0; nodes never touching the hub keep their own components --
    computed by a sequential union-find replay."""
    edges = _hub_edges()
    df = _hub_edges_df(spark).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )

    parent = list(range(N_NODES))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    # component label = min node id in the component (the operator contract)
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in nodes}

    t0 = time.monotonic()
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, "a", "b").collect()
    }
    elapsed = time.monotonic() - t0
    assert got == want, "hub-graph star CC diverged from union-find replay"
    assert elapsed < CC_HUB_BOUND_S, (
        f"hub star CC took {elapsed:.1f}s -- skew pathology "
        f"(bound {CC_HUB_BOUND_S}s)"
    )
    print(f"hub star CC: {elapsed:.1f}s over {len(edges)} edges")
