"""The small-star/large-star CC must agree with the certified min-label
operator on random graphs (isolated-after-merge nodes, chains -- the long-
diameter case star rounds exist for -- cliques, self-loops, multi-component
mixes)."""

from __future__ import annotations

import random

from cassandra_sstable_tools_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_star_cc_matches_min_label_on_random_graphs(spark):
    rng = random.Random(20260814)
    cases = []
    # long chain: the adversarial case for O(diameter) propagation
    cases.append([(i, i + 1) for i in range(40)])
    for _ in range(3):
        n = rng.choice([6, 20, 60])
        cases.append(
            [(rng.randrange(n), rng.randrange(n))
             for _ in range(rng.choice([4, 25, 80]))]
        )
    for i, edges in enumerate(cases):
        df = spark.createDataFrame(edges, "a long, b long")
        # the chain needs O(diameter) min-label rounds -- the exact weakness
        # the star formulation removes; give the BASELINE a bigger budget
        want = _labels(connected_components(df, "a", "b", max_iters=100))
        got = _labels(connected_components_star(df, "a", "b"))
        assert got == want, f"case {i}: star CC diverged from min-label CC"


def test_star_cc_collapses_deep_chain_within_default_budget(spark):
    """The O(log n) claim, behaviorally: a 200-node chain (diameter 200 --
    min-label propagation would need ~200 rounds) collapses to one
    component within the DEFAULT round budget (20). This is the measurable
    difference between the two formulations, not just an asymptotic note."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = _labels(connected_components_star(df, "a", "b"))
    assert got == {i: 0 for i in range(201)}
