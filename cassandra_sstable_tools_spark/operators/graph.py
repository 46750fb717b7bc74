"""Connected components over an undirected edge list -- the grouping step
between pairwise similarity output and "keep one per duplicate group".

Iterative distributed min-label propagation: per round, every node takes
min(own label, neighbors' labels) -- one equi-join + one groupBy(min) over
the edges, repeated to a fixpoint detected by the monotone sum-of-labels
invariant (labels only decrease and are integers, so an unchanged sum IS
convergence; one cheap aggregate per round). localCheckpoint truncates the
growing lineage each round (on a cluster: checkpoint dir).

Scale: rounds = graph diameter; duplicate-cluster graphs are shallow (docs
duplicating a common source). The alternating small-star/large-star
formulation (O(log n) rounds, same per-round plan shape) is the upgrade
path if diameters grew. Non-convergence raises -- never silently wrong
labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITERS = 20


def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iters: int = CC_MAX_ITERS,
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = min node id
    of the connected component. `pairs` rows are undirected edges."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} rounds"
        )
    edges.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))
