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


# --- PageRank (fixed-round, integer-exact) ----------------------------------
PR_ROUNDS = 5
PR_INIT = 1_000_000          # initial rank mass per node (ppm of one unit)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact ratio
PR_BASE = PR_INIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # (1-d)*init


def pagerank(edges: DataFrame, src: str, dst: str,
             rounds: int = PR_ROUNDS) -> DataFrame:
    """Fixed-round PageRank over a DIRECTED edge list, entirely in integer
    arithmetic: per round every node's rank becomes
    ``PR_BASE + sum(floor(r(u) * 85 / (100 * outdeg(u))))`` over in-edges.

    Fixed rounds (not convergence detection) + integer floor division make
    the result bit-exact and SQL-expressible -- the oracle unrolls the same
    recurrence as chained CTEs, so a hash match proves the distributed
    iteration equals the sequential definition. Per round the plan is ONE
    equi-join (edges pre-joined with out-degrees, keyed on src -- reused
    partitioning) + ONE groupBy(dst): the standard distributed PageRank
    shape, linear in |E| per round, no N^2 anywhere. Dangling mass is
    dropped (nodes keep the base term) -- documented, matches the oracle.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(PR_INIT).cast("bigint"))
    for _ in range(rounds):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {PR_DAMP_NUM}) div ({PR_DAMP_DEN} * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(PR_BASE) + F.coalesce(F.col("in_mass"), F.lit(0)))
            .cast("bigint")
            .alias("rank"),
        )
    # materialize the final ranks off the caches, then release them --
    # otherwise every invocation leaks two pinned frames for the session
    # lifetime (evicting genuinely shared caches like the adapter's cells)
    ranks = ranks.localCheckpoint(eager=True)
    e_deg.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_unrolled_sql(edges_cte: str, rounds: int = PR_ROUNDS) -> str:
    """DuckDB mirror: the same recurrence unrolled as chained CTEs (recursive
    CTEs forbid aggregation in the recursive member, so fixed-round
    unrolling IS the relational formulation). `edges_cte` must name a CTE
    `edges(src, dst)` already distinct."""
    parts = [f"""deg AS (SELECT src, count(*) AS outdeg FROM {edges_cte} GROUP BY 1),
pr_nodes AS (
    SELECT src AS node FROM {edges_cte}
    UNION SELECT dst FROM {edges_cte}
),
pr0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS rank FROM pr_nodes)"""]
    for i in range(rounds):
        parts.append(f"""pr{i + 1} AS (
    SELECT n.node,
           CAST({PR_BASE} + coalesce(s.in_mass, 0) AS BIGINT) AS rank
    FROM pr_nodes n LEFT JOIN (
        SELECT e.dst AS node,
               sum((p.rank * {PR_DAMP_NUM}) // ({PR_DAMP_DEN} * d.outdeg))
                   AS in_mass
        FROM pr{i} p
        JOIN {edges_cte} e ON e.src = p.node
        JOIN deg d ON d.src = e.src
        GROUP BY 1
    ) s ON s.node = n.node
)""")
    return ",\n".join(parts)
