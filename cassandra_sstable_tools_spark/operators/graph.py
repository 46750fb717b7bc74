"""Connected components over an undirected edge list -- the grouping step
between pairwise similarity output and "keep one per duplicate group".

Iterative distributed min-label propagation: per round, every node takes
min(own label, neighbors' labels) -- one equi-join + one groupBy(min) over
the edges, repeated to a fixpoint detected by the monotone sum-of-labels
invariant (labels only decrease and are integers, so an unchanged sum IS
convergence; one cheap aggregate per round). localCheckpoint truncates the
growing lineage each round (on a cluster: checkpoint dir).

Scale: rounds = graph diameter; duplicate-cluster graphs are shallow (docs
duplicating a common source). For deep graphs the alternating
small-star/large-star formulation (``connected_components_star``, O(log n)
rounds) is IMPLEMENTED below and differential-tested equal to this
operator -- including a chain whose diameter exceeds this operator's round
budget. Non-convergence raises -- never silently wrong labels.
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
    und = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    # Self-loops fold the "keep my own label" term INTO the neighbor
    # minimum: min over labels of (neighbors + self) == least(own label,
    # neighbor min), so each round is ONE equi-join + ONE groupBy(min)
    # where the old formulation paid a SECOND labels-side join just to
    # re-attach the node's own label (optimization guide S2.4 -- remove
    # shuffles outright). Hash-partitioning the (big, static) edge side
    # on the join key once means every round's join reuses this cached
    # distribution and only the node-grain labels frame moves.
    edges = (
        und.union(
            und.select(F.col("src").alias("src"), F.col("src").alias("dst"))
            .distinct()
        )
        .repartition("dst")
        .persist()
    )
    # Lazy checkpoint + the checksum aggregate as the materializing
    # action: one job per round does BOTH the checkpoint write and the
    # convergence check (the eager=True form paid a second full pass per
    # round just to read the sum; optimization guide S1.2 -- remove
    # passes). Blocks persist whole rows at the RDD layer, so the
    # column-pruned aggregate above them changes nothing.
    # try/finally (r12 ADVICE): the non-convergence raise must not leak the
    # persisted (self-loop-grown, repartitioned) edges frame
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .localCheckpoint(eager=False)
        )
        prev_sum = labels.agg(F.sum("lbl")).first()[0]
        for _ in range(max_iters):
            labels = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("lbl").alias("lbl"))
                .select(F.col("src").alias("node"), "lbl")
                .localCheckpoint(eager=False)
            )
            cur_sum = labels.agg(F.sum("lbl")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(
                f"connected components did not converge in {max_iters} rounds"
            )
    finally:
        edges.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


# --- small-star / large-star connected components ---------------------------
# The O(log n)-round formulation (the "upgrade path" the min-label operator's
# docstring promises): Kiveris et al., "Connected Components in MapReduce and
# Beyond" (SoCC'14). Alternating star rounds flatten trees doubly-
# exponentially, so 10^10-node graphs converge in a handful of rounds where
# plain label propagation needs the graph diameter.


def _star_round(edges: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """One star operation over an undirected edge set held as BOTH directed
    copies (Kiveris et al., SoCC'14, Algorithms 1-2). Per center u:
    m = min(N(u) + {u}); large-star emits (v, m) for neighbors v > u;
    small-star emits (v, m) for neighbors v <= u AND (u, m) for the center
    itself -- without the center emission the star's root would detach from
    its spokes and components silently shatter (caught by the differential
    test on a chain). Self-loops drop; (v <= u)-neighbor minima equal
    full-neighborhood minima because larger neighbors can never beat u.

    ``dedup=False`` skips the output ``distinct`` (one exchange +
    aggregate): sound whenever the consumer is another star round followed
    by a deduplicating one, because groupBy(min) and the min-attach join
    are insensitive to duplicate edges and the duplicate multiplicity is
    bounded by the round's own input size (large-star emits at most one
    row per input directed edge, so the undeduped set never exceeds the
    deduped previous round's edge count)."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("nbr_min"))
    m = F.least(F.col("nbr_min"), F.col("src"))
    tgt = F.col("dst") > F.col("src") if large else F.col("dst") <= F.col("src")
    out = (
        edges.join(mins, "src")
        .where(tgt)
        .select(F.col("dst").alias("a"), m.alias("b"))
    )
    if not large:
        centers = mins.select(
            F.col("src").alias("a"),
            F.least(F.col("nbr_min"), F.col("src")).alias("b"),
        )
        out = out.union(centers)
    out = out.where(F.col("a") != F.col("b"))
    return out.distinct() if dedup else out


def connected_components_star(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iters: int = CC_MAX_ITERS,
) -> DataFrame:
    """Same contract as ``connected_components`` (node -> min-id component),
    via alternating large-star/small-star rounds. Each round is two
    groupBy(min) + join passes over the CURRENT edge set -- which shrinks
    toward star graphs centered on component minima -- so total work decays
    with the rounds and the round count is O(log n), not O(diameter). Per
    the same monotone argument as min-label propagation, an unchanged edge
    checksum is convergence; non-convergence raises. Equality with the
    min-label operator is pinned by a randomized differential test."""
    singles = (
        pairs.select(F.col(a_col).alias("node"))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .persist()
    )
    und = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .where(F.col(a_col) != F.col(b_col))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the first checksum
    )

    def both_dirs(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )

    def checksum(e: DataFrame):
        # Order-independent SET identity, not an arithmetic sum: summing
        # xxhash64(a, b) makes any edge rewire change the checksum with
        # overwhelming probability, whereas (count, sum(a+b)) could in
        # principle survive a swap (e.g. {1-4, 2-3} -> {1-3, 2-4}) and
        # terminate a round early with wrong labels.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a bigint sum of 64-bit hashes overflows
            # (ANSI mode raises); decimal(38,0) is exact to ~1e19 edges
            F.sum(F.xxhash64(F.col("a"), F.col("b")).cast("decimal(38,0)")).alias("s"),
        ).first()
        return (row["n"], row["s"])

    prev = checksum(und)
    for _ in range(max_iters):
        # fuse the large-star and small-star passes into ONE materialized
        # job per iteration: the intermediate edge set is never needed by
        # name, so checkpointing it only doubled the per-round job count
        # lazy checkpoint: the checksum right below is the materializing
        # action, so each round is ONE job (write blocks + convergence
        # check) instead of two full passes. The INTERMEDIATE large-star
        # output skips its distinct (dedup=False): the small-star round
        # is duplicate-insensitive and ends in its own distinct, so the
        # round's edge SET is unchanged while one full exchange +
        # hash-aggregate per round disappears (guide S2.4).
        und = _star_round(
            both_dirs(_star_round(both_dirs(und), large=True, dedup=False)),
            large=False,
        ).localCheckpoint(eager=False)
        cur = checksum(und)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star connected components did not converge in {max_iters} rounds"
        )
    # converged edge set is a union of stars rooted at component minima:
    # every node's label = min(self, neighbors); isolated former nodes (their
    # component collapsed into them) label themselves
    labels = (
        both_dirs(und)
        .groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("node"),
            F.least("nbr_min", F.col("src")).alias("component"),
        )
    )
    out = (
        singles.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    out = out.localCheckpoint(eager=True)
    singles.unpersist()
    return out


# --- PageRank (fixed-round, integer-exact) ----------------------------------
PR_ROUNDS = 5
PR_INIT = 1_000_000          # initial rank mass per node (ppm of one unit)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact ratio
PR_BASE = PR_INIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # (1-d)*init


def _free_checkpoint_blocks(sc, rdd_ids) -> None:
    """Best-effort eager release of localCheckpoint block storage.

    ``DataFrame.localCheckpoint`` persists an internal RDD that the public
    Dataset API gives no handle to; its blocks are otherwise freed only
    lazily when the ContextCleaner GCs the plan -- across a many-round
    iteration that lets dead per-round checkpoints pile up (r06 ADVICE).
    We diff ``JavaSparkContext.getPersistentRDDs`` ids around the
    checkpoint call and unpersist the previous round's ids explicitly.
    Wrapped defensively: failure here only defers cleanup to the
    ContextCleaner, never affects results.

    Spark logs "locally checkpointed ... cannot be recomputed after
    unpersisting" at WARN for each freed RDD -- expected: the freed rounds
    are dead by construction (the NEXT round is already eagerly
    materialized), so non-recomputability is exactly the point.
    """
    try:
        m = sc._jsc.getPersistentRDDs()
        for rid in rdd_ids:
            jrdd = m.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
    except Exception:
        pass


def _persistent_rdd_ids(sc) -> set:
    try:
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    except Exception:
        return set()


def _new_local_ckpt_ids(sc, before: set) -> set:
    """Ids persisted since ``before`` that are LOCALLY CHECKPOINTED rdds.

    The raw id diff would attribute ANY rdd persisted in the window to this
    round -- on a shared session a concurrent job's ``cache()`` could get
    unpersisted a round later (r07 ADVICE #5). Filtering on
    ``isLocallyCheckpointed`` excludes plain caches; the residual risk is a
    concurrent thread's own simultaneous localCheckpoint, which the
    round-loop cannot distinguish (single-writer-per-session remains the
    documented assumption for that case). An id we cannot verify is left
    alone (deferred to the ContextCleaner), never freed on suspicion."""
    try:
        m = sc._jsc.getPersistentRDDs()
        out = set()
        for k in m.keySet().toArray():
            rid = int(k)
            if rid in before:
                continue
            jrdd = m.get(k)
            try:
                if jrdd is not None and jrdd.rdd().isLocallyCheckpointed():
                    out.add(rid)
            except Exception:
                pass
        return out
    except Exception:
        return set()


def pagerank(edges: DataFrame, src: str, dst: str,
             rounds: int = PR_ROUNDS, reliable: bool = False) -> DataFrame:
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

    Checkpointing: each round eagerly checkpoints the node-grain ranks so
    every round is one shallow job (not one rounds-deep mega-plan), and the
    PREVIOUS round's checkpoint blocks are freed immediately rather than
    lazily by the ContextCleaner. Default ``localCheckpoint`` stores blocks
    unreplicated on executors -- fine for a bench/single box, but a single
    executor loss mid-run kills a long cluster job (lineage is truncated);
    pass ``reliable=True`` (requires ``sc.setCheckpointDir``) to write
    per-round checkpoints to reliable storage instead.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # hash-partition the (big) edge side on the join key ONCE -- every
    # round's join then reuses this cached distribution and only the
    # node-grain ranks frame moves (on a cluster: |nodes| << |edges|)
    e_deg = e.join(deg, "src").repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    sc = edges.sparkSession.sparkContext
    # A node ABSENT from a round's contribution aggregate (no in-edges)
    # scores exactly PR_BASE -- and the set of such nodes is CONSTANT
    # across rounds (it is nodes minus the distinct edge destinations).
    # Computing that remainder once turns the old per-round
    # nodes-LEFT-JOIN-contrib (a second corpus-keyed shuffle + join every
    # round) into a plain union with a tiny precomputed frame
    # (optimization guide S2.4 -- remove shuffles outright). Checkpointed
    # eagerly so the anti-join runs once, not once per round's lineage.
    base_plan = nodes.join(
        e.select(F.col("dst").alias("node")).distinct(), "node", "left_anti"
    ).select("node", F.lit(PR_BASE).cast("bigint").alias("rank"))
    base_ckpt_ids: set = set()
    if reliable:
        # feeds every round's plan -- must survive executor loss like the
        # per-round checkpoints do
        base_ranks = base_plan.checkpoint(eager=True)
    else:
        before_base = _persistent_rdd_ids(sc)
        base_ranks = base_plan.localCheckpoint(eager=True)
        base_ckpt_ids = _new_local_ckpt_ids(sc, before_base)
    # one-time count over the already-materialized blocks: graphs where
    # every node has an in-edge (any undirected/bipartite edge set) have
    # an EMPTY remainder, and unioning an empty 32-partition frame into
    # every round's checkpoint job costs shuffle.partitions no-op TASKS
    # per round; a small non-empty remainder reads as one task instead
    n_base = base_ranks.count()
    if n_base == 0:
        base_ranks = None
    elif n_base < 1_000_000:
        base_ranks = base_ranks.coalesce(1)
    ranks = nodes.withColumn("rank", F.lit(PR_INIT).cast("bigint"))
    prev_ckpt_ids: set = set()
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
        ranks = contrib.select(
            "node",
            (F.lit(PR_BASE) + F.col("in_mass")).cast("bigint").alias("rank"),
        )
        if base_ranks is not None:
            ranks = ranks.unionByName(base_ranks)
        # eager per-round checkpoint: each round is one shallow job over
        # the node-grain frame instead of one rounds-deep mega-plan at the
        # end (which re-optimizes and re-shuffles every prior round inside
        # a single job -- the source of multi-second run-to-run variance)
        if reliable:
            ranks = ranks.checkpoint(eager=True)
        else:
            before = _persistent_rdd_ids(sc)
            ranks = ranks.localCheckpoint(eager=True)
            # previous round's checkpoint is now dead -- free its blocks
            # instead of waiting for the ContextCleaner (r06 ADVICE)
            _free_checkpoint_blocks(sc, prev_ckpt_ids)
            prev_ckpt_ids = _new_local_ckpt_ids(sc, before)
    # the final ranks are already materialized off the caches -- release them;
    # otherwise every invocation leaks pinned frames for the session
    # lifetime (evicting genuinely shared caches like the adapter's cells).
    # base_ranks' union branch was materialized INTO the final checkpoint,
    # so its blocks are dead too.
    e_deg.unpersist()
    nodes.unpersist()
    _free_checkpoint_blocks(sc, base_ckpt_ids)
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
