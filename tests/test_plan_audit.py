"""Plan-shape regressions are test failures (see plans/audit.py).

Each assertion here was first verified by reading `.explain("formatted")`
output; the test pins it so refactors can't silently regress the physical
plan while staying value-correct.
"""

from __future__ import annotations

from cassandra_sstable_tools_spark.plans.audit import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_no_cartesian,
    assert_no_sort_merge_join,
)

LINEITEM_WIDTH = 11  # columns in the fixture lineitem table


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.tpch import tpch_q6

    df = tpch_q6(spark, sf_dir)
    assert_filter_pushed(df, "l_shipdate")
    assert_columns_pruned(df, LINEITEM_WIDTH)


def test_q3_broadcasts_dimensions(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.tpch import tpch_q3

    df = tpch_q3(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)
    assert_no_cartesian(df)


def test_ivf_probe_broadcast_no_smj(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.similarity import ann_ivf_topk
    from cassandra_sstable_tools_spark.plans.audit import assert_max_window_nodes

    df = ann_ivf_topk(spark, sf_dir)
    assert_no_sort_merge_join(df)
    assert_broadcast_join(df, min_count=2)  # probes + queries
    # The r04 weak-plan fix: centroid assignment is a literal-array argmax
    # fold, NOT an N x K broadcast join ranked back down by a corpus-sized
    # row_number window. Only the final candidate top-K may plan a Window.
    assert_max_window_nodes(df, 1)


def test_ivfpq_assignment_no_window(spark, sf_dir):
    """ann_ivfpq_topk shares the literal-argmax assignment; same pin."""
    from cassandra_sstable_tools_spark.llm.similarity import ann_ivfpq_topk
    from cassandra_sstable_tools_spark.plans.audit import assert_max_window_nodes

    df = ann_ivfpq_topk(spark, sf_dir)
    assert_no_sort_merge_join(df)
    assert_max_window_nodes(df, 1)


def test_lsh_topk_broadcasts_query_side(spark, sf_dir):
    """Banded multi-probe LSH: query band keys, the candidate list, and the
    query vectors all broadcast -- the corpus must never sort-merge-join
    (i.e. never shuffles for a join; the only exchange is the tiny
    candidate distinct)."""
    from cassandra_sstable_tools_spark.llm.similarity import ann_lsh_topk

    df = ann_lsh_topk(spark, sf_dir)
    assert_no_sort_merge_join(df)
    assert_broadcast_join(df, min_count=3)  # q_bands + cand + queries
    assert_no_cartesian(df)


def test_pstats_prunes_index_scan(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.pstats import pstats_top_size

    df = pstats_top_size(spark, sf_dir)
    assert_no_cartesian(df)


def test_filename_filter_pushed(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.catalog import sstables_filtered

    df = sstables_filtered(spark, sf_dir)
    assert_no_cartesian(df)


def test_simhash_banding_is_single_band_join(spark, sf_dir):
    """The melted (band_id, band_value) formulation plans exactly ONE band
    self-join -- a 4-joins+union regression would add 3 more. The bucket
    cap (operators/banding.py) contributes two co-grain joins (bucket
    stats onto the left rows) and the candidate-grain signature gathers
    add two more at the bounded candidate row count, so the full pinned
    shape is 4 join nodes; the self-join being singular is what the
    original pin was protecting."""
    from cassandra_sstable_tools_spark.llm.dedup import simhash_neardup_pairs
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    plan = formatted_plan(simhash_neardup_pairs(spark, sf_dir))
    # count join operators in the plan TREE only ("formatted" repeats every
    # node name once more as a detail-block header)
    tree = [l for l in plan.splitlines() if not l.startswith("(")]
    joins = sum(
        ("SortMergeJoin" in l) or ("ShuffledHashJoin" in l) or ("BroadcastHashJoin" in l)
        for l in tree
    )
    assert joins == 4, (
        f"expected stats join + band self-join + 2 sig gathers, found {joins}"
    )


def test_ngram_topk_uses_bounded_heap(spark, sf_dir):
    """Global top-K must plan TakeOrderedAndProject (bounded per-task heap),
    never a full global sort of the distinct-ngram table."""
    from cassandra_sstable_tools_spark.llm.corpus import ngram_topk
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    plan = formatted_plan(ngram_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "top-K lost the bounded-heap plan"


def test_cfstats_sstables_avoids_expand(spark, sf_dir):
    """The split-branch formulation must not plan an Expand (the x3 row
    blowup a multi-countDistinct aggregate would reintroduce)."""
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.queries.cfstats import cfstats_sstables

    plan = formatted_plan(cfstats_sstables(spark, sf_dir))
    assert "Expand" not in plan, "cfstats_sstables regressed to Expand x3"


def test_bucketed_layout_elides_exchange(spark, sf_dir):
    """The SSTable sort-order optimization (SURVEY.md §4): pre-bucketed cells
    aggregate by partition_key with ZERO shuffles, and the result matches the
    shuffling plan exactly."""
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.sources.bucketed import (
        materialize_bucketed_cells,
        per_partition_stats_bucketed,
    )

    b = materialize_bucketed_cells(spark, sf_dir, table="t_bucketed_cells")
    try:
        df = per_partition_stats_bucketed(b)
        assert "Exchange" not in formatted_plan(df)
        from cassandra_sstable_tools_spark.sources.tpch_adapter import cells

        plain = per_partition_stats_bucketed(cells(spark, sf_dir))
        assert "Exchange" in formatted_plan(plain)  # the baseline DOES shuffle
        import pandas as pd

        from conftest import normalize

        pd.testing.assert_frame_equal(
            normalize(df.toPandas()),
            normalize(plain.toPandas()),
            check_dtype=False,
            check_exact=True,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_cells")


def test_pack_chunks_hierarchical_prefix_sum(spark, sf_dir):
    """Sequence packing must plan the two-level prefix sum (bucket window +
    per-(lang,bucket) doc window -- exactly 2 Window nodes), broadcast the
    tiny bucket-offset frame, and never fall back to one giant per-lang
    window over the corpus (which would be a single Window node)."""
    from cassandra_sstable_tools_spark.llm.packing import pack_chunks
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    df = pack_chunks(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)
    assert_no_cartesian(df)
    tree = [l for l in formatted_plan(df).splitlines() if not l.startswith("(")]
    windows = sum("Window" in l for l in tree)
    assert windows == 2, f"expected 2-level prefix sum, found {windows} windows"


def test_doc_repetition_is_pure_map(spark, sf_dir):
    """Repetition signals are array expressions in one codegen'd scan --
    the plan must contain NO Exchange (no shuffle at any corpus size)."""
    from cassandra_sstable_tools_spark.llm.text import doc_repetition
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    assert "Exchange" not in formatted_plan(doc_repetition(spark, sf_dir))


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval-side n-gram set must broadcast (a benchmark suite is always
    tiny next to the corpus); the training side must never cartesian."""
    from cassandra_sstable_tools_spark.llm.curation import decontaminate_flags

    df = decontaminate_flags(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)
    assert_no_cartesian(df)


def test_mixture_budget_single_window_pass(spark, sf_dir):
    """Mixture budgeting is one window + one aggregation over 4 narrow
    columns -- the scan must prune the text column out of the shuffle
    (projection happens before the lang exchange)."""
    from cassandra_sstable_tools_spark.llm.curation import mixture_budget
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    df = mixture_budget(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    tree = [l for l in plan.splitlines() if not l.startswith("(")]
    windows = sum("Window" in l for l in tree)
    assert windows == 1, f"expected 1 window pass, found {windows}"


def test_asof_join_single_shuffle_no_join_operator(spark, sf_dir):
    """The as-of union+window formulation must contain NO join operator at
    all (the naive formulation is a range join) -- just the per-key window
    over the unioned sides."""
    from cassandra_sstable_tools_spark.queries.events import purchase_attribution

    df = purchase_attribution(spark, sf_dir)
    assert_no_cartesian(df)
    assert_no_sort_merge_join(df)


def test_range_join_is_equi_not_bnlj(spark, sf_dir):
    """Bucketing must give the planner an equi-key: the interval join must
    plan as a hash/sort-merge EQUI join, never BroadcastNestedLoopJoin or
    CartesianProduct (which is what the raw range predicate would get)."""
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.queries.events import clicks_near_purchases

    df = clicks_near_purchases(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert_no_cartesian(df)


def test_purge_no_corpus_join_exchanges(spark, sf_dir):
    """Purge's cached path: the only joins are the rare-row broadcast of
    the delete map -- never a sort-merge join of the corpus."""
    from cassandra_sstable_tools_spark.operators.purge import purge_stats
    from cassandra_sstable_tools_spark.sources import tpch_adapter

    df = purge_stats(tpch_adapter.cells(spark, sf_dir))
    assert_no_sort_merge_join(df)
    assert_broadcast_join(df, min_count=1)
    assert_no_cartesian(df)


def test_ivfpq_broadcasts_and_no_corpus_smj(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.similarity import ann_ivfpq_topk

    df = ann_ivfpq_topk(spark, sf_dir)
    assert_no_sort_merge_join(df)
    assert_broadcast_join(df, min_count=2)  # centroids/probes + queries
    assert_no_cartesian(df)


def test_funnel_filters_pushed_no_cartesian(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.timeseries import funnel_stages

    df = funnel_stages(spark, sf_dir)
    assert_filter_pushed(df, "event_type")  # stage slices filter at the scan
    assert_no_cartesian(df)


def test_gapfill_broadcasts_counts(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.timeseries import events_gapfill

    # the dense axis and the hourly counts are both aggregate-sized; the
    # final left join must broadcast, never shuffle the axis
    df = events_gapfill(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)


def test_cube_single_expand_single_agg_pass(spark, sf_dir):
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.queries.timeseries import events_cube

    import re

    plan = formatted_plan(events_cube(spark, sf_dir))
    # one Expand feeding one aggregation chain -- NOT four scans unioned
    # (formatted plans list each node twice: tree + detail section)
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_chunk_dedup_linear_no_cartesian(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.dedup import chunk_dedup_stats

    df = chunk_dedup_stats(spark, sf_dir)
    assert_no_cartesian(df)


def test_props_json_parse_stays_in_jvm(spark, sf_dir):
    from cassandra_sstable_tools_spark.plans.audit import assert_no_python_eval
    from cassandra_sstable_tools_spark.queries.timeseries import events_props_stats

    assert_no_python_eval(events_props_stats(spark, sf_dir))


def test_cms_sketch_broadcasts(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.corpus import heavy_hitters_cms

    df = heavy_hitters_cms(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)  # 1024-cell sketch never shuffles
    assert_no_cartesian(df)


def test_bloom_filter_broadcasts(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.curation import decontaminate_bloom

    df = decontaminate_bloom(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)  # <=2048 packed words
    assert_no_cartesian(df)


def test_length_outliers_broadcast_moments(spark, sf_dir):
    from cassandra_sstable_tools_spark.llm.corpus import doc_length_outliers

    df = doc_length_outliers(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)  # per-source moments frame
    assert_no_cartesian(df)


def test_salted_agg_two_exchange_shape(spark, sf_dir):
    import re

    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.queries.timeseries import (
        events_type_stats_salted,
    )

    plan = formatted_plan(events_type_stats_salted(spark, sf_dir))
    # the documented trade: exactly the salt exchange + the final key
    # exchange, no more (a third would mean the salt column leaked)
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n == 2, f"expected the 2-exchange salted shape, found {n}:\n{plan}"


def test_compaction_preview_broadcasts_delete_map(spark, sf_dir):
    from cassandra_sstable_tools_spark.queries.purge import compaction_preview

    df = compaction_preview(spark, sf_dir)
    assert_broadcast_join(df, min_count=1)  # the per-pk delete map
    assert_no_cartesian(df)


def test_pagerank_no_cartesian_no_python(spark, sf_dir):
    from cassandra_sstable_tools_spark.plans.audit import assert_no_python_eval
    from cassandra_sstable_tools_spark.queries.tpch_ext import (
        supplier_part_pagerank,
    )

    df = supplier_part_pagerank(spark, sf_dir)
    assert_no_cartesian(df)
    assert_no_python_eval(df)


def test_table_scope_filter_reaches_source_scan(spark, sf_dir):
    """--table scoping applies at the cells ROOT: Catalyst constant-folds
    the CASE defining table_name into a predicate over l_orderkey sitting
    DIRECTLY on the lineitem parquet relation (in a real SSTable layout the
    same filter is directory-level partition pruning)."""
    from pyspark.sql import functions as F

    from cassandra_sstable_tools_spark.sources import tpch_adapter as A

    df = A._cells_uncached(spark, sf_dir).where(F.col("table_name") == "tab_lcs")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    filt = [i for i, l in enumerate(lines) if "Filter" in l]
    assert filt, f"no Filter node in scoped plan:\n{plan}"
    i = filt[-1]
    assert "l_orderkey" in lines[i], lines[i]  # folded to a SOURCE predicate
    assert "table_name" not in lines[i], lines[i]
    assert "Relation" in lines[i + 1] and "parquet" in lines[i + 1], (
        "scope filter is not directly above the parquet relation"
    )


def test_cli_bucketed_top_partitions_no_exchange(spark, sf_dir):
    """The --bucketed CLI path end-to-end: materialize-once accessor + the
    rendered top-N frame plan scan + local agg + bounded heap with ZERO
    Exchange anywhere."""
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan
    from cassandra_sstable_tools_spark.sources.bucketed import (
        bucketed_top_partitions,
        drop_bucketed_table,
        ensure_bucketed_cells,
    )

    drop_bucketed_table(spark, "t_cli_bucketed")
    try:
        b = ensure_bucketed_cells(spark, sf_dir, table="t_cli_bucketed")
        df = bucketed_top_partitions(b, 5)
        plan = formatted_plan(df)
        assert "Exchange" not in plan
        assert "TakeOrderedAndProject" in plan
        # second call must REUSE, not rewrite (materialize-once contract)
        again = ensure_bucketed_cells(spark, sf_dir, table="t_cli_bucketed")
        assert "Exchange" not in formatted_plan(bucketed_top_partitions(again, 5))
    finally:
        drop_bucketed_table(spark, "t_cli_bucketed")


def test_ivf_index_partition_pruned(spark, sf_dir):
    """The durable IVF index: the probe predicate must prune hive
    partitions (PartitionFilters on centroid_id -- only probed lists'
    FILES are opened), and the result must be bit-identical to the
    scan-path ann_ivf_topk."""
    from cassandra_sstable_tools_spark.llm.ann_index import ann_ivf_topk_indexed
    from cassandra_sstable_tools_spark.llm.similarity import ann_ivf_topk
    from cassandra_sstable_tools_spark.plans.audit import assert_partition_pruned

    df = ann_ivf_topk_indexed(spark, sf_dir)
    assert_partition_pruned(df, "centroid_id")
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, ann_ivf_topk(spark, sf_dir).collect()))
    assert got == want, "indexed path diverged from scan path"


def test_ivfpq_index_partition_pruned_and_codes_only(spark, sf_dir):
    """The durable IVF+PQ index: partition-pruned probes AND a codes-only
    read -- the scan's ReadSchema must contain the two-bigint code columns
    and must NOT read any raw vector column."""
    import re

    from cassandra_sstable_tools_spark.llm.ann_index import (
        ann_ivfpq_topk_indexed,
        ivfpq_index_path,
    )
    from cassandra_sstable_tools_spark.llm.similarity import ann_ivfpq_topk
    from cassandra_sstable_tools_spark.plans.audit import (
        assert_partition_pruned,
        formatted_plan,
    )

    df = ann_ivfpq_topk_indexed(spark, sf_dir)
    assert_partition_pruned(df, "centroid_id")
    plan = formatted_plan(df)
    idx_path = ivfpq_index_path(sf_dir)
    idx_schemas = [
        s for loc, s in re.findall(
            r"Location:[^\n]*?([^\s,\]]+)[,\]][^\n]*\nReadSchema: struct<([^>]*)>",
            plan,
        )
        if idx_path in loc
    ] or re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any("packed_codes" in s for s in idx_schemas)
    assert not any("qv" in s.split("packed_codes")[0] and "array<bigint>" in s
                   for s in idx_schemas if "packed_codes" in s), (
        "index scan reads raw vectors alongside codes"
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, ann_ivfpq_topk(spark, sf_dir).collect()))
    assert got == want, "indexed PQ path diverged from scan path"


def test_label_centroid_single_agg_no_explode(spark, sf_dir):
    """The 64 per-dim sums must fuse into ONE groupBy(label) over the scan:
    no Generate (a posexplode formulation would shuffle N*64 rows) and no
    Window anywhere in the plan."""
    from cassandra_sstable_tools_spark.llm.similarity import (
        label_centroid_stats,
    )
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    plan = formatted_plan(label_centroid_stats(spark, sf_dir))
    assert "Generate" not in plan  # no explode of the qv array
    assert "Window" not in plan


def test_dataset_split_single_scan_no_join(spark, sf_dir):
    """Split assignment is a pure per-row hash function: one scan, one
    partial-aggregated groupBy, zero joins/windows."""
    from cassandra_sstable_tools_spark.llm.curation import dataset_split_stats
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    plan = formatted_plan(dataset_split_stats(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan


def test_source_overlap_join_after_distinct(spark, sf_dir):
    """The self-join must run on the DISTINCT (hash, source) frame (passage
    grain), never on raw occurrences, and must be an equi-join."""
    from cassandra_sstable_tools_spark.llm.dedup import source_overlap_matrix
    from cassandra_sstable_tools_spark.plans.audit import (
        assert_no_cartesian,
        formatted_plan,
    )

    df = source_overlap_matrix(spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    # the distinct's aggregate must appear on BOTH join inputs: two
    # hash-partitioned pre-join aggregates (h, source grain) feed the join
    assert plan.count("HashAggregate") >= 4


def test_source_overlap_nontrivial(spark, sf_dir):
    """Guard against trivial certification: the fixture DOES contain
    cross-source duplicated passages, so the matrix must be non-empty
    (an all-zero/empty result would certify nothing about the join)."""
    from cassandra_sstable_tools_spark.llm.dedup import source_overlap_matrix

    assert source_overlap_matrix(spark, sf_dir).count() > 0


def test_per_source_sample_two_bounded_windows(spark, sf_dir):
    """The salted sampler must plan TWO Window nodes -- the first partitioned
    by (source, salt hash): the pmod(xxhash64) salt must appear in the plan,
    proving no single window sorts a whole source."""
    from cassandra_sstable_tools_spark.llm.corpus import per_source_sample_topk
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )

    df = per_source_sample_topk(spark, sf_dir)
    assert tree_node_count(df, "Window") == 2
    assert "pmod" in formatted_plan(df)


def test_q12_single_join_no_window(spark, sf_dir):
    """q12's shape is one orders<->lineitem equi join + one fused agg: no
    Window, no cartesian, and the date-lateness predicate must not force a
    non-equi join strategy."""
    from cassandra_sstable_tools_spark.queries.tpch_ext import (
        tpch_q12_priority_shipping,
    )
    from cassandra_sstable_tools_spark.plans.audit import (
        assert_no_cartesian,
        formatted_plan,
    )

    df = tpch_q12_priority_shipping(spark, sf_dir)
    assert_no_cartesian(df)
    assert "Window" not in formatted_plan(df)


def test_q20_broadcasts_dims_no_cartesian(spark, sf_dir):
    """q20's name-filtered part list, qualifying-supplier set, and nation
    lookups are all broadcast (>= 3 broadcast joins); the only shuffles key
    on partkey/suppkey."""
    from cassandra_sstable_tools_spark.queries.tpch_ext import (
        tpch_q20_excess_suppliers,
    )
    from cassandra_sstable_tools_spark.plans.audit import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    df = tpch_q20_excess_suppliers(spark, sf_dir)
    assert_no_cartesian(df)
    assert_broadcast_join(df, min_count=3)


def test_quality_model_udf_is_arrow_batched(spark, sf_dir):
    """The model-inference slot must plan ArrowEvalPython (vectorized
    pandas_udf batches over Arrow) -- NEVER BatchEvalPython (row-at-a-time
    pickling, the 10-100x-slower trap a drive-by refactor to F.udf would
    introduce). Also pins that only the 3 integer FEATURES cross the
    python boundary, not the text column: the scan's ReadSchema carries
    text (features derive from it) but the ArrowEvalPython node's input
    must not."""
    from cassandra_sstable_tools_spark.llm.pipeline import quality_model_scores
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    df = quality_model_scores(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # feature extraction stays JVM-side: the python node consumes the
    # 3 bigint features, so no Arrow row is wider than doc_id + 3 ints
    arrow_lines = [ln for ln in plan.splitlines() if "ArrowEvalPython" in ln]
    assert arrow_lines and all("text" not in ln for ln in arrow_lines), plan


def test_semantic_dedup_keep_no_forced_broadcast(spark, sf_dir):
    """The keep-list join must NOT carry a broadcast hint (r10 judge
    finding): the clusters frame has one row per near-dup node --
    data-dependent and unbounded (a mass-duplicated page makes it
    corpus-sized), so a hint-forced broadcast OOMs the driver at scale.
    Pin it by disabling auto-broadcast: a hint survives the conf and
    would still plan BroadcastHashJoin; an unhinted equi-join falls back
    to a shuffle join. AQE broadcasting when the build side measures
    small at runtime remains allowed (that is the desired behavior)."""
    from cassandra_sstable_tools_spark.llm.similarity import (
        semantic_dedup_keep,
    )
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(semantic_dedup_keep(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan, plan


def test_bm25_single_scan_broadcast_stats_bounded_topk(spark, sf_dir):
    """bm25_topk: the 1-row stats frame broadcasts back over the scan
    (BroadcastNestedLoopJoin on a 1-row build side, not a shuffle), the
    top-K plans TakeOrderedAndProject (bounded per-task heaps), and the
    tf computation stays in JVM higher-order functions (no Python)."""
    from cassandra_sstable_tools_spark.llm.text import bm25_topk
    from cassandra_sstable_tools_spark.plans.audit import formatted_plan

    plan = formatted_plan(bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_stratified_sample_two_phase_windows(spark, sf_dir):
    """stratified_sample: the salted two-phase rank plans exactly two
    Window nodes -- (source, salt) then (source) over the bounded
    survivors -- never one corpus-wide per-source sort."""
    from cassandra_sstable_tools_spark.llm.curation import (
        stratified_sample,
    )
    from cassandra_sstable_tools_spark.plans.audit import tree_node_count

    df = stratified_sample(spark, sf_dir)
    assert tree_node_count(df, "Window") == 2


def test_dedup_keep_best_argmax_is_aggregate_not_window(spark, sf_dir):
    """dedup_keep_best: the per-cluster argmax must plan as a partial+
    final AGGREGATE (map-side combine absorbs a corpus-sized mass-dup
    cluster), never a per-cluster window sort; and no broadcast hint
    forces a join (same contract as semantic_dedup_keep)."""
    from cassandra_sstable_tools_spark.llm.similarity import (
        dedup_keep_best,
    )
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )

    df = dedup_keep_best(spark, sf_dir)
    plan = formatted_plan(df)
    # the CC operator uses windows internally; the REPS argmax must not
    # add a row_number-over-cluster pass: pin no rank function at all
    assert "row_number" not in plan, plan
    assert tree_node_count(df, "Aggregate") >= 2  # partial + final

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_nb = formatted_plan(dedup_keep_best(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan_nb, plan_nb


def test_doc_bigram_typicality_aggregates_no_window_no_hint(spark, sf_dir):
    """doc_bigram_typicality (r13 staged): frequency joins carry NO
    broadcast hint (the bigram/unigram count frames are corpus-sized --
    a hint-forced broadcast is the semantic_dedup_keep r10 defect all
    over again), the per-doc rollup is a partial+final AGGREGATE, and
    no window sort appears anywhere."""
    from cassandra_sstable_tools_spark.llm.corpus import (
        doc_bigram_typicality,
    )
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )

    df = doc_bigram_typicality(spark, sf_dir)
    assert tree_node_count(df, "Window") == 0
    assert tree_node_count(df, "Aggregate") >= 2  # partial + final
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_nb = formatted_plan(doc_bigram_typicality(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan_nb, plan_nb


def test_compression_report_broadcasts_the_listing(spark, sf_dir):
    """compression_report_cassdir (r13 staged): both inputs are
    1-row-per-sstable frames; the Data.db listing side is explicitly
    broadcast (metadata-only, always tiny), so the join never shuffles
    the parsed chunk maps."""
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        compression_report_cassdir,
    )

    df = compression_report_cassdir(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert tree_node_count(df, "SortMergeJoin") == 0


def test_dedup_survivorship_aggregate_no_hint(spark, sf_dir):
    """dedup_survivorship (r13 staged): the per-source rollup is a
    partial+final AGGREGATE over the doc-grain LEFT join, and no
    broadcast hint forces any join (the clusters side is data-dependent
    -- the semantic_dedup_keep contract)."""
    from cassandra_sstable_tools_spark.llm.dedup import dedup_survivorship
    from cassandra_sstable_tools_spark.plans.audit import (
        formatted_plan,
        tree_node_count,
    )

    df = dedup_survivorship(spark, sf_dir)
    assert tree_node_count(df, "Aggregate") >= 2

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_nb = formatted_plan(dedup_survivorship(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan_nb, plan_nb


def test_purge_window_reuses_cells_cache_partitioning(spark, sf_dir):
    """r12 optimization regression pin: the cells cache is hash-partitioned
    on (table_name, partition_key) -- attribute expressions only, because a
    repartition column that folds to a LITERAL (keyspace = F.lit('ks1'))
    makes HashPartitioning.satisfies(ClusteredDistribution) fail and every
    pk-grain window/groupBy silently re-shuffles the whole corpus (measured
    59.7 MB / 7 jobs on purge_top where the module doctrine says zero).
    The pin is on the EXECUTED (AQE-final) plan of a WARM run (cache
    already materialized -- the first run plans before the cache's
    partitioning is observable and keeps the exchange; every subsequent
    run, which is what the bench measures, must not): no exchange keyed on
    the LWW window's dedup columns (_w0/_w1) may exist -- that exchange is
    the regression signature, and the planner can only skip it when the
    cache's partitioning satisfies the window's required distribution."""
    from cassandra_sstable_tools_spark.queries.purge import QUERIES

    QUERIES["purge_top"](spark, sf_dir).collect()  # materialize the cache
    df = QUERIES["purge_top"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    offending = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "_w0" in line
    ]
    assert not offending, offending
