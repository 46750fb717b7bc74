"""Physical-plan audit helpers: make "the plan we want" a TESTED property,
not a one-time `.explain()` glance.

A query's correctness is proven by the DuckDB oracle; these helpers prove
the PLAN stays the shape that scales (filters reach the scan, projections
prune columns, small sides broadcast, no accidental cartesian products).
Tests pin the properties so a refactor that silently regresses the plan --
e.g. a widened ReadSchema or a broadcast that degrades to sort-merge -- is
caught at test time, the way a perf regression would surface in production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text (captured, not printed).

    If the DataFrame has already been EXECUTED under AQE, the tree gains a
    "== Final Plan ==" / "== Initial Plan ==" pair and every node appears
    twice; the initial-plan tree slice is stripped so audits measure the
    plan that actually runs. (Reusing an executed frame is normal here --
    prepared-plan memos like ann_ivf_topk's hand audits the same object
    the bench executes.)"""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)
    # Strip EVERY initial-plan tree slice: adaptively-executed subqueries
    # print their own Final/Initial pair, so a single pass is not enough.
    while "== Initial Plan ==" in text:
        lines = text.splitlines()
        start = next(
            i for i, l in enumerate(lines) if "== Initial Plan ==" in l
        )
        end = next(
            (i for i in range(start, len(lines)) if not lines[i].strip()),
            len(lines),
        )
        text = "\n".join(lines[:start] + lines[end:])
    return text


def pushed_filters(plan: str) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    """Every scan's ReadSchema struct body."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """At least one scan pushes a predicate on ``column``."""
    plan = formatted_plan(df)
    assert any(column in f for f in pushed_filters(plan)), (
        f"no pushed filter mentions {column!r}; PushedFilters={pushed_filters(plan)}"
    )


def assert_columns_pruned(df: DataFrame, table_width: int) -> None:
    """Every scan reads strictly fewer columns than the full table."""
    plan = formatted_plan(df)
    widths = [len(s.split(",")) for s in read_schemas(plan)]
    assert widths and all(w < table_width for w in widths), (
        f"scan reads full width ({widths} vs table {table_width})"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    # tree-line count: a detail block of an AQE-replaced initial-plan node
    # must not fail (or pass) the audit for the plan that actually runs
    assert tree_node_count(df, "CartesianProduct") == 0, (
        "plan contains a cartesian product"
    )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    n = tree_node_count(df, "BroadcastHashJoin") + tree_node_count(
        df, "BroadcastNestedLoopJoin"
    )
    assert n >= min_count, f"expected >= {min_count} broadcast joins, found {n}"


def assert_no_sort_merge_join(df: DataFrame) -> None:
    assert tree_node_count(df, "SortMergeJoin") == 0, (
        "plan degraded to sort-merge join"
    )


def tree_node_count(df: DataFrame, node: str) -> int:
    """WHOLE-WORD occurrences of a physical operator in the plan TREE only
    (the "formatted" detail blocks repeat every node name once more as a
    header line starting with "("; those are excluded; word-boundary match
    so e.g. "Window" does not count "WindowGroupLimit" nor "Exchange"
    count "BroadcastExchange")."""
    plan = formatted_plan(df)
    pat = re.compile(rf"\b{re.escape(node)}\b")
    return sum(
        bool(pat.search(l)) for l in plan.splitlines() if not l.startswith("(")
    )


def assert_max_window_nodes(df: DataFrame, n: int) -> None:
    """At most ``n`` Window operators in the plan -- pins formulations that
    replaced a per-row ranking window (e.g. the IVF literal-argmax
    assignment) so a refactor can't silently reintroduce a corpus-sized
    window + its Exchange. (WindowGroupLimit, the rank<=n pushdown, is not
    a Window -- whole-word matching excludes it.)"""
    found = tree_node_count(df, "Window")
    assert found <= n, f"expected <= {n} Window nodes, found {found}"


def partition_filters(plan: str) -> list[str]:
    """Every non-empty PartitionFilters entry across the plan's scans."""
    return [f for f in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if f]


def assert_partition_pruned(df: DataFrame, column: str) -> None:
    """At least one scan prunes hive-style partitions on ``column`` --
    the reader-side payoff of a partitioned sink: the filter becomes a
    directory listing, not a row filter, so non-matching partitions are
    never opened."""
    plan = formatted_plan(df)
    assert any(column in f for f in partition_filters(plan)), (
        f"no PartitionFilters mentions {column!r}; "
        f"partition_filters={partition_filters(plan)}"
    )


def assert_no_python_eval(df: DataFrame) -> None:
    """No row-at-a-time or Arrow Python evaluation anywhere in the plan --
    the expression stayed in JVM codegen (e.g. from_json, not a UDF)."""
    plan = formatted_plan(df)
    for node in ("BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, f"plan drops to Python evaluation ({node})"
