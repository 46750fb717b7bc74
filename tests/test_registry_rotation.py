"""The driver certifies only the first 50 registry entries per round.

Ordering policy (registry.py docstring): least-certified queries first,
derived from committed CORRECTNESS_r*.json history. These tests pin the
invariants that make the 50-entry window sustainable.
"""

from cassandra_sstable_tools_spark.queries import registry

DRIVER_WINDOW = 50

# Queries with no green driver row as of round 2 (judge r02 verdict) —
# every one must sit inside the next round's verification window.
NEVER_VERIFIED_R02 = {
    "ann_ivf_kmeans_topk", "events_hourly", "events_sliding", "sessionize",
    "user_activity", "cohort_retention", "events_top_types", "media_metadata",
    "frame_sample", "image_resize", "media_embed", "catalog_tables",
    "sstables_filtered", "summary_rollup", "cardinality_estimates",
    "stream_sessionize_sessions", "stream_events_hourly", "stream_dedup_events",
}


def test_never_verified_queries_inside_driver_window():
    window = list(registry.queries())[:DRIVER_WINDOW]
    missing = NEVER_VERIFIED_R02 - set(window)
    assert not missing, f"never-verified queries outside driver window: {missing}"


def test_zero_green_sorts_before_any_green():
    hist = registry._green_history()
    names = list(registry.queries())
    greens = [len(hist.get(n, [])) for n in names]
    assert greens == sorted(greens), "registry order must be non-decreasing in green count"


def test_queries_and_oracles_share_order():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [n for n in q if n in set(o)]


def test_ordering_is_deterministic():
    assert list(registry.queries()) == list(registry.queries())
