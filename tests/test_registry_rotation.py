"""The driver certifies only the first 50 registry entries per round.

Ordering policy (registry.py docstring): least-certified queries first,
derived from committed CORRECTNESS_r*.json history. These tests pin the
invariants that make the 50-entry window sustainable.
"""

from cassandra_sstable_tools_spark.queries import registry

DRIVER_WINDOW = 50

def test_never_verified_queries_inside_driver_window():
    """Every query with NO green driver row in any committed round must sit
    inside the next round's 50-entry window -- computed from the live green
    history, not a frozen list (an r02-frozen set went stale the moment its
    members got certified and newer queries pushed them down). This is also
    the registry-growth guard: adding queries is fine only while the
    never-green population still fits the window."""
    names = list(registry.queries())
    hist = registry._green_history()
    never = [n for n in names if n not in hist]
    assert len(never) <= DRIVER_WINDOW, (
        f"{len(never)} never-certified queries exceed the {DRIVER_WINDOW}-entry "
        "driver window; stop adding queries until a round certifies some"
    )
    missing = set(never) - set(names[:DRIVER_WINDOW])
    assert not missing, f"never-verified queries outside driver window: {missing}"


def test_stalest_certificates_sort_first():
    """Order is non-decreasing in last-green round (staleness-first), with
    never-green queries (last=0) leading -- so every cohort rotates back
    through the driver window instead of being starved by a later round
    that certified many queries at once."""
    hist = registry._green_history()
    names = list(registry.queries())
    last = [hist[n][-1] if n in hist else 0 for n in names]
    assert last == sorted(last), "registry order must be non-decreasing in last-green round"


def test_oldest_certified_cohort_inside_driver_window():
    """The concrete r05 contract (VERDICT r04 #4): the 25 queries whose
    latest certificate is oldest must ALL fit the next 50-entry window."""
    hist = registry._green_history()
    names = list(registry.queries())
    certified = [n for n in names if n in hist]
    oldest25 = sorted(certified, key=lambda n: hist[n][-1])[:25]
    outside = [n for n in oldest25 if names.index(n) >= DRIVER_WINDOW]
    assert not outside, f"stale certificates outside driver window: {outside}"


def test_queries_and_oracles_share_order():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [n for n in q if n in set(o)]


def test_ordering_is_deterministic():
    assert list(registry.queries()) == list(registry.queries())


def test_every_registered_query_is_documented():
    """Docstring coverage is part of the registry contract: the docstring is
    where each query states its semantics and its 100 TB plan shape."""
    undocumented = [
        n for n, f in registry.queries().items()
        if not (f.__doc__ or "").strip()
    ]
    assert not undocumented, f"queries without docstrings: {undocumented}"
