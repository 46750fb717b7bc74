"""Engine-wide constants.

Mirrors the reference's fixed parameters:
- gc_grace / droppable cutoff: strict ``local_deletion_time < now - gc_grace``
  (reference: cassandra/PurgeStatisticBackend.java:208, cassandra/DataReader.java:86).
- NO_TTL sentinel -1 (reference: PartitionStatistics.java:92).
- LDT sentinel Integer.MAX_VALUE -> blank display
  (reference: cli/SSTableMetadataCollector.java:79-80).

``NOW_SECONDS`` is pinned so droppability is deterministic across the engine,
the DuckDB oracle, and repeated runs (FIXTURES.md requires a fixed ``now``).
"""

# Pinned "now" for droppability decisions (2023-11-14T22:13:20Z).
NOW_SECONDS = 1_700_000_000

# Default gc_grace_seconds (Cassandra's default, 10 days).
GC_GRACE_SECONDS = 864_000

# Tombstones with local_deletion_time strictly below this are droppable.
GC_BEFORE = NOW_SECONDS - GC_GRACE_SECONDS  # 1_699_136_000

# Sentinel for "no TTL" in TTL histograms (reference NO_TTL = -1).
NO_TTL = -1

# Sentinel local_deletion_time meaning "never deleted" (Integer.MAX_VALUE).
LDT_SENTINEL = 2_147_483_647

# Default top-N size for ranking reports (reference `-n` flag default 10).
DEFAULT_TOP_N = 10

# Percentiles reported by histogram snapshots
# (reference: cli/PartitionSizeStatisticsCollector.java:119-124).
REPORT_PERCENTILES = [0.5, 0.75, 0.9, 0.95, 0.99, 0.999]
