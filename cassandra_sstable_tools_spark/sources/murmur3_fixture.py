"""Murmur3-token-ordered sibling fixture + the token sidecar parquet.

Closes the r08 VERDICT's token-range certification gap (#4): the
``token_range_scan`` path (sources/lookup.py) was certified only by an
in-repo brute-force differential because no SQL oracle can compute
Cassandra's murmur3. This module materializes a REAL Murmur3Partitioner
tree -- the SAME per-sstable cell payloads, partition deletions and
SerializationHeaders as the main fixture (so the shared ``decoded``
oracle CTE keeps predicting every decoded field and byte span), with the
index entries sorted by (murmur3 token, key) exactly as a murmur3 node
writes them and blocks packed back-to-back -- plus a ``tokens.parquet``
SIDECAR of (partition_key, token) pairs, computed once at plant time.
The DuckDB oracle then replays a token-range predicate in plain SQL:

    decoded JOIN tokens USING (partition_key) WHERE token BETWEEN lo, hi

Sidecar reading: each sf_dir's sidecar lands under its own digest
directory and the oracle globs ``<root>/tokens/*/tokens.parquet``; a
token is a pure function of the key bytes, so unioning sidecars of other
scale factors adds rows the join against the current corpus's decoded
frame simply never touches (SELECT DISTINCT keeps the pair set exact).

Physical-representability parity with the main tree (the rules the
shared oracle CTEs encode):
- NULL-psize partitions keep an index entry but ZERO byte extent (their
  offset equals the successor's) -- the scan skips them;
- budget-failing partitions plant header + END and decode as empty;
- Data.db exists iff the sstable's uncompressed_length is non-NULL,
  Statistics.db iff it has stats (min_timestamp) -- the decodable
  universe (``phys_sst``) is identical to the main tree's;
- all files are UNCOMPRESSED here: the LZ4 chunk layer is certified on
  the main tree, and packing blocks back-to-back keeps the token scan's
  byte accounting exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cassandra_sstable_tools_spark.sources.sstable_binary import (
    _DEFAULT_VERSION,
    _FIXTURE_ROOT,
    FIXTURE_VERSION,
    encode_index_db,
    index_offsets,
)

# fixed certification bounds: the middle half of the murmur3 ring -- wide
# enough to be non-vacuous at every sf, narrow enough that the scan's
# summary floor + early stop are exercised (literals so the oracle can
# replay them verbatim)
TOKEN_RANGE_LO = -(1 << 62)
TOKEN_RANGE_HI = (1 << 62)

TOKENS_GLOB = os.path.join(_FIXTURE_ROOT, "tokens", "*", "tokens.parquet")


def materialize_murmur3_files(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> str:
    """Write the murmur3-ordered fixture tree for ``sf_dir`` (idempotent
    per sf_dir via a _SUCCESS marker, atomic-ish temp+rename like the
    main materializer) and its token sidecar. Returns the tree root."""
    import hashlib
    import shutil

    from cassandra_sstable_tools_spark.sources import tpch_adapter
    from cassandra_sstable_tools_spark.sources.bloom import (
        FIXTURE_HASH_COUNT,
        build_filter,
        encode_filter_db,
    )
    from cassandra_sstable_tools_spark.sources.data_cells import (
        encode_unfiltereds,
        fixture_cell_payload,
        partition_budget_ok,
    )
    from cassandra_sstable_tools_spark.sources.data_db import (
        LIVE_LDT,
        LIVE_MFDA,
        encode_partition_header,
        fixture_partition_headers,
    )
    from cassandra_sstable_tools_spark.sources.lookup import (
        MURMUR3_PARTITIONER,
        key_decorator,
    )
    from cassandra_sstable_tools_spark.sources.statistics_db import (
        encode_statistics_db,
        fixture_stats,
    )
    from cassandra_sstable_tools_spark.sources.summary_db import (
        FIXTURE_MIN_INDEX_INTERVAL,
        encode_summary_db,
    )

    if (
        tpch_adapter._FILENAME_FILTER is not None
        or tpch_adapter._TABLE_SCOPE != (None, None)
    ):
        raise RuntimeError(
            "materialize_murmur3_files must run without an active "
            "filename_filter/table_scope (fixture cache is unscoped)"
        )
    # coupled to the MAIN fixture version: a payload/encoder bump there
    # re-materializes this sibling tree and its token sidecar too
    digest = hashlib.md5(
        (os.path.abspath(sf_dir) + ":" + FIXTURE_VERSION + ":m3v1").encode()
    ).hexdigest()[:12]
    if root is None:
        root = os.path.join(_FIXTURE_ROOT, "m3-" + digest)
    marker = os.path.join(root, "_SUCCESS")
    tokens_dir = os.path.join(_FIXTURE_ROOT, "tokens", digest)
    if os.path.exists(marker) and os.path.exists(
        os.path.join(tokens_dir, "tokens.parquet")
    ):
        return root

    rows = (
        tpch_adapter.index_entries(spark, sf_dir)
        .select("keyspace", "table_name", "sstable_id", "partition_key")
        .collect()
    )
    lengths = {
        (r["keyspace"], r["table_name"], r["sstable_id"]):
            r["uncompressed_length"]
        for r in tpch_adapter.sstables(spark, sf_dir)
        .select("keyspace", "table_name", "sstable_id", "uncompressed_length")
        .collect()
    }
    psizes = {
        (r["keyspace"], r["table_name"], r["sstable_id"], r["partition_key"]):
            r["psize"]
        for r in tpch_adapter.partition_sizes_cached(spark, sf_dir)
        .select("keyspace", "table_name", "sstable_id", "partition_key", "psize")
        .collect()
    }
    stats_map = fixture_stats(spark, sf_dir)
    deletions_map = fixture_partition_headers(spark, sf_dir)
    cell_payload = fixture_cell_payload(spark, sf_dir)
    decorate = key_decorator(MURMUR3_PARTITIONER)

    by_sstable: dict[tuple, list[bytes]] = {}
    for r in rows:
        by_sstable.setdefault(
            (r["keyspace"], r["table_name"], r["sstable_id"]), []
        ).append(r["partition_key"].encode("utf-8"))

    tmp = root + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    token_rows: dict[str, int] = {}
    for (ks, tb, ss), keys in by_sstable.items():
        keys.sort(key=decorate)  # murmur3 node order: (token, key)
        dels = deletions_map.get((ks, tb, ss), {})
        hdr, parts = cell_payload.get((ks, tb, ss), (None, {}))
        has_data = lengths.get((ks, tb, ss)) is not None
        entries: list[tuple[bytes, int]] = []
        blocks: list[bytes] = []
        pos = 0
        for key in keys:
            pk = key.decode("utf-8")
            token_rows[pk] = decorate(key)[0]
            entries.append((key, pos))
            psize = psizes.get((ks, tb, ss, pk))
            if not has_data or psize is None:
                continue  # zero-extent: offset shared with the successor
            ldt, mfda = dels.get(pk, (LIVE_LDT, LIVE_MFDA))
            body = encode_partition_header(key, ldt, mfda)
            recs = parts.get(pk, []) if hdr is not None else []
            if recs and partition_budget_ok(int(psize), recs):
                body += encode_unfiltereds(recs, hdr)
            else:
                body += b"\x01"  # bare END_OF_PARTITION
            blocks.append(body)
            pos += len(body)
        d = os.path.join(tmp, ks, tb)
        os.makedirs(d, exist_ok=True)
        base = os.path.join(d, f"{_DEFAULT_VERSION}-{ss}-big-")
        with open(base + "Index.db", "wb") as f:
            f.write(encode_index_db(entries))
        idx_offs = index_offsets(entries, version=_DEFAULT_VERSION)
        with open(base + "Summary.db", "wb") as f:
            f.write(
                encode_summary_db(
                    [(k, o) for (k, _p), o in zip(entries, idx_offs)],
                    min_index_interval=FIXTURE_MIN_INDEX_INTERVAL,
                )
            )
        with open(base + "Filter.db", "wb") as f:
            f.write(
                encode_filter_db(
                    build_filter(keys, hash_count=FIXTURE_HASH_COUNT)
                )
            )
        if (ks, tb, ss) in stats_map:
            import dataclasses

            stats = dataclasses.replace(
                stats_map[(ks, tb, ss)], partitioner=MURMUR3_PARTITIONER
            )
            with open(base + "Statistics.db", "wb") as f:
                f.write(
                    encode_statistics_db(
                        stats, version=_DEFAULT_VERSION, header=hdr
                    )
                )
        if has_data:
            with open(base + "Data.db", "wb") as f:
                f.write(b"".join(blocks))

    os.makedirs(_FIXTURE_ROOT, exist_ok=True)
    if os.path.exists(root):
        shutil.rmtree(root)
    os.replace(tmp, root)
    # the sidecar: written AFTER the tree so a crashed plant never leaves
    # tokens for files that don't exist
    import pandas as pd

    os.makedirs(tokens_dir, exist_ok=True)
    pdf = pd.DataFrame(
        sorted(token_rows.items()), columns=["partition_key", "token"]
    )
    pdf["token"] = pdf["token"].astype("int64")
    pdf.to_parquet(os.path.join(tokens_dir, "tokens.parquet"), index=False)
    with open(marker, "w") as f:
        f.write("ok\n")
    return root


def token_range_scan_cassdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE token-range certificate: decode every partition whose murmur3
    token falls in [TOKEN_RANGE_LO, TOKEN_RANGE_HI] from the real
    murmur3-ordered tree, via the summary-floored early-stopping index
    scan (sources/lookup.py token_range_scan -- nodetool-repair subrange
    semantics). The oracle joins the shared ``decoded`` frame against the
    plant-time token sidecar, so a hash match certifies the token
    comparator dispatch, the summary floor, the early stop AND every
    decoded field of the selected partitions."""
    from cassandra_sstable_tools_spark.sources.lookup import token_range_scan

    root = materialize_murmur3_files(spark, sf_dir)
    return token_range_scan(spark, root, TOKEN_RANGE_LO, TOKEN_RANGE_HI)


def _oracle() -> str:
    from cassandra_sstable_tools_spark.sources.data_cells import _phys_ctes
    from cassandra_sstable_tools_spark.oracles import with_adapter

    return with_adapter(f""",{_phys_ctes()},
tokens AS (
    SELECT DISTINCT partition_key, token
    FROM read_parquet('{TOKENS_GLOB}')
)
SELECT d.*
FROM decoded d
JOIN tokens t USING (partition_key)
WHERE t.token BETWEEN {TOKEN_RANGE_LO} AND {TOKEN_RANGE_HI}
""")


QUERIES = {"token_range_scan_cassdir": token_range_scan_cassdir}
ORACLES = {"token_range_scan_cassdir": _oracle()}
