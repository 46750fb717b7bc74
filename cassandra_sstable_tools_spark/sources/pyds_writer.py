"""The sstable SINK: ``df.write.format("cassandra-sstable")``.

Completes the source/sink story the reference never had (it is read-only
tooling over files Cassandra wrote): a cell-grain DataFrame -- the same
18-column frame ``data_cells`` decodes, minus/plus the identity columns
-- writes back out as REAL big-format sstables, one per Spark partition,
with the full healthy component set (Data/Index/Summary/Filter/CRC/
Digest/TOC/Statistics). The written tree reads back through every
directory-mode query of this engine, and ``data_cells(written) ==
input`` is pinned by a round-trip differential.

Scope: arbitrary payloads round-trip byte-exactly when the frame carries
``value_bytes`` (+ ``value_marshal`` for the column's declared type) --
the ``data_cells(..., with_values=True)`` lossless frame the executed
compaction reads. A frame WITHOUT value_bytes is the writer's long
domain: ``cell_value`` 8-byte longs only, and a record whose
``value_len`` says its payload was anything else REFUSES by name (r10:
previously such payloads silently wrote as EMPTY values). Clustering is
UTF8 by default; ``option("clustering_type", ...)`` declares a typed
clustering (long/int/uuid/...; COMMA-SEPARATED aliases declare a
composite, e.g. ``"long,text"``), encoded through the display inverses
and verified to re-render identically. Rows and Statistics.db min/max
bounds order by the DECLARED comparator (sign-aware for numeric types,
timestamp-reassembled for v1 UUIDs), never by display strings. Counter columns
are named ``*_ctr`` (the codec's naming convention for counter-ness,
statics included); markers / row / partition deletions as before.
Encodability is per-record LOUD: a row outside the domain names itself
and its field, nothing writes garbage.

Layout decisions (all mirror what a healthy Cassandra 3/4 directory
looks like to this engine's own readers):

- **One sstable per Spark partition** under ``<root>/<keyspace>/
  <table>/``; the caller sizes sstables by sizing partitions
  (``df.repartitionByRange(N, "partition_key")`` gives N sstables with
  disjoint sorted key ranges -- the natural 100 TB layout). Empty
  partitions write nothing.
- **ByteOrderedPartitioner declared** in Statistics.db and partition
  blocks written in key-byte order -- the order the files actually
  follow, so point reads, range scans and the summary floor all work
  against written trees. (Murmur3 order would scatter rendered keys.)
- **Generation ids** are ``<run-base><partition-id>`` (run-base random
  per write job): unique within a directory across repeated appends,
  watermark-monotonic enough for the streaming reader only in the
  lexicographic sense -- a stream tailing a directory written by THIS
  sink should use startingOffsets=earliest (documented).
- **Statistics.db writes LAST**: this engine's readers (and the
  streaming source's visibility rule) require Data+Index+Statistics,
  so a crashed task leaves an invisible partial sstable, never a
  half-readable one. abort() additionally deletes what finished tasks
  wrote.
- **Append-only**: mode("overwrite") is refused loudly -- a Cassandra
  data directory is never clobbered wholesale by tooling.

100 TB notes: each task holds ONE sstable's records in memory (the
caller's partition sizing bounds it -- same contract as any
sort-within-partition file sink); components stream to disk;
nothing aggregates on the driver beyond task commit messages
(O(partitions) paths).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

_BIG_VERSION = "nb"
# TOC content: every component this writer emits, sorted -- the same
# "sorted(existing) + TOC.txt" list the fixture materializer writes
# (TOC.txt sorts last anyway), so toc_check passes on written trees
_ALL_COMPONENTS = sorted([
    "CRC.db", "Data.db", "Digest.crc32", "Filter.db", "Index.db",
    "Statistics.db", "Summary.db", "TOC.txt",
])

_KEY_TYPE_MARSHAL = {
    None: "org.apache.cassandra.db.marshal.UTF8Type",
    "": "org.apache.cassandra.db.marshal.UTF8Type",
    "string": "org.apache.cassandra.db.marshal.UTF8Type",
    "text": "org.apache.cassandra.db.marshal.UTF8Type",
    "utf8": "org.apache.cassandra.db.marshal.UTF8Type",
    "hex": "org.apache.cassandra.db.marshal.BytesType",
    "long": "org.apache.cassandra.db.marshal.LongType",
    "bigint": "org.apache.cassandra.db.marshal.LongType",
    "int": "org.apache.cassandra.db.marshal.Int32Type",
    "uuid": "org.apache.cassandra.db.marshal.UUIDType",
    "timeuuid": "org.apache.cassandra.db.marshal.TimeUUIDType",
    "smallint": "org.apache.cassandra.db.marshal.ShortType",
    "tinyint": "org.apache.cassandra.db.marshal.ByteType",
    "boolean": "org.apache.cassandra.db.marshal.BooleanType",
    "date": "org.apache.cassandra.db.marshal.SimpleDateType",
    "time": "org.apache.cassandra.db.marshal.TimeType",
    "timestamp": "org.apache.cassandra.db.marshal.TimestampType",
    "inet": "org.apache.cassandra.db.marshal.InetAddressType",
    "varint": "org.apache.cassandra.db.marshal.IntegerType",
    # r12: decimal joins the clustering/key vocabulary (comparator model
    # in data_cells.comparator_key; plain-notation displays only)
    "decimal": "org.apache.cassandra.db.marshal.DecimalType",
}


def marshal_for_key_type(key_type: str | None) -> str:
    """Writer key_type alias -> the marshal class the header declares.
    ``composite(a,b,...)`` (the key_renderer/key_encoder vocabulary)
    declares CompositeType with each component's marshal -- the r11
    second half of multi-component typed layouts: composite PARTITION
    keys round-trip alongside composite clusterings. Unknown aliases and
    nested composites fail loud."""
    m = _KEY_TYPE_MARSHAL.get(key_type)
    if m is not None:
        return m
    if key_type and key_type.startswith("composite(") \
            and key_type.endswith(")"):
        inner = [a.strip() for a in key_type[len("composite("):-1]
                 .split(",")]
        ms = []
        for a in inner:
            im = _KEY_TYPE_MARSHAL.get(a) if a else None
            if im is None:
                raise ValueError(
                    f"unsupported composite key component {a!r} (in "
                    f"{key_type!r}): one of "
                    f"{sorted(k for k in _KEY_TYPE_MARSHAL if k)}"
                )
            ms.append(im)
        return ("org.apache.cassandra.db.marshal.CompositeType("
                + ",".join(ms) + ")")
    raise ValueError(
        f"unsupported writer key_type {key_type!r}: one of "
        f"{sorted(k for k in _KEY_TYPE_MARSHAL if k)} or composite(...)"
    )


def validate_clustering_type(clustering_type: str | None) -> None:
    """Loud validation of the (possibly comma-separated composite)
    clustering_type alias list -- ONE implementation for the
    write_sstable and SSTableWriter option paths (r11 review: the
    duplicated loops could drift)."""
    if clustering_type is None:
        return
    for alias in clustering_type.split(","):
        if alias.strip() not in _KEY_TYPE_MARSHAL:
            raise ValueError(
                f"unsupported writer clustering_type {alias.strip()!r} "
                f"(in {clustering_type!r}): one of "
                f"{sorted(k for k in _KEY_TYPE_MARSHAL if k)}"
            )


def _key_bytes(display: str, key_type: str | None) -> bytes:
    """Inverse of the frame's partition_key rendering. Default render is
    UTF-8-or-0x-hex, so a 0x literal decodes as hex; typed displays go
    through key_encoder. The caller re-renders and compares, so a
    mis-inverted key fails LOUD instead of writing a key that reads back
    differently."""
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        key_encoder,
    )

    if key_type in (None, "", "string", "text", "utf8"):
        if display.startswith("0x") and len(display) % 2 == 0:
            try:
                return bytes.fromhex(display[2:])
            except ValueError:
                pass
        return display.encode("utf-8")
    return key_encoder(key_type)(display)


_REQUIRED_COLS = {
    "partition_key", "kind", "clustering", "column_name", "cell_path",
    "writetime", "ttl", "local_deletion_time", "is_tombstone",
    "is_expiring", "is_counter", "cell_value", "range_start", "range_end",
}


def _atomic_write(path: str, data: bytes) -> None:
    """tmp + rename, so a reader never sees a half-written component and
    an idempotent micro-batch REPLAY can overwrite a live file safely.
    The tmp name is attempt-unique: concurrent attempts of one task
    (speculation, zombie retries) must never truncate each other's
    in-flight tmp (review finding)."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _check_ident(name: str, what: str) -> str:
    if not name or "/" in name or "-" in name or name in (".", ".."):
        raise ValueError(
            f"{what} {name!r} cannot be empty or contain '/' or '-' "
            "(the sstable filename grammar splits on them)"
        )
    return name


@dataclass
class SSTableWriteMessage(WriterCommitMessage):
    paths: list = field(default_factory=list)
    rows: int = 0
    # deferred Statistics.db components: [(path, bytes)] -- set by the
    # STREAMING sink's tasks, written by its driver-side commit
    stats: list = field(default_factory=list)


def _infer_header(records: list[dict], key_marshal: str,
                  clustering_marshals: list[str] | None = None):
    """SerializationHeaderInfo from the task's records: column set and
    types. A record carrying ``value_marshal`` (a with_values decode)
    declares its column's EXACT marshal type, so rewrites preserve the
    source schema; records without one infer the writer's long-domain
    defaults (LongType values, CounterColumnType for ``*_ctr`` names,
    MapType(UTF8,Long) for CellPath-addressed cells) -- a declared type
    always beats a default, two different DECLARED types for one column
    raise. EncodingStats mins run over the values each kind actually
    serializes (every delta must be non-negative -- the fixture payload
    rule). Counter statics key as ``<name>_ctr`` exactly like regulars
    (r09 advice: the asymmetry silently renamed static counters across a
    round-trip)."""
    from cassandra_sstable_tools_spark.sources.data_cells import (
        COUNTER_TYPE,
        LONG_TYPE,
        MAP_UTF8_LONG_TYPE,
    )
    from cassandra_sstable_tools_spark.sources.statistics_db import (
        ENC_DELETION_TIME_EPOCH,
        ENC_TIMESTAMP_EPOCH,
        SerializationHeaderInfo,
    )

    # name -> (marshal type, declared: bool)
    statics: dict[str, tuple[str, bool]] = {}
    regulars: dict[str, tuple[str, bool]] = {}

    def put(table: dict, name: str, t: str, declared: bool) -> None:
        prev = table.get(name)
        if prev is None:
            table[name] = (t, declared)
            return
        pt, pdecl = prev
        if pt == t:
            return
        if pdecl and declared:
            raise ValueError(
                f"column {name!r} declared as both {pt} and {t} -- "
                "one column cannot carry two marshal types"
            )
        if declared:
            table[name] = (t, True)
        elif not pdecl:
            raise ValueError(
                f"column {name!r} inferred as both {pt} and {t} -- "
                "a column is either simple, complex or counter"
            )

    min_ts = min_ldt = min_ttl = None
    for rec in records:
        kind = rec["kind"]
        is_cellish = kind == "CELL" or kind == "STATIC_CELL"
        # fast path (guide §1.2): the column tables saturate after a few
        # records -- when this (name, type) pair is already recorded with
        # the same type, `put` is a no-op; skip its call (and the marshal
        # lookups feeding it) with one dict probe
        if is_cellish or kind == "COMPLEX_DELETE":
            table = regulars if kind != "STATIC_CELL" else statics
            marshal = rec.get("value_marshal")
            if rec["is_counter"]:
                name, t, declared = rec["cell_name"] + "_ctr", COUNTER_TYPE, True
            elif marshal:
                name, t, declared = rec["cell_name"], marshal, True
            elif kind != "STATIC_CELL" and (
                rec.get("cell_path") is not None or kind == "COMPLEX_DELETE"
            ):
                name, t, declared = rec["cell_name"], MAP_UTF8_LONG_TYPE, False
            else:
                name, t, declared = rec["cell_name"], LONG_TYPE, False
            prev = table.get(name)
            if prev is None or prev[0] != t:
                put(table, name, t, declared)
        elif kind == "PARTITION_DELETE":
            continue  # header-carried; not part of EncodingStats
        wt = rec["writetime"]
        if wt is not None and (min_ts is None or wt < min_ts):
            min_ts = wt
        ttl = rec["ttl"]
        serializes_ldt = (
            (bool(rec["is_tombstone"]) or ttl is not None)
            if is_cellish
            else kind in (
                "ROW_DELETE", "RANGE_TOMBSTONE_MARKER", "COMPLEX_DELETE"
            )
        )
        if serializes_ldt:
            ldt = rec["local_deletion_time"]
            if ldt is not None:
                ldt = int(ldt)
                if min_ldt is None or ldt < min_ldt:
                    min_ldt = ldt
        if ttl is not None:
            ttl = int(ttl)
            if min_ttl is None or ttl < min_ttl:
                min_ttl = ttl
    return SerializationHeaderInfo(
        min_timestamp=min_ts if min_ts is not None else ENC_TIMESTAMP_EPOCH,
        min_local_deletion_time=(
            min_ldt if min_ldt is not None else ENC_DELETION_TIME_EPOCH
        ),
        min_ttl=min_ttl or 0,
        key_type=key_marshal,
        clustering_types=(
            clustering_marshals
            or ["org.apache.cassandra.db.marshal.UTF8Type"]
        ),
        static_columns=sorted((n, t) for n, (t, _) in statics.items()),
        regular_columns=sorted((n, t) for n, (t, _) in regulars.items()),
    )


def _bound_components(bound) -> list[bytes]:
    """(comparator key, component values) -> Statistics.db bound list:
    the component bytes up to the first null (nulls cannot serialize as
    bound values; the surviving prefix is a valid conservative bound)."""
    if bound is None:
        return []
    out: list[bytes] = []
    for v in bound[1]:
        if v is None:
            break
        out.append(v)
    return out


def _field(row, name):
    """Optional frame column: None when the frame doesn't carry it."""
    try:
        return row[name]
    except (KeyError, ValueError, TypeError, IndexError):
        return None


def _clustering_marshals_for(
    records: list[dict], clustering_type: str | None
) -> list[str] | None:
    """The written header's clustering types (one per component). An
    explicit ``clustering_type`` option wins -- alias vocabulary like
    key_type, COMMA-SEPARATED for composite clusterings ('long,text');
    otherwise AUTO-DISCOVER from the records' ``clustering_marshal``
    column (a with_values decode carries the source header's clustering
    types comma-joined, so a compaction rewrite re-declares typed
    clustering -- single or composite -- with no user flag). Discovery
    rules: two different declared layouts for one sstable raise (a
    table's clustering cannot fork); any component type outside the
    display inverse's set falls back to a single UTF8 component -- the
    written component then carries the rendered display, which
    re-renders identically (display-faithful, not layout-faithful;
    documented). None -> single UTF8 default."""
    from cassandra_sstable_tools_spark.sources.data_cells import (
        _CLUSTERING_ENCODERS,
    )

    if clustering_type is not None:
        return [
            _KEY_TYPE_MARSHAL[a.strip()]
            for a in clustering_type.split(",")
        ]
    declared = {
        r["clustering_marshal"]
        for r in records
        if r.get("clustering_marshal")
    }
    if len(declared) > 1:
        raise ValueError(
            f"records declare conflicting clustering types {sorted(declared)}"
            " -- one sstable has one clustering layout"
        )
    if declared:
        (m,) = declared
        parts = m.split(",")
        # every component must be a modeled simple type: a parenthesized
        # type (MapType(a,b)) splits into non-class fragments and falls
        # through to the UTF8 fallback, never to a misdeclared header
        if all(p.rsplit(".", 1)[-1] in _CLUSTERING_ENCODERS or
               p.rsplit(".", 1)[-1] == "UTF8Type" for p in parts):
            return parts
    return None  # single UTF8 default (display-faithful fallback)


def _row_to_record(row) -> dict:
    kind = row["kind"]
    name = row["column_name"]
    if kind in ("CELL", "STATIC_CELL", "COMPLEX_DELETE"):
        if name is None:
            raise ValueError(f"{kind} record without a column_name")
        if row["is_counter"]:
            if not name.endswith("_ctr"):
                raise ValueError(
                    f"counter column {name!r}: the codec's counter naming "
                    "convention requires a *_ctr column name"
                )
            name = name[: -len("_ctr")]
    # Payload safety (r09 verdict #1): ``cell_value`` alone can only carry
    # 8-byte long payloads -- the decoder marks every other payload with
    # its ``value_len``, and the LOSSLESS ``value_bytes`` column (a
    # with_values decode) carries the bytes themselves. A record whose
    # payload was dropped by the long-only frame REFUSES here by name --
    # the writer must never silently write an EMPTY value for it.
    # (dict rows: .get IS _field's semantics -- absent key -> None --
    # without the per-row try/except; Row objects keep the probing helper)
    if type(row) is dict:
        value_bytes = row.get("value_bytes")
        value_len = row.get("value_len")
    else:
        value_bytes = _field(row, "value_bytes")
        value_len = _field(row, "value_len")
    if value_bytes is None and kind in ("CELL", "STATIC_CELL"):
        cv = row["cell_value"]
        if value_len is not None and (value_len != 8 or cv is None):
            raise ValueError(
                f"column {row['column_name']!r} key "
                f"{row['partition_key']!r}: payload of {value_len} bytes "
                "cannot round-trip through cell_value (8-byte longs only) "
                "-- re-read with data_cells(..., with_values=True) so "
                "value_bytes carries it, or drop the record explicitly"
            )
    if type(row) is dict:
        value_marshal = row.get("value_marshal")
        clustering_marshal = row.get("clustering_marshal")
    else:
        value_marshal = _field(row, "value_marshal")
        clustering_marshal = _field(row, "clustering_marshal")
    return {
        "partition_key": row["partition_key"],
        "clustering": row["clustering"],
        "kind": kind,
        "cell_name": name,
        "cell_size": row["cell_value"],
        "value_bytes": value_bytes,
        "value_marshal": value_marshal,
        "clustering_marshal": clustering_marshal,
        "writetime": row["writetime"],
        "ttl": row["ttl"],
        "is_tombstone": row["is_tombstone"],
        "is_counter": row["is_counter"],
        "local_deletion_time": row["local_deletion_time"],
        "range_start": row["range_start"],
        "range_end": row["range_end"],
        "cell_path": row["cell_path"],
    }


def write_sstable(
    rows: list,
    out_dir: str,
    sstable_id: str,
    key_type: str | None = None,
    compression: str = "none",
    defer_stats: bool = False,
    clustering_type: str | None = None,
) -> tuple[list[str], tuple[str, bytes] | None]:
    """Encode one sstable (all components) from cell-grain rows; returns
    (written paths, deferred stats). Partition blocks are laid out
    back-to-back in key-byte order; every component derives from the REAL
    encoded bytes (positions, summary offsets, bloom membership, CRCs,
    histograms), so the written sstable is indistinguishable from a
    planted fixture to every reader in this engine.

    ``defer_stats=True`` skips writing Statistics.db and returns its
    (path, bytes) instead -- Statistics.db presence IS this engine's
    visibility gate, so a coordinator (the streaming sink's commit) can
    make a whole batch of sstables visible together, after every task
    succeeded."""
    from cassandra_sstable_tools_spark.sources.bloom import (
        FIXTURE_HASH_COUNT,
        build_filter,
        encode_filter_db,
    )
    from cassandra_sstable_tools_spark.sources.crc_db import encode_crc_db
    from cassandra_sstable_tools_spark.sources.data_cells import (
        clustering_comparator_tuple,
        clustering_components,
        encode_unfiltereds,
        record_encodable,
    )
    from cassandra_sstable_tools_spark.sources.data_db import (
        LIVE_LDT,
        LIVE_MFDA,
        encode_partition_header,
    )
    from cassandra_sstable_tools_spark.sources.sstable_binary import (
        encode_index_db,
        index_offsets,
        render_typed,
    )
    from cassandra_sstable_tools_spark.sources.statistics_db import (
        SSTableStats,
        encode_statistics_db,
    )
    from cassandra_sstable_tools_spark.sources.summary_db import (
        FIXTURE_MIN_INDEX_INTERVAL,
        encode_summary_db,
    )

    key_marshal = marshal_for_key_type(key_type)
    validate_clustering_type(clustering_type)

    by_key: dict[bytes, dict] = {}
    # encode+round-trip-verify each DISTINCT key once (a cell-grain batch
    # repeats every key per column/clustering; the verification outcome
    # is a pure function of the display)
    key_cache: dict[str, bytes] = {}
    for row in rows:
        rec = _row_to_record(row)
        pk = rec["partition_key"]
        kb = key_cache.get(pk)
        if kb is None:
            try:
                kb = _key_bytes(pk, key_type)
            except ValueError as ex:
                raise ValueError(
                    f"partition_key {pk!r} does not survive "
                    f"the {key_type or 'default'} encoding round-trip ({ex}) "
                    "-- pass the matching key_type option"
                ) from ex
            back = render_typed(kb, key_marshal)
            if back != pk:
                raise ValueError(
                    f"partition_key {pk!r} does not survive "
                    f"the {key_type or 'default'} encoding round-trip "
                    f"(re-renders as {back!r}) -- pass the matching key_type "
                    "option"
                )
            key_cache[pk] = kb
        slot = by_key.setdefault(kb, {"deletion": None, "recs": []})
        if rec["kind"] == "PARTITION_DELETE":
            # collapse to the header's single (max ldt, max writetime)
            ldt, mfda = int(rec["local_deletion_time"]), int(rec["writetime"])
            prev = slot["deletion"]
            slot["deletion"] = (
                (ldt, mfda) if prev is None
                else (max(prev[0], ldt), max(prev[1], mfda))
            )
        else:
            if not record_encodable(rec):
                raise ValueError(
                    f"record not encodable by the cell codec: kind="
                    f"{rec['kind']} key={rec['partition_key']!r} "
                    f"column={rec['cell_name']!r} (see data_cells.py "
                    "record_encodable for the per-kind field rules)"
                )
            slot["recs"].append(rec)

    all_recs = [r for s in by_key.values() for r in s["recs"]]
    clustering_marshals = _clustering_marshals_for(all_recs, clustering_type)
    header = _infer_header(all_recs, key_marshal, clustering_marshals)
    cl_types = header.clustering_types
    from cassandra_sstable_tools_spark.sources.data_cells import _encode_prep

    enc_prep = _encode_prep(header)

    entries: list[tuple[bytes, int]] = []
    blob = bytearray()
    psize_hist: dict[int, int] = {}
    ccount_hist: dict[int, int] = {}
    total_rows = 0
    total_cells = 0
    min_cl = max_cl = None
    ts_lo = ts_hi = None
    # distinct clustering displays already folded into the min/max bounds:
    # records repeat displays heavily (per column, per partition), and the
    # bound update is a pure function of the display, so each display pays
    # the comparator-tuple/components derivation ONCE per write (guide
    # §1.2 per-task work: the per-record loop previously re-looked-up the
    # lru caches 2x per record for an answer that cannot change)
    cl_seen: set = set()
    rowkeys: set = set()
    for kb in sorted(by_key):  # ByteOrdered: file order = key-byte order
        slot = by_key[kb]
        ldt, mfda = slot["deletion"] or (LIVE_LDT, LIVE_MFDA)
        recs = slot["recs"]
        body = encode_partition_header(kb, ldt, mfda)
        # strict_spans=False: the sink writes arbitrary-length payloads
        # with format-correct multi-byte vints; the 1-byte-vint cost
        # bounds are the FIXTURE span oracle's contract, not the format's
        body += encode_unfiltereds(
            recs, header, strict_spans=False, prep=enc_prep
        )
        entries.append((kb, len(blob)))
        blob += body
        psize_hist[len(body)] = psize_hist.get(len(body), 0) + 1
        # ONE pass per record: cell count, distinct row keys, timestamp
        # extremes and (per distinct display) clustering bounds -- the
        # previous 3 extra per-slot passes fused (guide §1.2)
        ncells = 0
        rowkeys.clear()
        for r in recs:
            kind = r["kind"]
            static = kind == "STATIC_CELL"
            if static or kind == "CELL":
                ncells += 1
            rowkeys.add((not static, r["clustering"]))
            wt = r["writetime"]
            if wt is not None:
                if ts_lo is None:
                    ts_lo = ts_hi = wt
                elif wt < ts_lo:
                    ts_lo = wt
                elif wt > ts_hi:
                    ts_hi = wt
            cl = r["clustering"]
            if cl is not None and cl not in cl_seen:
                cl_seen.add(cl)
                # min/max clustering in Statistics.db store the ENCODED
                # component bytes (what the decoder's typed display
                # re-renders). Bounds are selected by the DECLARED
                # comparator's order, NOT raw byte order -- under signed
                # types raw min/max inverts ({-3,2,10} -> min 2, max -3)
                # and a Cassandra reader using inverted bounds for slice
                # exclusion would wrongly skip the sstable (r10 ADVICE)
                ck = clustering_comparator_tuple(cl, cl_types)
                vals = clustering_components(cl, cl_types)
                if min_cl is None or ck < min_cl[0]:
                    min_cl = (ck, vals)
                if max_cl is None or ck > max_cl[0]:
                    max_cl = (ck, vals)
        ccount_hist[ncells] = ccount_hist.get(ncells, 0) + 1
        total_cells += ncells
        total_rows += len(rowkeys)

    if compression not in ("none", "lz4", "deflate", "snappy"):
        raise ValueError(
            f"unsupported writer compression {compression!r}: "
            "none|lz4|deflate|snappy"
        )
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(out_dir, f"{_BIG_VERSION}-{sstable_id}-big-")
    written: list[str] = []

    def _put(component: str, data: bytes) -> None:
        p = prefix + component
        _atomic_write(p, data)
        written.append(p)

    if compression != "none":
        # chunk-compressed Data.db + CompressionInfo chunk map; real
        # Cassandra writes no CRC.db for compressed sstables (chunk CRCs
        # live inline in Data.db)
        from cassandra_sstable_tools_spark.sources.lz4_block import (
            DEFLATE,
            LZ4,
            SNAPPY,
            write_chunked_file,
        )

        chunk_compressor = {
            "lz4": LZ4, "deflate": DEFLATE, "snappy": SNAPPY,
        }[compression]
        from cassandra_sstable_tools_spark.sources.sstable_binary import (
            encode_compression_info,
        )

        chunk_len = 65536
        dpath = prefix + "Data.db"
        # attempt-unique tmp, exactly like _atomic_write: two concurrent
        # attempts of one task (speculation, zombie retry) must never
        # interleave into the same tmp fd -- a fixed name would publish a
        # corrupt Data.db whose Digest is computed FROM the corrupt bytes,
        # so the corruption would pass integrity checks (r09 advice)
        tmp = f"{dpath}.{uuid.uuid4().hex}.tmp"
        try:
            with open(tmp, "wb") as f:
                # the layout is contiguous: one block at offset 0 IS the
                # image; chunks stream to disk as they compress
                offsets = write_chunked_file(
                    [(0, bytes(blob))], len(blob), chunk_len, f,
                    max_compressed_length=chunk_len,
                    compressor=chunk_compressor,
                )
            os.replace(tmp, dpath)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
        written.append(dpath)
        _put(
            "CompressionInfo.db",
            encode_compression_info(
                len(blob), version=_BIG_VERSION, chunk_length=chunk_len,
                compressor=chunk_compressor,
                options=(
                    {"lz4_high_compressor_level": "3"}
                    if compression == "lz4" else {}
                ),
                offsets=offsets,
            ),
        )
        components = sorted(
            c for c in _ALL_COMPONENTS if c != "CRC.db"
        ) + ["CompressionInfo.db"]
        components = sorted(set(components))
    else:
        _put("Data.db", bytes(blob))
        _put("CRC.db", encode_crc_db(prefix + "Data.db"))
        components = list(_ALL_COMPONENTS)
    idx_offs = index_offsets(entries, version=_BIG_VERSION)
    _put(
        "Summary.db",
        encode_summary_db(
            [(k, o) for (k, _p), o in zip(entries, idx_offs)],
            min_index_interval=FIXTURE_MIN_INDEX_INTERVAL,
        ),
    )
    _put(
        "Filter.db",
        encode_filter_db(
            build_filter([k for k, _ in entries],
                         hash_count=FIXTURE_HASH_COUNT)
        ),
    )
    # ASCII decimal CRC32 of the ON-DISK Data.db bytes (compressed chunks
    # included) -- the digest_check rule
    from cassandra_sstable_tools_spark.sources.data_db import file_crc32

    _put(
        "Digest.crc32",
        str(file_crc32(prefix + "Data.db")).encode("ascii"),
    )
    _put(
        "TOC.txt",
        "".join(c + "\n" for c in components).encode("ascii"),
    )
    _put("Index.db", encode_index_db(entries))
    stats = SSTableStats(
        partitioner="org.apache.cassandra.dht.ByteOrderedPartitioner",
        partition_size_hist=sorted(psize_hist.items()),
        column_count_hist=sorted(ccount_hist.items()),
        min_timestamp=ts_lo if ts_lo is not None else 0,
        max_timestamp=ts_hi if ts_hi is not None else 0,
        # full component tuples of the comparator-min/max positions;
        # truncated at the first null component (a null cannot serialize
        # as a bound value -- the remaining prefix is still a valid,
        # conservative bound)
        min_clustering=_bound_components(min_cl),
        max_clustering=_bound_components(max_cl),
        total_columns_set=total_cells,
        total_rows=total_rows,
    )
    # Statistics.db LAST: its presence is what makes the sstable visible
    # to this engine's readers and the streaming source
    stats_blob = encode_statistics_db(
        stats, version=_BIG_VERSION, header=header
    )
    if defer_stats:
        return written, (prefix + "Statistics.db", stats_blob)
    _put("Statistics.db", stats_blob)
    return written, None


class SSTableWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "cassandra-sstable sink is append-only: a Cassandra data "
                "directory is never clobbered wholesale; use mode('append')"
            )
        self.root = options.get("path")
        if not self.root:
            raise ValueError(
                "cassandra-sstable sink needs a path: .save('/data/dir')"
            )
        self.keyspace = options.get("keyspace")
        self.table = options.get("table")
        if bool(self.keyspace) != bool(self.table):
            raise ValueError(
                "cassandra-sstable sink needs option('keyspace', ...) and "
                "option('table', ...) together -- or NEITHER, in which "
                "case every row must carry keyspace/table_name columns "
                "(identity-preserving mode, e.g. compaction rewrites)"
            )
        for ident in (self.keyspace, self.table):
            if ident:
                _check_ident(ident, "keyspace/table name")
        self.key_type = options.get("key_type")
        marshal_for_key_type(self.key_type)  # loud on unknown aliases
        self.clustering_type = options.get("clustering_type")
        validate_clustering_type(self.clustering_type)
        self.compression = options.get("compression", "none").lower()
        if self.compression not in ("none", "lz4", "deflate", "snappy"):
            raise ValueError(
                f"unsupported writer compression {self.compression!r}: "
                "none|lz4|deflate|snappy"
            )
        # one random base per write job -> unique generations per append
        self.run_base = uuid.uuid4().hex[:8]

    def write(self, iterator) -> SSTableWriteMessage:
        from pyspark import TaskContext

        rows = list(iterator)
        if not rows:
            return SSTableWriteMessage()
        pid = TaskContext.get().partitionId()
        if self.keyspace:
            groups = {(self.keyspace, self.table): rows}
        else:
            # identity-preserving mode: one sstable per (ks, tb) present
            # in the task (the caller co-partitions by table + key range)
            groups = {}
            for row in rows:
                if not row["keyspace"] or not row["table_name"]:
                    raise ValueError(
                        "identity-preserving write: every row needs "
                        "keyspace/table_name (or pass the options)"
                    )
                # row-carried identities face the same filename-grammar
                # validation the option path gets -- and since they build
                # filesystem paths, also the traversal rejects ('/',
                # '..'): a hostile row must not write outside the root
                ks = _check_ident(row["keyspace"], "row keyspace")
                tb = _check_ident(row["table_name"], "row table_name")
                groups.setdefault((ks, tb), []).append(row)
        paths: list[str] = []
        stats: list[tuple[str, bytes]] = []
        for seq, ((ks, tb), grows) in enumerate(sorted(groups.items())):
            got, deferred = write_sstable(
                grows, os.path.join(self.root, ks, tb),
                sstable_id=self._sstable_id(pid, seq),
                key_type=self.key_type,
                compression=self.compression,
                defer_stats=self._defer_stats,
                clustering_type=self.clustering_type,
            )
            paths.extend(got)
            if deferred is not None:
                stats.append(deferred)
        return SSTableWriteMessage(paths=paths, rows=len(rows), stats=stats)

    _defer_stats = False

    def _sstable_id(self, pid: int, seq: int) -> str:
        return f"{self.run_base}x{pid:05d}n{seq}"

    def commit(self, messages) -> None:
        pass  # tasks finalize themselves (Statistics.db-last visibility)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for p in getattr(m, "paths", []) or []:
                try:
                    os.remove(p)
                except OSError:
                    pass


class SSTableStreamWriter(SSTableWriter, DataSourceStreamWriter):
    """``writeStream.format("cassandra-sstable")`` -- the memtable-flush
    analogue: each micro-batch flushes as fresh sstables.

    Exactly-once across retries AND restarts, by construction:
    - generations embed the batch id (``b<batchId>p<partition>``), so a
      REPLAYED batch rewrites the exact same filenames with the exact
      same bytes (the encoder sorts; components are pure functions of
      the rows) through atomic per-file replaces -- no duplicates;
    - tasks defer Statistics.db (this engine's visibility gate) into
      their commit messages; the driver-side ``commit`` writes them in
      ascending generation order only after EVERY task succeeded. A
      concurrent reader's listing therefore sees a generation-ordered
      PREFIX of the batch, which is exactly what the streaming reader's
      per-table watermark needs to never skip an sstable -- so a
      directory can be tailed by one stream while another writes it.

    Batch-id generations are lexicographically monotonic (zero-padded),
    so the streaming READER's watermark advances correctly over a tree
    this sink produces."""

    def __init__(self, options, overwrite: bool = False):
        if overwrite:
            raise ValueError(
                "cassandra-sstable stream sink is APPEND-only: "
                "complete/update output modes would re-flush whole "
                "aggregates as fresh generations every batch; use "
                "outputMode('append')"
            )
        super().__init__(options, overwrite=False)

    _defer_stats = True

    def _sstable_id(self, pid: int, seq: int) -> str:
        from pyspark import TaskContext

        batch = TaskContext.get().getLocalProperty("streaming.sql.batchId")
        if batch is None:
            raise RuntimeError(
                "streaming sstable sink: no streaming.sql.batchId in the "
                "task context (not running inside a micro-batch?)"
            )
        return f"b{int(batch):012d}p{pid:05d}n{seq}"

    def commit(self, messages, batchId: int) -> None:
        stats = sorted(
            (path, blob)
            for m in messages
            if m is not None
            for path, blob in getattr(m, "stats", []) or []
        )
        for path, blob in stats:  # ascending generation order (see above)
            _atomic_write(path, blob)

    def abort(self, messages, batchId: int) -> None:
        # nothing of this batch is visible (no Statistics.db written);
        # remove the invisible partials
        for m in messages:
            if m is None:
                continue
            for p in getattr(m, "paths", []) or []:
                try:
                    os.remove(p)
                except OSError:
                    pass
