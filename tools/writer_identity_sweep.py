"""Byte-identity sweep: write_sstable from the repo in argv[1] over a
config matrix; print sha256 of every component per config. Run against
the ref worktree and the working tree; diff the outputs."""
import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, sys.argv[1])

from cassandra_sstable_tools_spark.sources.pyds_writer import write_sstable


def recs_basic(key_fmt, ck_fmt, n_parts=40, complex_col=True):
    rows = []
    for p in range(n_parts):
        pk = key_fmt(p)
        if p % 7 == 0:  # partition delete on some
            rows.append({
                "partition_key": pk, "clustering": None,
                "kind": "PARTITION_DELETE", "column_name": None,
                "cell_value": None, "writetime": 1_600_000_000_000_000 + p,
                "ttl": None, "is_tombstone": True, "is_counter": False,
                "local_deletion_time": 1_600_000_000,
                "range_start": None, "range_end": None, "cell_path": None,
            })
        for c in range(4):
            ck = ck_fmt(p, c)
            kinds = ["CELL"]
            if c == 0:
                kinds.append("ROW_MARKER")
            if c == 1 and p % 3 == 0:
                kinds.append("ROW_DELETE")
            for kind in kinds:
                rows.append({
                    "partition_key": pk, "clustering": ck, "kind": kind,
                    "column_name": "v0" if kind == "CELL" else None,
                    "cell_value": (p * 13 + c) if kind == "CELL" else None,
                    "writetime": 1_700_000_000_000_000 + p * 10 + c,
                    "ttl": 300 if (kind == "CELL" and c == 2) else None,
                    "is_tombstone": kind in ("ROW_DELETE",) or (
                        kind == "CELL" and c == 3),
                    "is_counter": False,
                    "local_deletion_time": (
                        1_650_000_000
                        if (kind != "ROW_MARKER" and (
                            c in (2, 3) or kind == "ROW_DELETE"))
                        else None
                    ),
                    "range_start": None, "range_end": None, "cell_path": None,
                })
            # counter cell
            if c == 1:
                rows.append({
                    "partition_key": pk, "clustering": ck, "kind": "CELL",
                    "column_name": "cnt_ctr", "cell_value": p,
                    "writetime": 1_700_000_000_000_001, "ttl": None,
                    "is_tombstone": False, "is_counter": True,
                    "local_deletion_time": None,
                    "range_start": None, "range_end": None, "cell_path": None,
                })
            # static cell
            if c == 0:
                rows.append({
                    "partition_key": pk, "clustering": None,
                    "kind": "STATIC_CELL", "column_name": "s0",
                    "cell_value": p * 7,
                    "writetime": 1_700_000_000_000_002, "ttl": None,
                    "is_tombstone": False, "is_counter": False,
                    "local_deletion_time": None,
                    "range_start": None, "range_end": None, "cell_path": None,
                })
        # range tombstone marker
        rows.append({
            "partition_key": pk, "clustering": None,
            "kind": "RANGE_TOMBSTONE_MARKER", "column_name": None,
            "cell_value": None, "writetime": 1_690_000_000_000_000,
            "ttl": None, "is_tombstone": True, "is_counter": False,
            "local_deletion_time": 1_640_000_000,
            "range_start": ck_fmt(p, 0), "range_end": ck_fmt(p, 2),
            "cell_path": None,
        })
        if complex_col:
            rows.append({
                "partition_key": pk, "clustering": ck_fmt(p, 0),
                "kind": "CELL", "column_name": "m0", "cell_value": p,
                "writetime": 1_700_000_000_000_003, "ttl": None,
                "is_tombstone": False, "is_counter": False,
                "local_deletion_time": None,
                "range_start": None, "range_end": None,
                "cell_path": f"k{p % 5}",
            })
    return rows


def recs_values(n=50):
    # with_values-shaped records: raw payload bytes + declared marshals
    rows = []
    for p in range(n):
        pk = f"vk{p:04d}"
        rows.append({
            "partition_key": pk, "clustering": str(p - 20), "kind": "CELL",
            "column_name": "blob0",
            "cell_value": None,
            "value_bytes": bytes([p % 256]) * (p % 37 + 1),
            "value_len": p % 37 + 1,
            "value_marshal": "org.apache.cassandra.db.marshal.BytesType",
            "clustering_marshal": "org.apache.cassandra.db.marshal.LongType",
            "writetime": 1_700_000_000_500_000 + p, "ttl": None,
            "is_tombstone": False, "is_counter": False,
            "local_deletion_time": None,
            "range_start": None, "range_end": None, "cell_path": None,
        })
    return rows


CONFIGS = [
    ("text_utf8", recs_basic(lambda p: f"key{p:04d}",
                             lambda p, c: f"c{c}"), None, None, "none"),
    ("long_keys", recs_basic(lambda p: str(p * 11 - 200),
                             lambda p, c: str(c - 2)), "long", "long", "none"),
    ("lz4", recs_basic(lambda p: f"key{p:04d}",
                       lambda p, c: f"c{c}"), None, None, "lz4"),
    ("deflate", recs_basic(lambda p: f"key{p:04d}",
                           lambda p, c: f"c{c}"), None, None, "deflate"),
    ("snappy", recs_basic(lambda p: f"key{p:04d}",
                          lambda p, c: f"c{c}"), None, None, "snappy"),
    ("values_declared", recs_values(), None, None, "none"),
    ("composite_ck", recs_basic(
        lambda p: f"key{p:04d}",
        lambda p, c: f"{c - 2}:x{c}"), None, "long,text", "none"),
]

for name, rows, kt, ct, comp in CONFIGS:
    out = tempfile.mkdtemp(prefix="ident_", dir="/dev/shm")
    try:
        paths, _ = write_sstable(
            rows, out + "/w", "00c0de", key_type=kt,
            clustering_type=ct, compression=comp,
        )
        for p in sorted(paths):
            h = hashlib.sha256(open(p, "rb").read()).hexdigest()[:16]
            print(f"{name} {os.path.basename(p)} {h}")
    except Exception as exc:  # noqa: BLE001 -- error TEXT is part of identity
        print(f"{name} RAISED {type(exc).__name__}: {exc}")
    finally:
        shutil.rmtree(out, ignore_errors=True)

# error-path identity: payload refusal, conflicting marshals, bad counter name
ERR_CASES = [
    ("refuse_payload", [{
        "partition_key": "k", "clustering": "c", "kind": "CELL",
        "column_name": "v0", "cell_value": None, "value_bytes": None,
        "value_len": 16, "value_marshal": None, "clustering_marshal": None,
        "writetime": 1, "ttl": None, "is_tombstone": False,
        "is_counter": False, "local_deletion_time": None,
        "range_start": None, "range_end": None, "cell_path": None,
    }]),
    ("counter_name", [{
        "partition_key": "k", "clustering": "c", "kind": "CELL",
        "column_name": "v0", "cell_value": 1, "writetime": 1, "ttl": None,
        "is_tombstone": False, "is_counter": True,
        "local_deletion_time": None,
        "range_start": None, "range_end": None, "cell_path": None,
    }]),
    ("conflict_marshal", [
        {"partition_key": "k", "clustering": "c", "kind": "CELL",
         "column_name": "v0", "cell_value": None, "value_bytes": b"x",
         "value_len": 1,
         "value_marshal": "org.apache.cassandra.db.marshal.BytesType",
         "clustering_marshal": None, "writetime": 1, "ttl": None,
         "is_tombstone": False, "is_counter": False,
         "local_deletion_time": None, "range_start": None,
         "range_end": None, "cell_path": None},
        {"partition_key": "k", "clustering": "d", "kind": "CELL",
         "column_name": "v0", "cell_value": None, "value_bytes": b"yy",
         "value_len": 2,
         "value_marshal": "org.apache.cassandra.db.marshal.UTF8Type",
         "clustering_marshal": None, "writetime": 2, "ttl": None,
         "is_tombstone": False, "is_counter": False,
         "local_deletion_time": None, "range_start": None,
         "range_end": None, "cell_path": None},
    ]),
    ("bad_key_roundtrip", [{
        "partition_key": "not-a-long", "clustering": "c", "kind": "CELL",
        "column_name": "v0", "cell_value": 1, "writetime": 1, "ttl": None,
        "is_tombstone": False, "is_counter": False,
        "local_deletion_time": None,
        "range_start": None, "range_end": None, "cell_path": None,
    }]),
    ("missing_column_name", [{
        "partition_key": "k", "clustering": "c", "kind": "CELL",
        "column_name": None, "cell_value": 1, "writetime": 1, "ttl": None,
        "is_tombstone": False, "is_counter": False,
        "local_deletion_time": None,
        "range_start": None, "range_end": None, "cell_path": None,
    }]),
    ("path_on_simple", [{
        "partition_key": "k", "clustering": "c", "kind": "CELL",
        "column_name": "v0", "cell_value": 1, "writetime": 1, "ttl": None,
        "is_tombstone": False, "is_counter": False,
        "local_deletion_time": None, "range_start": None,
        "range_end": None, "cell_path": "p",
        "value_marshal": "org.apache.cassandra.db.marshal.LongType",
    }]),
]
for name, rows in ERR_CASES:
    out = tempfile.mkdtemp(prefix="identerr_", dir="/dev/shm")
    kt = "long" if name == "bad_key_roundtrip" else None
    try:
        write_sstable(rows, out + "/w", "00c0de", key_type=kt)
        print(f"{name} NO-RAISE")
    except Exception as exc:  # noqa: BLE001
        print(f"{name} RAISED {type(exc).__name__}: {exc}")
    finally:
        shutil.rmtree(out, ignore_errors=True)
