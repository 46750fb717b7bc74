"""Mechanical single-writer enforcement for durable index mutations.

The chunk-hash index and the IVF posting-list index both mutate via
read-snapshot-then-append (llm/dedup_index.py, llm/ann_index.py): two
concurrent appenders would each anti-join/assign against the pre-append
snapshot and could both insert the same rows, silently breaking the
hash-uniqueness / list-content invariants. Until r06 that contract was
docstring-only (r06 VERDICT #6); this module makes it mechanical: every
mutating entry point takes an exclusive lock file, so the second writer
FAILS LOUD with the holder's identity instead of corrupting the index.

Protocol: ``O_CREAT | O_EXCL`` on a sibling ``<path>.writer.lock`` file --
atomic on POSIX local filesystems and on NFS (exclusive create is the one
primitive NFS guarantees). The lock body records pid/host/time for the
error message. A writer that dies mid-append leaves the lock behind BY
DESIGN: the next writer must decide whether the dead writer's partial
append needs inspection before continuing (``break_lock`` is the explicit
override once that's done). This is the same judgment call every
lock-file-based system (git's index.lock) makes: availability is worth
less than a silently double-appended index.

Scope: guards SINGLE-BOX and shared-POSIX-filesystem deployments, which is
where these plain-parquet indexes are readable at all. On object stores
(S3: no atomic exclusive create) the honest upgrade is a transactional
table format (Iceberg/Delta) whose optimistic commit protocol replaces
this lock -- documented in the index modules, not silently emulated here.
"""

from __future__ import annotations

import os
import socket
import time
from contextlib import contextmanager


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted to mutate an index under an active lock."""


def _lock_path(index_path: str) -> str:
    return index_path.rstrip("/") + ".writer.lock"


@contextmanager
def index_writer_lock(index_path: str):
    """Exclusive writer lock for the index at ``index_path``.

    Raises ``ConcurrentWriterError`` (with the holder's pid/host/age) if
    another writer holds the lock -- including a dead one; see module
    docstring for why stale locks require an explicit ``break_lock``.
    """
    lock = _lock_path(index_path)
    parent = os.path.dirname(lock)
    if parent:
        os.makedirs(parent, exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            with open(lock) as f:
                holder = f.read().strip()
            age = time.time() - os.path.getmtime(lock)
        except OSError:
            holder, age = "<unreadable>", float("nan")
        raise ConcurrentWriterError(
            f"index at {index_path!r} is locked by another writer "
            f"[{holder}, {age:.0f}s old]. Appends are strictly "
            "single-writer (read-snapshot-then-append). If that writer is "
            "dead, inspect the index for a partial append, then "
            "break_lock() to clear."
        ) from None
    try:
        os.write(
            fd,
            f"pid={os.getpid()} host={socket.gethostname()} "
            f"t={int(time.time())}".encode(),
        )
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def break_lock(index_path: str) -> bool:
    """Explicitly clear a (verified-stale) writer lock. Returns whether a
    lock file existed."""
    try:
        os.unlink(_lock_path(index_path))
        return True
    except FileNotFoundError:
        return False
