"""Multi-writer concurrency control.

Reference (SURVEY.md §2.2): single-writer by default; optimistic
concurrency control (OCC) guards the commit point with a lock provider
and rejects commits whose file groups overlap a concurrently-completed
instant (``client/client/transaction/SimpleConcurrentFileWritesConflict
ResolutionStrategy.java``; mode enum
``common/model/WriteConcurrencyMode.java:30-32``). Lock providers in the
reference are ZK / DynamoDB / HiveMetastore / FileSystem; ours is the
filesystem one (atomic-create lock file), which is what its tests use.
"""

from __future__ import annotations

import json
import time


class ConcurrentWriteConflictError(Exception):
    """A concurrent commit touched the same file groups."""


class LockTimeoutError(Exception):
    pass


class FileSystemLockProvider:
    """Exclusive table lock via atomic create of a lock file
    (``FileSystemBasedLockProvider``): acquisition = atomic rename onto a
    path that must not exist; expiry guards against dead holders."""

    def __init__(self, fs, meta_path: str, ttl_seconds: float = 600.0):
        self.fs = fs
        self.path = f"{meta_path.rstrip('/')}/locks/table.lock"
        self.ttl = ttl_seconds

    def _expired(self) -> bool:
        try:
            held = json.loads(self.fs.read_text(self.path))
            return (time.time() - held.get("acquired_at", 0)) > self.ttl
        except Exception:  # unreadable lock → treat as stale
            return True

    def try_lock(self, owner: str) -> bool:
        self.fs.mkdirs(self.path.rsplit("/", 1)[0])
        if self.fs.exists(self.path):
            if not self._expired():
                return False
            self.fs.delete(self.path)
        try:
            self.fs.write_text_atomic(
                self.path, json.dumps({"owner": owner, "acquired_at": time.time()})
            )
            return True
        except IOError:
            return False  # lost the race

    def lock(self, owner: str, wait_seconds: float = 60.0, poll: float = 0.1) -> None:
        deadline = time.time() + wait_seconds
        while not self.try_lock(owner):
            if time.time() >= deadline:
                raise LockTimeoutError(f"could not acquire {self.path}")
            time.sleep(poll)

    def unlock(self, owner: str) -> None:
        try:
            held = json.loads(self.fs.read_text(self.path))
            if held.get("owner") == owner:
                self.fs.delete(self.path)
        except Exception:
            pass


def find_conflicts(
    view_commits: list[tuple[str, str, dict]],
    instant: str,
    written: set[tuple[str, str]],
) -> list[str]:
    """Instants that completed with a timestamp **after** ours began and
    touched any of our (partition, file_id) groups — the overlap test of
    ``SimpleConcurrentFileWritesConflictResolutionStrategy``."""
    out = []
    for ts, _, md in view_commits:
        if ts <= instant:
            continue
        touched = {
            (s.get("partition", ""), s["file_id"]) for s in md.get("write_stats", [])
        }
        for pp, fids in md.get("replaced", {}).items():
            touched.update((pp, f) for f in fids)
        if touched & written:
            out.append(ts)
    return out


def guarded_commit(table, instant: str, action: str, metadata: dict) -> None:
    """OCC commit point: under the table lock, re-read the timeline,
    check overlap against instants completed after ``instant``, then
    transition to completed. Single-writer mode commits directly."""
    if table.cfg.concurrency_mode.upper() != "OPTIMISTIC_CONCURRENCY_CONTROL":
        table.timeline.transition_to_completed(instant, action, metadata)
        return
    lock = FileSystemLockProvider(table.fs, table.meta_path)
    owner = f"writer-{instant}"
    lock.lock(owner, wait_seconds=table.cfg.lock_wait_seconds)
    try:
        from .metadata import FileSystemView

        fresh = FileSystemView(table.timeline)
        written = {
            (s.get("partition", ""), s["file_id"])
            for s in metadata.get("write_stats", [])
        }
        for pp, fids in metadata.get("replaced", {}).items():
            written.update((pp, f) for f in fids)
        losers = find_conflicts(fresh.commits, instant, written)
        if losers:
            raise ConcurrentWriteConflictError(
                f"instant {instant} conflicts with concurrent commit(s) "
                f"{losers} on overlapping file groups"
            )
        table.timeline.transition_to_completed(instant, action, metadata)
    finally:
        lock.unlock(owner)
