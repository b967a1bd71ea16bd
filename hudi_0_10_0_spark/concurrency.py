"""Multi-writer concurrency control.

Reference (SURVEY.md §2.2): single-writer by default; optimistic
concurrency control (OCC) guards the commit point with a lock provider
and rejects commits whose file groups overlap a concurrently-completed
instant (``client/client/transaction/SimpleConcurrentFileWritesConflict
ResolutionStrategy.java``; mode enum
``common/model/WriteConcurrencyMode.java:30-32``).

Lock providers are pluggable like the reference's
``hoodie.write.lock.provider`` (``client/client-common/.../transaction/
lock/LockManager.java`` loading ``ZookeeperBasedLockProvider`` /
``DynamoDBBasedLockProvider`` / ``HiveMetastoreBasedLockProvider`` /
``FileSystemBasedLockProvider`` by class name): ``WriteConfig.
lock_provider`` names a registry entry or a ``module:Class`` path.
In-sandbox implementations are FILESYSTEM (atomic-create lock file —
what the reference's tests use) and IN_PROCESS (shared threading lock
per table path, for same-JVM multi-writer tests); external-system
providers plug in through the same interface.
"""

from __future__ import annotations

import json
import threading
import time


class ConcurrentWriteConflictError(Exception):
    """A concurrent commit touched the same file groups."""


class LockTimeoutError(Exception):
    pass


class LockProvider:
    """Provider interface (``lock/LockProvider.java``): exclusive
    table-level lock. Implement ``try_lock``/``unlock``; ``lock`` is a
    shared poll-until-deadline on top."""

    def try_lock(self, owner: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def unlock(self, owner: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def lock(self, owner: str, wait_seconds: float = 60.0, poll: float = 0.1) -> None:
        deadline = time.time() + wait_seconds
        while not self.try_lock(owner):
            if time.time() >= deadline:
                raise LockTimeoutError(f"{type(self).__name__}: could not acquire lock")
            time.sleep(poll)


class FileSystemLockProvider(LockProvider):
    """Exclusive table lock via atomic create of a lock file
    (``FileSystemBasedLockProvider``): acquisition = atomic rename onto a
    path that must not exist; expiry guards against dead holders."""

    def __init__(self, fs, meta_path: str, ttl_seconds: float = 600.0):
        self.fs = fs
        self.path = f"{meta_path.rstrip('/')}/locks/table.lock"
        self.ttl = ttl_seconds

    def _read(self) -> dict | None:
        try:
            return json.loads(self.fs.read_text(self.path))
        except Exception:
            return None

    def _expired(self) -> bool:
        held = self._read()
        if held is None:  # unreadable lock → treat as stale
            return True
        return (time.time() - held.get("acquired_at", 0)) > self.ttl

    def try_lock(self, owner: str) -> bool:
        import uuid

        self.fs.mkdirs(self.path.rsplit("/", 1)[0])
        if self.fs.exists(self.path):
            stale = self._read()
            if stale is not None and (
                time.time() - stale.get("acquired_at", 0)
            ) <= self.ttl:
                return False
            # Expired-lock takeover: atomically MOVE the stale lock aside.
            # rename's source-must-exist semantics mean exactly ONE taker
            # succeeds — the delete+recreate scheme had a window where a
            # slow taker (which read the same stale content) could delete
            # the fast taker's FRESH lock and both would believe they
            # held it.
            # Re-read IMMEDIATELY before the move: shrinks the window in
            # which a rival's already-completed takeover (fresh lock now
            # at the path) could be mistaken for the expired one from the
            # read-to-rename gap down to microseconds.
            cur = self._read()
            if cur is not None and (
                time.time() - cur.get("acquired_at", 0)
            ) <= self.ttl:
                return False
            tomb = f"{self.path}.expired.{uuid.uuid4().hex}"
            try:
                if not self.fs.rename(self.path, tomb):
                    return False  # another taker moved it first
            except Exception:
                return False
            # Verify we moved the lock we decided was expired and not a
            # FRESH lock written by a rival inside the (tiny) read→rename
            # window; if fresh, put it back and bail.
            try:
                moved = json.loads(self.fs.read_text(tomb))
            except Exception:
                moved = None
            if moved is not None and (
                time.time() - moved.get("acquired_at", 0)
            ) <= self.ttl:
                try:
                    restored = self.fs.rename(tomb, self.path)
                except Exception:
                    restored = False
                if not restored:
                    # a third writer created a new lock while the path
                    # was vacant: the fresh lock we moved is stranded and
                    # its owner may still believe it holds — dual-hold is
                    # possible in this triple-race. Plain filesystems
                    # have no CAS to close it; the tomb is left in place
                    # as forensic evidence. This needs THREE writers
                    # interleaving within the microsecond read→rename
                    # window of a lock past its 600s TTL — use an
                    # external CAS provider (ZK/DynamoDB) where that risk
                    # is unacceptable (reference FileSystemBasedLock
                    # Provider has the same posture).
                    pass
                return False
            self.fs.delete(tomb)
        # Acquisition: write a UNIQUELY-named temp (no shared-tmp content
        # swap possible) then rename onto the lock path — rename fails if
        # the target exists, so at most one writer's rename lands.
        tmp = f"{self.path}.{uuid.uuid4().hex}.tmp"
        self.fs.write_text(
            tmp, json.dumps({"owner": owner, "acquired_at": time.time()})
        )
        try:
            if not self.fs.rename(tmp, self.path):
                self.fs.delete(tmp)
                return False  # lost the race
        except Exception:
            self.fs.delete(tmp)
            return False
        return True

    def unlock(self, owner: str) -> None:
        try:
            held = json.loads(self.fs.read_text(self.path))
            if held.get("owner") == owner:
                self.fs.delete(self.path)
        except Exception:
            pass


class InProcessLockProvider(LockProvider):
    """Same-process multi-writer lock (``InProcessLockProvider`` in the
    reference): one shared ``threading.Lock`` per table path. The right
    provider when several writer threads share a driver — no filesystem
    round-trips, no TTL heuristics."""

    _registry: dict[str, threading.Lock] = {}
    _owners: dict[str, str] = {}
    _guard = threading.Lock()

    def __init__(self, table_key: str):
        self.key = table_key
        with InProcessLockProvider._guard:
            self._lock = InProcessLockProvider._registry.setdefault(
                table_key, threading.Lock()
            )

    def try_lock(self, owner: str) -> bool:
        if self._lock.acquire(blocking=False):
            InProcessLockProvider._owners[self.key] = owner
            return True
        return False

    def unlock(self, owner: str) -> None:
        if InProcessLockProvider._owners.get(self.key) == owner:
            InProcessLockProvider._owners.pop(self.key, None)
            self._lock.release()


def get_lock_provider(table) -> LockProvider:
    """Resolve ``WriteConfig.lock_provider``: a registry name
    (FILESYSTEM | IN_PROCESS) or a ``module:Class`` dotted path whose
    class takes the table as its only constructor argument — the
    analogue of the reference loading a provider class from
    ``hoodie.write.lock.provider``."""
    name = (getattr(table.cfg, "lock_provider", None) or "FILESYSTEM").strip()
    up = name.upper()
    if up in ("FILESYSTEM", "FILE_SYSTEM", "FS"):
        return FileSystemLockProvider(table.fs, table.meta_path)
    if up in ("IN_PROCESS", "INPROCESS", "IN_MEMORY", "INMEMORY"):
        return InProcessLockProvider(table.base_path)
    if ":" in name:
        mod_name, cls_name = name.rsplit(":", 1)
        import importlib

        cls = getattr(importlib.import_module(mod_name), cls_name)
        return cls(table)
    raise ValueError(f"unknown lock provider: {name}")


def txn_start_marker(table, view=None) -> str | None:
    """Latest completed write instant at transaction start — the
    reference's ``lastSuccessfulInstant`` captured when the transaction
    begins (``SimpleConcurrentFileWritesConflictResolutionStrategy.
    getCandidateInstants:58-62`` filters completed commits AFTER it, not
    after the writer's own instant timestamp, so a concurrent commit
    whose pre-allocated timestamp sorts earlier is still a candidate).

    Pass the ``FileSystemView`` the write was PLANNED against: the
    marker is then the max completed instant in that exact view, so a
    commit landing between the view read and a later timeline re-list
    still counts as concurrent (it post-dates the planning state).
    None in single-writer mode (no OCC check)."""
    if table.cfg.concurrency_mode.upper() != "OPTIMISTIC_CONCURRENCY_CONTROL":
        return None
    if view is not None:
        return max((ts for ts, _, _ in view.commits), default="")
    done = table.timeline.completed_write_instants()
    return max((i.timestamp for i in done), default="")


def find_conflicts(
    view_commits: list[tuple[str, str, dict]],
    after_ts: str,
    written: set[tuple[str, str]],
) -> list[str]:
    """Instants that completed with a timestamp after ``after_ts`` (the
    last successful instant at transaction start, falling back to the
    writer's own instant) and touched any of our (partition, file_id)
    groups — the overlap test of
    ``SimpleConcurrentFileWritesConflictResolutionStrategy``."""
    out = []
    for ts, _, md in view_commits:
        if ts <= after_ts:
            continue
        touched = {
            (s.get("partition", ""), s["file_id"]) for s in md.get("write_stats", [])
        }
        for pp, fids in md.get("replaced", {}).items():
            touched.update((pp, f) for f in fids)
        if touched & written:
            out.append(ts)
    return out


def guarded_commit(
    table, instant: str, action: str, metadata: dict,
    txn_start: str | None = None,
) -> None:
    """OCC commit point: under the table lock, re-read the timeline,
    check overlap against instants completed after the transaction began
    (``txn_start`` from :func:`txn_start_marker`; falls back to the
    writer's own instant timestamp), then transition to completed.
    Single-writer mode commits directly."""
    from .metadata import reconcile_commit_schema

    if table.cfg.concurrency_mode.upper() != "OPTIMISTIC_CONCURRENCY_CONTROL":
        # no reconcile needed: single-writer mode means no concurrent
        # DDL can complete between a write's schema capture and its
        # commit (concurrent writers without OCC is a misconfiguration)
        table.timeline.transition_to_completed(instant, action, metadata)
        return
    lock = get_lock_provider(table)
    owner = f"writer-{instant}"
    lock.lock(owner, wait_seconds=table.cfg.lock_wait_seconds)
    try:
        written = {
            (s.get("partition", ""), s["file_id"])
            for s in metadata.get("write_stats", [])
        }
        for pp, fids in metadata.get("replaced", {}).items():
            written.update((pp, f) for f in fids)
        # candidates = completed after the txn began (reference rule:
        # catches a concurrent commit whose pre-allocated timestamp
        # sorts before ours) UNION completed after our instant (catches
        # a backdated instant landing under newer commits, which would
        # corrupt file-slice ordering) → threshold is the min
        after_ts = instant if txn_start is None else min(txn_start, instant)
        # Keep the critical section small: only instants NEWER than
        # after_ts can conflict, so read just those from the active
        # timeline instead of folding a full FileSystemView (which
        # re-parses every archive batch under the lock — seconds of
        # metadata I/O serializing all writers on a large table).
        # Archive batches are consulted only if their name's upper-bound
        # timestamp says one could hold such an instant (a long txn that
        # straddled an archive run).
        tl = table.timeline
        candidates = [
            (i.timestamp, i.action, tl.read_metadata(i))
            for i in tl.completed_write_instants()
            if i.timestamp > after_ts
        ]
        newest_archived = max(
            (
                n.rsplit(".archive.jsonl", 1)[0].split("_")[-1]
                for n in tl.fs.list_names(tl.archive_dir)
                if n.endswith(".archive.jsonl")
            ),
            default="",
        )
        if newest_archived > after_ts:
            from .timeline import WRITE_ACTIONS

            candidates += [
                (a["timestamp"], a["action"], a["metadata"])
                for a in tl.archived_instants()
                if a["action"] in WRITE_ACTIONS and a["timestamp"] > after_ts
            ]
        losers = find_conflicts(candidates, after_ts, written)
        if losers:
            raise ConcurrentWriteConflictError(
                f"instant {instant} conflicts with concurrent commit(s) "
                f"{losers} on overlapping file groups"
            )
        # under the lock: fold in any schema evolution committed since
        # this write began, so a concurrent ALTER cannot be reverted by
        # our (non-overlapping, hence conflict-free) commit. Reuses the
        # candidates already read for the conflict check — no extra
        # timeline I/O inside the critical section.
        reconcile_commit_schema(metadata, candidates)
        table.timeline.transition_to_completed(instant, action, metadata)
    finally:
        lock.unlock(owner)
