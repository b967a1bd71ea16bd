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


class Heartbeat:
    """Writer-liveness signal for LAZY failed-write cleaning under OCC.

    Reference: ``HoodieHeartbeatClient`` + ``HeartbeatUtils`` — the
    reference REJECTS the eager failed-write cleaning policy in
    multi-writer mode precisely because a rival's write-start sweep
    would delete a live writer's in-flight instant (found by the r5
    3-writer soak: a rival's ``rollback_pending_writes`` removed another
    writer's ``data/<instant>/_temporary`` mid-write). A daemon thread
    refreshes ``<meta>/heartbeat/<instant>`` every interval; liveness =
    file mtime younger than 3 intervals. Start the heartbeat BEFORE the
    requested instant file becomes visible so there is no window where
    a pending instant exists without a heartbeat."""

    def __init__(self, table, instant: str):
        self.table = table
        self.instant = instant
        self.path = f"{table.meta_path}/heartbeat/{instant}"
        self.interval = float(
            getattr(table.cfg, "heartbeat_interval_seconds", 60.0)
        )
        self._stop_evt = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "Heartbeat":
        self.table.fs.mkdirs(f"{self.table.meta_path}/heartbeat")
        self.table.fs.write_text(self.path, str(time.time()))
        self._thread = threading.Thread(
            target=self._run, daemon=True, name=f"heartbeat-{self.instant}"
        )
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop_evt.wait(self.interval):
            try:
                self.table.fs.write_text(self.path, str(time.time()))
            except BaseException:
                # refresh failure of ANY kind (including BaseExceptions a
                # test harness injects to simulate the process dying) must
                # never propagate out of the daemon thread: the contract
                # is simply that the mtime ages toward expiry
                pass

    def stop(self, delete: bool = True) -> None:
        """``delete=False`` for a lost instant-claim (timestamp
        collision): the heartbeat path is SHARED with the rival that
        owns the instant — deleting it would strip the rival's liveness
        guard and expose its in-flight write to the lazy sweep
        (code-review r7). The rival's own refresher keeps it fresh; a
        dead rival's file ages out naturally."""
        self._stop_evt.set()
        # JOIN before deleting: an in-flight refresh write racing the
        # delete would resurrect the file with a fresh mtime, delaying
        # rival cleanup by a full expiry window (diff-review r5)
        if self._thread is not None:
            self._thread.join(timeout=30.0)
        if not delete:
            return
        try:
            self.table.fs.delete(self.path)
        except Exception:
            pass


def start_heartbeat(table, instant: str) -> Heartbeat | None:
    """Heartbeat for a write instant — OCC mode only (single-writer has
    no rivals, and its eager sweep of pending instants stays valid)."""
    if table.cfg.concurrency_mode.upper() != "OPTIMISTIC_CONCURRENCY_CONTROL":
        return None
    return Heartbeat(table, instant).start()


def heartbeat_expiry_seconds(cfg) -> float:
    """THE liveness-staleness window: a guard file older than 3 missed
    heartbeat intervals reads as a crashed owner. One definition shared
    by heartbeat_live, plan-staleness, the orphan-heartbeat sweep, and
    the orphan-claim sweep, so a policy change cannot leave claims
    judged by a different expiry than the plans and heartbeats guarding
    the same instants (code-review r7)."""
    return 3.0 * float(getattr(cfg, "heartbeat_interval_seconds", 60.0))


def heartbeat_live(table, instant: str) -> bool:
    """True iff a live writer's heartbeat guards this pending instant.
    The caller's next step is DESTRUCTIVE (sweeping the instant), so
    only a CONFIRMED-absent heartbeat file reads as not-live; a
    transient metadata error (namenode failover, object-store 503) must
    not be mistaken for a crashed writer (diff-review r5)."""
    path = f"{table.meta_path}/heartbeat/{instant}"
    expiry = heartbeat_expiry_seconds(table.cfg)
    try:
        return (time.time() - table.fs.mtime(path)) <= expiry
    except Exception:
        try:
            return table.fs.exists(path)
        except Exception:
            return True  # unknown state → assume live, skip the sweep


class LockTimeoutError(Exception):
    pass


class CommitUndoneError(LockTimeoutError):
    """Raised when guarded_commit's post-write re-validate found an
    unseen conflicting rival and UNDID an already-published completed
    instant. Distinct from a plain lock timeout because the instant was
    momentarily COMPLETED: a rival key-index compaction in that window
    could have folded its delta into a ``<ts>.base``, so the caller's
    abort path must call ``drop_instant(..., folded_possible=True)``
    (advice r6)."""


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
    """Exclusive table lock via atomic create-if-absent of a lock file —
    the reference ``FileSystemBasedLockProvider``'s createIfNotExists
    pattern. Acquisition is a true CAS (``FS.create_exclusive``:
    O_CREAT|O_EXCL locally, namenode-atomic create on HDFS), so two
    writers can never both create the lock: the old write-tmp + rename
    acquisition and its read→rename races are gone. Expired-lock
    recovery moves the stale file aside with a source-must-exist rename
    (exactly one taker wins the move), then re-enters the same CAS; a
    recovery that turns out to have moved a FRESH rival lock restores it
    through the CAS too, never overwriting a third writer's newer
    acquisition. Each acquisition carries a unique token so a holder can
    re-``validate`` at its commit point that the on-disk lock is still
    its own (a holder that slept past the TTL mid-critical-section
    aborts instead of committing without mutual exclusion)."""

    def __init__(
        self,
        fs,
        meta_path: str,
        ttl_seconds: float = 600.0,
        claim_ttl_seconds: float | None = None,
    ):
        self.fs = fs
        self.path = f"{meta_path.rstrip('/')}/locks/table.lock"
        self.ttl = ttl_seconds
        # How long a RECOVERY CLAIM stays protected from rival clearing
        # (advice r8: was a hard-coded min(ttl, 30 s)). A recovery is a
        # handful of metadata ops, so 30 s is generous locally — but on
        # a slow object store a legitimate recovery can run longer, and
        # a rival clearing its claim mid-flight re-admits concurrent
        # recovery; such deployments should raise this explicitly.
        self.claim_ttl = (
            min(ttl_seconds, 30.0)
            if claim_ttl_seconds is None
            else claim_ttl_seconds
        )
        self._token: str | None = None

    def _read(self) -> dict | None:
        try:
            return json.loads(self.fs.read_text(self.path))
        except Exception:
            return None

    def _fresh(self, held: dict | None) -> bool:
        return held is not None and (
            time.time() - held.get("acquired_at", 0)
        ) <= self.ttl

    def _path_is_fresh(self) -> bool:
        """Freshness of whatever sits at the lock path. An UNREADABLE
        file is judged by its mtime, NOT treated as instantly stale: with
        O_EXCL acquisition the lock file momentarily exists EMPTY between
        the create and the content write, and a rival that read that
        window as \"stale\" would recover a LIVE lock (caught by the
        4-process soak). A vanished file (released between our create
        failure and this read) also counts as fresh — the next poll
        re-enters the CAS."""
        held = self._read()
        if held is not None:
            return (time.time() - held.get("acquired_at", 0)) <= self.ttl
        try:
            return (time.time() - self.fs.mtime(self.path)) <= self.ttl
        except Exception:
            return True

    def try_lock(self, owner: str) -> bool:
        import uuid

        self.fs.mkdirs(self.path.rsplit("/", 1)[0])
        token = uuid.uuid4().hex
        payload = json.dumps(
            {"owner": owner, "token": token, "acquired_at": time.time()}
        )
        if self.fs.create_exclusive(self.path, payload):
            self._token = token
            return True
        # Lock file exists: fresh → busy; expired → single-winner recovery.
        if self._path_is_fresh():
            return False
        # Single-recoverer claim BEFORE the move-aside: without it, a
        # taker acting on a stale "expired" read can rename away the
        # FRESH lock a rival recovery just installed, and a third taker
        # grabs the momentarily-vacant path while the first restores —
        # two takers then both believe they hold the lock (dual hold
        # caught by test_expired_lock_takeover_single_winner under full-
        # suite load, r8). The claim serializes recoverers so the
        # freshness re-read below cannot go stale against another
        # recovery; plain CAS acquirers are unaffected.
        claim = f"{self.path}.recovery"
        claim_token = uuid.uuid4().hex
        if not self.fs.create_exclusive(
            claim, json.dumps({"by": owner, "token": claim_token, "at": time.time()})
        ):
            # busy claim: a live recovery is in flight — or a crashed
            # recoverer's leftover, which would block recovery forever.
            # Clear stale claims via the SAME move-aside-and-verify
            # protocol as the lock itself — a blind age-gated delete let
            # a taker that stalled after reading an old mtime remove a
            # RIVAL's fresh claim later, re-admitting concurrent
            # recoveries (code-review r8): rename is single-winner, and
            # a moved-but-actually-fresh claim is restored through the
            # CAS instead of being lost.
            self._clear_stale_claim(claim)
            return False
        try:
            if self._path_is_fresh():
                # re-read under the claim: a rival recovery completed
                # between our first read and the claim — its lock is live
                return False
            tomb = f"{self.path}.expired.{uuid.uuid4().hex}"
            try:
                if not self.fs.rename(self.path, tomb):
                    return False  # released/vanished since the re-read
            except Exception:
                return False
            # Belt-and-braces: verify the moved file is the expired lock
            # we re-read — the only way it can be fresh now is a zombie
            # unlock (an expired holder releasing) racing a new CAS
            # acquisition inside the claim window; if fresh, put it back
            # through the CAS (if a third writer acquired the vacant
            # path meanwhile, the rightful state is whatever that CAS
            # winner wrote — the displaced owner's validate() catches
            # the displacement at its commit point).
            try:
                moved = json.loads(self.fs.read_text(tomb))
            except Exception:
                moved = None
            if self._fresh(moved):
                # restore, then delete the tomb on BOTH branches
                # (code-review r7): when a third writer won the vacant
                # path the restore fails, but the tomb's content serves
                # no further purpose, and leaking one tomb per contended
                # recovery grows the locks dir without bound
                self.fs.create_exclusive(self.path, json.dumps(moved))
                self.fs.delete(tomb)
                return False
            self.fs.delete(tomb)
            # Recovery cleared the path; acquisition is still the same
            # CAS — rival acquirers can beat us to it, never join us.
            if self.fs.create_exclusive(self.path, payload):
                self._token = token
                return True
            return False
        finally:
            # release OUR claim only: if this recovery stalled past the
            # stale gate, a rival may have cleared it and re-claimed —
            # a blind delete here would kill the rival's live claim
            # (code-review r8). Move-aside + token check + restore-on-
            # mismatch, same as the lock protocol.
            self._release_claim(claim, claim_token)

    def _clear_stale_claim(self, claim: str) -> None:
        """Single-winner removal of a crashed recoverer's leftover claim:
        rename aside, verify the moved content really is stale, restore
        through the CAS when it turns out fresh."""
        import uuid as _uuid

        try:
            if time.time() - self.fs.mtime(claim) <= self.claim_ttl:
                return
        except Exception:
            return
        tomb = f"{claim}.stale.{_uuid.uuid4().hex}"
        try:
            if not self.fs.rename(claim, tomb):
                return
        except Exception:
            return
        try:
            moved = json.loads(self.fs.read_text(tomb))
        except Exception:
            moved = None
        if moved is not None and (
            time.time() - moved.get("at", 0) <= self.claim_ttl
        ):
            # we moved a FRESH claim (rival re-claimed inside our
            # read→rename gap) — put it back; if the rival already
            # finished and a third claim exists, the CAS keeps theirs
            self.fs.create_exclusive(claim, json.dumps(moved))
        self.fs.delete(tomb)

    def _release_claim(self, claim: str, claim_token: str) -> None:
        import uuid as _uuid

        # Verify ownership BEFORE the move-aside (advice r8): if this
        # recovery stalled past the stale gate and a rival cleared our
        # claim and re-claimed, renaming first would evict the rival's
        # LIVE claim and leave the path vacant until the restore CAS —
        # a window a third taker could claim into, re-admitting the
        # multi-recoverer race the claim exists to serialize. When the
        # current content is not provably ours, returning without
        # touching it is strictly safer.
        try:
            cur = json.loads(self.fs.read_text(claim))
        except Exception:
            return  # vanished/unreadable — nothing provably ours
        if cur.get("token") != claim_token:
            return  # a rival's claim — leave it alone
        tomb = f"{claim}.release.{_uuid.uuid4().hex}"
        try:
            if not self.fs.rename(claim, tomb):
                return  # already cleared by a stale-gate rival
        except Exception:
            return
        # re-verify the MOVED content: a rival could still have cleared
        # and re-claimed inside the read→rename gap — restore theirs
        # through the CAS (single-winner either way)
        try:
            moved = json.loads(self.fs.read_text(tomb))
        except Exception:
            moved = None
        if moved is not None and moved.get("token") != claim_token:
            self.fs.create_exclusive(claim, json.dumps(moved))
        self.fs.delete(tomb)

    def validate(self, owner: str) -> bool:
        """True iff the on-disk lock is still THIS provider's acquisition
        (same owner AND same per-acquisition token). ``guarded_commit``
        re-validates at the commit point, converting any displacement —
        only possible once a holder outlives the TTL — into an abort
        rather than a dual commit."""
        held = self._read()
        return bool(
            held
            and held.get("owner") == owner
            and held.get("token") == self._token
        )

    def unlock(self, owner: str) -> None:
        import uuid

        held = self._read()
        if not held or held.get("owner") != owner:
            return
        if self._token is not None and held.get("token") != self._token:
            return  # the path holds someone else's acquisition — keep it
        # Release via move-aside-then-verify, not read-then-delete: the
        # source-must-exist rename means a concurrent expired-lock
        # recovery and this unlock can't both take the file, and a rival
        # lock moved by mistake (we were displaced between read and move)
        # is restored through the CAS instead of being deleted.
        tomb = f"{self.path}.unlock.{uuid.uuid4().hex}"
        try:
            if not self.fs.rename(self.path, tomb):
                return
        except Exception:
            return
        try:
            moved = json.loads(self.fs.read_text(tomb))
        except Exception:
            moved = None
        if (
            moved is not None
            and self._token is not None
            and moved.get("token") != self._token
        ):
            self.fs.create_exclusive(self.path, json.dumps(moved))
            self.fs.delete(tomb)  # on CAS failure too — see try_lock
            return
        self.fs.delete(tomb)


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


class FcntlLockProvider(LockProvider):
    """OS-advisory-lock provider (``fcntl.flock``) for single-host
    multi-process deployments. Fills the LockProvider SPI slot the
    reference reserves for session-backed providers
    (``lock/ZookeeperBasedLockProvider.java:55`` — ZK ephemeral nodes):
    the OS releases the lock the instant the holder dies, so there is
    no TTL heuristic, no expired-lock recovery, and therefore NO
    displacement window — ``validate`` is trivially true while held,
    which closes the FileSystem provider's third-order race for tables
    on a local filesystem. Only valid for driver-local table paths
    (flock has no meaning on HDFS/object stores); construction rejects
    anything else."""

    def __init__(self, meta_path: str, resolved_scheme: str | None = None):
        # Locality is judged by the RESOLVED filesystem scheme when the
        # caller can supply it (get_lock_provider passes the table FS's
        # actual scheme), never by path-string inspection alone: a
        # scheme-less path on a cluster with fs.defaultFS=hdfs:// puts
        # the table on HDFS while a string check would happily flock a
        # file on each driver's LOCAL disk — two hosts would both
        # "acquire" and commit with no mutual exclusion (code-review
        # r7; same rule as fs.create_exclusive's scheme resolution).
        if resolved_scheme is not None and resolved_scheme not in ("", "file"):
            raise ValueError(
                "FCNTL lock provider requires a driver-local table "
                f"(filesystem scheme {resolved_scheme!r}); use FILESYSTEM "
                "or a session-backed provider for shared stores"
            )
        if meta_path.startswith("file:"):
            meta_path = meta_path[len("file:"):]
        if "://" in meta_path:
            raise ValueError(
                "FCNTL lock provider requires a driver-local table path "
                f"(got {meta_path}); use FILESYSTEM or a session-backed "
                "provider for shared stores"
            )
        import os

        self._dir = os.path.join(meta_path, ".locks")
        self._path = os.path.join(self._dir, "table.flock")
        self._fd: int | None = None
        self._owner: str | None = None

    def try_lock(self, owner: str) -> bool:
        import fcntl
        import os

        os.makedirs(self._dir, exist_ok=True)
        fd = os.open(self._path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            return False
        self._fd, self._owner = fd, owner
        return True

    def unlock(self, owner: str) -> None:
        import fcntl
        import os

        if self._fd is None or self._owner != owner:
            return
        fcntl.flock(self._fd, fcntl.LOCK_UN)
        os.close(self._fd)
        self._fd, self._owner = None, None

    def validate(self, owner: str) -> bool:
        # flock is held until released or the holder dies — a held fd
        # IS the proof of mutual exclusion; no rival can displace it
        return self._fd is not None and self._owner == owner


def get_lock_provider(table) -> LockProvider:
    """Resolve ``WriteConfig.lock_provider``: a registry name
    (FILESYSTEM | IN_PROCESS | FCNTL) or a ``module:Class`` dotted path
    whose class takes the table as its only constructor argument — the
    analogue of the reference loading a provider class from
    ``hoodie.write.lock.provider``."""
    name = (getattr(table.cfg, "lock_provider", None) or "FILESYSTEM").strip()
    up = name.upper()
    if up in ("FILESYSTEM", "FILE_SYSTEM", "FS"):
        return FileSystemLockProvider(
            table.fs,
            table.meta_path,
            ttl_seconds=float(getattr(table.cfg, "lock_ttl_seconds", 600.0)),
        )
    if up in ("IN_PROCESS", "INPROCESS", "IN_MEMORY", "INMEMORY"):
        return InProcessLockProvider(table.base_path)
    if up in ("FCNTL", "FLOCK", "LOCAL_OS"):
        return FcntlLockProvider(
            table.meta_path, resolved_scheme=table.fs._resolved_scheme()
        )
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


def _conflict_candidates(tl, after_ts: str, exclude: str) -> list[tuple]:
    """(timestamp, action, metadata) of every completed write instant
    newer than ``after_ts`` (excluding ``exclude``) — active timeline
    plus, when an archive batch's name-encoded upper bound says one
    could hold such an instant (a long txn straddling an archive run),
    the archived manifests. ONE definition used by both the pre-commit
    conflict check and the post-write undo recheck, so the two can
    never consult different candidate sets (code-review r7)."""
    from .timeline import WRITE_ACTIONS

    out = [
        (i.timestamp, i.action, tl.read_metadata(i))
        for i in tl.completed_write_instants()
        if i.timestamp > after_ts and i.timestamp != exclude
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
        out += [
            (a["timestamp"], a["action"], a["metadata"])
            for a in tl.archived_instants()
            if a["action"] in WRITE_ACTIONS
            and a["timestamp"] > after_ts
            and a["timestamp"] != exclude
        ]
    return out


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
        candidates = _conflict_candidates(tl, after_ts, exclude=instant)
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
        # Fencing at the commit point: a writer that outlived the lock
        # TTL mid-critical-section may have been displaced by an
        # expired-lock recovery — re-validate that the on-disk lock is
        # still OUR acquisition before writing the completed instant,
        # turning a (TTL-scale) displacement into an abort instead of a
        # commit without mutual exclusion.
        if hasattr(lock, "validate") and not lock.validate(owner):
            raise LockTimeoutError(
                f"lock for instant {instant} was recovered by another "
                "writer (holder outlived the lock TTL) — aborting commit"
            )
        table.timeline.transition_to_completed(instant, action, metadata)
        # Close the validate→complete TOCTOU (verdict r5): a holder that
        # stalls BETWEEN the validate above and the completion write for
        # longer than the TTL could still publish after being displaced.
        # Re-validate AFTER the write; on a token change a rival
        # recovered the lock, so re-arbitrate from the CURRENT timeline:
        #
        # - Overlap with a commit we never conflict-checked → UNDO ours
        #   (delete only the COMPLETED file; the caller's abort path
        #   cleans pending files) and abort. The undo cannot orphan a
        #   reader-visible dependency: a rival that SAW our commit and
        #   overlapped it aborted itself at its own gate, and a
        #   non-overlapping rival never touched our file groups — so
        #   nothing committed was built ON our rows (diff-review r6).
        # - No overlap → the displacement was harmless; the commit
        #   stands and the write reports success (undoing here would be
        #   the real anomaly: rivals may already have listed it).
        #
        # Residual (third-order) race: a rival whose timeline listing
        # predates our completion write and whose commit lands after
        # this re-check — the same gap the reference's FileSystem lock
        # carries. A rival TABLE SERVICE (clean / compaction /
        # clustering) that consumed the momentarily-visible commit
        # inside the displacement window is handled below: the undo is
        # refused when one exists (r7 watch item, closed).
        if hasattr(lock, "validate") and not lock.validate(owner):
            # same candidate definition as the pre-commit check — incl.
            # archive batches: a conflicting rival that committed AND
            # was archived during a long displacement window must not
            # escape the undo (code-review r7)
            recheck = _conflict_candidates(tl, after_ts, exclude=instant)
            if find_conflicts(recheck, after_ts, written):
                # The undo is only safe while nothing has CONSUMED the
                # momentarily-visible commit. A rival SERVICE newer than
                # our instant may have: a clean deletes the file
                # versions our commit superseded, a compaction folds
                # our log files into a new base, a clustering rewrites
                # our file groups — deleting the completed file after
                # any of those loses data the service already acted on,
                # which is strictly worse than the lost-update anomaly
                # the undo prevents. When one exists, let the commit
                # stand (exactly the reference FileSystem-lock
                # behavior, which never re-validates post-write at
                # all) — closes the r7 watch item on rival-service
                # interaction inside the TTL-displacement window.
                # "Consumed" is judged by ACTUAL overlap with our file
                # groups, not mere existence of a newer service — an
                # inline-clean deployment produces a newer CLEAN after
                # every rival commit, and a blanket refusal would
                # disable the undo exactly where it matters
                # (code-review r7). A clean consumed us iff it deleted
                # a file version OF A GROUP WE TOUCHED (undo would
                # leave that group with a hole in its version chain); a
                # compact/cluster consumed us iff its own write_stats /
                # replaced set intersects ours.
                from .operators.write import _parse_layout_path
                from .timeline import CLEAN

                consumed: list[str] = []
                for i in tl.completed((CLEAN,)):
                    if i.timestamp <= instant:
                        continue
                    for p in tl.read_metadata(i).get("deleted", []):
                        parsed = _parse_layout_path(
                            table.base_path, table.abs_path(p)
                        )
                        if parsed is not None and (parsed[0], parsed[1]) in written:
                            consumed.append(i.timestamp)
                            break
                for ts, _act, md in recheck:
                    if ts <= instant or (md or {}).get("operation") not in (
                        "compact",
                        "cluster",
                    ):
                        continue
                    touched = {
                        (s.get("partition", ""), s["file_id"])
                        for s in (md or {}).get("write_stats", [])
                    }
                    for pp, fids in (md or {}).get("replaced", {}).items():
                        touched.update((pp, f) for f in fids)
                    if touched & written:
                        consumed.append(ts)
                if not consumed:
                    from .timeline import COMPLETED, Instant

                    table.fs.delete(
                        f"{table.timeline.dir}/"
                        f"{Instant(instant, action, COMPLETED).filename()}"
                    )
                    raise CommitUndoneError(
                        f"lock for instant {instant} was taken over "
                        "during the completion write (holder outlived "
                        "the lock TTL) and a conflicting rival "
                        "committed unseen — commit undone and aborted"
                    )
    finally:
        lock.unlock(owner)
