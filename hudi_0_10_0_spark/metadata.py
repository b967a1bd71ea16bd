"""Commit metadata + the file-system view.

The reference tracks "which files form the latest view of each file
group" with ``HoodieTableFileSystemView`` over timeline + file listings
(``common/table/view/``), accelerated by an internal metadata table
(``common/metadata/HoodieBackedTableMetadata.java``). Our commit
metadata *is* the manifest: every completed write instant records, per
file group, the files it added (base or delta/"log"), their row/byte
counts, key ranges, and per-column min/max/null stats. The view is
reconstructed by folding completed instants in timestamp order — no
DFS listing on the read path at all.

Scale note (100 TB): the active timeline holds ≤ ``keep_max_commits``
(30) instants; older ones are archived. Each instant's JSON carries
file-group-level entries only (a 100 TB table at 120 MB files ≈ 1M file
groups *total*, but a single commit touches a small fraction). For very
wide commits the manifest should graduate to a parquet snapshot +
deltas (the reference's metadata table, §2.2); the view API here is the
seam where that swap happens.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .timeline import CLEAN, REPLACE_COMMIT, Timeline, WRITE_ACTIONS


@dataclass
class WriteStat:
    """One file group's output within one commit
    (reference: ``common/model/HoodieWriteStat.java``)."""

    partition: str
    file_id: str
    paths: list[str]  # relative to table base
    rows: int
    bytes: int
    min_key: str | None = None
    max_key: str | None = None
    log: bool = False  # True → MOR delta file ("log"); False → base file
    col_stats: dict | None = None  # col -> [min, max, null_count]
    # METADATA_ONLY bootstrap: file belongs to the user's source dataset
    # (absolute path, no meta columns inside) — readers derive the meta
    # columns on the fly and the cleaner never deletes it from disk
    # (reference: BootstrapMode.METADATA_ONLY keeps a pointer to the
    # original file, client/client/bootstrap/BootstrapMode.java:29-34)
    raw: bool = False
    # log stats only (optimization r8): does this delta file contain any
    # delete-marker-true row?  False lets the MOR merge skip the whole
    # delete-block window pass (one sort+window over every row of the
    # log-bearing groups); None (legacy commits) keeps it conservatively.
    tombstones: bool | None = None

    def to_dict(self) -> dict:
        d = {
            "partition": self.partition,
            "file_id": self.file_id,
            "paths": self.paths,
            "rows": self.rows,
            "bytes": self.bytes,
            "min_key": self.min_key,
            "max_key": self.max_key,
            "log": self.log,
            "col_stats": self.col_stats,
            "raw": self.raw,
        }
        if self.tombstones is not None:
            d["tombstones"] = self.tombstones
        return d

    @staticmethod
    def from_dict(d: dict) -> "WriteStat":
        return WriteStat(**{k: v for k, v in d.items() if k in WriteStat.__dataclass_fields__})


def make_commit_metadata(
    operation: str,
    schema_json: str,
    write_stats: list[WriteStat],
    replaced: dict[str, list[str]] | None = None,
    extra: dict | None = None,
) -> dict:
    return {
        "operation": operation,
        "schema": schema_json,
        "write_stats": [s.to_dict() for s in write_stats],
        "replaced": replaced or {},
        "extra": extra or {},
        "total_rows": sum(s.rows for s in write_stats),
        "total_bytes": sum(s.bytes for s in write_stats),
    }


def reconcile_commit_schema(
    metadata: dict, candidates: list[tuple[str, str, dict]]
) -> None:
    """Reconcile-on-commit (``HoodieSparkSqlWriter.scala:168`` "reconcile
    schema"): a write captures the table schema when it STARTS; if a
    concurrent ``ALTER TABLE`` (add column / widen type) completes before
    this write commits, committing the stale schema would make
    ``latest_schema()`` revert the DDL. Merge the about-to-commit schema
    with the newest schema among ``candidates`` — the instants completed
    since the transaction began, which guarded_commit has ALREADY read
    for its conflict check (no extra timeline I/O inside the lock; an
    instant older than the txn start cannot carry schema our write
    didn't see). Missing columns are appended as nullable (data files
    simply surface typed nulls); narrower types take the committed wider
    type. Mutates ``metadata`` in place."""
    ours = metadata.get("schema")
    if not ours or not candidates:
        return
    theirs = None
    for _ts, _action, md in sorted(candidates, key=lambda c: c[0], reverse=True):
        if md.get("schema"):
            theirs = md["schema"]
            break
    if not theirs or theirs == ours:
        return
    merged = _merge_schema_json(ours, theirs)
    if merged != ours:
        metadata["schema"] = merged


def _merge_schema_json(ours: str, theirs: str) -> str:
    from pyspark.sql import types as T

    from .config import DELETE_MARKER_COL
    from .operators.schema_evolution import is_widening

    try:
        sa = T.StructType.fromJson(json.loads(ours))
        sb = T.StructType.fromJson(json.loads(theirs))
    except Exception:
        return ours
    theirs_by_name = {f.name: f for f in sb.fields}
    out = []
    for f in sa.fields:
        g = theirs_by_name.get(f.name)
        if g is not None and g.dataType != f.dataType and is_widening(
            f.dataType, g.dataType
        ):
            f = T.StructField(f.name, g.dataType, True)
        out.append(f)
    ours_names = {f.name for f in sa.fields}
    missing = [g for g in sb.fields if g.name not in ours_names]
    if missing:
        # layout convention: the delete marker stays last
        marker = [f for f in out if f.name == DELETE_MARKER_COL]
        rest = [f for f in out if f.name != DELETE_MARKER_COL]
        out = rest + [T.StructField(g.name, g.dataType, True) for g in missing] + marker
    return T.StructType(out).json()


@dataclass
class BaseFileVersion:
    instant: str
    paths: list[str]
    rows: int
    bytes: int
    min_key: str | None
    max_key: str | None
    col_stats: dict | None
    raw: bool = False  # METADATA_ONLY-bootstrapped source file


@dataclass
class LogFileVersion:
    instant: str
    paths: list[str]
    rows: int
    bytes: int
    # delete-marker presence recorded by the writer's profile (r8);
    # None = unknown (legacy commit) → merge keeps the delete-block pass
    tombstones: bool | None = None


@dataclass
class FileSlice:
    """Latest-view slice of one file group: one base file + ordered
    delta files after it (``common/model/FileSlice.java:32-53``)."""

    partition: str
    file_id: str
    base: BaseFileVersion
    logs: list[LogFileVersion] = field(default_factory=list)

    @property
    def total_bytes(self) -> int:
        return self.base.bytes + sum(l.bytes for l in self.logs)

    def all_paths(self) -> list[str]:
        out = list(self.base.paths)
        for l in self.logs:
            out.extend(l.paths)
        return out


class FileGroup:
    """All versions of one (partition, file_id)
    (``common/model/HoodieFileGroup.java:34-156``)."""

    def __init__(self, partition: str, file_id: str):
        self.partition = partition
        self.file_id = file_id
        self.bases: list[BaseFileVersion] = []  # ascending by instant
        self.logs: list[LogFileVersion] = []  # ascending by instant
        self.replaced_at: str | None = None

    def slice_as_of(self, as_of: str | None) -> FileSlice | None:
        if self.replaced_at is not None and (as_of is None or self.replaced_at <= as_of):
            return None
        base = None
        for b in self.bases:
            if as_of is None or b.instant <= as_of:
                base = b
        if base is None:
            return None
        logs = [
            l
            for l in self.logs
            if l.instant > base.instant and (as_of is None or l.instant <= as_of)
        ]
        return FileSlice(self.partition, self.file_id, base, logs)


class FileSystemView:
    """Timeline-fold view of the table's file groups."""

    def __init__(self, timeline: Timeline):
        self.timeline = timeline
        self.groups: dict[tuple[str, str], FileGroup] = {}
        self.commits: list[tuple[str, str, dict]] = []  # (ts, action, metadata)
        self._build()

    def _build(self) -> None:
        # archived commits' files can still be the latest slices (archiving
        # trims the timeline, not the data); fold their manifests along
        # with the active ones. Read the archive ONCE (each call re-lists
        # and re-parses every archive batch file from storage).
        archived = self.timeline.archived_instants()
        entries: list[tuple[str, str, dict]] = [
            (a["timestamp"], a["action"], a["metadata"])
            for a in archived
            if a["action"] in WRITE_ACTIONS
        ]
        # An instant can transiently be BOTH archived and active (crash
        # between the archive batch write and the active-file deletes);
        # folding it twice would duplicate log-file versions, so MOR
        # merges and compaction would read the same delta twice.
        archived_keys = {(ts, a) for ts, a, _ in entries}
        for inst in self.timeline.completed_write_instants():
            if (inst.timestamp, inst.action) in archived_keys:
                continue
            entries.append((inst.timestamp, inst.action, self.timeline.read_metadata(inst)))
        # Savepoints let archive() move instants NEWER than a protected
        # active instant, so archived∪active is NOT timestamp-ordered by
        # construction — sort before folding. slice_as_of, the cleaner's
        # retention windows, latest_schema, and avg_record_size all rely
        # on per-group version lists being in instant order; an
        # out-of-order fold made a savepointed old base version
        # masquerade as the latest slice (stale reads).
        entries.sort(key=lambda e: e[0])
        # fold clean instants: physically removed file versions must drop
        # out of the view (the reference's listing-based view sees their
        # absence; ours subtracts the cleaner's deletion record)
        cleaned: set[str] = set()
        for a in archived:
            if a["action"] == CLEAN:
                cleaned.update(a["metadata"].get("deleted", []))
        for inst in self.timeline.completed((CLEAN,)):
            cleaned.update(self.timeline.read_metadata(inst).get("deleted", []))
        self._cleaned = cleaned
        for ts, action, md in entries:
            self.commits.append((ts, action, md))
            for sd in md.get("write_stats", []):
                st = WriteStat.from_dict(sd)
                fg = self.groups.setdefault(
                    (st.partition, st.file_id), FileGroup(st.partition, st.file_id)
                )
                if sd.get("stripped"):
                    # archive consolidation's skeleton of a fully-cleaned
                    # stat (timeline.consolidate_archive): the file group
                    # existence is recorded, the dead version is not
                    continue
                if cleaned and st.paths and all(p in cleaned for p in st.paths):
                    continue
                if st.log:
                    fg.logs.append(
                        LogFileVersion(
                            ts, st.paths, st.rows, st.bytes, st.tombstones
                        )
                    )
                else:
                    fg.bases.append(
                        BaseFileVersion(
                            ts, st.paths, st.rows, st.bytes,
                            st.min_key, st.max_key, st.col_stats, st.raw,
                        )
                    )
            if action == REPLACE_COMMIT:
                for pp, fids in md.get("replaced", {}).items():
                    for fid in fids:
                        fg = self.groups.setdefault((pp, fid), FileGroup(pp, fid))
                        # first replacement wins for as-of semantics
                        if fg.replaced_at is None or ts < fg.replaced_at:
                            fg.replaced_at = ts

    # -- queries -----------------------------------------------------------
    def latest_schema(self) -> str | None:
        for _, _, md in reversed(self.commits):
            if md.get("schema"):
                return md["schema"]
        return None

    def partitions(self, as_of: str | None = None) -> list[str]:
        return sorted(
            {s.partition for s in self.latest_file_slices(as_of=as_of)}
        )

    def latest_file_slices(
        self,
        as_of: str | None = None,
        partitions: list[str] | None = None,
    ) -> list[FileSlice]:
        pset = set(partitions) if partitions is not None else None
        out = []
        for (pp, _), fg in sorted(self.groups.items()):
            if pset is not None and pp not in pset:
                continue
            sl = fg.slice_as_of(as_of)
            if sl is not None:
                out.append(sl)
        return out

    def commits_in_range(
        self, begin: str | None, end: str | None = None
    ) -> list[tuple[str, str, dict]]:
        """Completed write commits with begin < ts <= end — the
        reference's (begin, end] incremental bound
        (``ds/IncrementalRelation.scala:77``)."""
        return [
            (ts, action, md)
            for ts, action, md in self.commits
            if (begin is None or ts > begin) and (end is None or ts <= end)
        ]

    def file_ids_touched_in_range(
        self, begin: str | None, end: str | None
    ) -> set[tuple[str, str]]:
        touched = set()
        for _, _, md in self.commits_in_range(begin, end):
            for sd in md.get("write_stats", []):
                touched.add((sd["partition"], sd["file_id"]))
        return touched

    def all_referenced_paths(self) -> set[str]:
        paths = set()
        for fg in self.groups.values():
            for b in fg.bases:
                paths.update(b.paths)
            for l in fg.logs:
                paths.update(l.paths)
        return paths

    def raw_paths(self) -> set[str]:
        """Paths of METADATA_ONLY-bootstrapped source files — referenced
        by the table but owned by the user's original dataset; the
        cleaner may drop them from the view but never from disk."""
        return {
            p
            for fg in self.groups.values()
            for b in fg.bases
            if b.raw
            for p in b.paths
        }

    # -- sizing inputs for the writer -------------------------------------
    def avg_record_size(self, default: int) -> int:
        """From recent commit totals
        (``UpsertPartitioner.java:160-163`` / HoodieCompactionConfig
        record-size estimate seed)."""
        for ts, action, md in reversed(self.commits):
            rows, bts = md.get("total_rows", 0), md.get("total_bytes", 0)
            if rows and bts and not all(s.get("log") for s in md.get("write_stats", [])):
                return max(32, int(bts / rows))
        return default

    def small_files(
        self, partition: str, small_file_limit: int, as_of: str | None = None
    ) -> list[FileSlice]:
        return [
            s
            for s in self.latest_file_slices(as_of=as_of, partitions=[partition])
            if not s.logs and 0 < s.base.bytes < small_file_limit
        ]
