"""Read/query operators: snapshot, read-optimized, incremental, time
travel, with manifest-driven file listing and column-stats data skipping.

Reference entry: ``ds/DefaultSource.scala:72-131`` dispatching on
(tableType, queryType) into ``HoodieFileIndex`` /
``MergeOnReadSnapshotRelation`` / ``IncrementalRelation``. Our listing
comes from the commit manifests (metadata.FileSystemView) — never a DFS
scan — and Spark's parquet source handles pushdown/pruning from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DELETE_MARKER_COL, META_COLS, TableType
from ..metadata import FileSlice
from ..payloads import get_payload
from ..operators.merge import mor_merge_window

QUERY_SNAPSHOT = "snapshot"
QUERY_READ_OPTIMIZED = "read_optimized"
QUERY_INCREMENTAL = "incremental"


def _empty(table) -> DataFrame:
    return table.spark.createDataFrame([], table.read_schema())


def _read_paths(table, paths: list[str]) -> DataFrame:
    """Read with the table's latest schema pinned: stable column set
    across commits and add-column evolution (old files yield nulls)."""
    if not paths:
        return _empty(table)
    return table.spark.read.schema(table.read_schema()).parquet(
        *[table.abs_path(p) for p in paths]
    )


def _merge_slices(table, slices: list[FileSlice]) -> DataFrame:
    """MOR snapshot view of the given slices: base ∪ delta rows, then
    latest-version-per-key (payload order) and tombstone drop."""
    base_paths = [p for s in slices for p in s.base.paths]
    log_paths = [p for s in slices for l in s.logs for p in l.paths]
    if not log_paths:
        return _read_paths(table, base_paths)
    payload = get_payload(table.cfg.payload, table.cfg.precombine_field)
    union = _read_paths(table, base_paths + log_paths)
    return mor_merge_window(union, payload)


def snapshot(
    table,
    as_of: str | None = None,
    query_type: str = QUERY_SNAPSHOT,
    filters: list | None = None,
) -> DataFrame:
    """Latest (or as-of, for time travel — ``DataSourceOptions
    as.of.instant``) view. ``filters`` are optional Column predicates
    additionally used for stats-based file skipping before the scan;
    they are re-applied post-merge, so they are an optimization only.
    """
    view = table.view()
    slices = view.latest_file_slices(as_of=as_of)
    if filters:
        slices = prune_slices_by_stats(table, slices, filters)
    if table.cfg.table_type == TableType.COPY_ON_WRITE or query_type == QUERY_READ_OPTIMIZED:
        df = _read_paths(table, [p for s in slices for p in s.base.paths])
        df = df.filter(~F.coalesce(F.col(DELETE_MARKER_COL), F.lit(False)))
    else:
        if as_of is not None:
            # time-travel over MOR must bound delta rows by the instant
            slices = [
                FileSlice(s.partition, s.file_id, s.base, [l for l in s.logs if l.instant <= as_of])
                for s in slices
            ]
        df = _merge_slices(table, slices)
    if filters:
        for f in filters:
            df = df.filter(f)
    return df.drop(DELETE_MARKER_COL)


def incremental(
    table, begin: str | None, end: str | None = None
) -> DataFrame:
    """Rows whose latest version landed in instant range (begin, end]
    (``ds/IncrementalRelation.scala:47-77,101-175``): restrict to file
    groups touched in the range, build the as-of-end view of those
    groups, filter on ``_hoodie_commit_time``."""
    view = table.view()
    commits = view.commits_in_range(begin, end)
    if not commits:
        return _empty(table).drop(DELETE_MARKER_COL)
    end_ts = commits[-1][0]
    touched = view.file_ids_touched_in_range(begin, end_ts)
    slices = [
        s
        for s in view.latest_file_slices(as_of=end_ts)
        if (s.partition, s.file_id) in touched
    ]
    if table.cfg.table_type == TableType.COPY_ON_WRITE:
        df = _read_paths(table, [p for s in slices for p in s.base.paths])
        df = df.filter(~F.coalesce(F.col(DELETE_MARKER_COL), F.lit(False)))
    else:
        df = _merge_slices(table, slices)
    cond = F.col("_hoodie_commit_time") <= F.lit(end_ts)
    if begin is not None:
        cond = cond & (F.col("_hoodie_commit_time") > F.lit(begin))
    return df.filter(cond).drop(DELETE_MARKER_COL)


# --------------------------------------------------------------------------
# Column-stats data skipping (reference: DataSkippingUtils.scala:49-229 +
# HoodieFileIndex.scala:178-294 — predicate → stats-range test)
# --------------------------------------------------------------------------

_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


def prune_slices_by_stats(table, slices, filters) -> list:
    """Drop file slices whose column stats prove the predicate can't
    match. ``filters`` may be Column objects (inspected for simple
    shapes) or (col, op, value) triples. Slices with delta files or
    missing stats are always kept (must-read)."""
    triples = [f for f in filters if isinstance(f, tuple) and len(f) == 3]
    if not triples:
        return slices
    kept = []
    for s in slices:
        if s.logs or not s.base.col_stats:
            kept.append(s)
            continue
        match = True
        for col, op, val in triples:
            st = s.base.col_stats.get(col)
            if not st:
                continue
            mn, mx, _ = st
            if mn is None or mx is None:
                continue
            v = _coerce(val, mn)
            if v is None:
                continue
            if op in ("=", "==") and not (mn <= v <= mx):
                match = False
            elif op == "<" and not (mn < v):
                match = False
            elif op == "<=" and not (mn <= v):
                match = False
            elif op == ">" and not (mx > v):
                match = False
            elif op == ">=" and not (mx >= v):
                match = False
            elif op == "in" and not any(mn <= _coerce(x, mn) <= mx for x in val):
                match = False
            if not match:
                break
        if match:
            kept.append(s)
    return kept


def _coerce(val, template):
    """Align the literal's type with the JSON-roundtripped stat value."""
    try:
        if isinstance(template, bool):
            return bool(val)
        if isinstance(template, int) and not isinstance(val, bool):
            return int(val)
        if isinstance(template, float):
            return float(val)
        if isinstance(template, str):
            return str(val)
    except (TypeError, ValueError):
        return None
    return val
