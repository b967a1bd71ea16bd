"""Streaming + batch read source via the Python DataSource API.

Reference: ``sql/hudi/streaming/HoodieStreamSource.scala:50-144`` — a
``readStream`` source whose offsets are commit timestamps: each
micro-batch is the incremental pull ``(last_offset, latest_commit]``.

Design (Spark-first, executor-distributed): the *driver* plans partitions
from the timeline (one ``InputPartition`` per file slice — same planning
as the batch incremental read), and *executors* read the parquet via
PyArrow and apply the MOR latest-version-per-key merge in pandas. No
``collect()``; scale = one task per file slice, exactly like the
reference's ``HoodieMergeOnReadRDD``.

Also exposes ``incremental_batches`` — a driver-side micro-batch iterator
over the normal DataFrame incremental read, for ``foreachBatch``-style
consumers that want full Catalyst plans per batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..config import (
    COMMIT_TIME_COL,
    DELETE_MARKER_COL,
    RECORD_KEY_COL,
    SEQNO_COL,
)

FORMAT_NAME = "hudi_0_10_0_stream"


class _LocalFS:
    """Read-only FS adapter (``Timeline`` surface) over ``pyarrow.fs`` so
    driver-side planning inside the DataSource needs no SparkSession."""

    def __init__(self, base_uri: str):
        import pyarrow.fs as pafs

        self.fs, self.base = pafs.FileSystem.from_uri(
            base_uri if "://" in base_uri else os.path.abspath(base_uri)
        )

    def _resolve(self, p: str) -> str:
        return p if not p.startswith("file:") else p[len("file:"):]

    def list_names(self, p: str) -> list[str]:
        import pyarrow.fs as pafs

        try:
            sel = pafs.FileSelector(self._resolve(p), recursive=False)
            return [os.path.basename(f.path) for f in self.fs.get_file_info(sel)]
        except (FileNotFoundError, OSError):
            return []

    def read_text(self, p: str) -> str:
        with self.fs.open_input_stream(self._resolve(p)) as f:
            return f.read().decode("utf-8")

    def exists(self, p: str) -> bool:
        import pyarrow.fs as pafs

        return self.fs.get_file_info(self._resolve(p)).type != pafs.FileType.NotFound


def _open_table_meta(path: str):
    """(cfg, Timeline, FileSystemView) without a SparkSession."""
    from ..config import WriteConfig
    from ..metadata import FileSystemView
    from ..timeline import Timeline

    fs = _LocalFS(path)
    meta = f"{path.rstrip('/')}/_hoodie_meta"
    cfg = WriteConfig.from_json(fs.read_text(f"{meta}/table_config.json"))
    tl = Timeline(fs, meta)
    return cfg, tl, FileSystemView(tl)


def _merge_order_cols(payload_name: str, precombine: str | None) -> list[str]:
    """Ascending sort columns whose LAST row per key is the winner —
    pandas mirror of ``Payload.mor_merge_order`` (payloads.py)."""
    if payload_name in ("default", "event_time") and precombine:
        return [precombine, COMMIT_TIME_COL, SEQNO_COL]
    cols = [COMMIT_TIME_COL]
    if precombine:
        cols.append(precombine)
    cols.append(SEQNO_COL)
    return cols


@dataclass
class SlicePartition(InputPartition):
    base_paths: list[str] = field(default_factory=list)
    log_paths: list[str] = field(default_factory=list)
    order_cols: list[str] = field(default_factory=list)
    begin: str | None = None  # exclusive commit-time lower bound
    end: str | None = None  # inclusive upper bound
    columns: list[str] = field(default_factory=list)


def _read_slice_arrow(part: SlicePartition):
    """Executor-side: read one file slice with pyarrow, merge base+log
    rows (latest version per key), apply the incremental commit-time
    range, drop tombstones; yield arrow batches in schema column order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for p in part.base_paths + part.log_paths:
        tables.append(pq.read_table(p))
    if not tables:
        return
    tbl = pa.concat_tables(tables, promote_options="permissive")
    df = tbl.to_pandas()
    if part.log_paths:  # merge needed
        # na_position='first': ascending sort + tail(1) makes the LAST
        # row win, so nulls must sort FIRST to lose — matching the Spark
        # merge path's desc_nulls_last (a null ordering value must never
        # beat a real one; pandas' default na_position='last' inverted
        # this between the two read paths)
        df = df.sort_values(
            part.order_cols, kind="stable", na_position="first"
        ).groupby(RECORD_KEY_COL, as_index=False, sort=False).tail(1)
    if DELETE_MARKER_COL in df.columns:
        df = df[~df[DELETE_MARKER_COL].fillna(False).astype(bool)]
    if part.begin is not None:
        df = df[df[COMMIT_TIME_COL] > part.begin]
    if part.end is not None:
        df = df[df[COMMIT_TIME_COL] <= part.end]
    for c in part.columns:  # add-column evolution: old files lack new cols
        if c not in df.columns:
            df[c] = None
    out = pa.Table.from_pandas(df[part.columns], preserve_index=False)
    yield from out.to_batches(max_chunksize=65536)


def _plan_slices(
    path: str,
    begin: str | None,
    end: str | None,
    incremental: bool,
    as_of: str | None = None,
) -> tuple[list[SlicePartition], T.StructType]:
    cfg, _, view = _open_table_meta(path)
    schema_json = view.latest_schema()
    if not schema_json:
        return [], T.StructType()
    schema = T.StructType.fromJson(json.loads(schema_json))
    columns = [f.name for f in schema.fields if f.name != DELETE_MARKER_COL]
    out_schema = T.StructType([f for f in schema.fields if f.name != DELETE_MARKER_COL])
    order_cols = _merge_order_cols(cfg.payload, cfg.precombine_field)

    if incremental:
        commits = view.commits_in_range(begin, end)
        if not commits:
            return [], out_schema
        end_ts = commits[-1][0]
        touched = view.file_ids_touched_in_range(begin, end_ts)
        slices = [
            s
            for s in view.latest_file_slices(as_of=end_ts)
            if (s.partition, s.file_id) in touched
        ]
    else:
        end_ts = None
        slices = view.latest_file_slices(as_of=as_of)

    base = path.rstrip("/")
    parts = []
    for s in slices:
        parts.append(
            SlicePartition(
                base_paths=[f"{base}/{p}" for p in s.base.paths],
                log_paths=[f"{base}/{p}" for p in (pp for l in s.logs for pp in l.paths)],
                order_cols=order_cols,
                begin=begin if incremental else None,
                end=end_ts if incremental else None,
                columns=columns,
            )
        )
    return parts, out_schema


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, options: dict):
        self.path = path
        self.start_commit = options.get("begin")  # exclusive, optional

    def initialOffset(self) -> dict:
        return {"ts": self.start_commit or ""}

    def latestOffset(self) -> dict:
        _, tl, _ = _open_table_meta(self.path)
        latest = tl.latest_completed()
        return {"ts": latest.timestamp if latest else ""}

    def partitions(self, start: dict, end: dict):
        begin = start.get("ts") or None
        end_ts = end.get("ts") or None
        if end_ts is None or begin == end_ts:
            return []
        parts, _ = _plan_slices(self.path, begin, end_ts, incremental=True)
        return parts

    def read(self, partition: SlicePartition):
        return _read_slice_arrow(partition)

    def commit(self, end: dict) -> None:
        pass


class HudiBatchReader(DataSourceReader):
    def __init__(self, path: str, options: dict):
        self.path = path
        self.query_type = options.get("query.type", "snapshot")
        self.as_of = options.get("as.of.instant")
        self.begin = options.get("begin")
        self.end = options.get("end")

    def partitions(self):
        inc = self.query_type == "incremental"
        parts, _ = _plan_slices(
            self.path, self.begin, self.end, incremental=inc, as_of=self.as_of
        )
        if self.query_type == "read_optimized":
            for p in parts:
                p.log_paths = []
        return parts

    def read(self, partition: SlicePartition):
        return _read_slice_arrow(partition)


class HudiStreamDataSource(DataSource):
    """``spark.read/readStream.format("hudi_0_10_0_stream")``.

    Options: ``path`` (required); batch: ``query.type`` =
    snapshot | read_optimized | incremental, ``as.of.instant``,
    ``begin``/``end``; streaming: ``begin`` start offset."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        _, schema = _plan_slices(self.options["path"], None, None, incremental=False)
        return schema

    def reader(self, schema) -> HudiBatchReader:
        return HudiBatchReader(self.options["path"], dict(self.options))

    def streamReader(self, schema) -> HudiStreamReader:
        return HudiStreamReader(self.options["path"], dict(self.options))


def register(spark: SparkSession) -> None:
    spark.dataSource.register(HudiStreamDataSource)


def read_stream(spark: SparkSession, path: str, begin: str | None = None) -> DataFrame:
    """``readStream`` over a table: each micro-batch = incremental pull."""
    register(spark)
    reader = spark.readStream.format(FORMAT_NAME).option("path", path)
    if begin is not None:
        reader = reader.option("begin", begin)
    return reader.load()


def incremental_batches(table, begin: str | None = None):
    """Driver-side micro-batch puller (the ``availableNow`` pattern):
    yields ``(DataFrame, end_commit)`` for each new commit window since
    ``begin``; caller persists ``end_commit`` as its checkpoint."""
    while True:
        latest = table.timeline.latest_completed()
        if latest is None or latest.timestamp == begin:
            return
        df = table.incremental(begin, latest.timestamp)
        yield df, latest.timestamp
        begin = latest.timestamp
