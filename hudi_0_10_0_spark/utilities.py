"""Stand-alone table utilities.

``snapshot_export`` mirrors ``util/HoodieSnapshotExporter.java:72-265``
(and subsumes ``util/HoodieSnapshotCopier.java`` — the copier is the
exporter's "hudi" output format): export the latest snapshot of a table
either as a plain dataset (parquet/json/orc, meta columns dropped,
optional repartitioning) or as a copy that is itself a readable table.

Deliberate divergences from the reference, both documented inline:

- For ``output_format="hudi"`` on a MOR source we copy FULL latest file
  slices (base + delta files), so the export answers snapshot reads
  identically to the source. The reference copies base files only
  (``getLatestBaseFilesBeforeOrOn``) while copying ALL commit metadata,
  which leaves a MOR export whose logs dangle.
- Older file versions are NOT copied (exactly like the reference), so
  time travel to instants before the export is not functional in the
  copy; snapshot and incremental-from-export reads are.
"""

from __future__ import annotations

import logging
from typing import Callable

log = logging.getLogger(__name__)

EXPORT_FORMATS = ("parquet", "json", "orc", "hudi")

# _hoodie_meta/ entries that are writer-process state, never part of a
# table's durable identity: lock files, heartbeats, instant claims.
_EPHEMERAL_META_DIRS = ("locks", ".locks", "heartbeat")


class SnapshotExportError(ValueError):
    """HoodieSnapshotExporterException analogue."""


def snapshot_export(
    spark,
    source_base_path: str,
    target_path: str,
    output_format: str = "parquet",
    output_partition_field: str | None = None,
    partitioner: Callable | None = None,
) -> str:
    """Export the source table's latest snapshot to ``target_path``.

    ``partitioner(df) -> DataFrameWriter`` overrides the default layout
    for non-hudi formats (reference ``Partitioner`` SPI,
    ``HoodieSnapshotExporter.java:76-78``). Returns the latest source
    commit timestamp the export captured. A ``_SUCCESS`` marker is
    written last (reference ``createSuccessTag``).
    """
    from .fs import FS
    from .table import HudiTable

    if output_format not in EXPORT_FORMATS:
        raise SnapshotExportError(
            f"output_format must be one of {EXPORT_FORMATS}, got {output_format!r}"
        )
    table = HudiTable.load(spark, source_base_path)
    # target-side operations need a FileSystem bound to the TARGET's
    # scheme — the table's fs is pinned to the source base URI and a
    # cross-store export (local → s3a://…) would die on "Wrong FS"
    # (code-review r7); copy_file already resolves its destination
    tfs = FS(spark, target_path)
    if tfs.exists(target_path):
        raise SnapshotExportError("The target output path already exists.")
    latest = table.timeline.latest_completed()
    if latest is None:
        raise SnapshotExportError("No commits present. Nothing to snapshot.")
    view = table.view()
    slices = view.latest_file_slices(as_of=latest.timestamp)
    if not slices:
        raise SnapshotExportError("The source dataset has 0 partition to snapshot.")

    if output_format == "hudi":
        _export_as_hudi(table, tfs, target_path, latest.timestamp, slices)
    else:
        _export_as_non_hudi(
            table, target_path, output_format, output_partition_field, partitioner
        )
    tfs.write_text(f"{target_path.rstrip('/')}/_SUCCESS", "")
    return latest.timestamp


def _export_as_non_hudi(table, target_path, output_format, partition_field, partitioner):
    from .config import META_COLS

    # BaseFileOnlyView semantics (HoodieSnapshotExporter.java:183-189):
    # latest base files only — a MOR source exports its read-optimized
    # view, exactly like the reference
    df = table.read_optimized()
    df = df.drop(*[c for c in META_COLS if c in df.columns])
    if partitioner is not None:
        writer = partitioner(df)
    elif partition_field:
        from pyspark.sql import functions as F

        # one shuffle keyed by the output partition column so each
        # partition directory is written by few tasks (reference default
        # partitioner: repartition(col) + partitionBy(col))
        writer = df.repartition(F.col(partition_field)).write.partitionBy(
            partition_field
        )
    else:
        writer = df.write
    writer.format(output_format).mode("overwrite").save(target_path)


def _export_as_hudi(table, tfs, target_path, latest_ts, slices):
    """Copy latest file slices + table metadata so the target loads as a
    table (`HudiTable.load(spark, target_path)`) and answers the same
    snapshot query. Metadata copied: table config, COMPLETED timeline
    instants <= latest, archived manifests (a latest slice's base may
    have been written by an archived commit), key-index files. Skipped:
    pending instants, instant claims, locks, heartbeats — writer-process
    state, not table state. ``tfs`` is a FileSystem bound to the target
    scheme (mkdirs on the destination side)."""
    from .table import META_DIR

    fs = table.fs
    src_root = table.base_path.rstrip("/")
    dst_root = target_path.rstrip("/")

    # -- data: latest slices only, relative paths preserved ---------------
    pairs: list[tuple[str, str]] = []
    for s in slices:
        if s.base.raw:
            # METADATA_ONLY-bootstrapped group: the base file is
            # source-owned, referenced by (absolute) path in the
            # manifest — the copy keeps the reference, not the bytes,
            # exactly like the source table itself
            paths = [p for l in s.logs for p in l.paths]
        else:
            paths = s.all_paths()
        pairs.extend((table.abs_path(rel), f"{dst_root}/{rel}") for rel in paths)
    _copy_data_files(table.spark, fs, pairs)

    # -- metadata (O(timeline) small files — driver-side is fine) ---------
    src_meta = f"{src_root}/{META_DIR}"
    dst_meta = f"{dst_root}/{META_DIR}"
    for name in fs.list_names(src_meta):
        if name in _EPHEMERAL_META_DIRS or name == "timeline":
            continue
        _copy_tree(fs, tfs, f"{src_meta}/{name}", f"{dst_meta}/{name}")
    tl = table.timeline
    tfs.mkdirs(f"{dst_meta}/timeline")
    for inst in tl.completed():
        if inst.timestamp <= latest_ts:
            fs.copy_file(
                f"{tl.dir}/{inst.filename()}",
                f"{dst_meta}/timeline/{inst.filename()}",
            )
    # archived manifests (folded into every view build)
    if fs.exists(tl.archive_dir):
        _copy_tree(fs, tfs, tl.archive_dir, f"{dst_meta}/timeline/archived")
    log.info(
        "exported %d data files + timeline<=%s to %s",
        len(pairs), latest_ts, dst_root,
    )


# Schemes pyarrow.fs can resolve inside a Python worker ("" = plain
# path, handled as LocalFileSystem). Hadoop-only spellings translate
# (s3a/s3n → s3); hdfs is deliberately NOT here — pyarrow's HadoopFS
# needs libhdfs + Hadoop env in every Python worker, which the
# JVM-driver FileUtil path never needed, so hdfs stays driver-side.
_PA_SCHEMES = {"", "file", "s3", "s3a", "s3n", "gs"}
_PA_TRANSLATE = {"s3a": "s3", "s3n": "s3"}


def _uri_scheme(p: str) -> str:
    return p.split("://", 1)[0] if "://" in p else ""


def _copy_data_files(spark, fs, pairs: list[tuple[str, str]]) -> None:
    """Copy the data files. Small exports run on the driver (FileUtil
    stream copy); past 64 files the pairs fan out over executors
    (reference: ``context.foreach(files, …)`` in
    ``HoodieSnapshotExporter.exportAsHudi``) via ``pyarrow.fs``. URIs
    whose scheme pyarrow cannot resolve in a Python worker fall back to
    the driver loop rather than dying mid-copy on the executors
    (code-review r7)."""
    distributable = all(
        _uri_scheme(s) in _PA_SCHEMES and _uri_scheme(d) in _PA_SCHEMES
        for s, d in pairs
    )
    if len(pairs) <= 64 or not distributable:
        for src, dst in pairs:
            fs.copy_file(src, dst)
        return
    sc = spark.sparkContext
    sc.parallelize(pairs, max(2, len(pairs) // 16)).foreach(_pa_copy_pair)


def _pa_fs(p: str):
    from pyarrow import fs as pafs

    scheme = _uri_scheme(p)
    if scheme == "":
        return pafs.LocalFileSystem(), p
    tr = _PA_TRANSLATE.get(scheme)
    if tr:
        p = tr + p[len(scheme):]
    return pafs.FileSystem.from_uri(p)


def _pa_copy_pair(pair: tuple[str, str]) -> None:
    """Executor-side single-file copy via pyarrow.fs (runs in a Python
    worker — no py4j gateway). Create-once like the driver path's
    ``FS.copy_file`` — collision behavior must not flip on file count
    (code-review r7)."""
    import posixpath

    from pyarrow import fs as pafs

    src, dst = pair
    src_fs, src_path = _pa_fs(src)
    dst_fs, dst_path = _pa_fs(dst)
    if dst_fs.get_file_info(dst_path).type != pafs.FileType.NotFound:
        raise FileExistsError(dst)
    dst_fs.create_dir(posixpath.dirname(dst_path), recursive=True)
    with src_fs.open_input_stream(src_path) as r, dst_fs.open_output_stream(
        dst_path
    ) as w:
        while True:
            chunk = r.read(4 << 20)
            if not chunk:
                break
            w.write(chunk)


def import_parquet(
    spark,
    src_path: str,
    target_path: str,
    cfg,
    command: str = "insert",
    source_format: str = "parquet",
) -> str:
    """``util/HDFSParquetImporter.java:109-230``: rewrite an existing
    dataset INTO a table (vs bootstrap, which adopts files in place).
    ``command`` ∈ insert (default) / upsert / bulkinsert, the
    importer's ``--command`` values; an existing target gets the new
    batch applied with that operation, a fresh target is created.
    Returns the commit instant."""
    from .table import HudiTable

    cmd = command.lower().replace("_", "")
    ops = {"insert": "insert", "upsert": "upsert", "bulkinsert": "bulk_insert"}
    if cmd not in ops:
        raise ValueError(
            f"command must be one of {sorted(ops)} "
            "(HDFSParquetImporter --command), got " + repr(command)
        )
    df = spark.read.format(source_format).load(src_path)
    # create(exist_ok=True) rather than load() for existing targets so a
    # caller-supplied cfg that conflicts with the stored table identity
    # (different key/partition/keygen fields) is REJECTED instead of
    # silently ignored — the import would otherwise proceed under the
    # stored config while the caller believes theirs applied (advice r7)
    table = HudiTable.create(spark, target_path, cfg, exist_ok=True)
    return getattr(table, ops[cmd])(df)


def run_table_service(
    spark, base_path: str, service: str, mode: str = "scheduleandexecute", **kw
) -> str | int | None:
    """Stand-alone service runner — the ``HoodieCleaner`` /
    ``HoodieCompactor`` / ``HoodieClusteringJob`` utilities as one
    entry point. ``service`` ∈ clean / archive / compact / cluster;
    compact and cluster honor the clustering job's ``--mode`` values
    (``schedule`` — plan only, ``execute`` — run the earliest pending
    plan (or ``kw['instant']``), ``scheduleandexecute`` — default)."""
    from .table import HudiTable

    t = HudiTable.load(spark, base_path)
    s, m = service.lower(), mode.lower()
    if s == "clean":
        return t.clean()
    if s == "archive":
        return t.archive()
    if s not in ("compact", "cluster"):
        raise ValueError(f"unknown service {service!r}")
    if m == "schedule":
        return t.schedule_compaction(**kw) if s == "compact" else t.schedule_cluster(**kw)
    if m == "execute":
        instant = kw.pop("instant", None)
        if s == "compact":
            if instant is None:
                pend = [
                    i for i in t.timeline.pending() if i.action == "compaction"
                ]
                if not pend:
                    return None
                instant = pend[0].timestamp
            return t.compact(instant)
        return t.run_cluster(instant)
    if m == "scheduleandexecute":
        return t.compact(**kw) if s == "compact" else t.cluster(**kw)
    raise ValueError(f"unknown mode {mode!r}")


def _copy_tree(fs, tfs, src: str, dst: str) -> None:
    if not fs.is_dir(src):
        fs.copy_file(src, dst)
        return
    tfs.mkdirs(dst)
    for name in fs.list_names(src):
        _copy_tree(fs, tfs, f"{src}/{name}", f"{dst}/{name}")
