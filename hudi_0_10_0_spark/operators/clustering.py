"""Clustering: rewrite selected file groups into target-sized, sorted
(or space-filling-curve-ordered) files via a ``replacecommit``.

Reference: plan strategies in
``spark-client/client/clustering/plan/strategy/`` (size-based /
recent-days / selected-partitions / single-file-sort) executed by
``MultipleSparkJobExecutionStrategy.java:90-161`` with linear-sort or
z-order/hilbert partitioners. Ours: one DataFrame pass —
``repartitionByRange`` on (partition, sortkey) + ``sortWithinPartitions``
— then a manifest swap.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ..config import (
    FILE_ID_COL,
    PARTITION_PATH_COL,
    RECORD_KEY_COL,
    TableType,
)
from ..functions.zorder import with_hilbert_value, with_zvalue
from ..metadata import make_commit_metadata
from ..timeline import REPLACE_COMMIT
from .merge import mor_merge_window
from ..payloads import get_payload
from .write import collect_write_stats, write_instant_files


def cluster(
    table,
    partitions: list[str] | None = None,
    sort_cols: list[str] | None = None,
    layout: str = "sort",  # sort | zorder | hilbert
    curve_method: str = "sample",  # raw | map | sample (see functions/zorder.py)
    curve_bits: int = 16,
    target_file_size: int | None = None,
    small_files_only: bool = False,
    target_file_groups: int | None = None,
) -> str | None:
    """Returns the replacecommit instant, or None if nothing to do."""
    cfg = table.cfg
    view = table.view()
    slices = view.latest_file_slices(partitions=partitions)
    if small_files_only:
        # SparkSizeBasedClusteringPlanStrategy: only groups below the
        # small-file limit participate
        slices = [s for s in slices if s.total_bytes < cfg.small_file_limit_bytes]
    if not slices:
        return None

    target = target_file_size or cfg.max_file_size_bytes
    instant = table.new_instant()
    table.timeline.create_requested(instant, REPLACE_COMMIT, {"operation": "cluster"})
    table.timeline.transition_to_inflight(instant, REPLACE_COMMIT)
    try:
        from ..sources.read import slices_to_df

        log_paths = [p for s in slices for l in s.logs for p in l.paths]
        df = slices_to_df(table, slices)
        if log_paths:  # MOR: fold deltas while clustering
            df = df.unionByName(
                table.spark.read.schema(table.read_schema()).parquet(
                    *[table.abs_path(p) for p in log_paths]
                )
            )
            df = mor_merge_window(
                df, get_payload(cfg.payload, cfg.precombine_field)
            )

        sort_key = None
        if layout == "zorder" and sort_cols:
            df = with_zvalue(df, sort_cols, "__curve", bits=curve_bits, method=curve_method)
            sort_key = "__curve"
        elif layout == "hilbert" and sort_cols:
            df = with_hilbert_value(df, sort_cols, "__curve", bits=curve_bits, method=curve_method)
            sort_key = "__curve"
        elif sort_cols:
            sort_key = sort_cols[0]

        total_bytes = sum(s.total_bytes for s in slices)
        n_out = target_file_groups or max(1, int(total_bytes / target))
        prefix = uuid.uuid4().hex[:8]
        order_cols = [F.col(PARTITION_PATH_COL)] + (
            [F.col(c) for c in (sort_cols if sort_key != "__curve" else [sort_key])]
            if sort_cols
            else [F.col(RECORD_KEY_COL)]
        )
        df = df.repartitionByRange(n_out, *order_cols).withColumn(
            FILE_ID_COL,
            F.concat_ws("-", F.lit(prefix), F.spark_partition_id().cast("string")),
        )

        # write directly (file groups are pre-assigned by the range
        # partitioner — no reshuffle). The single local sort leads with
        # the layout (directory) columns so the dynamic-partition writer
        # accepts the ordering as-is: otherwise it inserts its own sort
        # by (_pp, _fg) alone, which both duplicates the work and
        # scrambles the curve/sort-key order inside each file — the
        # entire point of clustering.
        out = df.withColumn("_pp", F.when(F.col(PARTITION_PATH_COL) == "", F.lit("__HIVE_DEFAULT_PARTITION__")).otherwise(F.col(PARTITION_PATH_COL))).withColumn("_fg", F.col(FILE_ID_COL))
        out = out.sortWithinPartitions(F.col("_pp"), F.col("_fg"), *order_cols)
        if sort_key == "__curve":
            out = out.drop("__curve")
        out.write.mode("error").partitionBy("_pp", "_fg").parquet(
            table.instant_data_path(instant)
        )
        stats = collect_write_stats(table, instant)
        replaced: dict[str, list[str]] = {}
        for s in slices:
            replaced.setdefault(s.partition, []).append(s.file_id)
        md = make_commit_metadata(
            "cluster",
            view.latest_schema() or "",
            stats,
            replaced=replaced,
            extra={"layout": layout, "sort_cols": sort_cols or []},
        )
        table.timeline.transition_to_completed(instant, REPLACE_COMMIT, md)
    except Exception:
        table.fs.delete(table.instant_data_path(instant), recursive=True)
        table.timeline.delete_instant_files(instant, REPLACE_COMMIT)
        raise
    return instant
