"""Catalog sync — the ``HiveSyncTool`` analogue for the Spark catalog.

Reference (``hudi-sync/hudi-hive-sync/.../HiveSyncTool.java``):
``syncHoodieTable`` (:114-135) registers a COW table once and a MOR
table TWICE — ``<name>_ro`` (read optimized) and ``<name>_rt``
(snapshot/"realtime", suffixes :68-69) — into the Hive metastore,
auto-creating the database (:151-160), diffing the schema
(``syncSchema``), adding partitions written since
``lastCommitTimeSynced`` (:186-196), and recording the new sync point
(``updateLastCommitTimeSynced``). External engines then query by NAME
instead of path.

Spark-first shape: the metastore thrift endpoint is an external system
this build cannot reach, and a PERSISTENT Spark catalog entry cannot
encode Hudi semantics (a parquet-path table would read tombstones and
unmerged MOR bases — silently wrong). What CAN carry the semantics is a
registered view over the engine's own read plan, so sync registers
``<db>_<name>`` / ``_ro`` / ``_rt`` as GLOBAL temp views (the
``global_temp`` database — visible to every session of this
SparkSession, the closest in-process analogue of a shared metastore):
``spark.sql("SELECT ... FROM global_temp.db_tbl_rt")`` works with zero
engine imports. Re-running sync after commits re-registers the views
(a temp view freezes the PLAN, and a Hudi read plan embeds the
timeline it was built from), which also makes schema evolution
automatic — exactly the reconcile-on-sync contract of ``syncSchema``.

Sync state (``last_commit_time_sync``, per registered name) lives in
``_hoodie_meta/catalog_sync.json`` next to the table — the analogue of
the Hive table property — so conditional sync can skip when nothing
new committed, and ``partitions_added`` reports the partitions written
since the last sync the way ``getPartitionsWrittenToSince`` does.
"""

from __future__ import annotations

import json
import logging

log = logging.getLogger(__name__)

SUFFIX_SNAPSHOT_TABLE = "_rt"  # HiveSyncTool.java:68
SUFFIX_READ_OPTIMIZED_TABLE = "_ro"  # HiveSyncTool.java:69


class CatalogSyncTool:
    """Register a Hudi table's read views in the Spark catalog's
    ``global_temp`` database and keep them fresh across commits."""

    def __init__(self, spark, table, database: str = "default",
                 table_name: str | None = None):
        self.spark = spark
        self.table = table
        self.database = database
        self.table_name = table_name or table.cfg.table_name or "hudi_table"

    # -- state -------------------------------------------------------------
    def _state_path(self) -> str:
        return f"{self.table.meta_path}/catalog_sync.json"

    def _load_state(self) -> dict:
        try:
            return json.loads(self.table.fs.read_text(self._state_path()))
        except Exception:
            return {}

    def _save_state(self, state: dict) -> None:
        self.table.fs.write_text_atomic(
            self._state_path(), json.dumps(state, indent=1), overwrite=True
        )

    # -- naming ------------------------------------------------------------
    def _qualify(self, suffix: str = "") -> str:
        # global_temp has no sub-databases; the db name joins the view
        # name (documented divergence from the metastore's true 2-level
        # namespace)
        return f"{self.database}_{self.table_name}{suffix}"

    def registered_names(self) -> list[str]:
        from .config import TableType

        if self.table.cfg.table_type == TableType.MERGE_ON_READ:
            return [
                self._qualify(SUFFIX_READ_OPTIMIZED_TABLE),
                self._qualify(SUFFIX_SNAPSHOT_TABLE),
            ]
        return [self._qualify()]

    # -- sync --------------------------------------------------------------
    def sync(self, conditional: bool = True) -> dict:
        """One sync round (``syncHoodieTable`` parity): no-op when
        nothing committed since the last sync and the views still exist
        (conditional sync), else (re)register every view and advance
        ``last_commit_time_sync``. Returns a report dict."""
        from .config import TableType

        latest = self.table.timeline.latest_completed()
        latest_ts = latest.timestamp if latest else None
        state = self._load_state()
        names = self.registered_names()
        if latest_ts is None:
            # a freshly created table has no commits and therefore no
            # read plan to register — report cleanly instead of letting
            # snapshot() raise from deep inside the read path
            # (code-review r8)
            return {"synced": False, "last_commit_time_sync": None,
                    "tables": names, "partitions_added": []}
        existing = {
            v.name for v in self.spark.catalog.listTables("global_temp")
        }
        last_synced = state.get("last_commit_time_sync")
        if (
            conditional
            and latest_ts is not None
            and last_synced == latest_ts
            and all(n in existing for n in names)
        ):
            return {"synced": False, "last_commit_time_sync": last_synced,
                    "tables": names, "partitions_added": []}

        mor = self.table.cfg.table_type == TableType.MERGE_ON_READ
        if mor:
            self.table.read_optimized().createOrReplaceGlobalTempView(
                self._qualify(SUFFIX_READ_OPTIMIZED_TABLE)
            )
            self.table.snapshot().createOrReplaceGlobalTempView(
                self._qualify(SUFFIX_SNAPSHOT_TABLE)
            )
        else:
            self.table.snapshot().createOrReplaceGlobalTempView(self._qualify())

        # partitions written since the last sync point
        # (getPartitionsWrittenToSince parity) — from commit metadata,
        # no storage scan
        parts: set[str] = set()
        for ts, _, md in self.table.view().commits:
            if last_synced is None or ts > last_synced:
                for sd in md.get("write_stats", []):
                    parts.add(sd.get("partition", ""))
        state["last_commit_time_sync"] = latest_ts
        state["tables"] = names
        self._save_state(state)
        log.info("catalog sync complete for %s (partitions added: %d)",
                 names, len(parts))
        return {"synced": True, "last_commit_time_sync": latest_ts,
                "tables": names, "partitions_added": sorted(parts)}

    def unsync(self) -> None:
        """Drop the registered views (DROP TABLE analogue)."""
        for n in self.registered_names():
            self.spark.catalog.dropGlobalTempView(n)
