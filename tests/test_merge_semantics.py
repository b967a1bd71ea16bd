"""Reference-parity merge semantics pinned by the r5 payload review:
log-vs-log preCombine on MOR, COW/MOR agreement on NULL ordering,
whole-row duplicate resolution in the merge kernel, and the guard rails
on table lifecycle APIs (exist_ok config conflicts, bootstrap modes)."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType


def _cfg(**kw):
    base = dict(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        auto_clean=False,
        auto_archive=False,
    )
    base.update(kw)
    return WriteConfig(**base)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, ts double, v string")


def test_mor_out_of_order_delta_commits_precombine_wins(spark, tmp_table_path):
    """HoodieMergedLogRecordScanner merges log-vs-log via preCombine: the
    LARGER ordering value wins even when it arrived in an EARLIER
    deltacommit (OverwriteWithLatestAvroPayload.preCombine); commit order
    only breaks ties. The old commit-desc-first order let the later
    deltacommit's stale event overwrite the newer one."""
    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, "base")]))
    t.upsert(_rows(spark, [(1, "a", 10.0, "newer-event")]))
    t.upsert(_rows(spark, [(1, "a", 5.0, "stale-event")]))  # out of order
    assert t.snapshot().select("v").first()[0] == "newer-event"
    # compaction resolves identically
    t.compact()
    assert t.snapshot().select("v").first()[0] == "newer-event"


def test_mor_log_beats_base_for_overwrite_payload(spark, tmp_table_path):
    """Overwrite semantics: combineAndGetUpdateValue ignores the stored
    value, so a log record with a LOWER ordering value still replaces the
    base row — only log-vs-log consults preCombine."""
    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_rows(spark, [(1, "a", 100.0, "base")]))
    t.upsert(_rows(spark, [(1, "a", 1.0, "log-lower-ts")]))
    assert t.snapshot().select("v").first()[0] == "log-lower-ts"


def test_mor_delete_block_after_high_ordering_log(spark, tmp_table_path):
    """A key-only tombstone (NULL ordering) deletes everything logged
    before it — even log rows whose ordering value is higher (delete
    BLOCKS are positional in the reference scanner)."""
    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(_rows(spark, [(1, "a", 1.0, "base"), (2, "a", 1.0, "keep")]))
    t.upsert(_rows(spark, [(1, "a", 9e9, "high")]))
    t.delete(spark.createDataFrame([(1, "a")], "id long, part string"))
    assert [r.v for r in t.snapshot().collect()] == ["keep"]
    t.compact()
    assert [r.v for r in t.snapshot().collect()] == ["keep"]


@pytest.mark.parametrize("tt", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_default_payload_null_ordering_agrees_across_table_types(
    spark, tmp_table_path, tt
):
    """DefaultPayload event-time guard: a NULL incoming ordering value
    cannot prove the row is newer, so the stored row survives — on BOTH
    table types (the COW path used to take the incoming row while the
    MOR path kept the stored one)."""
    t = HudiTable.create(
        spark, tmp_table_path + f"/{tt.value}",
        _cfg(table_type=tt, payload="default", inline_compact=False),
    )
    t.bulk_insert(_rows(spark, [(1, "a", 5.0, "stored")]))
    t.upsert(
        spark.createDataFrame(
            [(1, "a", None, "null-ordering")],
            "id long, part string, ts double, v string",
        )
    )
    assert t.snapshot().select("v").first()[0] == "stored"


def test_duplicate_inserts_never_column_torn(spark, tmp_table_path):
    """With preCombine disabled, duplicate-key rows entering the merge
    kernel must resolve to ONE WHOLE source row (the reference merge
    handle's map-put semantics) — never a per-column any_value blend
    fabricating a row that existed in neither duplicate."""
    t = HudiTable.create(
        spark, tmp_table_path + "/t", _cfg(combine_before_upsert=False)
    )
    t.bulk_insert(_rows(spark, [(99, "a", 1.0, "seed")]))
    dup = spark.createDataFrame(
        [(1, "a", 1.0, "left", None), (1, "a", 1.0, None, "right")],
        "id long, part string, ts double, v string, w string",
    )
    t.upsert(dup)
    got = t.snapshot().filter("id = 1").collect()
    assert len(got) == 1
    pair = (got[0]["v"], got[0]["w"])
    assert pair in (("left", None), (None, "right")), pair


def test_create_exist_ok_conflicting_config_raises(spark, tmp_table_path):
    p = tmp_table_path + "/t"
    HudiTable.create(spark, p, _cfg())
    # same identity fields → fine
    HudiTable.create(spark, p, _cfg(), exist_ok=True)
    with pytest.raises(ValueError, match="payload"):
        HudiTable.create(spark, p, _cfg(payload="default"), exist_ok=True)
    with pytest.raises(ValueError, match="record_key_field"):
        HudiTable.create(spark, p, _cfg(record_key_field="v"), exist_ok=True)


def test_bootstrap_unknown_mode_raises(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark, tmp_table_path + "/t",
        WriteConfig(record_key_field="o_orderkey",
                    partition_field="o_orderpriority",
                    precombine_field="o_orderdate"),
    )
    with pytest.raises(ValueError, match="bootstrap mode"):
        t.bootstrap("/root/testdata/sf0.001/orders.parquet", mode="METADATA-ONLY")
