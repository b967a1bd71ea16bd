"""Persisted record-level key index (operators/key_index.py): tagging
parity with SIMPLE, log-structured maintenance, compaction, rollback,
and staleness handling across the replace family."""

import pytest
from pyspark.sql import functions as F

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType
from hudi_0_10_0_spark.operators import key_index as KI


def _cfg(**kw):
    base = dict(
        record_key_field="o_orderkey",
        partition_field="o_orderstatus",
        precombine_field="o_totalprice",
        index_type="RECORD_INDEX",
        key_index_buckets=8,
    )
    base.update(kw)
    return WriteConfig(**base)


@pytest.fixture()
def rec(spark, tmp_table_path, orders):
    t = HudiTable.create(spark, tmp_table_path + "/rec", _cfg())
    t.bulk_insert(orders)
    return t


def test_upsert_update_delete_with_record_index(rec, orders):
    rec.upsert(orders.limit(40).withColumn("o_comment", F.lit("RI")))
    snap = rec.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "RI").count() == 40
    # global semantics: delete by key alone, no partition column needed
    rec.delete(orders.limit(10).select("o_orderkey"))
    assert rec.snapshot().count() == orders.count() - 10
    # the delete tombstones flow into the index: re-upserting the keys
    # makes them come back exactly once
    rec.upsert(orders.limit(10).withColumn("o_comment", F.lit("BACK")))
    snap = rec.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "BACK").count() == 10


def test_index_files_present_and_compacted(rec, orders):
    # several small writes -> delta dirs accumulate, then compact
    for i in range(3):
        rec.upsert(orders.limit(5).withColumn("o_comment", F.lit(f"w{i}")))
    dirs = KI._index_dirs(rec)
    assert len(dirs) >= 2
    assert KI.compact_if_due(rec) is False  # below threshold of 8
    rec.cfg.key_index_compact_deltas = 2
    assert KI.compact_if_due(rec) is True
    dirs2 = KI._index_dirs(rec)
    assert len(dirs2) == 1 and dirs2[0].endswith(".base")
    # index still answers correctly after compaction
    rec.upsert(orders.limit(3).withColumn("o_comment", F.lit("after")))
    snap = rec.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "after").count() == 3


def test_record_index_survives_replace_family(rec, orders):
    status = orders.select("o_orderstatus").first()[0]
    # delete_partition leaves stale index entries -> tagger must demote
    rec.delete_partition([status])
    n_alive = orders.filter(F.col("o_orderstatus") != status).count()
    assert rec.snapshot().count() == n_alive
    # upsert keys that used to live in the dropped partition: stale
    # entries point at replaced groups; rows must re-insert, not vanish
    back = orders.filter(F.col("o_orderstatus") == status).limit(20)
    rec.upsert(back)
    assert rec.snapshot().count() == n_alive + 20
    # clustering rewrites groups and refreshes the index
    rec.cluster(sort_cols=["o_orderkey"])
    rec.upsert(back.withColumn("o_comment", F.lit("postcluster")))
    snap = rec.snapshot()
    assert snap.count() == n_alive + 20
    assert snap.filter(F.col("o_comment") == "postcluster").count() == 20


def test_record_index_rollback_drops_delta(rec, orders):
    c_last = rec.commits()[-1]
    rec.upsert(orders.limit(7).withColumn("o_comment", F.lit("oops")))
    c_bad = rec.commits()[-1]
    assert any(d == c_bad for d in KI._index_dirs(rec))
    rec.rollback(c_bad)
    assert all(d != c_bad for d in KI._index_dirs(rec))
    # rollback also reverts the add-column evolution the upsert introduced
    snap = rec.snapshot()
    assert "o_comment" not in snap.columns
    assert rec.commits()[-1] == c_last


def test_record_index_mor(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark,
        tmp_table_path + "/recmor",
        _cfg(table_type=TableType.MERGE_ON_READ, inline_compact=False),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(25).withColumn("o_comment", F.lit("D1")))
    t.delete(orders.limit(5).select("o_orderkey"))
    snap = t.snapshot()
    assert snap.count() == orders.count() - 5
    assert snap.filter(F.col("o_comment") == "D1").count() == 20
    t.compact()
    assert t.read_optimized().count() == orders.count() - 5


@pytest.mark.parametrize("seed", [11, 29])
def test_record_index_random_sequence(spark, tmp_table_path, seed):
    """Randomized op chain under the persisted global key index against
    a key-only model: upserts keep the stored partition (global,
    update_partition_path=False), deletes are key-only, drop_partition
    leaves stale index entries the tagger must demote, services must not
    change results. Fixed seed for reproducibility."""
    import random

    from pyspark.sql import types as T

    SCHEMA = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("ts", T.LongType()),
        ]
    )
    PARTS = ["p0", "p1", "p2"]
    KEYS = list(range(40))
    rng = random.Random(seed)

    cfg = WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        index_type="RECORD_INDEX",
        key_index_buckets=8,
        key_index_compact_deltas=3,  # force index compactions mid-chain
        inline_compact=False,
        auto_clean=False,
        auto_archive=False,
    )
    t = HudiTable.create(spark, tmp_table_path + f"/randrec{seed}", cfg)
    # key -> (row, phys_part): the `part` COLUMN always carries the
    # incoming value, while the PHYSICAL hoodie partition stays where
    # the key first landed (updatePartitionPath=false — the reference's
    # global-index behavior); drop_partition removes by PHYSICAL
    # partition, which can differ from the column after such updates.
    model: dict = {}

    def rows(n, ts):
        out = {}
        for _ in range(n):
            k = rng.choice(KEYS)
            out[k] = (k, rng.choice(PARTS), rng.randrange(1000), ts)
        return list(out.values())

    def check():
        got = {
            r["id"]: (r["id"], r["part"], r["v"], r["ts"])
            for r in t.snapshot().select("id", "part", "v", "ts").collect()
        }
        want = {k: row for k, (row, _pp) in model.items()}
        assert got == want, (
            f"drift: extra={set(got) - set(want)} missing={set(want) - set(got)} "
            f"diff={[ (k, got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k) ][:5]}"
        )

    init = rows(25, ts=0)
    t.bulk_insert(spark.createDataFrame(init, SCHEMA))
    for (k, p, v, ts) in init:
        model[k] = ((k, p, v, ts), p)
    check()

    ts = 1
    for _ in range(10):
        op = rng.choice(
            ["upsert", "upsert", "upsert", "delete", "compact_index",
             "cluster", "drop_partition"]
        )
        if op == "upsert":
            batch = rows(rng.randrange(1, 12), ts)
            t.upsert(spark.createDataFrame(batch, SCHEMA))
            for (k, p, v, tts) in batch:
                phys = model[k][1] if k in model else p
                model[k] = ((k, p, v, tts), phys)
        elif op == "delete":
            live = sorted(model)
            if not live:
                continue
            picked = [live[rng.randrange(len(live))] for _ in range(min(4, len(live)))]
            df = spark.createDataFrame([(k,) for k in picked], "id long")
            t.delete(df)
            for k in picked:
                model.pop(k, None)
        elif op == "drop_partition":
            part = rng.choice(PARTS)
            t.delete_partition([part])
            for k in [k for k, (_row, pp) in model.items() if pp == part]:
                model.pop(k)
        elif op == "compact_index":
            KI.compact_if_due(t)
        elif op == "cluster":
            t.cluster(sort_cols=["id"])
        ts += 1
        check()


def test_key_index_df_matches_table(rec, orders):
    idx = rec.key_index_df()
    assert idx is not None
    assert idx.count() == orders.count()
    # every key maps to a live file group
    live = {(s.partition, s.file_id) for s in rec.file_slices()}
    pairs = {
        (r["_hoodie_partition_path"], r["_hoodie_file_id"]) for r in idx.collect()
    }
    assert pairs <= live


def test_record_index_restore_unwinds_deltas(rec, orders):
    c0 = rec.commits()[0]
    rec.savepoint(c0)
    rec.upsert(orders.limit(15).withColumn("o_totalprice", F.lit(1.0)))
    c1 = rec.commits()[-1]
    assert any(d == c1 for d in KI._index_dirs(rec))
    rec.restore(c0)
    assert all(d != c1 for d in KI._index_dirs(rec))
    # index still answers correctly post-restore
    rec.upsert(orders.limit(5).withColumn("o_totalprice", F.lit(2.0)))
    snap = rec.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_totalprice") == 2.0).count() == 5


def test_record_index_survives_timeline_archiving(spark, tmp_table_path, orders):
    """Archiving trims the active timeline but index deltas named by
    archived instants must stay readable — otherwise tags miss and
    upserts duplicate keys."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/recarch",
        _cfg(keep_min_commits=2, keep_max_commits=3, auto_clean=False),
    )
    t.bulk_insert(orders)
    ten = orders.limit(10)
    for i in range(4):
        t.upsert(ten.withColumn("o_totalprice", F.lit(float(i))))
    t.archive()  # may be a no-op — auto_archive already ran inline
    assert t.timeline.archived_instants(), "expected archived instants"
    # the bulk-insert instant is archived now; its index delta must count
    t.upsert(ten.withColumn("o_totalprice", F.lit(99.0)))
    snap = t.snapshot()
    assert snap.count() == orders.count(), "tag misses duplicated keys"
    assert snap.filter(F.col("o_totalprice") == 99.0).count() == 10


def test_record_index_truncate_then_reinsert(rec, orders):
    rec.truncate()
    assert rec.snapshot().count() == 0
    # stale entries point at replaced groups; re-insert must not vanish
    rec.upsert(orders.limit(50))
    assert rec.snapshot().count() == 50
