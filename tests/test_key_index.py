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


def test_cow_delete_tombstones_index(rec, orders):
    """COW rewrites OMIT deleted rows; the index must still record the
    delete (explicit tombstones), or deleted keys stay mapped forever."""
    gone = [r[0] for r in orders.limit(10).select("o_orderkey").collect()]
    rec.delete(orders.limit(10).select("o_orderkey"))
    idx = KI.read_index(rec)
    live_keys = {r[0] for r in idx.select("_hoodie_record_key").collect()}
    assert not ({str(k) for k in gone} & live_keys), "deleted keys still live in index"
    assert rec.key_index_df().count() == orders.count() - 10


def test_cow_delete_whole_group_tombstones_index(spark, tmp_table_path):
    """Deleting every row of every affected group writes NO data files —
    the index delta must still carry the tombstones."""
    df = spark.createDataFrame(
        [(i, "pA", i, 0) for i in range(20)], "id long, part string, v long, ts long"
    )
    t = HudiTable.create(
        spark,
        tmp_table_path + "/allgone",
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="ts",
            index_type="RECORD_INDEX", key_index_buckets=8,
        ),
    )
    t.bulk_insert(df)
    t.delete(df.select("id"))
    assert t.snapshot().count() == 0
    idx = KI.read_index(t)
    assert idx is None or idx.count() == 0


def test_cow_reinsert_after_delete_honors_incoming_partition(spark, tmp_table_path):
    """A key deleted from partition pA and re-inserted with part=pB must
    land in pB: the tombstone kills the global mapping, so nothing pins
    the key to the old physical partition."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/reins",
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="ts",
            index_type="RECORD_INDEX", key_index_buckets=8,
        ),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "pA", 10, 0), (2, "pA", 20, 0)], "id long, part string, v long, ts long"
    ))
    t.delete(spark.createDataFrame([(1,)], "id long"))
    t.upsert(spark.createDataFrame([(1, "pB", 11, 1)], "id long, part string, v long, ts long"))
    row = t.snapshot().filter(F.col("id") == 1).select("_hoodie_partition_path", "part", "v").first()
    assert row["part"] == "pB" and row["v"] == 11
    assert row["_hoodie_partition_path"] == "pB", "re-insert pinned to deleted key's old partition"


def test_reinsert_after_drop_partition_honors_incoming_partition(spark, tmp_table_path):
    """Stale index entries pointing at REPLACED groups must be dropped
    BEFORE tagging: demoting after the global tag keeps the stale
    partition, sending the re-insert into the dropped partition even
    when the incoming row names another one."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/dropreins",
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="ts",
            index_type="RECORD_INDEX", key_index_buckets=8,
        ),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "pA", 10, 0), (2, "pB", 20, 0)], "id long, part string, v long, ts long"
    ))
    t.delete_partition(["pA"])
    # key 1 used to live in pA; it arrives naming pB now
    t.upsert(spark.createDataFrame([(1, "pB", 11, 1)], "id long, part string, v long, ts long"))
    row = t.snapshot().filter(F.col("id") == 1).select("_hoodie_partition_path", "part").first()
    assert row["part"] == "pB"
    assert row["_hoodie_partition_path"] == "pB", "re-insert landed in the dropped partition"


@pytest.mark.parametrize("table_type", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_update_partition_path_move_same_instant(spark, tmp_table_path, table_type):
    """GLOBAL move with update_partition_path=True writes the old
    partition's tombstone and the new partition's insert under the SAME
    instant. When the old partition sorts ABOVE the new one, the index's
    latest-wins window must still prefer the live entry — otherwise the
    key vanishes from the index and the next upsert duplicates it."""
    t = HudiTable.create(
        spark,
        tmp_table_path + f"/move{table_type.value}",
        WriteConfig(
            record_key_field="id", partition_field="part", precombine_field="ts",
            index_type="RECORD_INDEX", key_index_buckets=8,
            update_partition_path=True, table_type=table_type,
            inline_compact=False,
        ),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "p9", 10, 0), (2, "p9", 20, 0)], "id long, part string, v long, ts long"
    ))
    # move key 1 from p9 (sorts high) to p1 (sorts low)
    t.upsert(spark.createDataFrame([(1, "p1", 11, 1)], "id long, part string, v long, ts long"))
    snap = t.snapshot()
    assert snap.count() == 2
    assert snap.filter(F.col("id") == 1).select("_hoodie_partition_path").first()[0] == "p1"
    # the key must still be live in the index under the NEW partition
    idx = KI.read_index(t)
    entry = idx.filter(F.col("_hoodie_record_key") == "1").collect()
    assert len(entry) == 1 and entry[0]["_hoodie_partition_path"] == "p1"
    # and a further upsert updates in place instead of inserting a dup
    t.upsert(spark.createDataFrame([(1, "p1", 12, 2)], "id long, part string, v long, ts long"))
    snap = t.snapshot()
    assert snap.count() == 2
    assert snap.filter(F.col("id") == 1).select("v").first()[0] == 12
    # deleting the moved key must not be a no-op
    t.delete(spark.createDataFrame([(1,)], "id long"))
    assert t.snapshot().count() == 1


def test_rollback_after_index_compaction_rebuilds(rec, orders):
    """Once deltas are folded into a <ts>.base, a rolled-back instant's
    entries survive inside the base — rollback must wipe the index so the
    next tag rebuilds from live slices."""
    ten = orders.limit(10)
    for i in range(3):
        rec.upsert(ten.withColumn("o_totalprice", F.lit(float(i))))
    rec.cfg.key_index_compact_deltas = 2
    assert KI.compact_if_due(rec) is True
    rec.upsert(ten.withColumn("o_totalprice", F.lit(77.0)))
    c_bad = rec.commits()[-1]
    rec.rollback(c_bad)
    # rolled-back values must not be taggable: the next upsert of the
    # same keys updates (not duplicates), and 77.0 is gone
    rec.upsert(ten.withColumn("o_totalprice", F.lit(88.0)))
    snap = rec.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_totalprice") == 77.0).count() == 0
    assert snap.filter(F.col("o_totalprice") == 88.0).count() == 10
    names = rec.fs.list_names(KI.index_root(rec)) or []
    assert not [n for n in names if n.endswith(".compact_tmp")]


def test_no_match_delete_does_not_brick_index(spark, tmp_table_path):
    """Code-review r6: a delete matching NO keys produced an empty index
    delta dir (only _SUCCESS); spark.read.parquet on it threw and every
    later tag read failed. Empty deltas are skipped at write AND read."""
    from pyspark.sql import functions as F

    from hudi_0_10_0_spark import HudiTable, WriteConfig

    t = HudiTable.create(
        spark, tmp_table_path + "/nb",
        WriteConfig(record_key_field="id", partition_field="part",
                    precombine_field="v", index_type="RECORD_INDEX",
                    key_index_buckets=2),
    )
    t.bulk_insert(spark.createDataFrame(
        [(1, "p0", 1), (2, "p0", 2)], "id long, part string, v long"))
    # no key 99 exists: the tombstone frame is empty
    t.delete(spark.createDataFrame([(99, "p0")], "id long, part string"))
    # the table must still tag and upsert normally
    t.upsert(spark.createDataFrame([(1, "p0", 10)], "id long, part string, v long"))
    assert t.snapshot().filter("id = 1").first().v == 10
    assert t.snapshot().count() == 2


def test_bucket_count_scales_at_compaction(spark, tmp_table_path, orders):
    """Index compaction re-derives the bucket count from on-disk size
    (verdict r6 #3): a tiny per-bucket byte target forces the new base
    onto more buckets than the configured default, the marker records
    it, later deltas follow the base's generation, and tagging across
    the mixed generations stays exact."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/scale",
        _cfg(
            key_index_buckets=8,
            key_index_compact_deltas=1,
            key_index_bucket_target_bytes=64,  # force a re-bucket
            key_index_max_buckets=128,
        ),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(30).withColumn("o_comment", F.lit("G1")))
    # past compact_deltas → compaction ran and re-bucketed
    dirs = KI._index_dirs(t)
    bases = [d for d in dirs if d.endswith(".base")]
    assert bases, f"no compacted base in {dirs}"
    n_base = KI._dir_bucket_count(t, bases[-1])
    assert n_base == 128, f"expected cap 128, got {n_base}"
    # new deltas follow the base generation, not the config default
    t.upsert(orders.limit(10).withColumn("o_comment", F.lit("G2")))
    deltas = [d for d in KI._index_dirs(t) if not d.endswith(".base")]
    if deltas:
        assert KI._dir_bucket_count(t, deltas[-1]) == 128
    # mixed-generation tag correctness: update + delete + reinsert
    t.delete(orders.limit(5).select("o_orderkey"))
    assert t.snapshot().count() == orders.count() - 5
    t.upsert(orders.limit(5).withColumn("o_comment", F.lit("BACK")))
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "BACK").count() == 5
    # no key maps to two live locations
    idx = KI.read_index(t)
    assert idx.groupBy("_hoodie_record_key").count().filter("count > 1").count() == 0


def test_fine_bucket_math_composes():
    """h mod n == (h mod FINE) mod n for every n | FINE — the identity
    the per-generation pruning rests on."""
    import random

    rnd = random.Random(7)
    for _ in range(2000):
        h = rnd.randint(-(2**63), 2**63 - 1)
        fine = h % KI.FINE_BUCKETS  # python % == pmod for positive mod
        for n in (8, 16, 64, 128, 1024, 65536):
            assert h % n == fine % n


def test_bucket_pruning_reads_only_touched_buckets(spark, tmp_table_path, orders):
    """With a >64-bucket generation, tag_buckets_of returns fine buckets
    and read_index prunes each dir by its own count — the pruned index
    must still contain every incoming key's entry."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/prune",
        _cfg(
            key_index_buckets=128,
            key_index_compact_deltas=100,  # keep deltas, no compaction
        ),
    )
    t.bulk_insert(orders)
    # the tag path stamps the record key before consulting the index
    incoming = orders.limit(7).withColumn(
        "_hoodie_record_key", F.col("o_orderkey").cast("string")
    )
    fine = KI.tag_buckets_of(t, incoming)
    assert fine is not None and 0 < len(fine) <= 7
    pruned = KI.read_index(t, fine)
    full = KI.read_index(t)
    keys = {r[0] for r in incoming.select(F.col("o_orderkey").cast("string")).collect()}
    got = {
        r[0]
        for r in pruned.filter(
            F.col("_hoodie_record_key").isin(list(keys))
        ).collect()
    }
    want = {
        r[0]
        for r in full.filter(F.col("_hoodie_record_key").isin(list(keys))).collect()
    }
    assert got == want and got == keys


def test_target_bucket_count_clamps_misconfig(spark, tmp_table_path, orders):
    """Code-review r7: non-pow2 caps and floor>cap must clamp to powers
    of two dividing FINE_BUCKETS, never silently disable pruning."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/clamp",
        _cfg(
            key_index_buckets=131072,  # above FINE_BUCKETS
            key_index_bucket_target_bytes=1,
            key_index_max_buckets=1000,  # not a power of two
        ),
    )
    t.bulk_insert(orders)
    dirs = KI._index_dirs(t)
    n = KI.target_bucket_count(t, dirs)
    assert n == 512, n  # pow2_floor(1000) = 512; floor clamped to cap
    assert KI.FINE_BUCKETS % n == 0


def test_delta_bucket_count_capped(spark, tmp_table_path, orders):
    """Code-review r7: deltas never inherit a huge base generation —
    capped at DELTA_MAX_BUCKETS to bound small-file counts."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/cap",
        _cfg(
            key_index_buckets=8,
            key_index_compact_deltas=1,
            key_index_bucket_target_bytes=1,  # base jumps to the cap
            key_index_max_buckets=4096,
        ),
    )
    t.bulk_insert(orders)
    from pyspark.sql import functions as F  # noqa: F811

    t.upsert(orders.limit(20).withColumn("o_comment", F.lit("X")))  # compacts
    bases = [d for d in KI._index_dirs(t) if d.endswith(".base")]
    assert bases and KI._dir_bucket_count(t, bases[-1]) == 4096
    t.cfg.key_index_compact_deltas = 100  # keep the next delta unfolded
    t.upsert(orders.limit(5).withColumn("o_comment", F.lit("Y")))
    deltas = [d for d in KI._index_dirs(t) if not d.endswith(".base")]
    assert deltas
    assert KI._dir_bucket_count(t, deltas[-1]) == KI.DELTA_MAX_BUCKETS
    # correctness across the mixed generations
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter(F.col("o_comment") == "Y").count() == 5


def test_key_range_file_pruning_after_compaction(spark, tmp_table_path, orders):
    """verdict r7 #2: a compacted base carries a _key_ranges sidecar;
    a tag with per-fine-bucket key ranges reads only intersecting
    FILES of the touched buckets — and must agree with the full read."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/franges",
        WriteConfig(
            record_key_field="id",
            partition_field="part",
            precombine_field="v",
            index_type="RECORD_INDEX",
            key_index_buckets=128,
            key_index_compact_deltas=1,
            key_index_bucket_target_bytes=1 << 30,  # one generation: 128
            key_index_file_target_bytes=256,  # force multi-file buckets
        ),
    )
    big = spark.range(30000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("part"),
        F.lit(1).alias("v"),
    )
    t.bulk_insert(big)
    t.upsert(big.limit(10).withColumn("v", F.lit(2)))  # compacts
    bases = [d for d in KI._index_dirs(t) if d.endswith(".base")]
    assert bases, "compaction should have produced a base"
    ranges = KI._dir_ranges(t, bases[-1])
    assert ranges, "compacted base must carry the _key_ranges sidecar"
    # the tiny file target must have split at least one bucket
    from collections import Counter

    per_bucket = Counter(rel.split("/", 1)[0] for rel in ranges)
    assert max(per_bucket.values()) > 1, per_bucket
    # ranges within one bucket are disjoint (sorted write)
    for b in per_bucket:
        ivs = sorted(v for k, v in ranges.items() if k.startswith(b + "/"))
        for (l1, h1), (l2, h2) in zip(ivs, ivs[1:]):
            assert h1 <= l2, (b, ivs)
    incoming = big.limit(7).withColumn(
        "_hoodie_record_key", F.col("id").cast("string")
    )
    fine = KI.tag_buckets_of(t, incoming)
    assert isinstance(fine, dict) and all(
        isinstance(v, tuple) and len(v) == 2 for v in fine.values()
    )
    pruned = KI.read_index(t, fine)
    full = KI.read_index(t)
    # the point of the exercise: fewer FILES scanned than the full read
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    keys = {r[0] for r in incoming.select(F.col("id").cast("string")).collect()}
    got = {
        r[0]
        for r in pruned.filter(F.col("_hoodie_record_key").isin(list(keys))).collect()
    }
    want = {
        r[0]
        for r in full.filter(F.col("_hoodie_record_key").isin(list(keys))).collect()
    }
    assert got == want == keys


def test_all_new_keys_batch_returns_empty_not_none(spark, tmp_table_path, orders):
    """An all-new-keys trickle batch whose file ranges exclude every
    base file must get an EMPTY mapping (all inserts), never None —
    None would trigger an O(table) build_full rebuild."""
    t = HudiTable.create(
        spark,
        tmp_table_path + "/newkeys",
        _cfg(
            key_index_buckets=128,
            key_index_compact_deltas=1,
            key_index_bucket_target_bytes=1 << 30,
            key_index_file_target_bytes=256,
        ),
    )
    t.bulk_insert(orders)
    t.upsert(orders.limit(5).withColumn("o_comment", F.lit("c")))  # compacts
    # keys far outside the stored key domain (orders keys are numeric
    # strings; 'zzz…' sorts above all of them)
    fresh = spark.createDataFrame(
        [(f"zzz{i}", "O", 1.0) for i in range(5)],
        "o_orderkey string, o_orderstatus string, o_totalprice double",
    ).withColumn("_hoodie_record_key", F.col("o_orderkey"))
    fine = KI.tag_buckets_of(t, fresh)
    idx = KI.read_index(t, fine, keys=fresh)
    assert idx is not None, "pruned-to-nothing must not read as 'no index'"
    assert idx.count() == 0
    # end-to-end: upserting genuinely new keys lands them as inserts
    n0 = t.snapshot().count()
    t.upsert(
        spark.createDataFrame(
            [(10**12 + i, "O", 1.0) for i in range(5)],
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        )
    )
    assert t.snapshot().count() == n0 + 5


def test_record_index_aliases_rejected_with_virtual_keys():
    """code-review r8: every accepted RECORD_INDEX spelling must hit the
    up-front virtual-keys guard, not a post-write AnalysisException."""
    from hudi_0_10_0_spark.config import RECORD_INDEX_TYPES

    for alias in RECORD_INDEX_TYPES:
        assert KI.enabled(WriteConfig(index_type=alias))
        with pytest.raises(ValueError, match="RECORD_INDEX"):
            WriteConfig(
                record_key_field="id",
                index_type=alias,
                populate_meta_fields=False,
            ).validate_virtual_keys()


def test_ranges_cache_invalidates_on_sidecar_rewrite(spark, tmp_table_path, orders):
    """code-review r8: a <instant>.base name CAN recur with different
    contents (wipe -> rebuild -> recompact under the same latest
    instant); the sidecar cache must key on the file's mtime, never
    serve the old generation's ranges."""
    t = HudiTable.create(
        spark, tmp_table_path + "/rc", _cfg(key_index_compact_deltas=0)
    )
    t.bulk_insert(orders.limit(50))
    KI.compact_if_due(t)
    bases = [d for d in KI._index_dirs(t) if d.endswith(".base")]
    assert bases
    first = KI._dir_ranges(t, bases[-1])
    assert first is not None
    # overwrite the sidecar in place (what a same-name recompaction does)
    import time as _time

    path = f"{KI.index_root(t)}/{bases[-1]}/{KI.RANGES_MARKER}"
    _time.sleep(0.02)  # ensure a distinct mtime
    t.fs.write_text_atomic(path, '{"__idx_bucket=0/fake.parquet": ["a", "b"]}',
                           overwrite=True)
    second = KI._dir_ranges(t, bases[-1])
    assert second == {"__idx_bucket=0/fake.parquet": ["a", "b"]}, second
