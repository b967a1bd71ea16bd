"""Randomized operation-sequence tests against an in-memory model —
the pytest analogue of the reference's DAG-based integration suite
(``hudi-integ-test/.../dag/nodes``: Insert/Upsert/Delete/Rollback/
Compact/Cluster/Validate chains over random workloads).

The model is a dict {(key, partition): row}; after every operation the
table snapshot must equal the model exactly. Sequences are generated
from fixed seeds so failures reproduce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_0_10_0_spark import HudiTable, WriteConfig
from hudi_0_10_0_spark.config import TableType

# soak/crash-matrix profile: deselected by the default (driver) fast
# profile, run with HUDI_FULL_SUITE=1 (see tests/conftest.py)
pytestmark = pytest.mark.soak

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


def _rows(rng, n, ts):
    out = {}
    for _ in range(n):
        k = rng.choice(KEYS)
        out[k] = (k, rng.choice(PARTS), rng.randrange(1000), ts)
    return list(out.values())


def _apply_model(model, rows, op):
    for (k, p, v, ts) in rows:
        # non-global index: identity is (key, partition)
        if op == "delete":
            model.pop((k, p), None)
        else:
            model[(k, p)] = (k, p, v, ts)


def _check(t, model):
    got = {
        (r["id"], r["part"]): (r["id"], r["part"], r["v"], r["ts"])
        for r in t.snapshot().select("id", "part", "v", "ts").collect()
    }
    assert got == model, (
        f"drift: extra={set(got) - set(model)} missing={set(model) - set(got)}"
    )


@pytest.mark.parametrize(
    "seed, table_type, file_format",
    [
        (7, TableType.COPY_ON_WRITE, "parquet"),
        (23, TableType.COPY_ON_WRITE, "parquet"),
        (7, TableType.MERGE_ON_READ, "parquet"),
        (23, TableType.MERGE_ON_READ, "parquet"),
        (11, TableType.COPY_ON_WRITE, "orc"),
        (11, TableType.MERGE_ON_READ, "orc"),
    ],
    ids=["cow-7", "cow-23", "mor-7", "mor-23", "cow-orc-11", "mor-orc-11"],
)
def test_random_op_sequences(spark, tmp_table_path, seed, table_type, file_format):
    rng = random.Random(seed)
    cfg = WriteConfig(
        record_key_field="id",
        partition_field="part",
        precombine_field="ts",
        table_type=table_type,
        base_file_format=file_format,
        inline_compact=False,
        auto_clean=False,
        auto_archive=False,
    )
    t = HudiTable.create(spark, tmp_table_path, cfg)
    model: dict = {}
    # (commit_ts, model copy) after each step — checked via time travel
    # at the end; cleared on clean (old versions may become unreadable)
    # and rollback (rolled-back instants disappear)
    history: list = []
    saved: tuple | None = None  # (savepoint_ts, model copy)

    init = _rows(rng, 25, ts=0)
    t.bulk_insert(spark.createDataFrame(init, SCHEMA))
    _apply_model(model, init, "insert")
    _check(t, model)

    ts = 1
    for step in range(10):
        op = rng.choice(
            ["upsert", "upsert", "delete", "compact", "cluster", "rollback",
             "overwrite", "drop_partition", "clean", "savepoint_restore"]
        )
        if op == "overwrite":
            # insert_overwrite: replace the touched partitions' contents
            rows = _rows(rng, rng.randrange(2, 8), ts)
            t.insert_overwrite(spark.createDataFrame(rows, SCHEMA))
            touched_parts = {p for (_k, p, _v, _t) in rows}
            for key in [k for k in model if k[1] in touched_parts]:
                model.pop(key)
            _apply_model(model, rows, "upsert")
        elif op == "drop_partition":
            part = rng.choice(PARTS)
            t.delete_partition([part])
            for key in [k for k in model if k[1] == part]:
                model.pop(key)
        elif op == "clean":
            # savepointed slices are clean-protected (tested in
            # test_services); un-savepointed history may become
            # unreadable, so drop it from the time-travel audit
            t.clean()
            history.clear()
        elif op == "upsert":
            rows = _rows(rng, rng.randrange(1, 12), ts)
            t.upsert(spark.createDataFrame(rows, SCHEMA))
            _apply_model(model, rows, "upsert")
        elif op == "delete":
            live = list(model.values())
            if not live:
                continue
            picked = [live[rng.randrange(len(live))] for _ in range(min(4, len(live)))]
            df = spark.createDataFrame(picked, SCHEMA).select("id", "part")
            t.delete(df)
            _apply_model(model, [(k, p, 0, 0) for (k, p, *_rest) in picked], "delete")
        elif op == "compact":
            t.compact()
        elif op == "cluster":
            t.cluster(sort_cols=["id"])
        elif op == "savepoint_restore":
            if saved is None:
                c = t.commits()[-1]
                t.savepoint(c)
                saved = (c, dict(model))
            else:
                sp_ts, sp_model = saved
                t.restore(sp_ts)
                model = dict(sp_model)
                saved = None
                history = [h for h in history if h[0] <= sp_ts]
        elif op == "rollback":
            # roll back the latest commit, then re-check against a model
            # replay: simplest sound approach — snapshot the model before
            # each write is complex, so instead roll back and re-sync the
            # model FROM the table (rollback correctness itself is pinned
            # by test_services); here we only require internal consistency
            commits = t.commits()
            if len(commits) > 1:
                t.rollback(commits[-1])
                model = {
                    (r["id"], r["part"]): (r["id"], r["part"], r["v"], r["ts"])
                    for r in t.snapshot().select("id", "part", "v", "ts").collect()
                }
        ts += 1
        _check(t, model)
        if op == "rollback":
            last = t.commits()[-1]
            history = [h for h in history if h[0] <= last]
        history.append((t.commits()[-1], dict(model)))

    # end-of-sequence invariants: compaction and clustering must not
    # change results
    t.compact()
    _check(t, model)
    t.cluster(sort_cols=["id"])
    _check(t, model)
    # incremental from the beginning covers every live row's latest state
    inc = t.incremental(None)
    inc_keys = {(r["id"], r["part"]) for r in inc.select("id", "part").collect()}
    assert inc_keys == set(model)
    # time-travel audit: the table as of each recorded commit must equal
    # the model as it was then (dedup: last model per commit ts wins)
    by_ts: dict = {}
    for cts, m in history:
        by_ts[cts] = m
    for cts in rng.sample(sorted(by_ts), min(3, len(by_ts))):
        m = by_ts[cts]
        got = {
            (r["id"], r["part"]): (r["id"], r["part"], r["v"], r["ts"])
            for r in t.snapshot(as_of=cts).select("id", "part", "v", "ts").collect()
        }
        assert got == m, f"time travel to {cts} diverged from model history"
