"""Write-path scale curve (VERDICT r3 #4): time one upsert commit's
stages at two data scales and show the fixed per-commit overhead
shrinking as a fraction of total — the evidence behind SCALE.md's
"O(groups) driver work" claim at the largest scale the sandbox allows.

Usage: python tools/scale_curve.py [sf_dir] [multipliers...]
Defaults: /root/testdata/sf0.1, multipliers 1 and 10
(sf0.1 lineitem ≈ 600k rows → points at ~600k and ~6M rows).

Prints one JSON line:
  {"points": [{"mult": 1, "base_rows": N, "batch_rows": M,
               "upsert_s": S, "rows_per_s": R, "stages": {...}}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in sys.argv[2:]] or [1, 10]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .appName("scale-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hudi_0_10_0_spark import HudiTable, WriteConfig
    from hudi_0_10_0_spark.operators.write import _StageTimer

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate",
    )
    base_count = li.count()

    points = []
    for mult in mults:
        # scale by unioning key-shifted copies — same key/partition
        # distribution shape at every point
        df = li
        for i in range(1, mult):
            df = df.unionByName(
                li.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
                )
            )
        df = df.withColumn(
            "uid",
            F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber")),
        )
        with tempfile.TemporaryDirectory() as tmp:
            t = HudiTable.create(
                spark,
                f"{tmp}/t",
                WriteConfig(
                    record_key_field="uid",
                    partition_field="l_returnflag",
                    precombine_field="l_quantity",
                    auto_clean=False,
                    auto_archive=False,
                ),
            )
            t.bulk_insert(df)

            # update batch: ~10% of rows, spread across every partition —
            # the shape of a steady-state ingest commit
            batch = df.filter(F.col("l_orderkey") % 10 == 0).withColumn(
                "l_quantity", F.col("l_quantity") + 1
            )
            batch_rows = batch.count()

            records: list = []
            _StageTimer.sink = records
            t0 = time.perf_counter()
            t.upsert(batch)
            upsert_s = time.perf_counter() - t0
            _StageTimer.sink = None

            stages = {}
            for _op, stage, dt in records:
                stages[stage] = round(stages.get(stage, 0.0) + dt, 3)
            points.append(
                {
                    "mult": mult,
                    "base_rows": base_count * mult,
                    "batch_rows": batch_rows,
                    "upsert_s": round(upsert_s, 3),
                    "rows_per_s": int(batch_rows / upsert_s),
                    "stages": stages,
                }
            )
            print(f"# mult={mult}: {json.dumps(points[-1])}", file=sys.stderr)

    print(json.dumps({"points": points}))
    spark.stop()


if __name__ == "__main__":
    main()
