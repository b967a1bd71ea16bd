"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at the given sf dir, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [--sf-dir=PATH] [query ...]

The first positional arg is treated as the sf dir only when it is an
existing directory; otherwise all positionals are query names and the
default sf dir (/root/testdata/sf0.01) is used.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import time

# Pin the process timezone BEFORE the JVM / DuckDB start: Spark's
# collect() renders TimestampType in the machine-local zone, while DuckDB
# returns naive UTC wall clock — on a non-UTC box every timestamp column
# would falsely hash-mismatch.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):
    time.tzset()

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
    if isinstance(v, (bytes, bytearray)):
        # Spark collects BinaryType as bytearray, DuckDB returns bytes —
        # str() of those differ ("bytearray(b'..')" vs "b'..'"); hex is
        # representation-neutral
        return "0x" + bytes(v).hex()
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


def row_line(row, order) -> str:
    """One canonical line per row. Cells are joined with '|' with any
    separator occurrences escaped first — otherwise ('a|b','c') and
    ('a','b|c') would hash identically and a real divergence could pass
    as OK (verification-chain review r6)."""
    return "|".join(
        norm_cell(row[i]).replace("\\", "\\\\").replace("|", "\\|")
        for i in order
    )


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(row_line(r, order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def canon_type(t: str) -> str:
    """Collapse a Spark simpleString / DuckDB description typename into a
    canonical family so declared result types can be compared without
    materializing either side through pandas.  The point is to catch the
    divergences a pandas/arrow-based driver would see — DuckDB HUGEINT or
    DECIMAL where Spark yields int64, double vs decimal — while treating
    int widths (int32 vs int64) as equal because the value hash already
    covers them."""
    t = t.strip().lower()
    if t.startswith(("array<", "struct<")) or t.endswith("[]") or t in ("list", "map"):
        return "list"
    m = re.match(r"decimal\s*\((\d+)\s*,\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long", "ubigint", "uinteger"):
        return "int"
    if t in ("hugeint", "uhugeint"):
        return "hugeint"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("string", "varchar", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "ts"
    if t in ("boolean", "bool"):
        return "bool"
    return t


def main():
    # argv[1] is the sf dir ONLY if it is an existing directory (or an
    # explicit --sf-dir=PATH); otherwise every positional arg is a query
    # name, so `python tools/check_oracle.py tpch_q6` runs the subset at
    # the default sf instead of dying with a misleading DuckDB IOException.
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    rest = []
    for a in args:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--"):
            print(f"ERROR: unknown flag {a}")
            print(__doc__.strip())
            return 2
        else:
            rest.append(a)
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest[0]
        rest = rest[1:]
    only = set(rest)
    if not os.path.isdir(sf_dir):
        print(f"ERROR: sf dir does not exist: {sf_dir}")
        return 2

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
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {','.join(sorted(unknown))}")
        print("       (valid names come from __spark_entry__.queries())")
        spark.stop()
        return 2
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
            # Relation API, NOT DB-API cursor.description: duckdb 1.0.0's
            # DB-API returns generic type objects (str() == "NUMBER" /
            # "DATETIME"), never concrete typenames, which would falsely
            # fail every numeric column.  rel.types yields concrete names
            # (INTEGER, DECIMAL(15,2), HUGEINT, ...) so the declared-type
            # check catches e.g. DuckDB HUGEINT or DECIMAL where Spark
            # declares bigint/double — the divergences a pandas/arrow-
            # comparing driver would see as float64-vs-int64.
            rel = con.sql(sql)
            ocols = list(rel.columns)
            odtypes = {
                c: canon_type(str(t)) for c, t in zip(rel.columns, rel.types)
            }
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        sdtypes = {f.name: canon_type(f.dataType.simpleString()) for f in sdf.schema.fields}
        for c in sdtypes:
            if c in odtypes and sdtypes[c] != odtypes[c]:
                problems.append(
                    f"declared type {c}: spark={sdtypes[c]} oracle={odtypes[c]}"
                )
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs, ho = df_hash(scols, srows), df_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a sample diff — as MULTISETS, so a multiplicity-only
                # divergence ({A,A,B} vs {A,B,B}) still prints diagnostic
                # rows (verification-chain review r6)
                import itertools
                from collections import Counter

                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                scnt = Counter(row_line(r, so) for r in srows)
                ocnt = Counter(row_line(r, oo) for r in orows)
                for x, n in itertools.islice((scnt - ocnt).items(), 3):
                    print(f"    spark-only (x{n}): {x[:160]}")
                for x, n in itertools.islice((ocnt - scnt).items(), 3):
                    print(f"    oracle-only (x{n}): {x[:160]}")
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
