"""Canary tests for tools/check_oracle.py — the local mimic of the
driver's correctness gate (VERDICT r3 #1/#2).

Round 3 broke the checker silently: a rewrite read declared types from
DuckDB's DB-API ``cursor.description``, but duckdb 1.0.0 returns generic
DB-API type objects there (``str() == "NUMBER"``), so every numeric query
falsely FAILed — and nothing in the default suite noticed because the
sweep is opt-in.  These tests run in the DEFAULT suite so a checker
regression fails CI immediately:

1. a unit test pinning ``canon_type`` agreement between a live DuckDB
   relation-API type probe and Spark's simpleString families, and
2. one cheap end-to-end ``check_oracle.py`` invocation on sub-second
   queries at sf0.001 (numeric + string + float columns covered).
"""

import subprocess
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_oracle import canon_type  # noqa: E402


def test_canon_type_matches_live_duckdb_probe():
    """If DuckDB's type-name surface changes again, this fails loudly."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT 1::INT AS i, 1::BIGINT AS l, 1::HUGEINT AS h, "
        "1.5::DOUBLE AS d, CAST(1 AS DECIMAL(15,2)) AS dec15, "
        "'x' AS s, DATE '2020-01-01' AS dt, "
        "TIMESTAMP '2020-01-01 00:00:00' AS ts, "
        "[1, 2] AS arr, TRUE AS b"
    )
    got = {c: canon_type(str(t)) for c, t in zip(rel.columns, rel.types)}
    con.close()
    assert got == {
        "i": "int",
        "l": "int",
        "h": "hugeint",
        "d": "float",
        "dec15": "decimal(15,2)",
        "s": "str",
        "dt": "date",
        "ts": "ts",
        "arr": "list",
        "b": "bool",
    }
    # And the Spark-side families these must line up with:
    assert canon_type("bigint") == "int"
    assert canon_type("double") == "float"
    assert canon_type("string") == "str"
    assert canon_type("timestamp") == "ts"
    assert canon_type("date") == "date"
    assert canon_type("array<bigint>") == "list"
    assert canon_type("decimal(15,2)") == "decimal(15,2)"


def test_dbapi_description_is_still_generic_in_this_duckdb():
    """Documents WHY the checker must not use cursor.description: if this
    starts failing, duckdb began returning concrete names and the comment
    in check_oracle.py should be revisited (the relation API stays
    correct either way)."""
    con = duckdb.connect()
    res = con.execute("SELECT 1::INT AS a")
    name = str(res.description[0][1])
    con.close()
    assert canon_type(name) not in ("int",), (
        "duckdb DB-API description now returns concrete typenames "
        f"({name!r}); check_oracle.py's relation-API read still works, "
        "but update this canary."
    )


@pytest.mark.slow
def test_checker_end_to_end_smoke():
    """One real check_oracle.py run on cheap queries with numeric, float,
    and string output columns at sf0.001 — proves the whole pipeline
    (Spark exec, DuckDB oracle, type check, value hash) is green."""
    proc = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            "/root/testdata/sf0.001",
            "dedup_exact",
            "text_stats",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-6:])
    assert proc.returncode == 0, f"checker smoke failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "RESULT: 2/2 OK" in proc.stdout, tail


def test_simhash_oracle_matches_on_non_ascii(spark):
    """code-review r4: the DuckDB simhash oracle folds FNV-1a per UTF-8
    BYTE like the engine (hash_token) — per-code-point folding diverged
    on any non-ASCII token (masked by the all-ASCII testdata)."""
    import duckdb
    import pandas as pd

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from hudi_0_10_0_spark.functions.dedup import simhash_dedup

    rows = [
        (1, "café naïve résumé déjà vu " * 6),
        (2, "café naïve résumé déjà vu " * 6 + "extra"),  # near-dup of 1
        (3, "日本語のテキスト 完全に 異なる 内容 です " * 5),
        (4, "ASCII only words repeated here " * 6),
        (5, "🎉 emoji héavy Ωmega ünïcode test " * 6),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        r["doc_id"] for r in simhash_dedup(sdf).select("doc_id").collect()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(r[0] for r in con.execute(entry._sql_simhash_dedup()).fetchall())
    con.close()
    assert got == want
    assert 2 not in got  # the near-dup was actually removed


def test_df_hash_separator_escaping():
    """Verification-chain review r6: cells containing the '|' join
    separator must not collide — ('a|b','c') vs ('a','b|c') hashed
    identically before escaping."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)

    cols = ["x", "y"]
    h1 = co.df_hash(cols, [("a|b", "c")])
    h2 = co.df_hash(cols, [("a", "b|c")])
    assert h1 != h2
    # and multiplicity differences still hash apart
    h3 = co.df_hash(cols, [("a", "1"), ("a", "1"), ("b", "2")])
    h4 = co.df_hash(cols, [("a", "1"), ("b", "2"), ("b", "2")])
    assert h3 != h4
    # backslash escaping is itself unambiguous
    assert co.df_hash(cols, [("a\\", "b")]) != co.df_hash(cols, [("a", "\\b")])
