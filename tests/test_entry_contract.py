"""Driver-contract invariants for __spark_entry__ (no Spark needed):
the correctness gate checks only the FIRST 50 entries of queries() in
registration order, so every non-TPC-H operator query must sit inside
that window, and every query needs a same-named oracle with matching
intent (TPC-H demos past the window stay covered by
tools/check_oracle.py's full sweep)."""

import __spark_entry__ as entry


def test_driver_window_holds_all_operator_queries():
    q = list(entry.queries().keys())
    window, rest = q[:50], q[50:]
    outside_non_tpch = [n for n in rest if not n.startswith("tpch_")]
    assert outside_non_tpch == [], (
        "operator queries pushed past the driver's 50-entry correctness "
        f"window: {outside_non_tpch} — reorder queries()"
    )
    assert len(q) == len(set(q))


def test_every_query_has_an_oracle():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q - o == set(), f"queries without oracle_sql: {sorted(q - o)}"
    assert o - q == set(), f"orphan oracle entries: {sorted(o - q)}"
