"""Property-based tests (hypothesis) for the pure-Python pruning logic:
data skipping must NEVER drop a file slice that could contain a
matching row — the safety property correctness rests on (the row-level
refilter cannot recover a pruned file).

No SparkSession needed; these run in milliseconds and explore the
predicate/stat space far beyond the handwritten cases.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_0_10_0_spark.plans.pruning import leaf_possible, pred_possible

INTS = st.integers(min_value=-1000, max_value=1000)
OPS = st.sampled_from(["=", "==", "<", "<=", ">", ">="])


def _leaf_holds(op, row_v, lit):
    return {
        "=": row_v == lit, "==": row_v == lit,
        "<": row_v < lit, "<=": row_v <= lit,
        ">": row_v > lit, ">=": row_v >= lit,
    }[op]


@settings(max_examples=500)
@given(lo=INTS, hi=INTS, row=INTS, op=OPS, lit=INTS)
def test_leaf_never_prunes_a_matching_row(lo, hi, row, op, lit):
    mn, mx = min(lo, hi), max(lo, hi)
    row_v = mn + abs(row) % (mx - mn + 1)  # a row actually inside the file
    stats = {"c": (mn, mx, 0)}
    if _leaf_holds(op, row_v, lit):
        assert leaf_possible(stats, ("c", op, lit)), (
            f"pruned a file [{mn},{mx}] containing row {row_v} "
            f"matching c {op} {lit}"
        )


@settings(max_examples=300)
@given(
    lo=INTS, hi=INTS, row=INTS,
    tree=st.recursive(
        st.tuples(st.just("leaf"), OPS, INTS),
        lambda kids: st.tuples(
            st.sampled_from(["and", "or"]), st.lists(kids, min_size=1, max_size=3)
        ),
        max_leaves=8,
    ),
)
def test_tree_never_prunes_a_matching_row(lo, hi, row, tree):
    mn, mx = min(lo, hi), max(lo, hi)
    row_v = mn + abs(row) % (mx - mn + 1)
    stats = {"c": (mn, mx, 0)}

    def build(t):
        if t[0] == "leaf":
            return ("c", t[1], t[2])
        return (t[0], [build(k) for k in t[1]])

    def holds(t):
        if t[0] == "leaf":
            return _leaf_holds(t[1], row_v, t[2])
        kids = [holds(k) for k in t[1]]
        return all(kids) if t[0] == "and" else any(kids)

    if holds(tree):
        assert pred_possible(stats, build(tree))


@settings(max_examples=200)
@given(vals=st.lists(INTS, min_size=1, max_size=6), lo=INTS, hi=INTS, row=INTS)
def test_in_predicate_never_prunes_a_matching_row(vals, lo, hi, row):
    mn, mx = min(lo, hi), max(lo, hi)
    row_v = mn + abs(row) % (mx - mn + 1)
    stats = {"c": (mn, mx, 0)}
    if row_v in vals:
        assert leaf_possible(stats, ("c", "in", vals))


FLOATS = st.floats(
    min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=500)
@given(lo=INTS, hi=INTS, row=INTS, op=OPS, lit=FLOATS)
def test_float_literal_against_int_stats_never_prunes(lo, hi, row, op, lit):
    """Regression: _coerce used to truncate float literals toward zero
    (int(3.5) -> 3), so ``col < 3.5`` against int stats min=max=3 pruned
    a file whose row col=3 matches."""
    mn, mx = min(lo, hi), max(lo, hi)
    row_v = mn + abs(row) % (mx - mn + 1)
    stats = {"c": (mn, mx, 0)}
    if _leaf_holds(op, row_v, lit):
        assert leaf_possible(stats, ("c", op, lit)), (
            f"pruned a file [{mn},{mx}] containing row {row_v} "
            f"matching c {op} {lit}"
        )


def test_float_literal_truncation_regression():
    # the exact shapes from the review finding
    assert leaf_possible({"c": (3, 3, 0)}, ("c", "<", 3.5))
    assert leaf_possible({"c": (-2, -2, 0)}, ("c", ">", -2.5))
    assert leaf_possible({"c": (3, 7, 0)}, ("c", "in", [3.0, 99.5]))
    # string literal against numeric stats still compares numerically
    assert leaf_possible({"c": (3, 3, 0)}, ("c", "<", "3.5"))
    assert not leaf_possible({"c": (3, 3, 0)}, ("c", ">", "3.5"))


def test_cross_type_alignment_regression():
    """Code-review r5: cross-type (literal, stats) pairs must either be
    compared in VALUE order or keep the slice — never compared through
    Python str()/lexicographic renderings."""
    import datetime
    from decimal import Decimal

    # bool literal vs partition-path string stats: str(True)='True' never
    # equalled Spark's 'true' rendering → every boolean match was pruned
    assert leaf_possible({"flag": ("true", "true", 0)}, ("flag", "=", True))
    assert not leaf_possible({"flag": ("false", "false", 0)}, ("flag", "=", True))
    assert leaf_possible({"flag": ("true", "true", 0)}, ("flag", "in", [True]))
    # bool vs non-boolean string stats: un-comparable → keep
    assert leaf_possible({"flag": ("x", "y", 0)}, ("flag", "=", True))
    # Decimal/float literal vs numeric-STRING stats (Decimal footer stats
    # json-roundtrip as strings): '12.5' > '9.9' is lexicographically
    # False and pruned a file whose rows match. The numeric
    # interpretation needs the declared column type (diff-review r5: a
    # true STRING column's min/max are lexicographic bounds — '10'<'9' —
    # and reinterpreting them numerically falsely prunes).
    dt = {"d": "decimal(10,2)"}
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", Decimal("9.9")), dt)
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", 9.9), dt)
    assert not leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", Decimal("12.5")), dt)
    # same stats WITHOUT a numeric dtype: un-prunable range → keep
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", Decimal("12.5")))
    # string-column lexicographic stats: min='10' > max='9'; a numeric
    # reinterpretation would prune the matching row c='9'
    assert leaf_possible({"c": ("10", "9", 0)}, ("c", "=", 9), {"c": "string"})
    # point range (partition pseudo-stats) stays numerically comparable
    # even without a dtype
    assert leaf_possible({"p": ("7", "7", 0)}, ("p", "=", 7))
    assert not leaf_possible({"p": ("7", "7", 0)}, ("p", "=", 8))
    # non-finite literals keep the slice instead of raising
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", float("nan")), dt)
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", "<", float("inf")), dt)
    assert leaf_possible({"d": ("10.0", "12.5", 0)}, ("d", ">", Decimal("NaN")), dt)
    # Decimal literal vs numeric stats compares exactly, no truncation
    assert leaf_possible({"c": (3, 3, 0)}, ("c", "<", Decimal("3.5")))
    assert not leaf_possible({"c": (3, 3, 0)}, ("c", ">", Decimal("3.5")))
    # date/datetime literals vs ISO string stats: lexicographic == chrono
    assert leaf_possible(
        {"dt": ("2020-01-01", "2020-06-01", 0)},
        ("dt", ">=", datetime.date(2020, 3, 1)),
    )
    assert not leaf_possible(
        {"dt": ("2020-01-01", "2020-06-01", 0)},
        ("dt", ">", datetime.date(2020, 6, 1)),
    )
    # 'in' with an un-comparable element keeps the slice (the scalar ops
    # already did; 'in' used to treat coercion failure as a non-match)
    assert leaf_possible({"flag": (True, True, 0)}, ("flag", "in", [1]))
    assert leaf_possible({"s": ("a", "z", 0)}, ("s", "in", [object()]))


@settings(max_examples=200)
@given(op=OPS, lit=INTS, lo=INTS, hi=INTS)
def test_missing_or_null_stats_never_prune(op, lit, lo, hi):
    # absent column stats or NULL bounds must always keep the file
    assert leaf_possible({}, ("c", op, lit))
    assert leaf_possible({"c": (None, None, 3)}, ("c", op, lit))
    assert leaf_possible({"other": (min(lo, hi), max(lo, hi), 0)}, ("c", op, lit))


@settings(max_examples=50, deadline=None)  # first duckdb.connect ~300ms
@given(keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=20))
def test_sample_bucket_is_engine_portable(keys):
    """The sampling hash must produce IDENTICAL buckets in any BIGINT
    engine — here: pure Python vs DuckDB SQL (the oracle's side)."""
    import duckdb

    from hudi_0_10_0_spark.functions.sampling import _A1, _A2, _B1, _B2, _P

    def py_bucket(x):
        h = x % _P
        h = (h * _A1 + _B1) % _P
        h = (h * _A2 + _B2) % _P
        return h % 10000

    expr = (
        f"((((k % {_P}) * {_A1} + {_B1}) % {_P} * {_A2} + {_B2}) % {_P}) % 10000"
    )
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?::BIGINT[]) AS k)", [keys]
    ).fetchall()
    assert [r[0] for r in got] == [py_bucket(k) for k in keys]
