"""LWW winner semantics under hostile corners (ADVICE round 1).

Round 1 carried two physical strategies (a max_by struct aggregate and the
row_number window) whose winners could diverge on NaN / MIN_VALUE / null
orderings. Round 2 measured the window (with Spark's WindowGroupLimit rank
pushdown) equal-or-4-8x-faster and removed the aggregate path — these tests
pin the single path's semantics on exactly the corners that used to
diverge, plus the plan shape that makes it fast (see test_plans.py).
"""

from __future__ import annotations

import math

from cht_sync_spark.operators.lww import lww_dedup

MINL = -(2**63)
MAXL = 2**63 - 1


def test_long_desc_with_extremes(spark):
    rows = [
        ("a", MINL, 1), ("a", MAXL, 2), ("a", None, 3),
        ("b", None, 1), ("b", None, 2),
        ("c", -5, 1), ("c", -7, 2),
    ]
    df = spark.createDataFrame(rows, "k string, h long, seq long")
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=[("h", False), ("seq", False)]).collect()}
    assert got["a"]["h"] == MAXL          # MIN_VALUE/None lose desc
    assert got["b"]["seq"] == 2           # all-null h -> later seq wins
    assert got["c"]["h"] == -5


def test_bool_asc_delete_vs_live(spark):
    rows = [
        ("a", 2, False, 1), ("a", 2, True, 2),   # live beats delete at equal height
        ("b", 2, True, 1), ("b", 2, None, 2),    # null loses under asc_nulls_last
        ("c", 2, True, 3),
    ]
    df = spark.createDataFrame(rows, "k string, h long, _deleted boolean, seq long")
    order = [("h", False), ("_deleted", True), ("seq", False)]
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=order).collect()}
    assert got["a"]["_deleted"] is False
    assert got["b"]["_deleted"] is True  # real value beats null
    assert got["c"]["_deleted"] is True


def test_asc_long_min_value_no_ansi_overflow(spark):
    """Ascending longs with MIN_VALUE: the removed aggregate path negated
    the column, which throws ARITHMETIC_OVERFLOW under Spark 4 ANSI. The
    window path must simply pick the smallest value."""
    df = spark.createDataFrame(
        [("a", MINL, 1), ("a", 7, 2), ("a", None, 3)], "k string, pri long, seq long"
    )
    out = lww_dedup(df, key=["k"], order=[("pri", True), ("seq", False)]).collect()
    assert len(out) == 1 and out[0]["pri"] == MINL


def test_asc_double_nan_ordering(spark):
    """NaN sorts GREATER than any value in Spark, so under asc it loses to
    every real number — the corner the old numeric-negation trick flipped
    (-NaN == NaN)."""
    rows = [("a", float("nan"), 1), ("a", 3.5, 2), ("b", float("nan"), 1), ("b", None, 2)]
    df = spark.createDataFrame(rows, "k string, score double, seq long")
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=[("score", True), ("seq", False)]).collect()}
    assert got["a"]["score"] == 3.5
    assert math.isnan(got["b"]["score"])  # NaN still beats null (nulls_last)


def test_double_desc_with_nan(spark):
    rows = [("a", float("nan"), 1), ("a", 3.5, 2), ("b", 1.0, 1), ("b", 2.0, 2)]
    df = spark.createDataFrame(rows, "k string, score double, seq long")
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=[("score", False), ("seq", False)]).collect()}
    assert math.isnan(got["a"]["score"])  # NaN is greatest desc
    assert got["b"]["score"] == 2.0


def test_full_transcript_order_spec(spark):
    """The production LWW_ORDER spec (rev_height desc, _deleted asc, _rev
    desc, seq desc) over conflicting revisions, deletes and null fields."""
    rows = [
        ("a", 2, False, "2-bbb", 10), ("a", 2, False, "2-aaa", 11), ("a", 1, False, "1-zzz", 12),
        ("b", 2, True, "2-zzz", 1), ("b", 2, False, "2-aaa", 2),
        ("c", None, None, None, 5), ("c", 1, False, "1-aaa", 1),
        ("d", 3, True, "3-ddd", 9), ("d", 2, False, "2-eee", 10),
    ]
    df = spark.createDataFrame(rows, "k string, rev_height long, _deleted boolean, _rev string, seq long")
    order = [("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)]
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=order).collect()}
    assert got["a"]["_rev"] == "2-bbb"    # greater hash wins the conflict
    assert got["b"]["_deleted"] is False  # live beats delete at equal height
    assert got["c"]["rev_height"] == 1    # null height loses (nulls last)
    assert got["d"]["_deleted"] is True   # higher height wins even if delete
