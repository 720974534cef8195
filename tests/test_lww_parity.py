"""Property-parity of the two LWW physical strategies (ADVICE round 1).

The max_by struct-aggregate fast path and the row_number window fallback
must pick the SAME winner for every order spec, including the hostile
corners: nulls, NaN (float/double), and MIN_VALUE longs (whose negation
throws under Spark 4 ANSI — the reason the fast path no longer inverts
numerics for ascending specs).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.operators.lww import _max_wins_exprs, lww_dedup, lww_order_cols

MINL = -(2**63)
MAXL = 2**63 - 1


def _window_reference(df, key, order):
    w = Window.partitionBy(*key).orderBy(*lww_order_cols(order))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def _winners(df, key, order):
    fast = {r["k"]: r.asDict() for r in lww_dedup(df, key=key, order=order).collect()}
    ref = {r["k"]: r.asDict() for r in _window_reference(df, key, order).collect()}
    return fast, ref


def test_parity_long_desc_with_extremes(spark):
    rows = [
        ("a", MINL, 1), ("a", MAXL, 2), ("a", None, 3),
        ("b", None, 1), ("b", None, 2),
        ("c", -5, 1), ("c", -7, 2),
    ]
    df = spark.createDataFrame(rows, "k string, h long, seq long")
    order = [("h", False), ("seq", False)]
    assert _max_wins_exprs(df, order) is not None  # fast path engages
    fast, ref = _winners(df, ["k"], order)
    assert fast == ref
    assert fast["a"]["h"] == MAXL and fast["b"]["seq"] == 2 and fast["c"]["h"] == -5


def test_parity_bool_asc_inversion(spark):
    rows = [
        ("a", 2, False, 1), ("a", 2, True, 2),   # live beats delete at equal height
        ("b", 2, True, 1), ("b", 2, None, 2),    # null loses under asc_nulls_last
        ("c", 2, True, 3),
    ]
    df = spark.createDataFrame(rows, "k string, h long, _deleted boolean, seq long")
    order = [("h", False), ("_deleted", True), ("seq", False)]
    assert _max_wins_exprs(df, order) is not None
    fast, ref = _winners(df, ["k"], order)
    assert fast == ref
    assert fast["a"]["_deleted"] is False and fast["b"]["_deleted"] is True


def test_asc_long_min_value_no_ansi_overflow(spark):
    """Ascending longs must take the window path: negating MIN_VALUE would
    throw ARITHMETIC_OVERFLOW under ANSI. Verify no fast path, no crash,
    right winner (smallest value wins asc)."""
    df = spark.createDataFrame(
        [("a", MINL, 1), ("a", 7, 2), ("a", None, 3)], "k string, pri long, seq long"
    )
    order = [("pri", True), ("seq", False)]
    assert _max_wins_exprs(df, order) is None  # falls back to window
    out = lww_dedup(df, key=["k"], order=order).collect()
    assert len(out) == 1 and out[0]["pri"] == MINL


def test_asc_double_nan_ordering(spark):
    """Ascending doubles: NaN sorts GREATER than any value in Spark, so
    under asc it must lose to every real number — the case the old
    negation fast path got wrong (-NaN == NaN flips nothing)."""
    rows = [("a", float("nan"), 1), ("a", 3.5, 2), ("b", float("nan"), 1), ("b", None, 2)]
    df = spark.createDataFrame(rows, "k string, score double, seq long")
    order = [("score", True), ("seq", False)]
    assert _max_wins_exprs(df, order) is None
    got = {r["k"]: r for r in lww_dedup(df, key=["k"], order=order).collect()}
    assert got["a"]["score"] == 3.5  # real number beats NaN under asc
    assert math.isnan(got["b"]["score"])  # NaN still beats null (nulls_last)


def test_parity_double_desc_with_nan(spark):
    rows = [("a", float("nan"), 1), ("a", 3.5, 2), ("b", 1.0, 1), ("b", 2.0, 2)]
    df = spark.createDataFrame(rows, "k string, score double, seq long")
    order = [("score", False), ("seq", False)]
    assert _max_wins_exprs(df, order) is not None  # desc double stays fast
    fast, ref = _winners(df, ["k"], order)
    for k in fast:
        fa, rb = fast[k]["score"], ref[k]["score"]
        assert (math.isnan(fa) and math.isnan(rb)) or fa == rb
    assert math.isnan(fast["a"]["score"])  # NaN is greatest desc


def test_parity_full_transcript_order_spec(spark):
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
    assert _max_wins_exprs(df, order) is not None
    fast, ref = _winners(df, ["k"], order)
    assert fast == ref
    assert fast["a"]["_rev"] == "2-bbb"   # greater hash wins the conflict
    assert fast["b"]["_deleted"] is False  # live beats delete at equal height
    assert fast["c"]["rev_height"] == 1    # null height loses (nulls last)
    assert fast["d"]["_deleted"] is True   # higher height wins even if delete
