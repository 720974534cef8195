"""As-of join (union-merge form) and interval range join (bucketized
equi-join form).

Pins (1) backward-inclusive match semantics against hand-computed
expectations (equal-ts match, no-match nulls, tolerance null-out, forward
mirror), (2) full parity with DuckDB's native ASOF LEFT JOIN on the
events fixture, (3) the scale shape — no join operator at all in the
as-of plan, no nested-loop/cartesian in the range-join plan, and (4)
range-join boundary inclusivity plus exactly-once pair emission across
bucket seams.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.asof import asof_join, interval_point_join

BASE = dt.datetime(2025, 3, 1, 10, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _m(-60), 100),  # before any right event -> null match
            (1, _m(4), 101),  # between r0 and r1 -> r0
            (1, _m(5), 102),  # exactly at r1 -> inclusive match r1
            (1, _m(60), 103),  # long after r1 -> r1 (tolerance kills it)
            (2, _m(0), 104),  # user with no right rows at all
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _m(0), 900, 1.0), (1, _m(5), 901, 2.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    return left, right


def test_backward_inclusive_and_nulls(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", right_cols=["event_id"])
    got = {r["event_id"]: (r["ts_r"], r["event_id_r"]) for r in out.collect()}
    assert got[100] == (None, None)
    assert got[101] == (_m(0), 900)
    assert got[102] == (_m(5), 901)  # equal ts matches (inclusive)
    assert got[103] == (_m(5), 901)
    assert got[104] == (None, None)
    assert out.count() == left.count()  # left-join row preservation


def test_tolerance_nulls_far_matches(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user_id", right_cols=["event_id"], tolerance_seconds=600
    )
    got = {r["event_id"]: r["event_id_r"] for r in out.collect()}
    assert got[101] == 900 and got[102] == 901
    assert got[103] is None  # 55 min > 10 min tolerance


def test_forward_direction(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", right_cols=["event_id"], direction="forward")
    got = {r["event_id"]: r["event_id_r"] for r in out.collect()}
    assert got[100] == 900  # earliest right >= left
    assert got[101] == 901
    assert got[102] == 901  # equal ts inclusive in forward too
    assert got[103] is None  # nothing after
    assert got[104] is None


def test_asof_plan_has_no_join(frames):
    left, right = frames
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, no join operator at all
    assert "Window" in plan


def test_duckdb_asof_parity(spark):
    """Full-column parity with DuckDB's native ASOF LEFT JOIN on the events
    fixture — the same pairing the driver query exposes."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = asof_join(purchases, clicks, on="user_id", right_cols=["event_id"])
    got = {
        (r["user_id"], r["event_id"]): (r["ts_r"], r["event_id_r"]) for r in out.collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    exp_rows = con.sql(
        """
        WITH c AS (SELECT user_id, ts, max(event_id) AS event_id
                   FROM events WHERE event_type='click' GROUP BY 1, 2),
             p AS (SELECT user_id, ts, event_id FROM events WHERE event_type='purchase')
        SELECT p.user_id, p.event_id, c.ts, c.event_id
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        """
    ).fetchall()
    exp = {(u, pid): (cts, cid) for u, pid, cts, cid in exp_rows}
    assert got == exp and len(got) > 0


def test_interval_point_join_bounds_and_seams(spark):
    intervals = spark.createDataFrame(
        [
            (1, 10, _m(0), _m(30)),
            (1, 11, _m(29), _m(59)),  # spans a 30-min bucket seam
        ],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, 20, _m(0)),  # == start of iv 10 (inclusive)
            (1, 21, _m(30)),  # == end of iv 10 AND inside iv 11, on the seam
            (1, 22, _m(59)),  # == end of iv 11
            (1, 23, _m(60)),  # outside both
            (2, 24, _m(15)),  # wrong key
        ],
        "user_id long, pt_id long, ts timestamp",
    )
    out = interval_point_join(
        intervals, points, on="user_id", bucket_seconds=1800.0
    )
    pairs = sorted((r["iv_id"], r["pt_id"]) for r in out.collect())
    assert pairs == [(10, 20), (10, 21), (11, 21), (11, 22)]  # each pair exactly once

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_point_join_max_buckets_guard(spark):
    intervals = spark.createDataFrame(
        [(1, 10, _m(0), _m(10_000))], "user_id long, iv_id long, start_ts timestamp, end_ts timestamp"
    )
    points = spark.createDataFrame([(1, 20, _m(5))], "user_id long, pt_id long, ts timestamp")
    with pytest.raises(Exception, match="spans more than"):
        interval_point_join(
            intervals, points, on="user_id", bucket_seconds=60.0, max_buckets=16
        ).collect()
