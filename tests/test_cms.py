"""Count-min sketch consumer (streaming/cms.py CmsConsumer).

Pinned: estimates equal exact live counts when the width avoids
collisions, through inserts, duplicate arrivals, value migrations, and
deletions (TURNSTILE: deletes subtract exactly — the retraction the HLL
plane cannot express); with a tiny width estimates are one-sided
(never undercount); an empty cell in any depth proves absence; nulls
never count; caught-up cycles are no-ops; config is pinned in the depth
tables and divergence is refused.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.cms import CmsConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SRC_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _src(spark, path):
    return SnapshotTable.create(
        spark, str(path), SRC_SCHEMA, key_cols=["conv_id", "turn_idx"],
        num_buckets=4, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )


def _row(conv, turn, tool, h, deleted=False):
    return (conv, turn, tool, deleted, h, f"{h}-x", h * 100 + turn)


def _mk(spark, src, path, width=256, depth=3):
    tgts = CmsConsumer.create_targets(
        spark, src, str(path), ["conv_id"], "tool", depth=depth, width=width,
        num_buckets=4,
    )
    return CmsConsumer(spark, src, tgts, "cms")


def _exact(src) -> dict:
    live = src.read_current(drop_tombstones=True).where(F.col("tool").isNotNull())
    return {
        (r.conv_id, r.tool): r.n
        for r in live.groupBy("conv_id", "tool").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _est(cons, values) -> dict:
    return {
        (r.conv_id, r.value): r.est for r in cons.estimate(values).collect()
    }


def test_lifecycle_exact_at_wide_width(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")

    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "x", 1), _row("a", 2, "y", 1),
         _row("b", 0, "x", 1), _row("b", 1, None, 1)], SRC_SCHEMA))
    cons.run()
    assert _est(cons, ["x", "y"]) == {("a", "x"): 2, ("a", "y"): 1, ("b", "x"): 1}
    assert _est(cons, ["x", "y"]) == {
        (g, v): n for (g, v), n in _exact(src).items()
    }

    # duplicate arrival + value migration (turn 1: x -> z at rev 2)
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 3, "x", 1), _row("a", 1, "z", 2)], SRC_SCHEMA))
    cons.run()
    want = _exact(src)
    assert _est(cons, ["x", "y", "z"]) == want
    assert want[("a", "x")] == 2 and want[("a", "z")] == 1

    # turnstile delete: the retraction must subtract exactly
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, None, 2, True), _row("b", 0, None, 2, True)], SRC_SCHEMA))
    cons.run()
    want = _exact(src)
    got = _est(cons, ["x", "y", "z"])
    assert got == want
    assert ("b", "x") not in got  # b's only x-row deleted: proven absent


def test_one_sided_at_tiny_width(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t", width=2, depth=2)
    rows = [_row("g", i, f"tool{i % 7}", 1) for i in range(40)]
    merge_upsert(src, spark.createDataFrame(rows, SRC_SCHEMA))
    cons.run()
    exact = _exact(src)
    vals = [f"tool{j}" for j in range(7)]
    got = _est(cons, vals)
    for j in range(7):
        key = ("g", f"tool{j}")
        assert got[key] >= exact[key]  # never undercounts


def test_caught_up_noop_and_validation(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "x", 1)], SRC_SCHEMA))
    cons.run()
    assert cons.run_once() == [None] * len(cons.targets)
    assert _est(cons, ["x"]) == {("a", "x"): 1}
    assert cons.pending_versions() == 0

    with pytest.raises(ValueError, match="non-empty"):
        cons.estimate([])
    with pytest.raises(ValueError, match="null"):
        cons.estimate(["x", None])
    with pytest.raises(ValueError, match="depth/width"):
        CmsConsumer.create_targets(spark, src, str(tmp_path / "bad"), ["conv_id"], "tool", depth=0)
    with pytest.raises(ValueError, match="not a cms depth table"):
        CmsConsumer(spark, src, [src], "x")
    with pytest.raises(ValueError, match="depth tables supplied"):
        CmsConsumer(spark, src, cons.targets[:1], "cms")


def test_non_string_value_column_probe_rendering(spark, tmp_path):
    """Probes over NON-STRING value columns must hash the same rendering
    maintenance used (Spark's cast-to-string, not Python str()). Boolean
    is the sharpest case: str(True)='True' but Spark renders 'true' — a
    Python-rendered probe would hash to untouched cells and report every
    present value as proven-absent (est 0, silent undercount). Long and
    timestamp columns ride the same engine-side path."""
    import datetime

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("height", T.LongType(), True),
            T.StructField("at", T.TimestampType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
            T.StructField("rev_height", T.LongType(), True),
            T.StructField("_rev", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "s"), schema, key_cols=["conv_id", "turn_idx"],
        num_buckets=2, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )
    ts = datetime.datetime(2026, 3, 1, 12, 30, 0)
    rows = [
        ("a", 0, True, 7, ts, False, 1, "1-x", 1),
        ("a", 1, True, 7, ts, False, 1, "1-x", 2),
        ("a", 2, False, 9, None, False, 1, "1-x", 3),
    ]
    merge_upsert(src, spark.createDataFrame(rows, schema))

    for value_col, probes, want in [
        ("flag", [True, False], {True: 2, False: 1}),
        ("height", [7, 9], {7: 2, 9: 1}),
        ("at", [ts], {ts: 2}),
    ]:
        tgts = CmsConsumer.create_targets(
            spark, src, str(tmp_path / f"t_{value_col}"), [], value_col,
            depth=2, width=128, num_buckets=2,
        )
        cons = CmsConsumer(spark, src, tgts, f"cms_{value_col}")
        cons.run()
        got = {r.value: r.est for r in cons.estimate(probes).collect()}
        assert got == want, value_col


def test_estimate_refuses_skewed_depth_cursors(spark, tmp_path):
    """A crash mid-cycle leaves depth cursors diverged; min-across-depths
    could then undercount the lagging depth's unapplied range, so probes
    must refuse until run() reconverges."""
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t", depth=2)
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "x", 1)], SRC_SCHEMA))
    cons.run()
    merge_upsert(src, spark.createDataFrame([_row("a", 1, "x", 1)], SRC_SCHEMA))
    # crash-mid-cycle simulation: only depth 0 applies the new version
    cons.subs[0].run_once()
    with pytest.raises(RuntimeError, match="depth cursors diverge"):
        cons.estimate(["x"])
    cons.run()  # reconverge
    assert _est(cons, ["x"]) == {("a", "x"): 2}


def test_run_once_pins_one_shared_tip(spark, tmp_path):
    """A clean run_once cycle leaves every depth cursor at the SAME
    version even if a concurrent writer lands a commit mid-cycle."""
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t", depth=3)
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "x", 1)], SRC_SCHEMA))
    cons.run_once()
    assert len({s.position() for s in cons.subs}) == 1


def test_global_sketch_no_group_cols(spark, tmp_path):
    """group_cols=[] — one global sketch over the whole table (the form
    the drive recipe exercises)."""
    src = _src(spark, tmp_path / "s")
    tgts = CmsConsumer.create_targets(
        spark, src, str(tmp_path / "t"), [], "tool", depth=2, width=64,
        num_buckets=2,
    )
    cons = CmsConsumer(spark, src, tgts, "g")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("b", 0, "x", 1), _row("b", 1, "y", 1)],
        SRC_SCHEMA))
    cons.run()
    got = {r.value: r.est for r in cons.estimate(["x", "y"]).collect()}
    assert got == {"x": 2, "y": 1}
