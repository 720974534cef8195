"""Row-level expectations on the model plane (ModelSpec.expectations —
dbt's accepted_values/custom tests and DLT expectations applied to the
engine's incremental models). Pins:

- 'drop' rules RETRACT failing rows (tombstone cascade): a row that
  starts failing after an edit leaves the stored model instead of going
  stale, and incremental == full rebuild;
- 'fail' rules abort the batch BEFORE any commit (exactly-once: the
  epoch never lands; the model catches up after the data is fixed);
- 'warn' rules never drop rows;
- editing the expectations factory changes the model identity (full
  refresh, like a transform edit);
- grouped models compose (group tombstone logic sees marked rows as
  emitted — no double tombstones).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.functions.quality import Expectation, ExpectationFailed
from cht_sync_spark.operators.models import ModelRunner, ModelSpec
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline


def _turns_transform(rows):
    return rows.select(
        "conv_id", "turn_idx", "role", "text", "seq", "rev_height", "_rev",
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("_deleted"),
    )


_TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


def _drop_rules():
    from cht_sync_spark.functions.quality import Expectation, accepted_values

    return [
        Expectation("known_role", accepted_values("role", ["user", "assistant", "tool"]), "drop"),
        Expectation("has_text", F.col("text").isNotNull() & (F.length("text") > 0), "drop"),
    ]


def _spec(name="turns_clean", expectations=_drop_rules, lww=None):
    return ModelSpec(
        name=name,
        key_cols=["conv_id", "turn_idx"],
        schema=_TURNS_SCHEMA,
        transform=_turns_transform,
        group_cols=None,
        lww_order=lww or [("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)],
        expectations=expectations,
    )


def _pipe(spark, feed_path, path, spec, **kw):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    return ReplayPipeline(
        spark, feed, f"{path}/landing", batch_size=150, num_buckets=4,
        models=[(spec, f"{path}/model")], **kw,
    )


def test_drop_rules_retract_and_match_rebuild(spark, feed_path, tmp_path):
    p = _pipe(spark, feed_path, tmp_path / "a", _spec())
    p.run()
    model = p.models[0].table
    got = model.read_current(drop_tombstones=True)
    # every surviving row passes both rules
    assert got.where(~F.col("role").isin("user", "assistant", "tool")).count() == 0
    assert got.where(F.col("text").isNull() | (F.length("text") == 0)).count() == 0
    # and the incremental state equals a from-scratch rebuild
    runner = p.models[0]
    landing_live = p.table.read_current()
    expected = _turns_transform(landing_live)
    for r in _drop_rules():
        expected = expected.withColumn(
            "_deleted", F.coalesce(F.col("_deleted"), F.lit(False)) | r.fails()
        )
    expected = expected.where(~F.col("_deleted"))
    assert got.count() == expected.count()
    assert got.exceptAll(expected.select(*got.columns)).count() == 0


def test_edit_into_violation_retracts_stored_row(spark, tmp_path):
    from cht_sync_spark.tables.format import SnapshotTable
    from pyspark.sql import Row

    landing_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
            T.StructField("rev_height", T.LongType(), True),
            T.StructField("_rev", T.StringType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    landing = SnapshotTable.create(
        spark, str(tmp_path / "landing"), landing_schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, bucket_cols=["conv_id"],
        lww_order=[("seq", False)],
    )
    runner = ModelRunner(spark, _spec(), str(tmp_path / "model"))

    def batch(items):
        return spark.createDataFrame(
            [Row(conv_id=c, turn_idx=t, role=r, text=x, seq=s, rev_height=s,
                 _rev=f"{s}-x", _deleted=False) for c, t, r, x, s in items],
            landing_schema,
        )

    b1 = batch([("a", 0, "user", "hello", 1)])
    landing.append_delta(b1)
    runner.run_increment(landing, b1, epoch=0)
    assert runner.table.read_current(drop_tombstones=True).count() == 1
    # the edit flips the row into violation (role becomes unknown)
    b2 = batch([("a", 0, "operator", "hello", 2)])
    landing.append_delta(b2)
    runner.run_increment(landing, b2, epoch=1)
    assert runner.table.read_current(drop_tombstones=True).count() == 0


def test_fail_rule_aborts_before_commit(spark, feed_path, tmp_path):
    def failing():
        return [Expectation("no_tools", F.col("role") != "tool", "fail")]

    spec = _spec(name="turns_failing", expectations=failing)
    p = _pipe(spark, feed_path, tmp_path / "f", spec)
    with pytest.raises(ExpectationFailed, match="no_tools"):
        p.run()
    runner = p.models[0]
    assert runner.last_epoch() == -1  # nothing committed: exactly-once holds
    assert runner.table.read_current().count() == 0


def test_warn_rules_keep_rows(spark, feed_path, tmp_path):
    def warning():
        return [Expectation("short_text", F.length("text") < 3, "warn")]

    spec = _spec(name="turns_warn", expectations=warning)
    p = _pipe(spark, feed_path, tmp_path / "w", spec)
    p.run()
    model = p.models[0].table
    live_landing = p.table.read_current(drop_tombstones=True).count()
    assert model.read_current(drop_tombstones=True).count() == live_landing


def test_expectation_edit_changes_identity(spark):
    a, b = _spec(), _spec(expectations=None)

    def other():
        return [Expectation("x", F.lit(True), "warn")]

    c = _spec(expectations=other)
    assert len({a.transform_hash(), b.transform_hash(), c.transform_hash()}) == 3
    with pytest.raises(ValueError, match="zero-arg factory"):
        _spec(expectations=[Expectation("x", F.lit(True))])


def test_tombstones_never_trip_fail_rules(spark, tmp_path):
    """A routine source delete flows through a model with a 'fail' rule:
    the tombstone's null payload must not abort the batch (Expectation's
    null-fails semantics judge LIVE rows only), and the retraction still
    cascades."""
    from cht_sync_spark.tables.format import SnapshotTable
    from pyspark.sql import Row

    def strict_text():
        return [Expectation("has_text", F.col("text").isNotNull(), "fail")]

    landing = SnapshotTable.create(
        spark, str(tmp_path / "landing"), _TURNS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, bucket_cols=["conv_id"],
        lww_order=[("seq", False)],
    )
    runner = ModelRunner(spark, _spec(name="strict", expectations=strict_text),
                         str(tmp_path / "model"))

    def batch(items):
        return spark.createDataFrame(
            [Row(conv_id=c, turn_idx=t, role=r, text=x, seq=s, rev_height=s,
                 _rev=f"{s}-x", _deleted=d) for c, t, r, x, s, d in items],
            _TURNS_SCHEMA,
        )

    b1 = batch([("a", 0, "user", "hello", 1, False)])
    landing.append_delta(b1)
    runner.run_increment(landing, b1, epoch=0)
    # the delete arrives as a tombstone stub: null role/text
    b2 = batch([("a", 0, None, None, 2, True)])
    landing.append_delta(b2)
    runner.run_increment(landing, b2, epoch=1)  # must not raise
    assert runner.table.read_current(drop_tombstones=True).count() == 0


def test_warn_counts_recorded(spark, feed_path, tmp_path):
    """'warn' violations are observable: the runner keeps the last
    check's counts (the dbt-test metrics surface)."""
    def warning():
        return [Expectation("short_text", F.length("text") < 3, "warn")]

    spec = _spec(name="turns_warn_counts", expectations=warning)
    p = _pipe(spark, feed_path, tmp_path / "wc", spec)
    p.run()
    runner = p.models[0]
    stats = runner.last_expectation_stats
    assert stats is not None and stats["n_rows"] > 0
    assert "fail_short_text" in stats


def test_grouped_model_composes(spark, feed_path, tmp_path):
    def conv_rules():
        return [Expectation("min_turns", F.col("n_turns") >= 2, "drop")]

    def conv_transform(landing):
        live = landing.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return (
            live.groupBy("conv_id")
            .agg(F.count("*").alias("n_turns"), F.max("seq").alias("seq"))
            .withColumn("_deleted", F.lit(False))
        )

    spec = ModelSpec(
        name="convs_min2",
        key_cols=["conv_id"],
        schema=T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("n_turns", T.LongType(), True),
                T.StructField("seq", T.LongType(), True),
                T.StructField("_deleted", T.BooleanType(), True),
            ]
        ),
        transform=conv_transform,
        group_cols=["conv_id"],
        expectations=conv_rules,
    )
    p = _pipe(spark, feed_path, tmp_path / "g", spec)
    p.run()
    got = p.models[0].table.read_current(drop_tombstones=True)
    assert got.count() > 0
    assert got.where(F.col("n_turns") < 2).count() == 0
    # oracle: groups with >= 2 live turns, computed from the landing table
    expect = (
        p.table.read_current(drop_tombstones=True)
        .groupBy("conv_id").count().where(F.col("count") >= 2).count()
    )
    assert got.count() == expect
