"""Incremental view maintenance (streaming/ivm.py): algebraic aggregates
maintained from the changelog with retractions recovered via time-travel
preimages — equality with full recompute, retraction-to-absence, loser-event
zero-delta, exactly-once under replay/races, and reseed recovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.ivm import AggregateConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SRC_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("_rev", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

def MEASURES():
    # built lazily: Column construction needs an active session
    return {
        "chars": F.length("text"),
        "tool_calls": F.when(F.col("tool").isNotNull(), F.lit(1)).otherwise(0),
    }


def _src(spark, path):
    return SnapshotTable.create(
        spark, str(path), SRC_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},  # COW producer: exact change files
    )


def _row(conv, turn, text, h, deleted=False, tool=None):
    return (conv, turn, text, tool, deleted, h, f"{h}-x", h * 100 + turn)


def _consumer(spark, src, path, name="agg"):
    tgt = AggregateConsumer.create_target(
        spark, src, str(path), ["conv_id"], MEASURES(), num_buckets=8
    )
    return AggregateConsumer(spark, src, tgt, name, ["conv_id"], MEASURES())


def _recompute(src):
    live = src.read_current(drop_tombstones=True)
    return live.groupBy("conv_id").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.when(F.col("tool").isNotNull(), F.lit(1)).otherwise(0)).alias("tool_calls"),
    )


def _assert_matches(cons):
    got = cons.target.read_current().select("conv_id", "n_rows", "chars", "tool_calls")
    want = _recompute(cons.source)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0, (
        f"got={sorted(map(tuple, got.collect()))} want={sorted(map(tuple, want.collect()))}"
    )


def test_incremental_equals_recompute_with_retractions(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _consumer(spark, src, tmp_path / "t")

    # cycle 1: two groups
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "hello", 1), _row("a", 1, "world!!", 1, tool="s"),
         _row("b", 0, "xyz", 1)], SRC_SCHEMA))
    r1 = cons.run_once()
    assert r1 is not None and r1.groups_changed == 2
    _assert_matches(cons)

    # cycle 2: update shrinks a's text (retract old contribution), delete
    # ALL of b (group retracts to absence), insert new group c
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "hi", 2), _row("b", 0, None, 2, deleted=True),
         _row("c", 5, "fresh", 1, tool="t")], SRC_SCHEMA))
    r2 = cons.run_once()
    assert r2 is not None
    _assert_matches(cons)
    rows = {r["conv_id"]: r for r in cons.target.read_current().collect()}
    assert "b" not in rows, "fully-deleted group must retract to absence"
    assert rows["a"]["n_rows"] == 2 and rows["a"]["chars"] == len("hi") + len("world!!")
    assert rows["c"]["tool_calls"] == 1

    # cycle 3: caught up -> None; replaying is a no-op (cursor moved)
    assert cons.run_once() is None
    _assert_matches(cons)


def test_losing_late_event_nets_zero_delta(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "current", 5)], SRC_SCHEMA))
    cons.run_once()
    before = cons.target.read_current().collect()

    # an out-of-order OLDER revision arrives: landing LWW keeps the stored
    # row; the aggregate must not move either
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "stale-longer-text", 2)], SRC_SCHEMA))
    r = cons.run_once()
    assert r is not None and r.groups_changed == 0
    assert cons.target.read_current().collect() == before
    _assert_matches(cons)


def test_same_name_concurrent_consumer_cannot_double_apply(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons1 = _consumer(spark, src, tmp_path / "t")
    cons2 = AggregateConsumer(spark, src, cons1.target, "agg", ["conv_id"], MEASURES())
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "abcd", 1)], SRC_SCHEMA))
    assert cons1.run_once() is not None
    # second consumer at the advanced cursor: nothing to apply (the additive
    # state is not idempotent — the cursor re-check is the guard)
    assert cons2.run_once() is None
    _assert_matches(cons1)


def test_multi_version_range_in_one_cycle(spark, tmp_path):
    """A lagged consumer crosses several source commits at once: the fold
    must net updates within the range (insert+update+delete of the same key
    collapses) and the preimage must come from the CURSOR version."""
    src = _src(spark, tmp_path / "s")
    cons = _consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "one", 1), _row("d", 0, "keep", 1)], SRC_SCHEMA))
    cons.run_once()
    # three commits while the consumer sleeps
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "two-longer", 2)], SRC_SCHEMA))
    merge_upsert(src, spark.createDataFrame([_row("a", 1, "sibling", 1)], SRC_SCHEMA))
    merge_upsert(src, spark.createDataFrame([_row("a", 0, None, 3, deleted=True)], SRC_SCHEMA))
    r = cons.run_once()
    assert r is not None and r.to_version == src.current_version()
    _assert_matches(cons)
    rows = {r["conv_id"]: r for r in cons.target.read_current().collect()}
    # a:0 inserted->updated->deleted nets to: only a:1 remains
    assert rows["a"]["n_rows"] == 1 and rows["a"]["chars"] == len("sibling")
    assert rows["d"]["n_rows"] == 1


def test_reseed_recovers_uncrossable_changelog(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "aa", 1), _row("b", 0, "bb", 1)], SRC_SCHEMA))
    cons.run_once()
    # a logical rewrite (full overwrite) breaks the incremental contract
    live = src.read_current().where(F.col("conv_id") != "b")
    src.overwrite(live)
    with pytest.raises(ValueError, match="logical rewrite"):
        cons.run_once()
    cons.reseed()
    _assert_matches(cons)
    assert cons.run_once() is None  # cursor advanced by the reseed


def EXT_MEASURES():
    from cht_sync_spark.streaming.ivm import Measure

    return {
        "max_h": Measure(F.col("rev_height"), kind="max"),
        "any_tool": Measure(F.col("tool").isNotNull(), kind="max"),  # bool_or
        # arg_min(text, turn_idx): min over struct(order, value)
        "first_text": Measure(
            F.struct(F.col("turn_idx"), F.col("text")), kind="min"
        ),
    }


def _ext_consumer(spark, src, path):
    tgt = AggregateConsumer.create_target(
        spark, src, str(path), ["conv_id"], EXT_MEASURES(), num_buckets=8
    )
    return AggregateConsumer(spark, src, tgt, "ext", ["conv_id"], EXT_MEASURES())


def _ext_recompute(src):
    live = src.read_current(drop_tombstones=True)
    return live.groupBy("conv_id").agg(
        F.count("*").alias("n_rows"),
        F.max("rev_height").alias("max_h"),
        F.max(F.col("tool").isNotNull()).alias("any_tool"),
        F.min(F.struct("turn_idx", "text")).alias("first_text"),
    )


def _assert_ext_matches(cons):
    got = cons.target.read_current().select(
        "conv_id", "n_rows", "max_h", "any_tool", "first_text"
    )
    want = _ext_recompute(cons.source)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0, (
        f"got={sorted(got.collect())} want={sorted(want.collect())}"
    )


def test_extremum_dominating_and_untouched_skip_recompute(spark, tmp_path):
    """Inserting a dominating value or touching a non-extremum row must
    never trigger the per-group recompute path."""
    src = _src(spark, tmp_path / "s")
    cons = _ext_consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "alpha", 3), _row("a", 1, "beta", 1, tool="s")], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 0
    _assert_ext_matches(cons)

    # dominating arrival: new key at height 9 — extremum replaced in place
    merge_upsert(src, spark.createDataFrame([_row("a", 2, "gamma", 9)], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 0
    _assert_ext_matches(cons)

    # non-holder update: a:1 re-edited at height 2 (< stored max 9), tool
    # kept — no measure's extremum is retracted, so no recompute
    merge_upsert(src, spark.createDataFrame([_row("a", 1, "beta2", 2, tool="s")], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 0
    _assert_ext_matches(cons)

    # dropping the ONLY tool row's tool field retracts the bool_or extremum
    # — that one genuinely needs the group recompute (and gets it right)
    merge_upsert(src, spark.createDataFrame([_row("a", 1, "beta3", 3)], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 1
    _assert_ext_matches(cons)
    rows = {x["conv_id"]: x for x in cons.target.read_current().collect()}
    assert rows["a"]["any_tool"] is False


def test_extremum_retraction_recomputes_only_that_group(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _ext_consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "low", 1), _row("a", 1, "high", 7),
         _row("b", 0, "only", 2)], SRC_SCHEMA))
    cons.run_once()

    # delete a's max-holding row AND touch b without retracting its max:
    # exactly one group recomputes
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 1, None, 8, deleted=True), _row("b", 1, "more", 1)], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 1
    _assert_ext_matches(cons)
    rows = {x["conv_id"]: x for x in cons.target.read_current().collect()}
    assert rows["a"]["max_h"] == 1  # fell back to the surviving row
    # arg_min retraction: delete a's turn 0 (the first_text holder) too
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, None, 9, deleted=True)], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 0  # group 'a' retracted to absence, no history scan
    _assert_ext_matches(cons)
    assert "a" not in {x["conv_id"] for x in cons.target.read_current().collect()}


def test_extremum_mixed_with_sums_matches_recompute(spark, feed_path, tmp_path):
    """Mixed sum+extremum measures over the real synthetic feed (conflicts,
    delete-vs-edit, height-3 deletes): incremental == recompute after a
    mid-replay cycle and at the end."""
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.ivm import Measure
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
                          table_properties={"cdc.enabled": "true"})
    measures = {
        "chars": F.length("text"),
        "max_h": Measure(F.col("rev_height"), kind="max"),
        "min_turn": Measure(F.col("turn_idx"), kind="min"),
    }
    tgt = AggregateConsumer.create_target(
        spark, pipe.table, str(tmp_path / "agg"), ["conv_id"], measures, num_buckets=8
    )
    cons = AggregateConsumer(spark, pipe.table, tgt, "mix", ["conv_id"], measures)
    pipe.run(max_batches=2)
    cons.run()
    pipe.run()
    cons.run()
    live = pipe.table.read_current(drop_tombstones=True)
    want = live.groupBy("conv_id").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length("text")).alias("chars"),
        F.max("rev_height").alias("max_h"),
        F.min("turn_idx").alias("min_turn"),
    )
    got = tgt.read_current().select("conv_id", "n_rows", "chars", "max_h", "min_turn")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_derived_group_migration(spark, tmp_path):
    """Derived group keys ((name, expr) pairs): an UPDATE that moves a row
    between derived groups must retract from the old group and add to the
    new one; fully-vacated derived groups disappear."""
    src = _src(spark, tmp_path / "s")
    grp = [("hband", (F.col("seq") / F.lit(100)).cast("long"))]  # = rev height
    measures = {"chars": F.length("text")}
    tgt = AggregateConsumer.create_target(
        spark, src, str(tmp_path / "t"), grp, measures, num_buckets=4
    )
    cons = AggregateConsumer(spark, src, tgt, "mig", grp, measures)
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "one", 1), _row("b", 0, "two", 1)], SRC_SCHEMA))
    cons.run_once()
    rows = {r["hband"]: r for r in tgt.read_current().collect()}
    assert rows[1]["n_rows"] == 2

    # update a:0 to height 2 — its row migrates from band 1 to band 2
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "one+", 2)], SRC_SCHEMA))
    cons.run_once()
    rows = {r["hband"]: r for r in tgt.read_current().collect()}
    assert rows[1]["n_rows"] == 1 and rows[1]["chars"] == len("two")
    assert rows[2]["n_rows"] == 1 and rows[2]["chars"] == len("one+")

    # move the last band-1 row too: band 1 must vanish entirely
    merge_upsert(src, spark.createDataFrame([_row("b", 0, "two+", 2)], SRC_SCHEMA))
    cons.run_once()
    rows = {r["hband"]: r for r in tgt.read_current().collect()}
    assert set(rows) == {2} and rows[2]["n_rows"] == 2
    # shadowing a real source column is rejected at construction
    with pytest.raises(ValueError, match="shadow"):
        AggregateConsumer(spark, src, tgt, "bad", [("text", F.lit("x"))], measures)


def test_derived_group_daily_rollup_matches_recompute(spark, feed_path, tmp_path):
    """The canonical dashboard shape — per-(day, source) rollup — over the
    real feed, incremental == recompute."""
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
                          table_properties={"cdc.enabled": "true"})
    grp = [("day", F.to_date("ts")), "source"]
    measures = {"chars": F.length("text")}
    tgt = AggregateConsumer.create_target(
        spark, pipe.table, str(tmp_path / "agg"), grp, measures, num_buckets=4
    )
    cons = AggregateConsumer(spark, pipe.table, tgt, "roll", grp, measures)
    pipe.run(max_batches=2)
    cons.run()
    pipe.run()
    cons.run()
    live = pipe.table.read_current(drop_tombstones=True)
    want = live.groupBy(F.to_date("ts").alias("day"), F.col("source")).agg(
        F.count("*").alias("n_rows"), F.sum(F.length("text")).alias("chars")
    )
    got = tgt.read_current().select("day", "source", "n_rows", "chars")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_second_consumer_name_on_same_target_rejected(spark, tmp_path):
    """Two DIFFERENT-named consumers on one additive target would each
    apply every range once — silent double-counting. Fail fast instead;
    reseed() under the new name is the takeover path (clears the stale
    cursor so the rename is not bricked forever)."""
    src = _src(spark, tmp_path / "s")
    cons1 = _consumer(spark, src, tmp_path / "t", name="agg")
    merge_upsert(src, spark.createDataFrame([_row("a", 0, "x", 1)], SRC_SCHEMA))
    cons1.run_once()
    rogue = AggregateConsumer(spark, src, cons1.target, "other", ["conv_id"], MEASURES())
    with pytest.raises(ValueError, match="one additive target admits one consumer"):
        rogue.run_once()
    rogue.reseed()  # documented takeover: rebuild + clear stale cursor
    assert "consumer.agg.version" not in cons1.target.snapshot().properties
    _assert_matches(rogue)
    assert rogue.run_once() is None  # and it owns the cursor now
    with pytest.raises(ValueError, match="one additive target"):
        cons1.run_once()  # the OLD name is now the rejected one


def test_null_group_key_is_one_group(spark, tmp_path):
    """A null derived group key (to_date over null ts is the flagship) is a
    real group: the null-safe state⟗delta join must fold consecutive
    cycles into ONE row, never split the group into duplicates."""
    src = _src(spark, tmp_path / "s")
    from cht_sync_spark.streaming.ivm import Measure

    grp = [("tchar", F.substring(F.col("text"), 1, 1))]  # null text -> null key
    measures = {"heights": Measure(F.col("rev_height"), kind="max")}
    tgt = AggregateConsumer.create_target(
        spark, src, str(tmp_path / "t"), grp, measures, num_buckets=4
    )
    cons = AggregateConsumer(spark, src, tgt, "nullg", grp, measures)
    # _row(text=None) is LIVE with a null contribution and a NULL group key
    merge_upsert(src, spark.createDataFrame([_row("a", 0, None, 1)], SRC_SCHEMA))
    cons.run_once()
    merge_upsert(src, spark.createDataFrame([_row("b", 0, None, 2)], SRC_SCHEMA))
    cons.run_once()
    rows = tgt.read_current().collect()
    assert len(rows) == 1 and rows[0]["tchar"] is None and rows[0]["n_rows"] == 2
    # extremum retraction inside the null group recomputes it (null-safe
    # semi-join), never drops or duplicates it
    merge_upsert(src, spark.createDataFrame([_row("b", 0, None, 3, deleted=True)], SRC_SCHEMA))
    r = cons.run_once()
    assert r.groups_recomputed == 1
    rows = tgt.read_current().collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 1 and rows[0]["heights"] == 1


def test_all_null_contributions_store_zero_on_both_paths(spark, tmp_path):
    """A group whose live rows all carry null contributions must store the
    SAME value (0) whether built incrementally or by the exact-recompute /
    reseed path — the maintained invariant is 'sum of non-null
    contributions, 0 when none'."""
    src = _src(spark, tmp_path / "s")
    cons = _consumer(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame([_row("z", 0, None, 1)], SRC_SCHEMA))
    cons.run_once()
    inc = {r["conv_id"]: r for r in cons.target.read_current().collect()}
    assert inc["z"]["chars"] == 0  # incremental path
    cons.reseed()
    res = {r["conv_id"]: r for r in cons.target.read_current().collect()}
    assert res["z"]["chars"] == 0  # exact path agrees
    assert inc["z"] == res["z"]


def test_pipeline_feed_incremental_consumption(spark, feed_path, tmp_path):
    """Against the real synthetic feed replayed through the pipeline: consume
    mid-replay and after — the aggregate equals a full recompute both times
    (conflict winners, delete-vs-edit, height-3 deletes all retract right)."""
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
                          table_properties={"cdc.enabled": "true"})
    tgt = AggregateConsumer.create_target(
        spark, pipe.table, str(tmp_path / "agg"), ["conv_id"], MEASURES(), num_buckets=8
    )
    cons = AggregateConsumer(spark, pipe.table, tgt, "agg", ["conv_id"], MEASURES())

    pipe.run(max_batches=2)
    cons.run()
    _assert_matches(cons)
    pipe.run()  # drain the rest; the consumer catches up across the gap
    cons.run()
    _assert_matches(cons)
