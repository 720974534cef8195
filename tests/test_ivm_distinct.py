"""Exact COUNT(DISTINCT) maintenance (streaming/ivm.py DistinctCountConsumer).

Pins: the summary rows equal a full COUNT(DISTINCT) recompute after
inserts, duplicate arrivals, value-migrating updates, deletions that
vanish a value, and deletions that empty a group (retraction to absence);
nulls never count; replay is exactly-once (cursor re-check); refcounts
and summaries are committed atomically (never observable out of sync);
reseed rebuilds both levels; derived group keys migrate exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.ivm import DistinctCountConsumer
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
        spark, str(path), SRC_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )


def _row(conv, turn, tool, h, deleted=False):
    return (conv, turn, tool, deleted, h, f"{h}-x", h * 100 + turn)


def _mk(spark, src, path, name="dc"):
    tgt = DistinctCountConsumer.create_distinct_target(
        spark, src, str(path), ["conv_id"], "tool", num_buckets=8
    )
    return DistinctCountConsumer(spark, src, tgt, name, ["conv_id"], "tool")


def _want(src) -> dict:
    live = src.read_current(drop_tombstones=True).where(F.col("tool").isNotNull())
    return {
        r.conv_id: r.n
        for r in live.groupBy("conv_id").agg(F.countDistinct("tool").alias("n")).collect()
    }


def _got(cons) -> dict:
    return {r.conv_id: r.n_distinct for r in cons.counts().collect()}


def _refs(cons) -> dict:
    return {
        (r.conv_id, r["__v"]): r.n_rows
        for r in cons.refcounts().select("conv_id", "__v", "n_rows").collect()
    }


def test_distinct_tracks_recompute_through_lifecycle(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")

    # inserts: a has tools {x, y} (y twice), b has {x}, c only nulls
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "y", 1), _row("a", 2, "y", 1),
         _row("b", 0, "x", 1), _row("c", 0, None, 1)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 2, "b": 1} == _want(src)
    assert _refs(cons) == {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 1}

    # duplicate arrival: refcount moves, distinct count must NOT
    merge_upsert(src, spark.createDataFrame([_row("a", 3, "x", 1)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 2, "b": 1} == _want(src)
    assert _refs(cons)[("a", "x")] == 2

    # value-migrating update: turn 1's tool y -> z (rev 2 wins)
    merge_upsert(src, spark.createDataFrame([_row("a", 1, "z", 2)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 3, "b": 1} == _want(src)  # {x,y,z}
    assert _refs(cons)[("a", "y")] == 1

    # delete the last y-row: y vanishes from a
    merge_upsert(src, spark.createDataFrame([_row("a", 2, None, 2, True)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 2, "b": 1} == _want(src)  # {x,z}
    assert ("a", "y") not in _refs(cons)

    # empty group b entirely: retraction to absence (no summary row left)
    merge_upsert(src, spark.createDataFrame([_row("b", 0, None, 2, True)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 2} == _want(src)
    assert cons.target.read_current().where("conv_id = 'b'").count() == 0


def test_update_to_null_stops_counting(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "y", 1)], SRC_SCHEMA))
    cons.run()
    merge_upsert(src, spark.createDataFrame([_row("a", 0, None, 2)], SRC_SCHEMA))
    cons.run()
    assert _got(cons) == {"a": 1} == _want(src)


def test_exactly_once_caught_up_and_sole_owner(spark, tmp_path):
    """Additive state is not idempotent; exactly-once rests on (a) the
    atomic delta+cursor commit — there is no state where the fold landed
    but the cursor did not — and (b) the sole-owner fence + pinned-commit
    conflict re-check inherited from AggregateConsumer (pinned in
    test_ivm.py). Here: a caught-up consumer must be a strict no-op, and a
    second consumer NAME on the same target must be refused."""
    import pytest

    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "y", 1)], SRC_SCHEMA))
    cons.run()
    want_refs, want_counts = _refs(cons), _got(cons)
    v = cons.target.current_version()
    assert cons.run_once() is None  # caught up: no commit, no re-apply
    assert cons.target.current_version() == v
    assert _refs(cons) == want_refs and _got(cons) == want_counts
    other = DistinctCountConsumer(spark, src, cons.target, "dc2", ["conv_id"], "tool")
    with pytest.raises(ValueError, match="one additive target admits one"):
        other.run_once()


def test_levels_commit_atomically(spark, tmp_path):
    """Every committed snapshot must satisfy the invariant
    summary.n == count(refcount rows of the group) — there is no version
    where the two levels disagree."""
    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "y", 1), _row("b", 0, "x", 1)], SRC_SCHEMA))
    cons.run()
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 1, "z", 2), _row("b", 0, None, 2, True)], SRC_SCHEMA))
    cons.run()
    t = cons.target
    for v in range(1, t.current_version() + 1):
        df = t.read_current(version=v)
        if df.isEmpty():
            continue
        sums = df.where(F.col("__v").isNull()).select("conv_id", "n_rows")
        refs = df.where(F.col("__v").isNotNull()).groupBy("conv_id").agg(
            F.count("*").alias("n_rows")
        )
        assert sums.exceptAll(refs).count() == 0 and refs.exceptAll(sums).count() == 0, v


def test_reseed_and_derived_groups(spark, tmp_path):
    src = _src(spark, tmp_path / "s")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "y", 1), _row("b", 0, "x", 1)], SRC_SCHEMA))
    # derived outer group: bucket conversations by first letter
    group = [("clan", F.substring("conv_id", 1, 1))]
    tgt = DistinctCountConsumer.create_distinct_target(
        spark, src, str(tmp_path / "t"), group, "tool", num_buckets=8
    )
    cons = DistinctCountConsumer(spark, src, tgt, "dc", group, "tool")
    cons.reseed()
    got = {r.clan: r.n_distinct for r in cons.counts().collect()}
    assert got == {"a": 2, "b": 1}
    # incremental continues after reseed: migrate b's x -> y
    merge_upsert(src, spark.createDataFrame([_row("b", 0, "y", 2)], SRC_SCHEMA))
    cons.run()
    got = {r.clan: r.n_distinct for r in cons.counts().collect()}
    assert got == {"a": 2, "b": 1}
    assert {(r.clan, r["__v"]) for r in cons.refcounts().select("clan", "__v").collect()} == {
        ("a", "x"), ("a", "y"), ("b", "y"),
    }


def test_topk_values_heavy_hitters(spark, tmp_path):
    """topk_values: per-group top-k by live support from the refcount
    plane — exact through migrations and deletes, deterministic
    (support desc, value asc) tie-break, validated k."""
    import pytest

    src = _src(spark, tmp_path / "s")
    cons = _mk(spark, src, tmp_path / "t")
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, "x", 1), _row("a", 1, "x", 1), _row("a", 2, "y", 1),
         _row("a", 3, "y", 1), _row("a", 4, "z", 1), _row("b", 0, "q", 1)],
        SRC_SCHEMA))
    cons.run()
    got = [(r.conv_id, r.value, r.support, r.rank)
           for r in cons.topk_values(2).orderBy("conv_id", "rank").collect()]
    # a: x and y tie at 2 -> value asc breaks it; z (1) is cut at k=2
    assert got == [("a", "x", 2, 1), ("a", "y", 2, 2), ("b", "q", 1, 1)]

    # delete both x rows: y promotes to rank 1, z enters at rank 2
    merge_upsert(src, spark.createDataFrame(
        [_row("a", 0, None, 2, True), _row("a", 1, None, 2, True)], SRC_SCHEMA))
    cons.run()
    got = [(r.conv_id, r.value, r.support, r.rank)
           for r in cons.topk_values(2).where("conv_id = 'a'").orderBy("rank").collect()]
    assert got == [("a", "y", 2, 1), ("a", "z", 1, 2)]

    with pytest.raises(ValueError, match="k must be positive"):
        cons.topk_values(0).collect()
