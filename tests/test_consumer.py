"""ChangelogConsumer — table-to-table incremental pipelines.

Pins: a consumer incrementally derives exactly the same target state a
full rebuild would; the cursor is exactly-once across crash windows and
replays; producer compaction is invisible; tombstones cascade under both
policies; transforms can reshape rows; lag probing is metadata-only; a
strict consumer refuses a COW (overwrite) producer while strict=False
over-delivers safely.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.consumer import ChangelogConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, text=x, seq=s, _deleted=d) for c, t, x, s, d in items],
        SCHEMA,
    )


def _mk_source(spark, path) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        lww_order=[("seq", False)],
    )


def _state(t, drop_tombstones=False):
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq)
        for r in t.read_current(drop_tombstones=drop_tombstones).collect()
    }


def test_incremental_equals_full_rebuild(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "mirror")
    c = ChangelogConsumer(spark, src, tgt, "mirror")

    src.append_delta(_rows(spark, [("a", 0, "t0", 1, False), ("a", 1, "t1", 2, False)]))
    r1 = c.run_once()
    assert r1 is not None and r1.rows == 2
    src.append_delta(_rows(spark, [("a", 0, "t0-edit", 3, False), ("b", 0, "u0", 4, False)]))
    src.append_delta(_rows(spark, [("a", 1, None, 5, True)]))  # tombstone
    r2 = c.run_once()
    assert r2 is not None and r2.from_version == r1.to_version
    assert _state(tgt) == _state(src)
    assert ("a", 0, "t0-edit", 3) in _state(tgt)
    # caught up: no-op, cursor does not move
    assert c.run_once() is None and c.pending_versions() == 0


def test_replay_is_noop_and_crash_window_heals(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")
    src.append_delta(_rows(spark, [("a", 0, "x", 1, False)]))
    c.run_once()
    v_applied = tgt.current_version()
    state = _state(tgt)

    # crash BEFORE the consumer committed: cursor unmoved -> the same
    # changelog range replays; idempotent merge leaves the state identical
    crashed = ChangelogConsumer(spark, src, tgt, "m")
    # simulate by rolling the cursor back (as if the merge never committed)
    tgt.commit(add_files=[], properties_update={"consumer.m.version": "1"})
    r = crashed.run_once()
    assert r is not None
    assert _state(tgt) == state
    # the replayed merge added no new data files beyond the property commits
    assert tgt.current_version() > v_applied  # commits happened...
    assert _state(tgt) == state  # ...but state is byte-identical


def test_producer_compaction_is_invisible(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")
    src.append_delta(_rows(spark, [("a", 0, "x", 1, False)]))
    c.run_once()
    src.compact()  # physical-only rewrite restates the whole table...
    src.append_delta(_rows(spark, [("b", 0, "y", 2, False)]))
    r = c.run_once()
    assert r is not None and r.rows == 1  # ...but only the real change flows
    assert _state(tgt) == _state(src)
    # a compaction-only range advances the cursor with a data-free commit
    src.compact()
    r2 = c.run_once()
    assert r2 is not None and r2.rows == 0
    assert c.run_once() is None


def test_transform_and_drop_tombstones(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    tgt = SnapshotTable.create(
        spark, str(tmp_path / "tgt"), out_schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, lww_order=[("seq", False)],
    )

    def tf(ch):
        return ch.select(
            "conv_id", "turn_idx",
            F.length(F.coalesce(F.col("text"), F.lit(""))).cast("int").alias("n_chars"),
            "seq", "_deleted",
        )

    c = ChangelogConsumer(spark, src, tgt, "typed", transform=tf, tombstones="drop")
    src.append_delta(_rows(spark, [("a", 0, "hello", 1, False), ("a", 1, "hi", 2, False)]))
    c.run_once()
    src.append_delta(_rows(spark, [("a", 1, None, 3, True)]))  # delete turn 1
    c.run_once()
    got = {(r.conv_id, r.turn_idx, r.n_chars) for r in tgt.read_current().collect()}
    assert got == {("a", 0, 5)}  # tombstone physically dropped


def test_strict_refuses_cow_producer_nonstrict_over_delivers(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    merge_upsert(src, _rows(spark, [("a", 0, "x", 1, False)]))  # COW: 'overwrite'
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    strict = ChangelogConsumer(spark, src, tgt, "m")
    with pytest.raises(ValueError, match="logical rewrite"):
        strict.run_once()
    relaxed = ChangelogConsumer(spark, src, tgt, "m", strict=False)
    r = relaxed.run_once()
    assert r is not None
    assert _state(tgt) == _state(src)
    # over-delivery on replayed rewrites stays idempotent
    merge_upsert(src, _rows(spark, [("a", 0, "x2", 2, False)]))
    relaxed.run_once()
    assert _state(tgt) == _state(src)


def test_drain_loop_and_pending(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")
    for i in range(3):
        src.append_delta(_rows(spark, [("a", i, f"t{i}", i + 1, False)]))
    assert c.pending_versions() == 3
    results = c.run(max_cycles=5)
    assert sum(r.rows for r in results) == 3
    assert c.pending_versions() == 0
    assert _state(tgt) == _state(src)


def test_reseed_recovers_from_producer_rollback(spark, tmp_path):
    # rollback makes the changelog uncrossable AND un-mergeable (restored
    # rows are LWW-older than what the target applied); reseed rebuilds the
    # target from current state + advances the cursor atomically
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")
    src.append_delta(_rows(spark, [("a", 0, "x", 1, False)]))
    keep_v = src.current_version()
    src.append_delta(_rows(spark, [("a", 0, "x2", 2, False), ("b", 0, "y", 3, False)]))
    c.run_once()
    assert _state(tgt) == {("a", 0, "x2", 2), ("b", 0, "y", 3)}
    src.rollback(keep_v)  # drops b entirely and downgrades a to seq 1
    with pytest.raises(ValueError, match="rollback"):
        c.run_once()
    r = c.reseed()
    assert r.merge is None and r.rows == 1
    assert _state(tgt) == {("a", 0, "x", 1)}  # LWW alone could never do this
    assert c.run_once() is None  # cursor advanced past the rollback
    # incremental consumption resumes normally afterwards
    src.append_delta(_rows(spark, [("c", 0, "z", 9, False)]))
    c.run_once()
    assert _state(tgt) == {("a", 0, "x", 1), ("c", 0, "z", 9)}


def test_reseed_applies_transform_and_tombstone_policy(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    src.append_delta(_rows(spark, [("a", 0, "x", 1, False), ("a", 1, "gone", 2, True)]))
    keep_v = src.current_version()
    src.append_delta(_rows(spark, [("a", 2, "extra", 3, False)]))

    def upper(df):
        return df.withColumn("text", F.upper(F.col("text")))

    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m", transform=upper, tombstones="drop")
    c.run_once()
    src.rollback(keep_v)
    r = c.reseed()
    # transform ran over the synthetic full-state slice; tombstones dropped
    assert _state(tgt) == {("a", 0, "X", 1)}
    assert r.rows == 1 and r.to_version == src.current_version()


def test_consumer_follows_additive_source_evolution(spark, tmp_path):
    """T11 across the consumer boundary: when the producer evolves
    additively mid-stream (new column), the next consumed cycle evolves
    the target through the merge's evolve path — pre-evolution target
    rows read NULL for the new column, exactly like the landing table's
    own additive evolution."""
    src = _mk_source(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")

    src.append_delta(_rows(spark, [("a", 0, "t0", 1, False)]))
    c.run_once()
    assert "tool" not in tgt.snapshot().schema.names

    evolved = _rows(spark, [("b", 0, "u0", 2, False)]).withColumn(
        "tool", F.lit("search")
    )
    # producer evolves additively on the MOR append path (the landing
    # table's in-flight evolution shape, test_evolution.py)
    src.append_delta(evolved, new_schema=src.evolve_schema(evolved.schema))
    r = c.run_once()
    assert r is not None and r.rows == 1
    assert "tool" in tgt.snapshot().schema.names
    got = {(x.conv_id, x.turn_idx, x.tool) for x in tgt.read_current().collect()}
    assert got == {("a", 0, None), ("b", 0, "search")}
    # steady state after evolution: replay/no-op and parity hold
    assert c.run_once() is None
    assert _state(tgt) == _state(src)
