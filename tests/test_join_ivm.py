"""Incrementally-maintained N:1 equi-join (streaming/join.py): equality
with full recompute under interleaved deltas on both inputs, dim-delete
retraction (inner) / null-out (left), replay idempotence, co-located
reverse-delta bucket pruning, purge ghost-delete cascade, and reseed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.join import JoinConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("author", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

DIM_SCHEMA = T.StructType(
    [
        T.StructField("author", T.StringType(), False),
        T.StructField("team", T.StringType(), True),
        T.StructField("rank", T.IntegerType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
        T.StructField("rev_height", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

RMAP = {"team": "team", "rank": "author_rank"}


def _lrow(conv, turn, author, text, h, deleted=False):
    return (conv, turn, author, text, deleted, h, h * 10_000 + turn)


def _drow(author, team, rank, h, deleted=False):
    return (author, team, rank, deleted, h, h * 100)


def _mk(spark, tmp_path, how="inner", on=("author",), tombstones="drop"):
    left = SnapshotTable.create(
        spark, str(tmp_path / "L"), LEFT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "R"), DIM_SCHEMA,
        key_cols=list(on), num_buckets=4,
        properties={"cdc.enabled": "true"},
    )
    tgt = JoinConsumer.create_target(
        spark, left, right, str(tmp_path / "J"), list(on), RMAP
    )
    cons = JoinConsumer(
        spark, left, right, tgt, "join", list(on),
        how=how, right_cols=RMAP, tombstones=tombstones,
    )
    return left, right, cons


def _recompute(left, right, on, how):
    a = left.read_current(drop_tombstones=True)
    b = right.read_current(drop_tombstones=True).select(
        *on, *[F.col(c).alias(t) for c, t in RMAP.items()]
    )
    return a.join(b, on=list(on), how=how)


def _assert_matches(cons, on=("author",)):
    got = cons.target.read_current(drop_tombstones=True)
    want = _recompute(cons.left, cons.right, list(on), cons.how)
    cols = sorted(want.columns)
    got, want = got.select(*cols), want.select(*cols)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0, (
        f"got={sorted(map(tuple, got.collect()))}\nwant={sorted(map(tuple, want.collect()))}"
    )


def test_inner_join_tracks_both_sides(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="inner")

    # seed both sides; alice/bob dims exist, carol's author is missing
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("a", 1, "bob", "yo", 1),
         _lrow("b", 0, "carol", "hm", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1), _drow("bob", "blue", 2, 1)], DIM_SCHEMA))
    r = cons.run_once()
    assert r is not None and r.rows > 0
    _assert_matches(cons)  # carol's row absent (no match)

    # ΔA only: new fact + author flip (bob -> alice) + fact delete
    merge_upsert(left, spark.createDataFrame(
        [_lrow("c", 0, "bob", "new", 1), _lrow("a", 1, "alice", "yo2", 2),
         _lrow("a", 0, "alice", None, 2, deleted=True)], LEFT_SCHEMA))
    cons.run_once()
    _assert_matches(cons)

    # ΔB only: dim update (team flip) + dim delete + NEW dim (carol appears:
    # her previously-unmatched fact row must now materialise)
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "green", 1, 2), _drow("bob", None, None, 2, deleted=True),
         _drow("carol", "gold", 9, 1)], DIM_SCHEMA))
    cons.run_once()
    _assert_matches(cons)

    # mixed wave on both sides in one cycle
    merge_upsert(left, spark.createDataFrame(
        [_lrow("b", 1, "carol", "x", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("carol", "gold2", 10, 2)], DIM_SCHEMA))
    cons.run_once()
    _assert_matches(cons)
    # caught up
    assert cons.run_once() is None
    assert cons.pending_versions() == 0


def test_left_join_nulls_on_dim_delete(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="left")
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("a", 1, "dave", "yo", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1)], DIM_SCHEMA))
    cons.run_once()
    _assert_matches(cons)  # dave present with null dim cols

    # dim delete: alice's fact rows must be REWRITTEN with nulls, not dropped
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", None, None, 2, deleted=True)], DIM_SCHEMA))
    cons.run_once()
    _assert_matches(cons)
    live = cons.target.read_current(drop_tombstones=True)
    assert live.count() == 2
    assert live.where(F.col("team").isNotNull()).count() == 0


def test_replay_is_idempotent(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="inner")
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("b", 0, "bob", "yo", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1), _drow("bob", "blue", 2, 1)], DIM_SCHEMA))
    cons.run_once()
    before = sorted(map(tuple, cons.target.read_current().collect()))
    a_pos, b_pos = cons.position(), cons.right_position()

    # crash-window replay: force both cursors back and re-consume
    cons.target.commit(add_files=[], properties_update={
        cons._ckpt_key: "1", cons._rkey: "1",
    })
    r = cons.run_once()
    assert r is not None
    after = sorted(map(tuple, cons.target.read_current().collect()))
    assert after == before
    assert cons.position() == a_pos and cons.right_position() == b_pos


def test_colocated_reverse_delta_prunes(spark, tmp_path):
    """Join on conv_id with the left bucketed by conv_id: a dim-only delta
    must open only the changed conv's left buckets, not the live set."""
    left = SnapshotTable.create(
        spark, str(tmp_path / "L"), LEFT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )
    dim_schema = T.StructType(
        [T.StructField("conv_id", T.StringType(), False)]
        + [f for f in DIM_SCHEMA.fields if f.name not in ("author",)]
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "R"), dim_schema, key_cols=["conv_id"], num_buckets=4,
        properties={"cdc.enabled": "true"},
    )
    tgt = JoinConsumer.create_target(
        spark, left, right, str(tmp_path / "J"), ["conv_id"], RMAP
    )
    cons = JoinConsumer(
        spark, left, right, tgt, "join", ["conv_id"], how="inner", right_cols=RMAP,
        tombstones="drop",
    )
    assert cons._colocated
    rows = [_lrow(f"c{i}", t, "x", "txt", 1) for i in range(24) for t in range(3)]
    merge_upsert(left, spark.createDataFrame(rows, LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [(f"c{i}", "t", i, False, 1, 100 + i) for i in range(24)], dim_schema))
    cons.run_once()
    _assert_matches_conv(cons)
    total_files = len(left.snapshot().files)

    # dim-only delta touching ONE conv
    merge_upsert(right, spark.createDataFrame(
        [("c3", "t2", 99, False, 2, 200)], dim_schema))
    cons.run_once()
    assert left.last_scan_files < total_files
    assert left.last_scan_files <= -(-total_files // 8) * 2  # ~1 bucket's worth
    _assert_matches_conv(cons)


def _assert_matches_conv(cons):
    got = cons.target.read_current(drop_tombstones=True)
    a = cons.left.read_current(drop_tombstones=True)
    b = cons.right.read_current(drop_tombstones=True).select(
        "conv_id", *[F.col(c).alias(t) for c, t in RMAP.items()]
    )
    want = a.join(b, on=["conv_id"], how=cons.how)
    cols = sorted(want.columns)
    got, want = got.select(*cols), want.select(*cols)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_purge_cascades_as_ghost_delete(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="inner")
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "private", 1), _lrow("b", 0, "bob", "keep", 1)],
        LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1), _drow("bob", "blue", 2, 1)], DIM_SCHEMA))
    cons.run_once()
    assert cons.target.read_current(drop_tombstones=True).count() == 2

    # GDPR purge of conversation 'a' on the left: content-free cdc delete
    # markers must cascade the removal into the joined table
    left.purge(spark.createDataFrame([("a",)], "conv_id string"))
    cons.run_once()
    live = cons.target.read_current(drop_tombstones=True)
    assert live.count() == 1
    assert live.select("conv_id").first()[0] == "b"
    # purged content is gone even from retained rows (tombstones dropped)
    assert cons.target.read_current().where(F.col("text") == "private").count() == 0


def test_compaction_only_range_advances_cursors(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="inner")
    merge_upsert(left, spark.createDataFrame([_lrow("a", 0, "alice", "hi", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame([_drow("alice", "red", 1, 1)], DIM_SCHEMA))
    cons.run_once()
    a_pos = cons.position()
    left.compact()
    right.compact()
    r = cons.run_once()
    assert r is not None and r.rows == 0 and r.merge is None
    assert cons.position() > a_pos
    assert cons.run_once() is None


def test_reseed_equals_incremental(spark, tmp_path):
    left, right, cons = _mk(spark, tmp_path, how="inner")
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("b", 0, "bob", "yo", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1)], DIM_SCHEMA))
    cons.run_once()
    merge_upsert(right, spark.createDataFrame([_drow("bob", "blue", 2, 1)], DIM_SCHEMA))
    cons.run_once()
    # __join_ver is consumer bookkeeping (cycle tips differ between the two
    # paths by construction); the CONTENT must be identical
    from cht_sync_spark.streaming.join import VER_COL

    inc = sorted(map(tuple, cons.target.read_current(drop_tombstones=True)
                     .drop(VER_COL).collect()))

    tgt2 = JoinConsumer.create_target(
        spark, left, right, str(tmp_path / "J2"), ["author"], RMAP
    )
    cons2 = JoinConsumer(
        spark, left, right, tgt2, "join", ["author"], how="inner", right_cols=RMAP,
        tombstones="drop",
    )
    cons2.reseed()
    seeded = sorted(map(tuple, tgt2.read_current(drop_tombstones=True)
                        .drop(VER_COL).collect()))
    assert inc == seeded
    assert cons2.run_once() is None  # reseed leaves both cursors at tips


def test_validations(spark, tmp_path):
    left = SnapshotTable.create(
        spark, str(tmp_path / "L"), LEFT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, bucket_cols=["conv_id"],
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "R"), DIM_SCHEMA, key_cols=["author"], num_buckets=4,
    )
    tgt = JoinConsumer.create_target(spark, left, right, str(tmp_path / "J"), ["author"])
    with pytest.raises(ValueError, match="N:1"):
        JoinConsumer(spark, left, right, tgt, "j", ["team"])  # not right's key
    with pytest.raises(ValueError, match="collide"):
        JoinConsumer(
            spark, left, right, tgt, "j", ["author"], right_cols={"team": "text"}
        )
    with pytest.raises(ValueError, match="'inner' or 'left'"):
        JoinConsumer(spark, left, right, tgt, "j", ["author"], how="full")
    bad_tgt = SnapshotTable.create(  # wrong bucket layout
        spark, str(tmp_path / "B"), tgt.snapshot().schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=2, bucket_cols=["conv_id"],
    )
    with pytest.raises(ValueError, match="bucket layout"):
        JoinConsumer(spark, left, right, bad_tgt, "j", ["author"])
    # a consumer selecting a right column the target never declared would
    # silently schema-evolve the target on its first cycle
    with pytest.raises(ValueError, match="not in the target schema"):
        JoinConsumer(spark, left, right, tgt, "j", ["author"],
                     right_cols={"rank": "undeclared_rank"})
    # join-column dtype mismatch: xxhash64(int) != xxhash64(long), so
    # bucket pruning on both sides would silently go wrong
    int_dim = T.StructType(
        [T.StructField("author", T.IntegerType(), False)]
        + [f for f in DIM_SCHEMA.fields if f.name != "author"]
    )
    right_int = SnapshotTable.create(
        spark, str(tmp_path / "Ri"), int_dim, key_cols=["author"], num_buckets=4,
    )
    int_left = T.StructType(
        [f if f.name != "author" else T.StructField("author", T.LongType(), True)
         for f in LEFT_SCHEMA.fields]
    )
    left_long = SnapshotTable.create(
        spark, str(tmp_path / "Ll"), int_left,
        key_cols=["conv_id", "turn_idx"], num_buckets=4, bucket_cols=["conv_id"],
    )
    tgt_i = JoinConsumer.create_target(
        spark, left_long, right_int, str(tmp_path / "Ji"), ["author"]
    )
    with pytest.raises(ValueError, match="dtypes differ"):
        JoinConsumer(spark, left_long, right_int, tgt_i, "j", ["author"])


def test_chained_join_then_aggregate(spark, tmp_path):
    """Two-hop derived cascade: JoinConsumer maintains the enriched join
    (cdc.enabled so its COW merges emit exact change files), and an
    AggregateConsumer tails THAT table's changelog to keep a per-team
    rollup fresh — the medallion chain landing -> enriched -> aggregate,
    each hop with its own atomic cursor."""
    from cht_sync_spark.streaming.ivm import AggregateConsumer

    left, right, cons = _mk(spark, tmp_path, how="inner")
    # recreate the join target with a change feed for the downstream hop
    jtgt = JoinConsumer.create_target(
        spark, left, right, str(tmp_path / "J2"), ["author"], RMAP,
        properties={"cdc.enabled": "true"},
    )
    cons = JoinConsumer(
        spark, left, right, jtgt, "join", ["author"], how="inner",
        right_cols=RMAP, tombstones="drop",
    )
    measures = {"rank_sum": F.col("author_rank")}
    atgt = AggregateConsumer.create_target(
        spark, jtgt, str(tmp_path / "A"), ["team"], measures, num_buckets=4
    )
    agg = AggregateConsumer(spark, jtgt, atgt, "rollup", ["team"], measures)

    def assert_rollup():
        want = (
            _recompute(left, right, ["author"], "inner")
            .groupBy("team")
            .agg(F.count("*").alias("n_rows"), F.sum("author_rank").alias("rank_sum"))
        )
        got = atgt.read_current().select("team", "n_rows", "rank_sum")
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0, (
            f"got={sorted(map(tuple, got.collect()))} "
            f"want={sorted(map(tuple, want.collect()))}"
        )

    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("a", 1, "bob", "yo", 1),
         _lrow("b", 0, "carol", "hm", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1), _drow("bob", "red", 2, 1)], DIM_SCHEMA))
    cons.run()
    agg.run()
    assert_rollup()

    # dim flip moves bob's facts red -> blue; carol appears (new team)
    merge_upsert(right, spark.createDataFrame(
        [_drow("bob", "blue", 2, 2), _drow("carol", "gold", 9, 1)], DIM_SCHEMA))
    cons.run()
    agg.run()
    assert_rollup()

    # fact delete retracts out of the rollup through BOTH hops
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", None, 2, deleted=True)], LEFT_SCHEMA))
    cons.run()
    agg.run()
    assert_rollup()


def test_value_index_reverse_delta_prunes(spark, tmp_path):
    """NON-co-located layout (left bucketed by conv_id, join on author)
    with the join-value inverted index attached: a dim-only delta probes
    the index instead of scanning the left live set, and opens only the
    dependents' buckets."""
    from cht_sync_spark.streaming.key_index import JoinKeyIndexConsumer

    left = SnapshotTable.create(
        spark, str(tmp_path / "L"), LEFT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "R"), DIM_SCHEMA, key_cols=["author"], num_buckets=4,
        properties={"cdc.enabled": "true"},
    )
    idx = JoinKeyIndexConsumer.create_index(
        spark, left, str(tmp_path / "I"), ["author"], num_buckets=4
    )
    ic = JoinKeyIndexConsumer(spark, left, idx, "vix")
    tgt = JoinConsumer.create_target(spark, left, right, str(tmp_path / "J"), ["author"], RMAP)
    cons = JoinConsumer(
        spark, left, right, tgt, "join", ["author"], how="inner",
        right_cols=RMAP, tombstones="drop", value_index=idx,
    )
    assert not cons._colocated

    # 'solo' authors only one conversation; the spread authors cover many
    rows = [
        _lrow(f"c{i}", t, "solo" if i == 3 else f"t{i % 5}", "txt", 1)
        for i in range(24) for t in range(3)
    ]
    merge_upsert(left, spark.createDataFrame(rows, LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow(a, "base", 1, 1) for a in ["solo"] + [f"t{j}" for j in range(5)]],
        DIM_SCHEMA))
    ic.run()
    cons.run_once()
    _assert_matches(cons)
    total_files = len(left.snapshot().files)

    # dim-only delta touching the one-conversation author
    merge_upsert(right, spark.createDataFrame([_drow("solo", "gold", 9, 2)], DIM_SCHEMA))
    assert cons._index_covers(max(cons.position(), 1))
    cons.run_once()
    assert left.last_scan_files < total_files
    assert left.last_scan_files <= -(-total_files // 8) * 2  # ~1 bucket's worth
    _assert_matches(cons)

    # author flip moves index rows; the NEW value's dim change must find
    # the flipped row through the index (delete-by-absence on the old row)
    merge_upsert(left, spark.createDataFrame(
        [_lrow("c7", 0, "solo", "moved", 2)], LEFT_SCHEMA))
    ic.run()
    cons.run_once()
    _assert_matches(cons)
    merge_upsert(right, spark.createDataFrame([_drow("solo", "mix", 10, 3)], DIM_SCHEMA))
    cons.run_once()
    _assert_matches(cons)
    got = cons.target.read_current(drop_tombstones=True)
    assert got.where((F.col("conv_id") == "c7") & (F.col("team") == "mix")).count() == 1


def test_value_index_stale_falls_back(spark, tmp_path):
    """An index whose cursor lags the join's left cursor is unsound for
    the reverse delta (it may miss dependents acquired before a_from):
    the consumer must fall back to the live scan and stay exact."""
    from cht_sync_spark.streaming.key_index import JoinKeyIndexConsumer

    left = SnapshotTable.create(
        spark, str(tmp_path / "L"), LEFT_SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8, bucket_cols=["conv_id"],
        properties={"cdc.enabled": "true"},
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "R"), DIM_SCHEMA, key_cols=["author"], num_buckets=4,
        properties={"cdc.enabled": "true"},
    )
    idx = JoinKeyIndexConsumer.create_index(
        spark, left, str(tmp_path / "I"), ["author"], num_buckets=4
    )
    tgt = JoinConsumer.create_target(spark, left, right, str(tmp_path / "J"), ["author"], RMAP)
    cons = JoinConsumer(
        spark, left, right, tgt, "join", ["author"], how="inner",
        right_cols=RMAP, tombstones="drop", value_index=idx,
    )
    merge_upsert(left, spark.createDataFrame(
        [_lrow("a", 0, "alice", "hi", 1), _lrow("b", 0, "bob", "yo", 1)], LEFT_SCHEMA))
    merge_upsert(right, spark.createDataFrame(
        [_drow("alice", "red", 1, 1), _drow("bob", "blue", 2, 1)], DIM_SCHEMA))
    cons.run_once()  # index never ran: no cursor at all
    _assert_matches(cons)
    # dim-only delta with the index still empty/lagging -> full-scan path,
    # exactness preserved (alice's dependent must be refreshed)
    merge_upsert(right, spark.createDataFrame([_drow("alice", "green", 1, 2)], DIM_SCHEMA))
    assert not cons._index_covers(max(cons.position(), 1))
    cons.run_once()
    _assert_matches(cons)
    live = cons.target.read_current(drop_tombstones=True)
    assert live.where(F.col("team") == "green").count() == 1


@pytest.mark.parametrize("seed,how", [(11, "inner"), (47, "left")])
def test_torture_random_interleavings(spark, tmp_path, seed, how):
    """Seeded random schedule over BOTH inputs (upserts, author flips,
    deletes, resurrections, equal-height conflicts, occasional compactions
    and consumer skips so a cycle crosses multi-snapshot ranges), checked
    against the full recompute after every consumer cycle. Small key pools
    force constant collisions; seeds are fixed so failures replay."""
    import random

    rng = random.Random(seed)
    left, right, cons = _mk(spark, tmp_path, how=how)
    convs = [f"c{i}" for i in range(6)]
    authors = [f"a{i}" for i in range(4)]
    lrev: dict[tuple, int] = {}
    drev: dict[str, int] = {}

    for step in range(10):
        # left wave: 0-4 upserts/deletes over colliding keys
        lrows = []
        for _ in range(rng.randint(0, 4)):
            k = (rng.choice(convs), rng.randint(0, 2))
            h = lrev.get(k, 0) + rng.choice([1, 1, 2])  # occasional height skip
            lrev[k] = h
            lrows.append(_lrow(
                k[0], k[1], rng.choice(authors + [None]),
                f"s{step}", h, deleted=rng.random() < 0.2,
            ))
        if lrows:
            merge_upsert(left, spark.createDataFrame(lrows, LEFT_SCHEMA))
        # right wave: 0-2 dim upserts/deletes (incl. resurrections)
        drows = []
        for _ in range(rng.randint(0, 2)):
            a = rng.choice(authors)
            h = drev.get(a, 0) + 1
            drev[a] = h
            drows.append(_drow(a, f"team{rng.randint(0, 2)}", rng.randint(0, 9),
                               h, deleted=rng.random() < 0.25))
        if drows:
            merge_upsert(right, spark.createDataFrame(drows, DIM_SCHEMA))
        if rng.random() < 0.2:
            (left if rng.random() < 0.5 else right).compact()
        if rng.random() < 0.3:
            continue  # skip the cycle: next one crosses a multi-snapshot range
        cons.run()
        _assert_matches(cons)

    cons.run()  # drain whatever the skips left behind
    _assert_matches(cons)
    assert cons.pending_versions() == 0


def test_left_additive_evolution_flows_into_target(spark, tmp_path):
    """T11 across the join boundary: the LEFT table evolves additively
    mid-stream; the next maintenance cycle's recompute carries the new
    column and the merge evolves the joined target — pre-evolution rows
    read NULL, parity with a full re-derivation holds."""
    left, right, cons = _mk(spark, tmp_path, how="left")
    right.append_delta(spark.createDataFrame([_drow("ann", "t1", 1, 1)], DIM_SCHEMA))
    left.append_delta(
        spark.createDataFrame([_lrow("a", 0, "ann", "x", 1)], LEFT_SCHEMA)
    )
    cons.run()
    assert "lang" not in cons.target.snapshot().schema.names

    evolved = (
        spark.createDataFrame([_lrow("b", 0, "ann", "y", 2)], LEFT_SCHEMA)
        .withColumn("lang", F.lit("en"))
    )
    left.append_delta(evolved, new_schema=left.evolve_schema(evolved.schema))
    cons.run()
    assert "lang" in cons.target.snapshot().schema.names
    got = {
        (r.conv_id, r.lang, r.team)
        for r in cons.target.read_current(drop_tombstones=True).collect()
    }
    assert got == {("a", None, "t1"), ("b", "en", "t1")}
    # steady state: caught up, and a dim-side delta still maintains the
    # evolved target correctly
    assert cons.run_once() is None
    right.append_delta(spark.createDataFrame([_drow("ann", "t2", 1, 2)], DIM_SCHEMA))
    cons.run_once()
    got = {
        (r.conv_id, r.lang, r.team)
        for r in cons.target.read_current(drop_tombstones=True).collect()
    }
    assert got == {("a", None, "t2"), ("b", "en", "t2")}
