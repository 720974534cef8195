"""SCD Type 2 history (dbt snapshots) — batch derivation and consumer.

Pins: the interval chain is a pure function of the revision set (batch
splits and out-of-order delivery cannot change the final table); deletes
close intervals and re-inserts open new ones; replay is a byte-level
no-op; check_cols collapses runs exactly like dbt's check strategy and
refuses out-of-order history rewrites; compaction is invisible; reseed
adopts from current state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.streaming.scd2 import Scd2Consumer, scd2_intervals
from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)

KEY = ["conv_id", "turn_idx"]


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, text=x, seq=s, _deleted=d) for c, t, x, s, d in items],
        SCHEMA,
    )


def _mk_source(spark, path) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=KEY, num_buckets=4,
        bucket_cols=["conv_id"],
        lww_order=[("seq", False)],
    )


def _hist(t) -> set:
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq, r.valid_from, r.valid_to, r.is_current)
        for r in t.read_current().collect()
    }


def _batch(df, check_cols=None) -> set:
    out = scd2_intervals(df, KEY, "seq", check_cols=check_cols)
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }


REVS = [
    # key (a,0): edit chain then delete then re-insert
    ("a", 0, "v1", 1, False),
    ("a", 0, "v2", 4, False),
    ("a", 0, None, 7, True),
    ("a", 0, "v3", 9, False),
    # key (a,1): single live revision
    ("a", 1, "w1", 2, False),
    # key (b,0): two edits, ends deleted
    ("b", 0, "x1", 3, False),
    ("b", 0, "x2", 5, False),
    ("b", 0, None, 8, True),
]


def test_batch_intervals_chain_delete_reinsert(spark):
    out = _batch(_rows(spark, REVS))
    assert ("a", 0, "v1", 1, 1, 4, False) in out
    assert ("a", 0, "v2", 4, 4, 7, False) in out
    assert ("a", 0, None, 7, 7, 9, False) in out  # delete closes, not current
    assert ("a", 0, "v3", 9, 9, None, True) in out  # re-insert opens fresh
    assert ("a", 1, "w1", 2, 2, None, True) in out
    assert ("b", 0, None, 8, 8, None, False) in out  # ends deleted: no current
    assert len(out) == len(REVS)


def test_batch_duplicates_and_null_order_dropped(spark):
    df = _rows(spark, REVS + [("a", 1, "w1", 2, False), ("z", 9, "n", None, False)])
    assert _batch(df) == _batch(_rows(spark, REVS))


def test_check_cols_collapses_runs(spark):
    revs = [
        ("a", 0, "same", 1, False),
        ("a", 0, "same", 2, False),  # collapses into seq 1's interval
        ("a", 0, "diff", 3, False),
        ("a", 0, "diff", 4, False),  # collapses
        ("a", 0, None, 5, True),  # delete always survives (flag tracked)
        ("a", 0, None, 6, True),  # consecutive delete collapses
        ("a", 0, "same", 7, False),  # re-insert survives
    ]
    out = _batch(_rows(spark, revs), check_cols=["text"])
    assert out == {
        ("a", 0, "same", 1, 1, 3, False),
        ("a", 0, "diff", 3, 3, 5, False),
        ("a", 0, None, 5, 5, 7, False),
        ("a", 0, "same", 7, 7, None, True),
    }


def _setup(spark, tmp_path, **kw):
    src = _mk_source(spark, tmp_path / "src")
    tgt = Scd2Consumer.create_target(spark, src, str(tmp_path / "hist"))
    return src, tgt, Scd2Consumer(spark, src, tgt, "hist", **kw)


def test_incremental_equals_batch_under_splits_and_ooo(spark, tmp_path):
    src, tgt, c = _setup(spark, tmp_path)
    # deliver the revision set in three commits, the LAST one out of order
    # (seq 4 and 3 arrive after seq 5/7/8/9 were already consumed)
    src.append_delta(_rows(spark, [r for r in REVS if r[3] in (1, 2)]))
    c.run_once()
    src.append_delta(_rows(spark, [r for r in REVS if r[3] in (5, 7, 8, 9)]))
    c.run_once()
    src.append_delta(_rows(spark, [r for r in REVS if r[3] in (3, 4)]))  # late
    r = c.run_once()
    assert r is not None and r.to_version == src.current_version()
    assert _hist(tgt) == _batch(_rows(spark, REVS))
    assert c.run_once() is None  # caught up


def test_replay_is_byte_identical(spark, tmp_path):
    src, tgt, c = _setup(spark, tmp_path)
    src.append_delta(_rows(spark, REVS[:4]))
    c.run_once()
    src.append_delta(_rows(spark, REVS[4:]))
    c.run_once()
    state = _hist(tgt)
    # crash window: cursor rolled back -> the range replays
    tgt.commit(add_files=[], properties_update={"consumer.hist.version": "2"})
    r = Scd2Consumer(spark, src, tgt, "hist").run_once()
    assert r is not None
    assert _hist(tgt) == state


def test_compaction_invisible_and_cursor_advances(spark, tmp_path):
    src, tgt, c = _setup(spark, tmp_path)
    src.append_delta(_rows(spark, REVS[:4]))
    c.run_once()
    src.compact()
    r = c.run_once()  # replace snapshot: no rows, cursor-only advance
    assert r is not None and r.rows == 0
    assert c.position() == src.current_version()
    src.append_delta(_rows(spark, REVS[4:]))
    c.run_once()
    assert _hist(tgt) == _batch(_rows(spark, REVS))


def test_check_strategy_monotone_ok_ooo_raises(spark, tmp_path):
    src, tgt, c = _setup(spark, tmp_path, check_cols=["text"])
    # monotone delivery with a collapsible run
    src.append_delta(_rows(spark, [("a", 0, "same", 1, False), ("a", 0, "same", 2, False)]))
    c.run_once()
    src.append_delta(_rows(spark, [("a", 0, "diff", 5, False)]))
    c.run_once()
    assert _hist(tgt) == {
        ("a", 0, "same", 1, 1, 5, False),
        ("a", 0, "diff", 5, 5, None, True),
    }
    # a late revision that re-collapses stored history must refuse:
    # revision set becomes {same@1, same@2, diff@4, diff@5} -> diff@5
    # collapses into diff@4's interval, invalidating the STORED diff@5 row
    src.append_delta(_rows(spark, [("a", 0, "diff", 4, False)]))
    with pytest.raises(ValueError, match="out-of-order"):
        c.run_once()


def test_equal_order_conflicts_fold_to_landing_winner(spark, tmp_path):
    """Equal-rev_height CouchDB conflicts (delete-vs-edit, rev-hash races)
    must resolve to the SAME winner the landing table keeps, and the fold
    must be deterministic across replays."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("rev_height", T.IntegerType()),
            T.StructField("_rev", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    lww = [("rev_height", False), ("_deleted", True), ("_rev", False), ("seq", False)]
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), schema,
        key_cols=KEY, num_buckets=4, bucket_cols=["conv_id"], lww_order=lww,
    )
    rows = [
        ("a", 0, "v1", 1, "1-aa", 1, False),
        # height-2 conflict: live edit beats the delete at equal height
        ("a", 0, None, 2, "2-zz", 2, True),
        ("a", 0, "v2", 2, "2-bb", 3, False),
        # height-3 rev-hash race: lexicographically greater hash wins
        ("a", 0, "v3x", 3, "3-cc", 4, False),
        ("a", 0, "v3y", 3, "3-dd", 5, False),
    ]
    src.append_delta(
        spark.createDataFrame(
            [Row(conv_id=c, turn_idx=t, text=x, rev_height=h, _rev=r, seq=s, _deleted=d)
             for c, t, x, h, r, s, d in rows],
            schema,
        )
    )
    tgt = Scd2Consumer.create_target(spark, src, str(tmp_path / "hist"))
    c = Scd2Consumer(spark, src, tgt, "hist")  # order_col defaults to rev_height
    c.run_once()
    got = {
        (r.rev_height, r.text, r._rev, r.valid_from, r.valid_to, r.is_current)
        for r in tgt.read_current().collect()
    }
    assert got == {
        (1, "v1", "1-aa", 1, 2, False),
        (2, "v2", "2-bb", 2, 3, False),  # live edit won the height-2 conflict
        (3, "v3y", "3-dd", 3, None, True),  # greater rev hash won height 3
    }
    # the current history row agrees with the landing table's LWW winner
    win = src.read_current(drop_tombstones=True).collect()[0]
    cur = tgt.read_current().where("is_current").collect()[0]
    assert (win.text, win._rev) == (cur.text, cur._rev)
    # replay: byte-identical (the fold is deterministic, not dropDuplicates)
    tgt.commit(add_files=[], properties_update={"consumer.hist.version": "1"})
    Scd2Consumer(spark, src, tgt, "hist").run_once()
    assert {
        (r.rev_height, r.text, r._rev, r.valid_from, r.valid_to, r.is_current)
        for r in tgt.read_current().collect()
    } == got


def test_reseed_adopts_current_state(spark, tmp_path):
    src, tgt, c = _setup(spark, tmp_path)
    src.append_delta(_rows(spark, REVS))
    r = c.reseed()
    assert r.to_version == src.current_version()
    # one interval per key, derived from the reconciled current rows
    cur = {(x.conv_id, x.turn_idx, x.text, x.seq, x.is_current) for x in tgt.read_current().collect()}
    assert cur == {
        ("a", 0, "v3", 9, True),
        ("a", 1, "w1", 2, True),
        ("b", 0, None, 8, False),  # tombstone winner: not current
    }
    # incremental continues from the adopted cursor
    src.append_delta(_rows(spark, [("a", 1, "w2", 11, False)]))
    c.run_once()
    h = _hist(tgt)
    assert ("a", 1, "w1", 2, 2, 11, False) in h
    assert ("a", 1, "w2", 11, 11, None, True) in h
