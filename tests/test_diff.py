"""Table diff between refs (SnapshotTable.diff) + AS OF time travel.

The audit surface for write-audit-publish and replay validation: one row
per key that differs between two reconciled states, classified
added/removed/changed, with driver-side bucket pruning (identical per-
bucket file sets are provably equal content — zero Spark work). as_of()
resolves timestamp time travel against the committed_at stamped on every
snapshot at the commit choke point.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

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


def _mk(spark, path) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=["conv_id"], lww_order=[("seq", False)],
    )


def test_diff_classifies_added_removed_changed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [
        ("a", 0, "a0", 1, False), ("b", 0, "b0", 2, False), ("c", 0, "c0", 3, False),
    ]))
    v1 = t.current_version()
    merge_upsert(t, _rows(spark, [
        ("a", 0, "a0-edit", 4, False),   # changed
        ("d", 0, "d0", 5, False),        # added
    ]), tombstones="drop")
    merge_upsert(t, _rows(spark, [("b", 0, None, 6, True)]), tombstones="drop")  # removed

    got = {(r.conv_id, r.turn_idx): r.diff_type for r in t.diff(v1).collect()}
    assert got == {("a", 0): "changed", ("d", 0): "added", ("b", 0): "removed"}
    rows = {(r.conv_id, r.turn_idx): r for r in t.diff(v1).collect()}
    assert rows[("a", 0)].before.text == "a0" and rows[("a", 0)].after.text == "a0-edit"
    assert rows[("d", 0)].before is None and rows[("d", 0)].after.text == "d0"
    assert rows[("b", 0)].after is None


def test_diff_equal_refs_is_empty_and_prunes_everything(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]))
    v = t.current_version()
    assert t.diff(v, v).count() == 0
    assert t.last_diff_buckets == []  # provably-equal: no Spark scan needed


def test_diff_prunes_untouched_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(f"c{i}", 0, f"x{i}", i + 1, False) for i in range(40)]))
    v1 = t.current_version()
    merge_upsert(t, _rows(spark, [("c7", 0, "edited", 100, False)]))
    d = t.diff(v1)
    assert {(r.conv_id, r.diff_type) for r in d.collect()} == {("c7", "changed")}
    assert t.last_diff_buckets == [t.bucket_for({"conv_id": "c7"})]


def test_diff_null_fields_compare_null_safe(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # a row with a NULL text that does NOT change must not appear as a diff
    merge_upsert(t, _rows(spark, [("a", 0, None, 1, False), ("b", 0, "y", 2, False)]))
    v1 = t.current_version()
    merge_upsert(t, _rows(spark, [("b", 0, "y2", 3, False)]))
    got = {(r.conv_id, r.turn_idx) for r in t.diff(v1).collect()}
    assert got == {("b", 0)}


def test_diff_by_tag_and_compare_cols(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False)]))
    t.tag("run-1")
    # bump only seq (an excluded column): no diff under compare_cols=['text']
    merge_upsert(t, _rows(spark, [("a", 0, "x", 9, False)]))
    assert t.diff("run-1", compare_cols=["text"]).count() == 0
    assert t.diff("run-1").count() == 1  # seq changed under the default


def test_diff_branch_vs_main(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]))
    v_main = t.current_version()
    br = t.create_branch("wip")
    merge_upsert(br, _rows(spark, [("a", 0, "x-branch", 5, False)]))
    d = t.diff(v_main, other=br)  # what would publishing the branch change?
    rows = {(r.conv_id, r.turn_idx): r for r in d.collect()}
    assert set(rows) == {("a", 0)}
    assert rows[("a", 0)].after.text == "x-branch"


def test_diff_across_rebucket_falls_back_without_prune(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [(f"c{i}", 0, f"x{i}", i + 1, False) for i in range(20)]))
    v1 = t.current_version()
    t.rebucket(8)
    merge_upsert(t, _rows(spark, [("c3", 0, "edited", 99, False)]))
    d = t.diff(v1)
    assert t.last_diff_buckets is None  # layouts differ: no bucket prune
    assert {(r.conv_id, r.diff_type) for r in d.collect()} == {("c3", "changed")}


def test_diff_key_mismatch_raises(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    other = SnapshotTable.create(
        spark, str(tmp_path / "o"),
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]),
        key_cols=["k"], num_buckets=2,
    )
    with pytest.raises(ValueError, match="key columns"):
        t.diff(t.current_version(), other=other)


def test_as_of_resolves_by_commit_time(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "v1", 1, False)]))
    v1 = t.current_version()
    t_mid = time.time()
    time.sleep(0.02)
    merge_upsert(t, _rows(spark, [("a", 0, "v2", 2, False)]))
    v2 = t.current_version()

    assert t.as_of(t_mid) == v1
    assert t.as_of(time.time()) == v2
    got = {r.text for r in t.read_current(version=t.as_of(t_mid)).collect()}
    assert got == {"v1"}
    with pytest.raises(ValueError, match="no snapshot"):
        t.as_of(t_mid - 10_000)
    # datetime form
    from datetime import datetime

    assert t.as_of(datetime.fromtimestamp(t_mid)) == v1


def test_diff_skips_hidden_internal_cols(spark, tmp_path):
    """MOR model tables hide internal.cols from reconciled reads; diff's
    default compare set must skip them instead of crashing (and refuse
    them in explicit compare_cols)."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_fold_rank", T.LongType()),
        ]
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["k"], num_buckets=2,
        lww_order=[("seq", False)],
        properties={"internal.cols": '["_fold_rank"]'},
    )
    rows = spark.createDataFrame([Row(k=1, v="a", seq=1, _fold_rank=0)], schema)
    merge_upsert(t, rows)
    v1 = t.current_version()
    merge_upsert(t, spark.createDataFrame([Row(k=1, v="b", seq=2, _fold_rank=0)], schema))
    got = {r.k: r.diff_type for r in t.diff(v1).collect()}
    assert got == {1: "changed"}
    with pytest.raises(ValueError, match="hidden"):
        t.diff(v1, compare_cols=["_fold_rank"])


def test_snapshot_equality_ignores_committed_at(spark, tmp_path):
    """fast_forward's fork-point CONTENT compare must not depend on when
    (or from which copied file's mtime) a snapshot was stamped — legacy
    snapshots fall back to file mtimes, which differ across branch copies."""
    import json as _json
    import os

    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False)]))
    tip = t.current_version()
    br = t.create_branch("wip")
    # simulate LEGACY snapshots: strip committed_at from both copies so the
    # loader falls back to (differing) file mtimes
    for snapdir in (t._snapdir, br._snapdir):
        d = os.path.join(t.path, snapdir)
        fp = os.path.join(d, f"v{tip:08d}.json")
        m = _json.load(open(fp))
        m.pop("committed_at", None)
        _json.dump(m, open(fp, "w"))
    os.utime(os.path.join(t.path, br._snapdir, f"v{tip:08d}.json"), (1, 1))
    t._snap_cache.clear()
    br._snap_cache.clear()
    a, b = t.snapshot(tip), br.snapshot(tip)
    assert a.committed_at != b.committed_at  # mtimes really differ...
    assert a == b  # ...but content equality holds
    # and the publish path accepts the untouched branch
    merge_upsert(br, _rows(spark, [("b", 0, "y", 2, False)]))
    assert t.fast_forward("wip") == tip + 1
