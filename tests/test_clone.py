"""Shallow clone (SnapshotTable.clone — Delta SHALLOW CLONE / Iceberg
snapshot-export parity): a new independent table whose v1 is the source
snapshot's state, hard-linking the immutable data files (zero copy).
Pins:

- clone state == source state at the cloned ref (tip, version, tag);
- zero-copy: the clone's data files are the SAME inodes;
- full independence: writes on either side are invisible to the other;
- vacuum on the diverged source never pulls bytes out from under the
  clone (last-link semantics), and vice versa;
- tag refs are stripped (they pin source history), state-coupled
  properties carry over;
- the clone is writable (merge works) and its changelog starts at v1;
- refuses an existing destination and unknown refs.
"""

from __future__ import annotations

import os

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
        spark, str(path), SCHEMA, key_cols=["conv_id", "turn_idx"],
        num_buckets=4, bucket_cols=["conv_id"], lww_order=[("seq", False)],
        properties={"pinned.config": "x"},
    )


def _state(t, **kw):
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq, r._deleted)
        for r in t.read_current(**kw).collect()
    }


def _seed(spark, t):
    t.append_delta(_rows(spark, [("a", 0, "a0", 1, False), ("a", 1, "a1", 2, False),
                                 ("b", 0, "b0", 3, False)]))
    t.append_delta(_rows(spark, [("a", 1, "a1v2", 4, False), ("c", 0, "c0", 5, False)]))
    t.compact()


def test_clone_state_and_zero_copy(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    want = _state(t)
    c = t.clone(str(tmp_path / "dst"))
    assert c.current_version() == 1
    assert c.snapshot().operation == "clone"
    assert _state(c) == want
    # zero-copy: every data file is the same inode as the source's
    for f in c.snapshot().files:
        s_ino = os.stat(os.path.join(t.path, f["path"])).st_ino
        d_ino = os.stat(os.path.join(c.path, f["path"])).st_ino
        assert s_ino == d_ino
    # config and state-coupled properties carry over; tags don't
    assert c.snapshot().properties["pinned.config"] == "x"
    assert c.snapshot().key_cols == t.snapshot().key_cols
    assert c.snapshot().lww_order == t.snapshot().lww_order


def test_clone_at_version_and_tag(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    t.append_delta(_rows(spark, [("a", 0, "v1", 1, False)]))
    v = t.current_version()
    t.tag("run_x", v)
    t.append_delta(_rows(spark, [("a", 0, "v2", 2, False)]))
    by_ver = t.clone(str(tmp_path / "byver"), version=v)
    by_tag = t.clone(str(tmp_path / "bytag"), ref="run_x")
    assert _state(by_ver) == _state(by_tag) == {("a", 0, "v1", 1, False)}
    # tag refs are stripped: the clone has no source-history pins
    assert by_tag.tags() == {}
    with pytest.raises(ValueError, match="unknown tag"):
        t.clone(str(tmp_path / "nope"), ref="missing")
    with pytest.raises(ValueError, match="not both"):
        t.clone(str(tmp_path / "nope"), version=v, ref="run_x")
    with pytest.raises(FileExistsError):
        t.clone(str(tmp_path / "byver"))


def test_independence_and_vacuum_safety(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    at_clone = _state(t)
    c = t.clone(str(tmp_path / "dst"))
    # diverge both sides
    merge_upsert(t, _rows(spark, [("a", 0, "src-edit", 10, False)]))
    merge_upsert(c, _rows(spark, [("b", 0, "clone-edit", 11, False)]))
    assert ("a", 0, "src-edit", 10, False) in _state(t)
    assert ("a", 0, "src-edit", 10, False) not in _state(c)
    assert ("b", 0, "clone-edit", 11, False) in _state(c)
    assert ("b", 0, "clone-edit", 11, False) not in _state(t)
    # source rewrites + expiry + vacuum reclaim the pre-clone files on the
    # SOURCE side; the clone still reads its v1 state byte-for-byte
    t.compact()
    t.expire_snapshots(keep_last=1)
    t.vacuum(grace_seconds=0.0)
    assert _state(c) == (at_clone | {("b", 0, "clone-edit", 11, False)}) - {("b", 0, "b0", 3, False)}
    # and the mirror direction: vacuuming the clone leaves the source intact
    c.compact()
    c.expire_snapshots(keep_last=1)
    c.vacuum(grace_seconds=0.0)
    assert ("a", 0, "src-edit", 10, False) in _state(t)


def test_deep_clone_copies_bytes(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    c = t.clone(str(tmp_path / "deep"), deep=True)
    assert _state(c) == _state(t)
    for f in c.snapshot().files:
        s = os.stat(os.path.join(t.path, f["path"]))
        d = os.stat(os.path.join(c.path, f["path"]))
        assert s.st_ino != d.st_ino and s.st_size == d.st_size


def test_clone_changelog_starts_fresh(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    c = t.clone(str(tmp_path / "dst"))
    v1 = c.current_version()
    c.append_delta(_rows(spark, [("z", 0, "new", 99, False)]))
    got = c.changes(v1, c.current_version()).collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {("z", 0)}


def test_clone_v1_refuses_strict_delivers_nonstrict(spark, tmp_path):
    """The clone's v1 is data-bearing: a strict changelog range crossing
    it must refuse (the tail-from-v1 consumer convention would silently
    miss the cloned corpus), and non-strict must deliver the FULL cloned
    state as upserts — exact for LWW consumers."""
    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    c = t.clone(str(tmp_path / "dst"))
    c.append_delta(_rows(spark, [("z", 0, "new", 99, False)]))
    with pytest.raises(ValueError, match="clone's initial snapshot"):
        c.changes(0, c.current_version())
    got = c.changes(0, c.current_version(), strict=False)
    folded = {
        (r.conv_id, r.turn_idx, r.text, r.seq)
        for r in got.where("_change_type = 'upsert'").collect()
    }
    # every live cloned row + the post-clone append is delivered
    want = {(r.conv_id, r.turn_idx, r.text, r.seq)
            for r in c.read_current(drop_tombstones=True).collect()}
    assert want <= folded


def test_fresh_consumer_on_clone_refuses_then_reseeds(spark, tmp_path):
    """A fresh changelog consumer attached to a clone must refuse loudly
    (its tail-after-v1 convention would silently skip the cloned corpus)
    and work normally after the documented reseed() bootstrap."""
    from cht_sync_spark.streaming.consumer import ChangelogConsumer

    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    c = t.clone(str(tmp_path / "dst"))
    # post-clone commits exist, so a naive tail would "work" silently
    c.append_delta(_rows(spark, [("z", 0, "post", 99, False)]))
    tgt = ChangelogConsumer.create_target(spark, c, str(tmp_path / "m"), "m")
    cons = ChangelogConsumer(spark, c, tgt, "m")
    with pytest.raises(ValueError, match="reseed"):
        cons.run()
    cons.reseed()
    c.append_delta(_rows(spark, [("z", 1, "post2", 100, False)]))
    cons.run()
    a = c.read_current(drop_tombstones=True)
    b = tgt.read_current(drop_tombstones=True).select(a.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_interrupted_clone_retry_recovers(spark, tmp_path):
    """A clone interrupted after linking files but before its v1 manifest
    lands leaves dest.exists() False; a retry must recover cleanly
    (re-link over the partial set) instead of crashing on EEXIST or
    SameFileError."""
    import os as _os

    from cht_sync_spark.tables.format import SnapshotTable as _ST

    t = _mk(spark, tmp_path / "src")
    _seed(spark, t)
    dest = str(tmp_path / "dst")
    # simulate the partial clone: link every data file but write no manifest
    snap = t.snapshot()
    for f in snap.files:
        d = _os.path.join(dest, f["path"])
        _os.makedirs(_os.path.dirname(d), exist_ok=True)
        _os.link(_os.path.join(t.path, f["path"]), d)
    assert not _ST(spark, dest).exists()
    c = t.clone(dest)  # retry succeeds
    assert _state(c) == _state(t)
