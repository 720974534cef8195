"""The FileIO storage seam (tables/fileio.py — VERDICT r4 #3): every
metadata-plane storage touch of SnapshotTable routes through ONE small
interface so an object-store implementation (conditional-PUT commits,
server-side-COPY clones, LIST-based vacuum — contract in the module
docstring) can replace the POSIX one without touching the table logic.

Pinned here: (a) an instrumented FileIO passed via ``io=`` observes every
op family across the table lifecycle — commit claims, snapshot/manifest
reads, atomic writes, listing, clone linking, vacuum walking/removal —
i.e. nothing bypasses the seam; (b) the io propagates to internal
handles (clone target, branch handles); (c) publish_atomic's exclusivity
is what CommitConflict is made of."""

from __future__ import annotations

from collections import Counter

import pytest

from cht_sync_spark.tables.fileio import LocalFileIO
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

_OPS = [
    "publish_atomic", "read_text", "write_text_atomic", "mkdirs", "exists",
    "list_dir", "is_dir", "size", "mtime", "walk_files", "remove",
    "remove_dir", "remove_tree", "link_or_copy", "copy",
]


class CountingIO(LocalFileIO):
    def __init__(self):
        self.calls: Counter = Counter()


def _wrap(name):
    base = getattr(LocalFileIO, name)

    def f(self, *a, **k):
        self.calls[name] += 1
        return base(self, *a, **k)

    return f


for _n in _OPS:
    setattr(CountingIO, _n, _wrap(_n))


def test_lifecycle_routes_through_the_seam(spark, tmp_path):
    io = CountingIO()
    df = spark.range(0, 50).selectExpr("id as k", "'a' as v", "1L as seq")
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), df.schema, key_cols=["k"],
        num_buckets=4, lww_order=[("seq", False)], io=io,
    )
    assert io.calls["publish_atomic"] >= 1  # the create commit claim
    t.append_delta(df)
    merge_upsert(t, spark.range(0, 10).selectExpr("id as k", "'b' as v", "2L as seq"))
    assert io.calls["write_text_atomic"] >= 2  # one manifest file per commit
    assert io.calls["list_dir"] >= 1  # _versions listing

    # cold handle: snapshot + manifest reads go through read_text
    cold_io = CountingIO()
    cold = SnapshotTable(spark, str(tmp_path / "t"), io=cold_io)
    assert cold.read_current(drop_tombstones=True).count() == 50
    assert cold_io.calls["read_text"] >= 2  # snapshot JSON + manifest file

    # clone: links through the seam and the dest inherits this io
    c = t.clone(str(tmp_path / "c"))
    assert io.calls["link_or_copy"] >= 1
    assert c._io is io
    assert c.read_current(drop_tombstones=True).count() == 50

    # deep clone copies bytes, never links
    d = t.clone(str(tmp_path / "d"), deep=True)
    assert io.calls["copy"] >= 1
    assert d.read_current(drop_tombstones=True).count() == 50

    # branch claim is a published marker (object-store compatible)
    before = io.calls["publish_atomic"]
    t.create_branch("aud")
    assert io.calls["publish_atomic"] >= before + 2  # marker + fork snapshot

    # expiry + vacuum: removal and walking through the seam
    t.compact()
    t.expire_snapshots(keep_last=1)
    assert io.calls["remove"] >= 1
    removed = t.vacuum(grace_seconds=0)
    assert removed >= 1
    assert io.calls["walk_files"] >= 1
    assert {r["k"] for r in t.read_current(drop_tombstones=True).select("k").collect()} == set(range(50))


def test_publish_atomic_exclusivity_is_commit_conflict(spark, tmp_path):
    io = CountingIO()
    df = spark.range(0, 5).selectExpr("id as k", "1L as seq")
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), df.schema, key_cols=["k"], num_buckets=2,
        lww_order=[("seq", False)], io=io,
    )
    snap = t.snapshot()
    # hand-build the same next version twice: second publication must lose
    from dataclasses import replace

    s2 = replace(snap, version=snap.version + 1, parent=snap.version, files=list(snap.files))
    t._write_manifest(s2)
    t._snap_cache.pop(s2.version, None)
    with pytest.raises(CommitConflict):
        t._write_manifest(replace(s2, properties=dict(snap.properties)))
