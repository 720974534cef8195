"""Object-store-semantics validation of the FileIO contract.

`tables/fileio.py` documents the S3/GCS mapping per operation; this
suite EXECUTES that contract: `ObjectStoreIO` keeps every metadata
object (snapshots, manifests, sidecars, branch markers — everything the
seam writes) in a key→(body, mtime) dict with *conditional-PUT*
semantics — create-iff-absent is a single atomic operation, there is NO
claim file, NO rename, NO zero-size intermediate state, and directories
are synthetic (listing = prefix scan, `remove_dir` a no-op, `mkdirs`
touches nothing for metadata prefixes). Data files (written by Spark)
pass through to the real filesystem, exactly as they would flow through
the Hadoop FS connectors on a cluster.

Running the full table lifecycle over this IO proves the table logic
depends ONLY on the documented interface, not on hidden POSIX behavior:

- commits/conflicts work with single-shot conditional PUT (the local
  zero-size-claim window is an implementation detail, not a dependency);
- a SECOND handle sharing only the object dict (another "node") reads
  identical state — metadata never touches the local disk (asserted:
  the real _snapshots/_manifests dirs stay empty);
- branches fork, clones link, expiry+vacuum reclaim both object-store
  metadata and real data files, changelog reads stay exact.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.tables.fileio import FileIO, LocalFileIO
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert


class ObjectStoreIO(FileIO):
    """Metadata = objects in a dict with conditional-PUT semantics;
    data files pass through to the real FS (the Spark/Hadoop plane)."""

    def __init__(self, store: dict | None = None):
        # path -> (text, mtime); shared across handles like a bucket is
        self.store: dict = store if store is not None else {}
        self._real = LocalFileIO()

    # ---- commit protocol: ONE atomic conditional PUT ------------------
    def publish_atomic(self, path: str, text: str) -> None:
        if path in self.store:
            raise FileExistsError(path)  # HTTP 412 Precondition Failed
        self.store[path] = (text, time.time())

    def read_text(self, path: str) -> str:
        if path in self.store:
            return self.store[path][0]
        raise FileNotFoundError(path)

    def write_text_atomic(self, path: str, text: str) -> None:
        self.store[path] = (text, time.time())  # plain PUT

    # ---- namespace: synthetic directories -----------------------------
    def mkdirs(self, d: str) -> None:
        # metadata prefixes need no creation on an object store; the
        # DATA plane here is the real FS (as Spark's Hadoop connectors
        # would own it on a cluster), so real dirs are made for it —
        # the no-local-metadata assertion checks they stay EMPTY
        os.makedirs(d, exist_ok=True)

    def exists(self, path: str) -> bool:
        return path in self.store or os.path.exists(path)

    def list_dir(self, d: str) -> list[str]:
        pre = d.rstrip("/") + "/"
        synth = {
            k[len(pre):].split("/", 1)[0]
            for k in self.store
            if k.startswith(pre)
        }
        try:
            return sorted(synth | set(os.listdir(d)))
        except (FileNotFoundError, NotADirectoryError):
            return sorted(synth)

    def is_dir(self, path: str) -> bool:
        pre = path.rstrip("/") + "/"
        return os.path.isdir(path) or any(k.startswith(pre) for k in self.store)

    def size(self, path: str) -> int | None:
        if path in self.store:
            return len(self.store[path][0])  # committed body length
        try:
            return os.path.getsize(path)
        except OSError:
            return None

    def mtime(self, path: str) -> float | None:
        if path in self.store:
            return self.store[path][1]
        try:
            return os.path.getmtime(path)
        except OSError:
            return None

    def walk_files(self, root: str):
        return self._real.walk_files(root)  # vacuum walks the data plane

    def remove(self, path: str) -> None:
        if path in self.store:
            del self.store[path]
        else:
            os.remove(path)

    def remove_dir(self, d: str) -> None:
        if os.path.isdir(d):
            os.rmdir(d)  # real data dir; synthetic prefixes need nothing

    def remove_tree(self, d: str) -> None:
        pre = d.rstrip("/") + "/"
        for k in [k for k in self.store if k.startswith(pre)]:
            del self.store[k]
        self._real.remove_tree(d)

    def link_or_copy(self, src: str, dst: str) -> None:
        self._real.link_or_copy(src, dst)  # server-side COPY analogue

    def copy(self, src: str, dst: str) -> None:
        self._real.copy(src, dst)


def _no_local_metadata(path: str) -> None:
    """The acid assertion: nothing bypassed the seam — the real
    _snapshots/_manifests directories hold NO files at all."""
    for sub in ("_snapshots", "_manifests"):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            assert os.listdir(d) == [], (sub, os.listdir(d))


def test_lifecycle_on_object_store_semantics(spark, tmp_path):
    io = ObjectStoreIO()
    path = str(tmp_path / "t")
    df = spark.range(0, 60).selectExpr(
        "id as k", "concat('v', id) as v", "1L as seq",
        "cast(false as boolean) as _deleted",
    )
    t = SnapshotTable.create(
        spark, path, df.schema, key_cols=["k"], num_buckets=4,
        lww_order=[("seq", False)], io=io,
        properties={"cdc.enabled": "true"},
    )
    t.append_delta(df)
    merge_upsert(
        t,
        spark.range(0, 20).selectExpr(
            "id as k", "'upd' as v", "2L as seq",
            "cast(id % 7 = 0 as boolean) as _deleted",
        ),
    )
    _no_local_metadata(path)

    # state exactness through the conditional-PUT commit chain
    got = {r["k"]: r["v"] for r in t.read_current(drop_tombstones=True).collect()}
    want = {k: ("upd" if k < 20 else f"v{k}") for k in range(60) if not (k < 20 and k % 7 == 0)}
    assert got == want

    # a second "node": fresh handle, SAME object dict, nothing local
    peer = SnapshotTable(spark, path, io=ObjectStoreIO(io.store))
    assert {r["k"]: r["v"] for r in peer.read_current(drop_tombstones=True).collect()} == want

    # changelog stays exact (CDF over the COW merge)
    ch = t.changes(1)
    assert ch.where(F.col("_change_type") == "delete").count() == 3  # 0,7,14

    # commit race: same-version conditional PUT loses with CommitConflict
    from dataclasses import replace

    snap = t.snapshot()
    s2 = replace(snap, version=snap.version + 1, parent=snap.version, files=list(snap.files))
    t._write_manifest(s2)
    t._snap_cache.pop(s2.version, None)
    with pytest.raises(CommitConflict):
        t._write_manifest(replace(s2, properties=dict(snap.properties)))

    # branch fork + publish through marker claims (objects, not mkdir)
    br = t.create_branch("aud")
    br.append_delta(
        spark.createDataFrame([(999, "branch", 9, False)], df.schema)
    )
    assert t.read_current().where("k = 999").count() == 0  # isolation
    t.fast_forward("aud")
    assert t.read_current(drop_tombstones=True).where("k = 999").count() == 1
    with pytest.raises(FileExistsError):
        t.create_branch("aud")
    _no_local_metadata(path)

    # clone: metadata objects for the dest, linked real data files
    c = t.clone(str(tmp_path / "c"))
    assert c.read_current(drop_tombstones=True).count() == len(want) + 1
    _no_local_metadata(str(tmp_path / "c"))

    # expiry + vacuum reclaim object-store manifests AND real parquet
    t.compact()
    n_objects_before = len(io.store)
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum(grace_seconds=0)
    assert removed >= 1
    assert len(io.store) < n_objects_before  # expired snapshot objects gone
    assert {r["k"] for r in t.read_current(drop_tombstones=True).select("k").collect()} == set(want) | {999}
    _no_local_metadata(path)
