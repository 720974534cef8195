"""File-level Bloom-filter skipping (tables/blooms.py + SnapshotTable.build_blooms).

Min/max file stats cannot prune point lookups on HIGH-CARDINALITY SCATTERED
columns (a uuid lands inside nearly every file's [lo, hi] range) — the lake
answer is per-file Bloom bitsets consulted at scan planning (Iceberg Puffin
blobs / Delta bloom indexes; the reference's analogous accelerators are its
Postgres point-lookup indexes, setup.js:21-31). Pinned here:

- a point lookup through a built bloom opens ~1 file instead of all of
  them, and returns EXACTLY the unpruned-read-plus-where result (a Bloom
  filter can over-keep but never over-prune);
- files written after the last build are conservatively kept (no false
  pruning) and a re-build covers exactly the missing files (incremental);
- a probe for an absent value skips (nearly) every file;
- integer columns work, including files where the column carries nulls
  (pandas float64 coercion must not change the hashed rendering);
- config is pinned: changing bits/k rebuilds everything, invalid configs
  and non-string/int columns are refused;
- the build commit is changelog-invisible (operation='replace');
- vacuum keeps the referenced sidecar and collects superseded ones;
- clone carries the sidecar (pruning survives the fork);
- meta('files') exposes bloom coverage.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _uuidish(i: int) -> str:
    # scattered ids: every file's [min, max] spans ~the whole keyspace,
    # so min/max stats cannot discriminate and only the bloom can prune
    return hashlib.md5(f"doc-{i}".encode()).hexdigest()


def _batch(spark, lo: int, hi: int, with_null_n: bool = False):
    rows = [
        Row(doc_id=_uuidish(i), n=(None if with_null_n and i % 3 == 0 else i), text=f"t{i}")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _make(spark, tmp_path, name: str, n_batches: int = 4, per: int = 200):
    t = SnapshotTable.create(
        spark, str(tmp_path / name), SCHEMA, key_cols=["doc_id"],
        num_buckets=1, sort_cols=["doc_id"], lww_order=[("n", True)],
    )
    for b in range(n_batches):
        t.append_delta(_batch(spark, b * per, (b + 1) * per))
    return t


def test_point_lookup_prunes_and_is_exact(spark, tmp_path):
    t = _make(spark, tmp_path, "t1")
    n_live = len(t.snapshot().files)
    assert n_live >= 4
    # without blooms: stats can't discriminate scattered ids — all kept
    target = _uuidish(42)
    t.read(filters=[("doc_id", "=", target)]).collect()
    assert t.last_scan_files == n_live

    assert t.build_blooms(["doc_id"]) == n_live
    got = t.read(filters=[("doc_id", "=", target)]).collect()
    assert [r["n"] for r in got] == [42]
    # the id lives in exactly one file; allow one false positive
    assert t.last_scan_files <= 2

    # parity sweep: bloom-pruned read == plain where() on the full read
    for i in (0, 199, 200, 777):
        want = sorted(
            r["n"] for r in t.read().where(F.col("doc_id") == _uuidish(i)).collect()
        )
        have = sorted(
            r["n"] for r in t.read(filters=[("doc_id", "=", _uuidish(i))]).collect()
        )
        assert have == want


def test_absent_value_skips_everything(spark, tmp_path):
    t = _make(spark, tmp_path, "t2")
    n_live = len(t.snapshot().files)
    t.build_blooms(["doc_id"])
    assert t.read(filters=[("doc_id", "=", "no-such-id")]).count() == 0
    # ~1% FP per file at this fill rate: nearly everything must be skipped
    assert t.last_scan_files <= max(1, n_live // 2)


def test_post_build_appends_conservative_then_incremental(spark, tmp_path):
    t = _make(spark, tmp_path, "t3", n_batches=3)
    first = t.build_blooms(["doc_id"])
    assert first == len(t.snapshot().files)
    # same config, nothing new: zero recompute
    assert t.build_blooms() == 0

    t.append_delta(_batch(spark, 600, 800))
    fresh = [f["path"] for f in t.snapshot().files]
    # the new file has no bitset: a probe for one of ITS ids must keep it
    got = t.read(filters=[("doc_id", "=", _uuidish(700))]).collect()
    assert [r["n"] for r in got] == [700]
    # re-build covers exactly the uncovered files
    n_new = len(fresh) - first
    assert n_new >= 1
    assert t.build_blooms() == n_new
    t.read(filters=[("doc_id", "=", _uuidish(700))]).collect()
    assert t.last_scan_files <= 2


def test_int_column_with_nulls(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t4"), SCHEMA, key_cols=["doc_id"],
        num_buckets=1, sort_cols=["doc_id"], lww_order=[("n", True)],
    )
    for b in range(3):
        t.append_delta(_batch(spark, b * 100, (b + 1) * 100, with_null_n=True))
    # a value above 2^53 in a null-carrying int column: the builder must
    # hash the exact integral rendering (string cast before Arrow), not a
    # float64 round-trip — a wrong hash would FALSELY PRUNE the row
    big = (1 << 60) + 1
    t.append_delta(spark.createDataFrame(
        [Row(doc_id="bigrow", n=big, text="t"), Row(doc_id="bignull", n=None, text="t")],
        SCHEMA,
    ))
    t.build_blooms(["n"])
    # 77 % 3 != 0 → present despite the column's float64-coercing nulls
    got = t.read(filters=[("n", "=", 77)]).collect()
    assert [r["doc_id"] for r in got] == [_uuidish(77)]
    assert t.last_scan_files <= 2
    got_big = t.read(filters=[("n", "=", big)]).collect()
    assert [r["doc_id"] for r in got_big] == ["bigrow"]
    # a null-masked slot (99 % 3 == 0) was never hashed: absent
    assert t.read(filters=[("n", "=", 99)]).count() == 0


def test_all_null_column_sentinel(spark, tmp_path):
    """A file whose bloom column is entirely null gets the computed-empty
    sentinel: equality probes SOUNDLY prune it (= never matches null), and
    re-builds reach the zero-recompute steady state instead of rescanning
    it forever."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t4n"), SCHEMA, key_cols=["doc_id"],
        num_buckets=1, sort_cols=["doc_id"], lww_order=[("n", True)],
    )
    t.append_delta(_batch(spark, 0, 100))
    t.append_delta(spark.createDataFrame(
        [Row(doc_id=f"null{i}", n=None, text="t") for i in range(50)], SCHEMA))
    n_live = len(t.snapshot().files)
    assert t.build_blooms(["n"]) == n_live
    assert t.build_blooms() == 0  # sentinel counted as covered
    t.read(filters=[("n", "=", 42)]).collect()
    assert t.last_scan_files <= 2  # the all-null file is pruned, value found
    assert t.read(filters=[("n", "=", 42)]).count() == 1


def test_config_change_rebuilds_and_validation(spark, tmp_path):
    t = _make(spark, tmp_path, "t5", n_batches=2)
    n_live = len(t.snapshot().files)
    assert t.build_blooms(["doc_id"], bits=4096, k=4) == n_live
    assert t.build_blooms() == 0
    # bits change: every file recomputed under the new layout
    assert t.build_blooms(["doc_id"], bits=8192, k=4) == n_live
    snap = t.snapshot()
    assert snap.properties["bloom.bits"] == "8192"

    with pytest.raises(ValueError, match="not in table schema"):
        t.build_blooms(["nope"])
    with pytest.raises(ValueError, match="multiple of 64"):
        t.build_blooms(["doc_id"], bits=1000)
    with pytest.raises(ValueError, match="k must be"):
        t.build_blooms(["doc_id"], k=0)
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "t5f"),
        T.StructType([T.StructField("k", T.StringType()), T.StructField("x", T.DoubleType())]),
        key_cols=["k"], num_buckets=1,
    )
    with pytest.raises(ValueError, match="only string"):
        t2.build_blooms(["x"])
    with pytest.raises(ValueError, match="no bloom.cols pinned"):
        t2.build_blooms()


def test_build_is_changelog_invisible(spark, tmp_path):
    t = _make(spark, tmp_path, "t6", n_batches=2)
    v0 = t.current_version()
    t.build_blooms(["doc_id"])
    snap = t.snapshot()
    assert snap.operation == "replace"
    # a strict consumer crossing the build version sees no phantom changes
    assert t.changes(v0, strict=True).count() == 0


def test_vacuum_keeps_current_collects_superseded(spark, tmp_path):
    t = _make(spark, tmp_path, "t7", n_batches=2)
    t.build_blooms(["doc_id"])
    old_side = t.snapshot().properties["bloom.sidecar"]
    t.append_delta(_batch(spark, 400, 500))
    t.build_blooms()
    new_side = t.snapshot().properties["bloom.sidecar"]
    assert new_side != old_side
    # both sidecars still referenced by retained history: vacuum keeps both
    t.vacuum(grace_seconds=0)
    assert os.path.exists(os.path.join(t.path, old_side))
    # expire the history that referenced the old sidecar: now collected
    t.expire_snapshots(keep_last=1)
    t.vacuum(grace_seconds=0)
    assert not os.path.exists(os.path.join(t.path, old_side))
    assert os.path.exists(os.path.join(t.path, new_side))
    t._bloom_cache.clear()
    t.read(filters=[("doc_id", "=", _uuidish(450))]).collect()
    assert t.last_scan_files <= 2


def test_clone_carries_blooms(spark, tmp_path):
    t = _make(spark, tmp_path, "t8", n_batches=3)
    t.build_blooms(["doc_id"])
    c = t.clone(str(tmp_path / "t8c"))
    got = c.read(filters=[("doc_id", "=", _uuidish(123))]).collect()
    assert [r["n"] for r in got] == [123]
    assert c.last_scan_files <= 2
    # the clone owns its sidecar copy: vacuuming the source changes nothing
    t.expire_snapshots(keep_last=1)
    t.vacuum(grace_seconds=0)
    c._bloom_cache.clear()
    assert c.read(filters=[("doc_id", "=", _uuidish(123))]).count() == 1


def test_meta_files_exposes_bloom_coverage(spark, tmp_path):
    t = _make(spark, tmp_path, "t9", n_batches=2)
    assert t.meta("files").where("has_bloom").count() == 0
    t.build_blooms(["doc_id"])
    n_live = len(t.snapshot().files)
    assert t.meta("files").where("has_bloom").count() == n_live
    t.append_delta(_batch(spark, 400, 450))
    covered = t.meta("files").where("has_bloom").count()
    assert covered == n_live  # the fresh file is visibly uncovered


def test_in_list_point_lookup(spark, tmp_path):
    """'in' filters compose with stats AND bloom pruning: a 3-id lookup
    opens ~3 files, results equal the plain isin, and an all-absent list
    skips (nearly) everything."""
    t = _make(spark, tmp_path, "t10")
    n_live = len(t.snapshot().files)
    t.build_blooms(["doc_id"])
    ids = [_uuidish(5), _uuidish(210), _uuidish(777)]
    got = sorted(r["n"] for r in t.read(filters=[("doc_id", "in", ids)]).collect())
    assert got == [5, 210, 777]
    assert t.last_scan_files <= 4  # one file per id + FP slack
    assert t.read(filters=[("doc_id", "in", ["nope-a", "nope-b"])]).count() == 0
    assert t.last_scan_files <= max(1, n_live // 2)
    import pytest

    with pytest.raises(ValueError, match="non-empty list"):
        t.read(filters=[("doc_id", "in", [])])
    with pytest.raises(ValueError, match="not contain None"):
        t.read(filters=[("doc_id", "in", [None, "x"])])
