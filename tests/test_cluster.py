"""Z-order clustering (`SnapshotTable.cluster`) — Delta OPTIMIZE ZORDER /
Iceberg sort-order-rewrite analogue. A replace-class, content-preserving
rewrite that orders the fold by the Morton interleave of the clustered
columns' min-max ranks and splits bounded files, so file-level skipping
works on EVERY clustered dimension simultaneously (the default key-sorted
layout gives tight bounds only on the sort prefix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable

XY = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _xy(spark, n=20000):
    # x and y vary independently of each other AND of the key order, so the
    # default k-sorted layout has useless per-file bounds on both
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7919) % 100).alias("y"),
        F.lit(1).cast("long").alias("seq"),
    )


def _rows(df):
    return sorted((r["k"], r["x"], r["y"]) for r in df.select("k", "x", "y").collect())


def _make(spark, tmp_path, n=20000, buckets=2):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), XY, ["k"], num_buckets=buckets,
        lww_order=[("seq", False)],
    )
    t.append_delta(_xy(spark, n))
    return t


def test_cluster_preserves_state_and_skips_both_dims(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _rows(t.read_current())
    snap = t.cluster(["x", "y"], bits=8, max_rows_per_file=500)
    assert snap.operation == "replace"
    assert _rows(t.read_current()) == before
    live = len(snap.files)
    assert live > t.snapshot().num_buckets  # bounded files actually split
    import json

    assert set(json.loads(snap.properties["stats.cols"])) >= {"x", "y"}
    for col in ("x", "y"):
        got = t.read(filters=[(col, ">=", 10), (col, "<=", 19)])
        assert sorted(r["k"] for r in got.collect()) == sorted(
            r["k"] for r in _xy(spark).where(F.col(col).between(10, 19)).collect()
        )
        # the point of z-order: BOTH dimensions skip most files
        assert t.last_scan_files < live / 2, (col, t.last_scan_files, live)


def test_cluster_twice_uses_manifest_bounds(spark, tmp_path):
    """First cluster() must fall back to an agg pass (the default layout
    records no x/y bounds); the second finds every live file carrying
    bounds and computes them driver-side. Both produce identical state."""
    t = _make(spark, tmp_path, n=5000)
    assert t._manifest_bounds(t.snapshot(), ["x", "y"]) is None
    before = _rows(t.read_current())
    t.cluster(["x", "y"], bits=8, max_rows_per_file=500)
    b = t._manifest_bounds(t.snapshot(), ["x", "y"])
    assert b == {"x": (0, 99), "y": (0, 99)}
    t.cluster(["x", "y"], bits=8, max_rows_per_file=500)
    assert _rows(t.read_current()) == before


def test_cluster_retains_tombstone_shadow(spark, tmp_path):
    sch = T.StructType(list(XY.fields) + [T.StructField("_deleted", T.BooleanType(), True)])
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), sch, ["k"], num_buckets=2, lww_order=[("seq", False)]
    )
    t.append_delta(_xy(spark, 100).withColumn("_deleted", F.lit(False)))
    t.append_delta(
        _xy(spark, 100).where("k < 10")
        .withColumn("_deleted", F.lit(True)).withColumn("seq", F.lit(5).cast("long"))
    )
    t.cluster(["x"], bits=8, max_rows_per_file=20)
    assert t.read().where(F.col("_deleted")).count() == 10
    # a late old live rev must still lose to the retained tombstone
    t.append_delta(
        _xy(spark, 100).where("k < 2")
        .withColumn("_deleted", F.lit(False)).withColumn("seq", F.lit(3).cast("long"))
    )
    alive = {r["k"] for r in t.read_current(drop_tombstones=True).collect()}
    assert alive == set(range(10, 100))


def test_cluster_changelog_invisible(spark, tmp_path):
    t = _make(spark, tmp_path, n=1000)
    v0 = t.current_version()
    t.cluster(["x"], bits=8, max_rows_per_file=100)
    t.append_delta(_xy(spark, 1000).where("k < 5").withColumn("seq", F.lit(2).cast("long")))
    ch = t.changes(v0)  # strict must pass: cluster is replace-class
    assert sorted(r["k"] for r in ch.collect()) == [0, 1, 2, 3, 4]


def test_cluster_validation(spark, tmp_path):
    sch = T.StructType(list(XY.fields) + [T.StructField("s", T.StringType(), True)])
    t = SnapshotTable.create(spark, str(tmp_path / "t"), sch, ["k"], num_buckets=2)
    t.append_delta(_xy(spark, 10).withColumn("s", F.lit("a")))
    with pytest.raises(ValueError):
        t.cluster([])
    with pytest.raises(ValueError):
        t.cluster(["x", "x"])
    with pytest.raises(ValueError):
        t.cluster(["s"])  # strings have no min-max locality rank
    with pytest.raises(ValueError):
        t.cluster(["x", "y"], bits=31)  # 62 bits > 60
    with pytest.raises(ValueError):
        t.cluster(["nope"])


class _RacyClusterTable(SnapshotTable):
    def __init__(self, spark, path, late_df):
        super().__init__(spark, path)
        self._late = late_df
        self._armed = True

    def _write_data(self, df, snap, level, **kw):
        files = super()._write_data(df, snap, level, **kw)
        if self._armed:
            self._armed = False
            SnapshotTable(self.spark, self.path).append_delta(self._late)
        return files


def test_cluster_does_not_lose_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, XY, ["k"], num_buckets=2, lww_order=[("seq", False)])
    t.append_delta(_xy(spark, 1000))
    late = _xy(spark, 1020).where("k >= 1000").withColumn("seq", F.lit(2).cast("long"))
    racy = _RacyClusterTable(spark, path, late)
    racy.cluster(["x"], bits=8, max_rows_per_file=100)
    got = {r["k"] for r in t.read_current().collect()}
    assert len(got) == 1020 and 1010 in got, "cluster dropped a concurrent append"
