"""SnapshotTable.as_view — the Spark SQL surface over reconciled state."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert


SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(k=k, v=v, seq=s, _deleted=d) for k, v, s, d in items], SCHEMA
    )


def test_view_matches_read_current_and_reregisters(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"],
        num_buckets=2, lww_order=[("seq", False)],
    )
    t.append_delta(_rows(spark, [("a", "x", 1, False), ("b", "y", 2, False)]))
    merge_upsert(t, _rows(spark, [("a", "x2", 3, False), ("c", "z", 4, True)]))
    t.as_view("tv")
    got = {(r.k, r.v) for r in spark.sql("SELECT k, v FROM tv").collect()}
    # tombstones dropped by default; LWW winner folded
    assert got == {("a", "x2"), ("b", "y")}
    # the view is a plan over the registration-time snapshot: advancing the
    # table requires re-registering (documented contract)
    merge_upsert(t, _rows(spark, [("b", "y2", 5, False)]))
    t.as_view("tv")
    got2 = {(r.k, r.v) for r in spark.sql("SELECT k, v FROM tv").collect()}
    assert got2 == {("a", "x2"), ("b", "y2")}
    # keep-tombstones form exposes the delete stubs
    t.as_view("tv_all", drop_tombstones=False)
    assert spark.sql("SELECT COUNT(*) AS n FROM tv_all WHERE _deleted").first()["n"] == 1
