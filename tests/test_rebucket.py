"""Bucket-layout evolution (`SnapshotTable.rebucket`) — the Iceberg
partition-spec-evolution analogue. A layout sized for 10^8 rows is wrong at
10^10; rebucket rewrites the folded state into a new hash layout in ONE
atomic replace-class commit: content-preserving (so changelog readers skip
it like compaction), time travel keeps the old layout per snapshot, and
every later operation (merge pruning, point lookups, bucket_for) picks up
the new layout from the snapshot it reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

KV = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

TOMB = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _kv(spark, lo, hi, v, seq):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v"), F.lit(seq).cast("long").alias("seq")
    )


def _tomb(spark, lo, hi, v, deleted, seq):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(v).alias("v"),
        F.lit(deleted).alias("_deleted"),
        F.lit(seq).cast("long").alias("seq"),
    )


def _state(t, **kw):
    return sorted(
        (r["k"], r["v"], r["seq"]) for r in t.read_current(**kw).select("k", "v", "seq").collect()
    )


def test_rebucket_preserves_state_and_changes_layout(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 120, "a", 1))
    t.append_delta(_kv(spark, 60, 180, "b", 2))  # overlapping: fold must pick b
    before = _state(t)
    v_old = t.current_version()

    snap = t.rebucket(16)
    assert snap.num_buckets == 16 and snap.version == v_old + 1
    assert snap.operation == "replace"
    assert _state(t) == before
    # every live file sits in the new layout, fully folded to base level
    assert all(f["level"] == "base" for f in snap.files)
    assert {f["bucket"] for f in snap.files} <= set(range(16))
    assert len({f["bucket"] for f in snap.files}) > 4  # actually spread wider
    # time travel: the old snapshot keeps the OLD layout and content
    assert t.snapshot(v_old).num_buckets == 4
    assert _state(t, version=v_old) == before


def test_rebucket_noop_and_validation(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 10, "a", 1))
    v = t.current_version()
    assert t.rebucket(4).version == v  # same layout: no commit
    with pytest.raises(ValueError):
        t.rebucket(0)
    with pytest.raises(ValueError):
        t.rebucket(8, bucket_cols=["v"])  # not a subset of key_cols


def test_rebucket_point_lookup_prunes_new_layout(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=2)
    t.append_delta(_kv(spark, 0, 400, "a", 1))
    t.rebucket(16)
    live = len(t.snapshot().files)
    got = t.read_current(filters=[("k", "=", 7)]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(7, "a")]
    assert t.last_scan_files < live  # pruned to the new layout's one bucket
    # bucket_for agrees with where the row actually landed
    b = t.bucket_for({"k": 7})
    raw = t.read(buckets=[b]).where(F.col("k") == 7).collect()
    assert len(raw) == 1


def test_rebucket_merge_after_uses_new_layout(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=2)
    merge_upsert(t, _kv(spark, 0, 100, "a", 1))
    t.rebucket(8)
    merge_upsert(t, _kv(spark, 50, 150, "b", 2))
    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert len(got) == 150 and got[0] == "a" and got[99] == "b" and got[149] == "b"
    assert {f["bucket"] for f in t.snapshot().files} <= set(range(8))


def test_rebucket_retains_tombstone_shadow(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TOMB, ["k"], num_buckets=4, lww_order=[("seq", False)]
    )
    t.append_delta(_tomb(spark, 0, 50, "live", False, 1))
    t.append_delta(_tomb(spark, 10, 20, None, True, 5))  # delete k=10..19
    t.rebucket(16)
    # tombstones survive the rewrite (they must keep shadowing late old revs)
    raw = t.read()
    assert raw.where(F.col("_deleted")).count() == 10
    # a LATE replay of an older live rev for a deleted key must still lose
    t.append_delta(_tomb(spark, 10, 12, "stale", False, 3))
    alive = {r["k"] for r in t.read_current(drop_tombstones=True).collect()}
    assert alive == set(range(0, 10)) | set(range(20, 50))


def test_rebucket_changelog_invisible(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 30, "a", 1))
    v0 = t.current_version()
    t.append_delta(_kv(spark, 30, 60, "b", 2))
    t.rebucket(8)
    t.append_delta(_kv(spark, 60, 90, "c", 3))
    ch = t.changes(v0)  # strict: must NOT raise — rebucket is replace-class
    rows = [(r["k"], r["v"]) for r in ch.collect()]
    assert sorted(rows) == sorted(
        [(k, "b") for k in range(30, 60)] + [(k, "c") for k in range(60, 90)]
    ), "rebucket restated rows leaked into the changelog"


def test_rebucket_narrow_bucket_cols_to_group_prefix(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
    )
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        sch,
        ["conv_id", "turn_idx"],
        num_buckets=4,
        lww_order=[("seq", False)],
    )
    df = spark.range(0, 200).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("conv_id"),
        (F.col("id") / 20).cast("int").alias("turn_idx"),
        F.lit("x").alias("v"),
        F.lit(1).cast("long").alias("seq"),
    )
    t.append_delta(df)
    before = sorted((r["conv_id"], r["turn_idx"]) for r in t.read_current().collect())
    # narrow the layout to the group prefix: all turns of a conv co-locate
    t.rebucket(8, bucket_cols=["conv_id"])
    assert sorted((r["conv_id"], r["turn_idx"]) for r in t.read_current().collect()) == before
    b = t.bucket_for({"conv_id": "c3"})
    in_bucket = t.read(buckets=[b]).where(F.col("conv_id") == "c3").count()
    assert in_bucket == 10  # every turn of the conversation in ONE bucket


class _RacyRebucketTable(SnapshotTable):
    """Injects a concurrent delta append between rebucket's fold-read/write
    and its commit — the window where an unpinned rewrite would silently
    DROP the appended rows."""

    def __init__(self, spark, path, late_df):
        super().__init__(spark, path)
        self._late = late_df
        self._armed = True

    def _write_data(self, df, snap, level):
        files = super()._write_data(df, snap, level)
        if self._armed:
            self._armed = False
            SnapshotTable(self.spark, self.path).append_delta(self._late)
        return files


def test_rebucket_does_not_lose_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 100, "a", 1))
    racy = _RacyRebucketTable(spark, path, _kv(spark, 100, 120, "late", 2))
    snap = racy.rebucket(16)
    assert snap.num_buckets == 16
    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert len(got) == 120 and got[110] == "late", "rebucket dropped a concurrent append"
