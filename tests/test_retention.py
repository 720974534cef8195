"""Predicate retention / TTL (SnapshotTable.expire_rows).

Retention is purge-by-predicate: every key whose LWW WINNER dates before
the cutoff leaves the live state with no row and no tombstone. Pins:

- expired state == winner-predicate oracle, evaluated on the WINNER (an
  older shadowed version with a larger ts must not resurrect or retain);
- NULL retention values never expire (rows retention cannot date);
- bucket pruning: buckets whose file stats cannot admit col < cutoff are
  untouched and carry over by file reference;
- metadata-only drop: with cdc_markers=False, a bucket whose every file
  is footer-proven all-expired (hi < cutoff, null-free) is removed with
  NO Spark read;
- the nulls flag blocks the metadata drop when nulls are present;
- cdc markers: changes() across a retention commit delivers content-free
  deletes a strict ChangelogConsumer cascades; without markers strict
  changes() refuses;
- no-match expiry is a metadata no-op (idempotent re-runs);
- a concurrent append during the expiry is never swallowed (S4 retry).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.streaming.consumer import ChangelogConsumer
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("age", T.LongType()),  # the retention column
        T.StructField("seq", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)


def _rows(spark, items):
    return spark.createDataFrame(
        [
            Row(conv_id=c, turn_idx=t, text=x, age=a, seq=s, _deleted=d)
            for c, t, x, a, s, d in items
        ],
        SCHEMA,
    )


def _mk(spark, path, cdc=False, stats_age=True) -> SnapshotTable:
    props = {}
    if cdc:
        props["cdc.enabled"] = "true"
    if stats_age:
        props["stats.cols"] = '["conv_id", "turn_idx", "age"]'
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=["conv_id"],
        lww_order=[("seq", False)],
        properties=props or None,
    )


def _state(t, **kw):
    return {
        (r.conv_id, r.turn_idx, r.text, r.age, r.seq, r._deleted)
        for r in t.read_current(**kw).collect()
    }


def _seed(spark, t):
    merge_upsert(t, _rows(spark, [
        ("a", 0, "a0", 100, 1, False), ("a", 1, "a1", 105, 2, False),
        ("b", 0, "b0", 200, 3, False), ("c", 0, "c0", 300, 4, False),
    ]))
    # MOR delta so the superseded versions stay physically on disk. Clock
    # skew: the WINNER of (a, 0) has a SMALLER age than the shadowed
    # version — retention must judge the winner, and removing the key must
    # not resurrect the shadowed version
    t.append_delta(_rows(spark, [
        ("a", 0, "a0-edit", 90, 5, False), ("c", 0, "c0-edit", 310, 6, False),
    ]))


def test_expire_matches_winner_oracle(spark, tmp_path):
    # cdc markers force the read path, so n counts expired WINNERS
    t = _mk(spark, tmp_path / "t", cdc=True)
    _seed(spark, t)
    snap, n = t.expire_rows("age", 150)
    # winners: (a,0) age 90 expired, (a,1) 105 expired, (b,0) 200 kept,
    # (c,0) winner 310 kept
    assert n == 2
    assert _state(t) == {
        ("b", 0, "b0", 200, 3, False),
        ("c", 0, "c0-edit", 310, 6, False),
    }
    # the shadowed (a,0) age-100 version must not resurrect after compaction
    t.compact()
    assert _state(t) == {
        ("b", 0, "b0", 200, 3, False),
        ("c", 0, "c0-edit", 310, 6, False),
    }


def test_null_values_never_expire(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [
        ("a", 0, "dated", 10, 1, False), ("b", 0, "undated", None, 2, False),
    ]))
    _, n = t.expire_rows("age", 1_000_000)
    assert n == 1
    assert _state(t) == {("b", 0, "undated", None, 2, False)}


def test_bucket_pruning_by_file_stats(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # two conversations in different buckets: one all-old, one all-new
    ba, bb = t.bucket_for({"conv_id": "a"}), t.bucket_for({"conv_id": "b"})
    assert ba != bb
    merge_upsert(t, _rows(spark, [("a", 0, "old", 10, 1, False)]))
    merge_upsert(t, _rows(spark, [("b", 0, "new", 900, 2, False)]))
    before = {e["path"] for e in t.snapshot().files if e["bucket"] == bb}
    snap, n = t.expire_rows("age", 100)
    assert n == 1
    # the all-new bucket's files carried over verbatim (never rewritten)
    after = {e["path"] for e in snap.files if e["bucket"] == bb}
    assert after == before
    assert _state(t) == {("b", 0, "new", 900, 2, False)}


def test_metadata_only_full_bucket_drop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    ba, bb = t.bucket_for({"conv_id": "a"}), t.bucket_for({"conv_id": "b"})
    assert ba != bb
    merge_upsert(t, _rows(spark, [
        ("a", 0, "old0", 10, 1, False), ("a", 1, "old1", 20, 2, False),
    ]))
    merge_upsert(t, _rows(spark, [("b", 0, "new", 900, 3, False)]))
    sc = spark.sparkContext
    sc.setJobGroup("retchk", "metadata retention check")
    try:
        snap, n = t.expire_rows("age", 100, cdc_markers=False)
        jobs = list(sc.statusTracker().getJobIdsForGroup("retchk"))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert jobs == []  # ZERO Spark jobs: pure metadata
    assert n == 2  # manifest physical rows of the dropped bucket
    assert {e["bucket"] for e in snap.files} == {bb}
    assert _state(t) == {("b", 0, "new", 900, 3, False)}


def test_nulls_flag_blocks_metadata_drop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [
        ("a", 0, "old", 10, 1, False), ("a", 1, "undated", None, 2, False),
    ]))
    # the bucket's file has hi < cutoff on non-null values BUT holds a null:
    # the metadata drop must not fire, and the null row must survive
    stats = [e["stats"]["age"] for e in t.snapshot().files]
    assert any(s.get("nulls") for s in stats)
    _, n = t.expire_rows("age", 100, cdc_markers=False)
    assert n == 1
    assert _state(t) == {("a", 1, "undated", None, 2, False)}


def test_unstatted_column_is_conservative(spark, tmp_path):
    # age absent from stats.cols (the legacy-entry shape: no bounds, no
    # nulls flag): every bucket is touched, no metadata drop — a full
    # conservative rewrite that still expires correctly
    t = _mk(spark, tmp_path / "t", stats_age=False)
    merge_upsert(t, _rows(spark, [("a", 0, "old", 10, 1, False)]))
    assert "age" not in (t.snapshot().files[0].get("stats") or {})
    _, n = t.expire_rows("age", 100, cdc_markers=False)
    assert n == 1
    assert _state(t) == set()


def test_no_match_is_metadata_noop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    v = t.current_version()
    snap, n = t.expire_rows("age", 5)
    assert n == 0 and snap.version == v  # no new snapshot
    snap2, n2 = t.expire_rows("age", 5)
    assert n2 == 0 and snap2.version == v


def test_cdc_markers_cascade_to_strict_consumer(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", cdc=True)
    _seed(spark, t)
    tgt = ChangelogConsumer.create_target(spark, t, str(tmp_path / "m"), "mirror")
    c = ChangelogConsumer(spark, t, tgt, "mirror")
    c.run(max_cycles=10)
    snap, n = t.expire_rows("age", 150)
    assert n == 2 and snap.operation == "retention"
    # strict changelog delivers the expiry as content-free deletes
    ch = t.changes(snap.version - 1, snap.version).collect()
    assert {(r.conv_id, r.turn_idx, r._change_type) for r in ch} == {
        ("a", 0, "delete"), ("a", 1, "delete"),
    }
    assert all(r.text is None for r in ch)  # content-free markers
    c.run(max_cycles=10)
    assert _state(tgt, drop_tombstones=True) == _state(t, drop_tombstones=True)


def test_without_markers_strict_changelog_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # no cdc.enabled
    _seed(spark, t)
    snap, n = t.expire_rows("age", 150)
    # the fully-expired 'a' bucket drops by metadata: n reports its
    # PHYSICAL manifest rows (2 base + 1 delta), not winner count
    assert n == 3 and t.last_expire_meta_buckets
    with pytest.raises(ValueError, match="retention"):
        t.changes(snap.version - 1, snap.version).collect()


def test_timestamp_cutoff_datetime_and_micros_agree(spark, tmp_path):
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    rows = [
        Row(k="old", ts=dt.datetime(2020, 1, 1), seq=1, _deleted=False),
        Row(k="new", ts=dt.datetime(2025, 1, 1), seq=2, _deleted=False),
    ]
    cut = dt.datetime(2024, 1, 1)
    cut_us = int(cut.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    for i, cutoff in enumerate([cut, cut_us]):
        t = SnapshotTable.create(
            spark, str(tmp_path / f"t{i}"), schema, key_cols=["k"],
            num_buckets=2, lww_order=[("seq", False)],
            properties={"stats.cols": '["ts"]'},
        )
        merge_upsert(t, spark.createDataFrame(rows, schema))
        _, n = t.expire_rows("ts", cutoff)
        assert n == 1
        assert [r.k for r in t.read_current().collect()] == ["new"]


def test_concurrent_append_never_swallowed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed(spark, t)
    orig = t.commit

    raced = {"done": False}

    def racing_commit(**kw):
        if not raced["done"] and kw.get("operation") == "retention":
            raced["done"] = True
            # a concurrent writer lands between the read and the commit
            t2 = SnapshotTable(spark, t.path)
            t2.append_delta(_rows(spark, [("z", 0, "late", 999, 50, False)]))
        return orig(**kw)

    t.commit = racing_commit  # type: ignore[method-assign]
    try:
        _, n = t.expire_rows("age", 150)
    finally:
        t.commit = orig  # type: ignore[method-assign]
    assert n == 3  # physical rows of the metadata-dropped 'a' bucket
    st = _state(t)
    assert ("z", 0, "late", 999, 50, False) in st
    assert not any(r[0] == "a" for r in st)
