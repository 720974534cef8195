"""Change Data Feed for copy-on-write merges (cdc.enabled table property).

A COW merge restates whole buckets, so its added base files over-deliver as
a changelog. With ``cdc.enabled='true'`` the merge also records its exact
(deduped, conformed) batch as 'cdc'-level files in the same atomic commit —
Delta's Change Data Feed. Pins: changes() prefers cdc files and becomes
exact for overwrite snapshots; normal reads never see cdc files; compaction
drops them from the live fold but history stays readable for the retention
window; vacuum removes them only after their snapshots expire; a strict
ChangelogConsumer can tail a cdc-enabled COW producer end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.streaming.consumer import ChangelogConsumer
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


def _mk(spark, path, cdc=True) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        lww_order=[("seq", False)],
        properties={"cdc.enabled": "true"} if cdc else None,
    )


def _state(t):
    return {(r.conv_id, r.turn_idx, r.text, r.seq) for r in t.read_current().collect()}


def test_cow_merge_changelog_is_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]))
    v1 = t.current_version()
    # second merge touches ONE key; without CDF the changelog would restate
    # every row of the rewritten bucket
    merge_upsert(t, _rows(spark, [("a", 0, "x2", 3, False), ("c", 0, "z", 4, True)]))
    ch = t.changes(v0)  # strict default: must NOT raise
    got = {(r.conv_id, r.turn_idx, r.text, r._change_version, r._change_type) for r in ch.collect()}
    assert got == {
        ("a", 0, "x", v1, "upsert"),
        ("b", 0, "y", v1, "upsert"),
        ("a", 0, "x2", v1 + 1, "upsert"),
        ("c", 0, None if False else "z", v1 + 1, "delete"),
    }
    # exactly-once: folding the changelog with the table's own LWW equals
    # the tip state
    from cht_sync_spark.operators.lww import lww_dedup

    folded = lww_dedup(
        ch.drop("_change_version", "_change_type"),
        key=["conv_id", "turn_idx"], order=[("seq", False)],
    )
    assert {tuple(r) for r in folded.collect()} == {tuple(r) for r in t.read_current().collect()}


def test_cdc_files_invisible_to_reads(spark, tmp_path):
    on = _mk(spark, tmp_path / "on", cdc=True)
    off = _mk(spark, tmp_path / "off", cdc=False)
    batch1 = [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]
    batch2 = [("a", 0, "x2", 3, False)]
    for t in (on, off):
        merge_upsert(t, _rows(spark, batch1))
        merge_upsert(t, _rows(spark, batch2))
    assert _state(on) == _state(off)
    # cdc entries exist only on the enabled table and only at level 'cdc'
    assert any(f["level"] == "cdc" for f in on.snapshot().files)
    assert not any(f["level"] == "cdc" for f in off.snapshot().files)
    on.read()  # default read lists base+delta only
    n_visible = on.last_scan_files
    assert n_visible == sum(1 for f in on.snapshot().files if f["level"] != "cdc")


def test_compaction_bounds_cdc_metadata_history_stays_readable(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False)]))
    merge_upsert(t, _rows(spark, [("a", 0, "x2", 2, False)]))
    pre = _state(t)
    t.compact()
    # live fold carries no cdc entries after compaction...
    assert not any(f["level"] == "cdc" for f in t.snapshot().files)
    assert _state(t) == pre
    # ...but the historical changelog still reads them exactly
    ch = t.changes(v0)
    texts = {(r.text, r._change_type) for r in ch.collect()}
    assert texts == {("x", "upsert"), ("x2", "upsert")}


def test_vacuum_retires_cdc_with_snapshot_retention(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(4):
        merge_upsert(t, _rows(spark, [("a", 0, f"v{i}", i + 1, False)]))
    t.compact()
    pre = _state(t)
    t.expire_snapshots(keep_last=1)
    t.vacuum(grace_seconds=0.0)
    assert _state(t) == pre  # live state untouched
    import os

    # every cdc file of the expired merges is physically gone
    leftovers = [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(t.path)
        for f in fns
        if f.endswith(".parquet")
    ]
    live = {os.path.normpath(os.path.join(t.path, f["path"])) for f in t.snapshot().files}
    assert {os.path.normpath(p) for p in leftovers} == live
    # and the changelog past the retention window is gone with them
    with pytest.raises(Exception):
        t.changes(1)


def test_strict_consumer_tails_cow_producer(spark, tmp_path):
    src = _mk(spark, tmp_path / "src")
    tgt = ChangelogConsumer.create_target(spark, src, str(tmp_path / "tgt"), "m")
    c = ChangelogConsumer(spark, src, tgt, "m")  # strict default
    merge_upsert(src, _rows(spark, [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]))
    r1 = c.run_once()
    assert r1 is not None and r1.rows == 2
    merge_upsert(src, _rows(spark, [("a", 0, "x2", 3, False), ("b", 0, None, 4, True)]))
    r2 = c.run_once()
    assert r2 is not None and r2.rows == 2  # exact: only the changed keys
    assert _state(tgt) == _state(src)
    assert c.run_once() is None


def test_cdc_only_buckets_retire_without_data_rewrite(spark, tmp_path):
    """Compacting a pure-COW table (no deltas, only cdc entries) is a
    METADATA-only commit: base files carry over verbatim, cdc entries
    leave the live fold (review finding — refolding identical bases just
    to drop manifest rows doubles merge write I/O)."""
    t = _mk(spark, tmp_path / "t")
    merge_upsert(t, _rows(spark, [("a", 0, "x", 1, False), ("b", 0, "y", 2, False)]))
    pre = t.snapshot()
    base_paths = {f["path"] for f in pre.files if f["level"] == "base"}
    assert any(f["level"] == "cdc" for f in pre.files)
    t.compact()
    post = t.snapshot()
    assert not any(f["level"] == "cdc" for f in post.files)
    assert {f["path"] for f in post.files if f["level"] == "base"} == base_paths
    assert _state(t) == {("a", 0, "x", 1), ("b", 0, "y", 2)}
