"""Minor compaction (SnapshotTable.compact_deltas): bin-pack delta files
per bucket without touching the base — the LSM minor compaction between
full compact() refolds. Pins:

- reconciled state is byte-identical across the pack (incl. tombstone
  shadows and the MOR fold-rank tiebreak);
- base files carry over verbatim; only candidate buckets' deltas rewrite;
- delta file count collapses to one per packed bucket;
- cdc-level change files are never touched;
- the replace commit is changelog-invisible (a strict consumer sees no
  change and its cursor still advances past it);
- schema evolution: old delta files missing a later column pack cleanly
  (null projection);
- nothing-to-pack is a version no-op; concurrent appends are never
  swallowed (S4 retry).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cht_sync_spark.streaming.consumer import ChangelogConsumer
from cht_sync_spark.tables.format import SnapshotTable

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


def _mk(spark, path, cdc=False) -> SnapshotTable:
    return SnapshotTable.create(
        spark, str(path), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        bucket_cols=["conv_id"], lww_order=[("seq", False)],
        properties={"cdc.enabled": "true"} if cdc else None,
    )


def _state(t, **kw):
    return {
        (r.conv_id, r.turn_idx, r.text, r.seq, r._deleted)
        for r in t.read_current(**kw).collect()
    }


def _seed_deltas(spark, t):
    t.append_delta(_rows(spark, [("a", 0, "a0", 1, False), ("b", 0, "b0", 2, False)]))
    t.append_delta(_rows(spark, [("a", 0, "a0-edit", 3, False), ("a", 1, "a1", 4, False)]))
    t.append_delta(_rows(spark, [("b", 0, None, 5, True)]))  # tombstone shadow


def test_state_preserved_and_files_packed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed_deltas(spark, t)
    before = _state(t)
    n_delta_before = sum(1 for f in t.snapshot().files if f["level"] == "delta")
    assert n_delta_before >= 4  # several small per-epoch files
    snap = t.compact_deltas()
    assert snap.operation == "replace"
    assert _state(t) == before
    # one delta file per packed bucket
    per = {}
    for f in snap.files:
        if f["level"] == "delta":
            per.setdefault(f["bucket"], []).append(f)
    assert per and all(len(fs) == 1 for fs in per.values())
    # tombstone shadow survives the pack: (b, 0) stays hidden
    assert not [r for r in t.read_current(drop_tombstones=True).collect() if r.conv_id == "b"]


def test_base_files_untouched_and_fold_parity_with_compact(spark, tmp_path):
    ta, tb = _mk(spark, tmp_path / "a"), _mk(spark, tmp_path / "b")
    for t in (ta, tb):
        t.append_delta(_rows(spark, [("a", 0, "v1", 1, False), ("b", 0, "b0", 2, False)]))
        t.compact()  # establish a base
        t.append_delta(_rows(spark, [("a", 0, "v2", 3, False)]))
        t.append_delta(_rows(spark, [("a", 0, "v3", 4, False)]))
    base_before = {f["path"] for f in ta.snapshot().files if f["level"] == "base"}
    snap = ta.compact_deltas()
    base_after = {f["path"] for f in snap.files if f["level"] == "base"}
    assert base_after == base_before  # carried by reference, never rewritten
    # minor-pack then read == full compact state
    tb.compact()
    assert _state(ta) == _state(tb)


def test_changelog_invisible_and_cdc_untouched(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", cdc=True)
    from cht_sync_spark.tables.merge import merge_upsert

    merge_upsert(t, _rows(spark, [("a", 0, "v1", 1, False)]))  # cdc files land
    t.append_delta(_rows(spark, [("a", 1, "x", 2, False)]))
    t.append_delta(_rows(spark, [("a", 2, "y", 3, False)]))
    tgt = ChangelogConsumer.create_target(spark, t, str(tmp_path / "m"), "mirror")
    c = ChangelogConsumer(spark, t, tgt, "mirror")
    c.run(max_cycles=10)
    cdc_before = {f["path"] for f in t.snapshot().files if f["level"] == "cdc"}
    v0 = t.current_version()
    snap = t.compact_deltas()
    assert snap.version > v0
    assert {f["path"] for f in snap.files if f["level"] == "cdc"} == cdc_before
    # strict consumer crosses the replace with zero delivered rows
    res = c.run(max_cycles=10)
    assert sum(r.rows for r in res) == 0
    assert _state(tgt, drop_tombstones=True) == _state(t, drop_tombstones=True)


def test_schema_evolution_projection(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append_delta(_rows(spark, [("a", 0, "old", 1, False)]))
    wider_batch = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=1, text="new", seq=2, _deleted=False, tool="search")],
        T.StructType(list(SCHEMA.fields) + [T.StructField("tool", T.StringType(), True)]),
    )
    t.append_delta(wider_batch, new_schema=t.evolve_schema(wider_batch.schema))
    snap = t.compact_deltas()
    got = {(r.conv_id, r.turn_idx, r.text, r.tool) for r in t.read_current().collect()}
    assert got == {("a", 0, "old", None), ("a", 1, "new", "search")}
    per = [f for f in snap.files if f["level"] == "delta"]
    assert len(per) == len({f["bucket"] for f in per})


def test_noop_and_min_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append_delta(_rows(spark, [("a", 0, "v1", 1, False)]))
    v = t.current_version()
    assert t.compact_deltas().version == v  # one file per bucket: no-op
    assert t.compact_deltas(min_files=1).version == v + 1  # forced single-file rewrite
    with pytest.raises(ValueError, match="min_files"):
        t.compact_deltas(min_files=0)


def test_pipeline_minor_cadence(spark, feed_path, tmp_path):
    """minor_compact_every packs the MOR landing's deltas in-loop: final
    state equals an uncadenced run, delta files stay bounded at one per
    touched bucket, and exactly-once markers are unaffected."""
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    def run(path, **kw):
        feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
        p = ReplayPipeline(spark, feed, str(path), batch_size=150,
                           num_buckets=4, mode="mor", **kw)
        p.run()
        return p

    a = run(tmp_path / "cadence", minor_compact_every=1)
    b = run(tmp_path / "plain")
    per = {}
    for f in a.table.snapshot().files:
        if f["level"] == "delta":
            per.setdefault(f["bucket"], []).append(f)
    assert per and all(len(fs) == 1 for fs in per.values())
    sa = a.table.read_current(drop_tombstones=True)
    sb = b.table.read_current(drop_tombstones=True)
    assert sa.count() == sb.count()
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0
    # resume is a no-op: the replace snapshots never disturb the watermark
    # (a fresh pipeline on the same table applies zero batches)
    resumed = run(tmp_path / "cadence", minor_compact_every=1)
    sa2 = resumed.table.read_current(drop_tombstones=True)
    assert sa2.count() == sa.count() and sa2.exceptAll(sb).count() == 0


def test_streaming_minor_cadence(spark, feed_path, tmp_path):
    """The streaming runner's minor_compact_every mirrors the pipeline's:
    per-trigger MOR deltas stay packed at one per touched bucket and the
    final state matches the batch replay."""
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline
    from cht_sync_spark.streaming.stream import StreamingReplay

    sr = StreamingReplay(
        spark, feed_path, str(tmp_path / "t"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, num_buckets=4, mode="mor",
        sources=feed_sources(), minor_compact_every=1,
    )
    sr.run_available_now()
    per = {}
    for f in sr.table.snapshot().files:
        if f["level"] == "delta":
            per.setdefault(f["bucket"], []).append(f)
    assert per and all(len(fs) == 1 for fs in per.values())
    ref = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "ref"), batch_size=300, num_buckets=4,
    )
    ref.run()
    sa = sr.table.read_current(drop_tombstones=True)
    sb = ref.table.read_current(drop_tombstones=True)
    cols = sb.columns
    assert sa.select(cols).exceptAll(sb).count() == 0
    assert sb.exceptAll(sa.select(cols)).count() == 0


def test_concurrent_append_never_swallowed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _seed_deltas(spark, t)
    orig = t.commit
    raced = {"done": False}

    def racing_commit(**kw):
        if not raced["done"] and kw.get("operation") == "replace":
            raced["done"] = True
            t2 = SnapshotTable(spark, t.path)
            t2.append_delta(_rows(spark, [("z", 0, "late", 99, False)]))
        return orig(**kw)

    t.commit = racing_commit  # type: ignore[method-assign]
    try:
        t.compact_deltas()
    finally:
        t.commit = orig  # type: ignore[method-assign]
    assert ("z", 0, "late", 99, False) in _state(t)
