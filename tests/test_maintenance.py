"""Table maintenance: snapshot expiry, orphan vacuum, pending probe."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

KV = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _kv(spark, lo, hi, v, seq):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v"), F.lit(seq).cast("long").alias("seq")
    )


def _disk_parquets(path):
    out = []
    for dirpath, _d, files in os.walk(os.path.join(path, "data")):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_expire_and_vacuum_reclaim_space(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=4)
    for i in range(4):
        t.append_delta(_kv(spark, i * 50, (i + 1) * 50, f"v{i}", i))
    t.compact()
    versions_before = len(t.history())
    files_before = len(_disk_parquets(path))
    live_files = len(t.snapshot().files)
    assert files_before > live_files  # pre-compact deltas still on disk

    # vacuum WITHOUT expiry keeps everything (old snapshots still reference
    # the deltas — time travel must not break); grace disabled: quiesced table
    assert t.vacuum(grace_seconds=0) == 0
    assert len(_disk_parquets(path)) == files_before

    removed_manifests = t.expire_snapshots(keep_last=1)
    assert removed_manifests == versions_before - 1
    removed_files = t.vacuum(grace_seconds=0)
    # orphaned data files AND the expired snapshots' now-unreferenced
    # manifest files are both collected
    assert removed_files >= files_before - live_files
    assert len(_disk_parquets(path)) == live_files
    from cht_sync_spark.tables.format import _MANDIR

    live_manifests = set(t.snapshot().manifests)
    on_disk = {
        os.path.join(_MANDIR, f) for f in os.listdir(os.path.join(path, _MANDIR))
    }
    assert on_disk == live_manifests

    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert len(got) == 200 and got[199] == "v3"


def test_vacuum_removes_losing_race_orphans(spark, tmp_path):
    path = str(tmp_path / "t2")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=4)
    merge_upsert(t, _kv(spark, 0, 100, "a", 1))
    # simulate a failed/crashed commit attempt: data written, never committed
    snap = t.snapshot()
    t._write_data(_kv(spark, 0, 10, "orphan", 9), snap, level="base")
    n_live = len(t.snapshot().files)
    assert len(_disk_parquets(path)) > n_live

    # DEFAULT grace window: freshly-written unreferenced files are an
    # in-flight commit as far as vacuum can tell (writers write data BEFORE
    # the manifest) — they must survive, or a concurrent commit would land
    # pointing at deleted files
    assert t.vacuum() == 0
    assert len(_disk_parquets(path)) > n_live

    removed = t.vacuum(grace_seconds=0)
    assert removed >= 1
    assert len(_disk_parquets(path)) == n_live
    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert len(got) == 100 and got[5] == "a"  # orphan rows never visible


def test_vacuum_rmdirs_dirs_it_emptied_same_pass(spark, tmp_path):
    """ADVICE r4: vacuum's own os.remove calls refresh the parent dir's
    mtime, so the old mtime-only guard could never rmdir a dir emptied by
    the same pass — empty bucket dirs lingered a full extra grace window.
    A dir whose every walk-time entry was removed by this pass as
    past-grace must be rmdir'd in the SAME pass (nested dirs included)."""
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=2)
    t.append_delta(_kv(spark, 0, 20, "a", 1))

    old = 1_000_000_000  # well before any grace cutoff
    stale = os.path.join(path, "data", "stale_dir")
    sub = os.path.join(stale, "sub")
    os.makedirs(sub)
    for d in (stale, sub):
        with open(os.path.join(d, "orphan.parquet"), "wb") as f:
            f.write(b"x")
        os.utime(os.path.join(d, "orphan.parquet"), (old, old))
    os.utime(sub, (old, old))
    # parent mtime FRESH (just created) — only the emptied-by-us rule
    # can legalize the rmdir within this pass
    removed = t.vacuum(grace_seconds=3600)
    assert removed == 2
    assert not os.path.exists(stale)  # gone in ONE pass, not two
    assert t.read_current().count() == 20


def test_vacuum_staging_liveness_is_deepest_mtime(spark, tmp_path):
    """ADVICE r4: aged-staging removal keyed off the _temporary ROOT's
    mtime, set at job start — a legitimate job running longer than the
    grace window had its live staging rmtree'd while its newest task
    files were seconds old. Liveness must be the newest entry anywhere
    in the staging tree."""
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=2)
    t.append_delta(_kv(spark, 0, 20, "a", 1))

    old = 1_000_000_000
    staging = os.path.join(path, "data", "job1", "_temporary", "0", "task0")
    os.makedirs(staging)
    part = os.path.join(staging, "part-00000")
    with open(part, "wb") as f:
        f.write(b"inflight")
    # root mtime OLD (job started hours ago), deep task file FRESH
    tmp_root = os.path.join(path, "data", "job1", "_temporary")
    for d in (tmp_root, os.path.dirname(staging)):
        os.utime(d, (old, old))
    t.vacuum(grace_seconds=3600)
    assert os.path.exists(part)  # long-running writer's staging survives

    # once NOTHING in the tree is fresh, the crashed-job staging goes
    os.utime(part, (old, old))
    os.utime(staging, (old, old))
    t.vacuum(grace_seconds=3600)
    assert not os.path.exists(tmp_root)


def test_in_loop_maintenance_bounds_state(spark, feed_path, feed_df, tmp_path):
    """maintenance_every: the sustained-ingest loop folds deltas, expires
    manifests and vacuums on a cadence — final state identical to the
    unmaintained run, with BOUNDED live delta files and manifest count —
    on the landing table AND every model table (each model commits one
    snapshot per epoch, so an unmaintained model's manifest count grows
    O(batches))."""
    from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS
    from cht_sync_spark.sources.feedgen import feed_sources as _fs

    ref = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=_fs()),
        str(tmp_path / "ref"), batch_size=150, num_buckets=8, mode="mor",
        models=[(CONVERSATIONS, str(tmp_path / "ref_conv")),
                (CONV_PROFILES, str(tmp_path / "ref_prof"))],
        lineage_path=str(tmp_path / "ref_lin"),
    )
    ref.run()

    pipe = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=_fs()),
        str(tmp_path / "m"), batch_size=150, num_buckets=8, mode="mor",
        models=[(CONVERSATIONS, str(tmp_path / "m_conv")),
                (CONV_PROFILES, str(tmp_path / "m_prof"))],
        lineage_path=str(tmp_path / "m_lin"),
        maintenance_every=2, maintenance_keep_snapshots=3,
    )
    results = pipe.run()
    assert len(results) >= 3

    snap = pipe.table.snapshot()
    deltas = [f for f in snap.files if f["level"] == "delta"]
    # at most maintenance_every batches of deltas are ever live
    assert len({f["commit"] for f in deltas}) <= 2
    # manifest directories are bounded by the expiry policy — landing + models
    assert len(pipe.table.history()) <= 3 + 1
    for m in pipe.models:
        assert len(m.table.history()) <= 3 + 1, m.spec.name
        assert len(ref._runners_by_name[m.spec.name].table.history()) > 3 + 1

    a = sorted(map(tuple, pipe.table.read_current(drop_tombstones=True).collect()))
    b = sorted(map(tuple, ref.table.read_current(drop_tombstones=True).collect()))
    assert a == b, "maintenance must not change the reconciled state"
    # model state is also untouched by maintenance
    for m in pipe.models:
        got = sorted(map(tuple, m.table.read_current(drop_tombstones=True).collect()))
        want = sorted(map(tuple, ref._runners_by_name[m.spec.name]
                          .table.read_current(drop_tombstones=True).collect()))
        assert got == want, m.spec.name
    # the lineage table (one micro-append delta per batch) is folded and
    # expired too — unmaintained it grows O(batches) in both dimensions
    assert len(pipe.lineage.history()) <= 3 + 1
    n_lin_deltas = sum(1 for f in pipe.lineage.snapshot().files if f["level"] == "delta")
    assert n_lin_deltas <= 2
    assert len(ref.lineage.history()) > 3 + 1
    # compare everything but duration_ms (wall-clock: differs across runs)
    det = [c for c in pipe.lineage.snapshot().schema.names if c != "duration_ms"]
    lin_got = sorted(map(tuple, pipe.lineage.read_current().select(*det).collect()))
    lin_want = sorted(map(tuple, ref.lineage.read_current().select(*det).collect()))
    assert lin_got == lin_want, "maintenance must not change lineage content"


def test_pending_probe_in_checkpoints(spark, feed_df, tmp_path):
    dirs = []
    for p in range(2):
        d = str(tmp_path / f"part{p}")
        feed_df.where(F.pmod(F.xxhash64("id"), F.lit(2)) == p).write.parquet(d)
        dirs.append(d)
    feed = ChangesFeedSource(spark, dirs, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), num_buckets=8, mode="mor", probe_pending=True
    )
    cuts = feed.plan_batches(400)
    pipe.run_batch(0, -(2**62), cuts[0])

    want = {
        (r["source"], r["p"]): r["n"]
        for r in feed_df.withColumn("p", F.pmod(F.xxhash64("id"), F.lit(2)).cast("int"))
        .where(F.col("seq") > cuts[0])
        .groupBy("source", "p")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r["source"], r["partition_id"]): r["pending"]
        for r in pipe.checkpoints().collect()
    }
    assert got == want
    assert all(v > 0 for v in got.values())  # first batch leaves a backlog


def test_incremental_compaction_folds_only_touched_buckets(spark, tmp_path):
    """compact() is O(touched buckets): only buckets holding delta (or cdc)
    files are refolded; untouched buckets keep their base files verbatim,
    and the result equals a full rewrite."""
    path = str(tmp_path / "inc")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=8)
    t.append_delta(_kv(spark, 0, 400, "base", 1))
    t.compact()  # all 8 buckets get a base
    base_paths = {f["path"]: f["bucket"] for f in t.snapshot().files}
    # a localized update: single key -> one bucket's delta
    t.append_delta(_kv(spark, 7, 8, "edit", 2))
    touched = {f["bucket"] for f in t.snapshot().files if f["level"] == "delta"}
    assert len(touched) == 1
    want = {(r.k, r.v) for r in t.read_current().collect()}
    t.compact()
    after = t.snapshot()
    assert not any(f["level"] == "delta" for f in after.files)
    # untouched buckets kept their ORIGINAL base files (no rewrite)
    untouched_kept = [
        f for f in after.files if f["path"] in base_paths and f["bucket"] not in touched
    ]
    assert len(untouched_kept) == len(base_paths) - 1
    assert {(r.k, r.v) for r in t.read_current().collect()} == want
    # no-op when nothing to fold: version does not advance
    v = t.current_version()
    t.compact()
    assert t.current_version() == v


def test_tags_pin_snapshots_through_expire_and_vacuum(spark, tmp_path):
    """A tagged snapshot (Iceberg ref) survives expire_snapshots + vacuum:
    time travel to the tag keeps working and its files stay on disk; after
    drop_tag the snapshot becomes expirable again."""
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=2)
    t.append_delta(_kv(spark, 0, 30, "v0", 1))
    pinned = t.tag("audit")
    want = {(r.k, r.v) for r in t.read(version=pinned).collect()}
    for i in range(1, 4):
        t.append_delta(_kv(spark, 0, 30, f"v{i}", i + 1))
    t.compact()
    t.expire_snapshots(keep_last=1)
    t.vacuum(grace_seconds=0)
    assert t.tags() == {"audit": pinned}
    # historical read through the tag is intact post-maintenance
    got = {(r.k, r.v) for r in t.read(version=t.resolve_ref("audit")).collect()}
    assert got == want and all(v == "v0" for _, v in got)
    # dropping the tag releases the pin
    t.drop_tag("audit")
    t.expire_snapshots(keep_last=1)
    assert t.vacuum(grace_seconds=0) > 0
    import pytest

    with pytest.raises(Exception):
        t.read(version=pinned)


def test_in_loop_maintenance_covers_consumer_targets(spark, feed_path, tmp_path):
    """Attached consumers' target tables commit once per catch-up cycle —
    unmaintained they grow O(batches) in snapshots. The maintenance cadence
    must expire/fold them too, without changing their derived state."""
    from cht_sync_spark.sources.feedgen import feed_sources as _fs
    from cht_sync_spark.streaming import ChangelogConsumer, Scd2Consumer

    pipe = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=_fs()),
        str(tmp_path / "t"), batch_size=150, num_buckets=8, mode="mor",
        maintenance_every=2, maintenance_keep_snapshots=3,
    )
    t = pipe.table
    mirror = ChangelogConsumer.create_target(spark, t, str(tmp_path / "mirror"), "m")
    mc = ChangelogConsumer(spark, t, mirror, "m")
    hist = Scd2Consumer.create_target(spark, t, str(tmp_path / "hist"))
    sc = Scd2Consumer(spark, t, hist, "h")
    pipe.consumers = [mc, sc]
    results = pipe.run()
    assert len(results) >= 3
    # both consumer targets are expiry-bounded like the landing table
    assert len(mirror.history()) <= 3 + 1
    assert len(hist.history()) <= 3 + 1
    # and their derived state is exactly what a fresh full pass derives
    a = t.read_current(drop_tombstones=True)
    b = mirror.read_current(drop_tombstones=True)
    assert a.count() == b.count() and a.exceptAll(b).count() == 0
    assert hist.read_current().where("is_current").count() == a.count()
