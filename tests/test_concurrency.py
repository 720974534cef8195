"""Concurrency semantics: S4 commit-conflict retry, S8 in-process
multi-source fan-out, T14 model-level parallelism.

Reference behaviors being matched:
- deadlock rollback-and-retry on the bulk upsert (couch2pg/src/importer.js:
  132-138) -> optimistic-concurrency retry on snapshot commits;
- one concurrent watcher per database in a single process (couch2pg/src/
  index.js:7-11) -> one ReplayPipeline per source, same landing table,
  same SparkSession, concurrent threads;
- dbt model split across parallel daemons with isolated manifests
  (docker-compose.yml:40-62, e2e-test.spec.js:332-356) -> thread-pooled
  model maintenance with per-model epoch markers.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.tables.format import CommitConflict, SnapshotTable
from cht_sync_spark.tables.merge import merge_upsert

from tests.oracle import COMPARE_COLS, expected_state, table_to_state

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


def test_version_pin_raises_conflict(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    v = t.current_version()
    t.commit(add_files=[], properties_update={"x": "1"})  # someone else commits
    with pytest.raises(CommitConflict):
        t.commit(add_files=[], properties_update={"y": "2"}, expected_version=v)


def test_merge_retries_after_losing_commit_race(spark, tmp_path):
    """Deterministic S4 retry: a competing commit lands INSIDE the merge's
    post-write/pre-commit window (via the properties_fn hook), so the
    pinned commit conflicts and the merge must redo itself on the new tip."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), KV, ["k"], num_buckets=4)
    merge_upsert(t, _kv(spark, 0, 100, "base", 1))

    injected = {"done": False}

    def _inject():
        if not injected["done"]:
            injected["done"] = True
            # a second writer (fresh handle) wins the race for this version
            other = SnapshotTable(spark, str(tmp_path / "t"))
            merge_upsert(other, _kv(spark, 200, 220, "racer", 5))
        return {}

    stats = merge_upsert(t, _kv(spark, 50, 150, "upd", 2), properties_fn=_inject)
    assert stats.retries == 1
    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert got[0] == "base" and got[60] == "upd" and got[149] == "upd" and got[210] == "racer"
    assert len(got) == 170


class _RacyCompactTable(SnapshotTable):
    """Injects a concurrent delta append between compact's fold-read/write
    and its commit — the window where an unpinned compact would silently
    DROP the appended rows (they are removed but were never folded)."""

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


def test_compact_does_not_lose_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, KV, ["k"], num_buckets=4)
    t.append_delta(_kv(spark, 0, 100, "a", 1))
    racy = _RacyCompactTable(spark, path, _kv(spark, 100, 120, "late", 2))
    racy.compact()
    got = {r["k"]: r["v"] for r in t.read_current().collect()}
    assert len(got) == 120 and got[110] == "late", "compact dropped a concurrent append"


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_concurrent_multi_source_ingest(spark, feed_df, tmp_path, mode):
    """S8: one pipeline per source, SAME landing table, running concurrently
    in one session. Final state must equal the sequential-apply oracle over
    the union of both feeds; each worker keeps its own epoch/watermark
    marker namespace."""
    sources = sorted(r["source"] for r in feed_df.select("source").distinct().collect())
    dirs = []
    for i, s in enumerate(sources):
        p = str(tmp_path / f"feed{i}")
        feed_df.where(F.col("source") == s).write.mode("overwrite").parquet(p)
        dirs.append(p)

    table_path = str(tmp_path / "landing")

    def _ingest(i):
        pipe = ReplayPipeline(
            spark,
            ChangesFeedSource(spark, dirs[i], sources=feed_sources()),
            table_path,
            batch_size=300,
            num_buckets=8,
            mode=mode,
            marker=f"src{i}",
        )
        return pipe.run()

    with ThreadPoolExecutor(2, thread_name_prefix="watcher") as ex:
        results = [f.result() for f in [ex.submit(_ingest, i) for i in range(len(dirs))]]
    assert all(len(r) > 0 for r in results)

    t = SnapshotTable(spark, table_path)
    got = table_to_state([r.asDict() for r in t.read_current().collect()])
    want = expected_state([r.asDict() for r in feed_df.collect()])
    assert set(got) == set(want)
    for _id in want:
        for c in COMPARE_COLS:
            assert got[_id][c] == want[_id][c], f"{_id}.{c}"
    props = t.snapshot().properties
    assert "epoch.src0" in props and "epoch.src1" in props
    for s in sources:
        assert f"checkpoint.{s}" in props


def test_concurrent_streaming_queries_one_table(spark, feed_df, tmp_path):
    """S8, streaming form: one Structured Streaming query per source
    (own Spark checkpoint, own epoch-marker namespace), both draining into
    the SAME landing table concurrently."""
    from cht_sync_spark.streaming.stream import StreamingReplay

    sources = sorted(r["source"] for r in feed_df.select("source").distinct().collect())
    dirs = []
    for i, s in enumerate(sources):
        p = str(tmp_path / f"sfeed{i}")
        feed_df.where(F.col("source") == s).repartition(4).write.mode("overwrite").parquet(p)
        dirs.append(p)

    table_path = str(tmp_path / "slanding")
    replays = [
        StreamingReplay(
            spark, dirs[i], table_path, str(tmp_path / f"ckpt{i}"),
            max_files_per_trigger=2, mode="mor", sources=[s], marker=f"w{i}",
        )
        for i, s in enumerate(sources)
    ]
    qs = [
        r._stream()
        .writeStream.foreachBatch(r._apply_batch)
        .option("checkpointLocation", r.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        for r in replays
    ]
    for q in qs:
        assert q.awaitTermination(600)
        if q.exception() is not None:
            raise q.exception()

    t = SnapshotTable(spark, table_path)
    got = table_to_state([r.asDict() for r in t.read_current().collect()])
    want = expected_state([r.asDict() for r in feed_df.collect()])
    assert set(got) == set(want)
    for _id in want:
        for c in COMPARE_COLS:
            assert got[_id][c] == want[_id][c], f"{_id}.{c}"
    props = t.snapshot().properties
    assert "epoch.w0" in props and "epoch.w1" in props


def test_parallel_models_match_sequential(spark, feed_path, tmp_path):
    """T14: concurrent model maintenance must produce byte-identical model
    tables to the sequential run, with per-model epoch markers isolated."""
    from cht_sync_spark.operators.models import CONVERSATIONS, TOOL_CALLS, EPOCH_PROP, HASH_PROP

    def _run(sub, par):
        models = [
            (CONVERSATIONS, str(tmp_path / sub / "conversations")),
            (TOOL_CALLS, str(tmp_path / sub / "tool_calls")),
        ]
        pipe = ReplayPipeline(
            spark, ChangesFeedSource(spark, feed_path, sources=feed_sources()), str(tmp_path / sub / "landing"),
            batch_size=300, num_buckets=8, models=models, model_parallelism=par,
        )
        pipe.run()
        return pipe

    par = _run("par", 2)
    seq = _run("seq", 1)
    for mp, ms in zip(par.models, seq.models):
        cols = ms.spec.key_cols
        a = sorted(map(tuple, mp.table.read_current(drop_tombstones=True).collect()))
        b = sorted(map(tuple, ms.table.read_current(drop_tombstones=True).collect()))
        assert a == b, f"model {ms.spec.name} diverged under parallelism"
        # per-model manifest isolation: own epoch + transform-hash markers
        props = mp.table.snapshot().properties
        assert EPOCH_PROP in props and HASH_PROP in props
