"""`cht_changes` Python Data Source (sources/datasource.py): batch parity
with the native parquet scan, planner-side file pruning, admission-capped
exactly-once streaming with resume through Spark's own offset log, and
StreamingReplay parity between the file-stream and custom-source forms.

The reference keeps its resume cursor in a `couchdb_progress` side table
(couch2pg/src/importer.js:177-183); here the cursor IS the stream's offset,
so these tests pin the one property the side table never had to prove:
Spark's checkpoint alone reproduces exactly-once delivery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cht_sync_spark.sources.datasource import (
    ChangesStreamReader,
    _Options,
    _plan_slices,
    drain,
    register,
    stream_offsets,
)


@pytest.fixture(scope="module")
def ds(spark):
    register(spark)
    return spark


def _feed_read(spark, path):
    return spark.read.parquet(path)


def _ds_read(spark, path, **opts):
    r = spark.read.format("cht_changes").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestBatch:
    def test_full_read_matches_parquet(self, ds, feed_path):
        a = _ds_read(ds, feed_path).drop("_feed_partition")
        b = _feed_read(ds, feed_path)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_seq_range_matches_filter(self, ds, feed_path):
        lo, hi = 100, 700
        a = _ds_read(ds, feed_path, since=lo, until=hi).drop("_feed_partition")
        b = _feed_read(ds, feed_path).where((F.col("seq") > lo) & (F.col("seq") <= hi))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        assert a.count() == b.count() > 0

    def test_sources_filter(self, ds, feed_path):
        a = _ds_read(ds, feed_path, sources="synthhost/db0")
        b = _feed_read(ds, feed_path).where(F.col("source") == "synthhost/db0")
        assert a.count() == b.count() > 0
        assert a.select("source").distinct().collect()[0][0] == "synthhost/db0"

    def test_planner_prunes_files_by_since(self, feed_path, spark):
        # the feed is written seq-range-partitioned (write_feed), so a high
        # `since` must prune whole files in OUR planner — the Python-source
        # analogue of PushedFilters reaching the scan
        hi = _feed_read(spark, feed_path).agg(F.max("seq")).first()[0]
        all_slices = _plan_slices([feed_path], {0: -(1 << 62)}, {0: None})
        top_slices = _plan_slices([feed_path], {0: int(hi) - 1}, {0: None})
        assert len(all_slices) >= 4  # n_files=4 in the fixture
        assert len(top_slices) == 1
        # empty range plans nothing (the restart partitions(o, o) call)
        assert _plan_slices([feed_path], {0: 5}, {0: 5}) == []


class TestStreamReader:
    def test_capped_cuts_are_monotone_rowgroup_boundaries(self, feed_path):
        r = ChangesStreamReader(_Options({"path": feed_path, "eventsperbatch": "150"}))
        cur = r.initialOffset()["0"]
        seen = []
        for _ in range(50):
            nxt = r._next_cut(0, cur)
            if nxt == cur:
                break
            seen.append(nxt)
            cur = nxt
        assert seen == sorted(seen) and len(seen) >= 2
        assert cur == r._max_seq(0)  # schedule terminates at the feed max

    def test_unseeded_latest_caps_from_since(self, feed_path):
        # fresh queries may see latestOffset BEFORE initialOffset (runner
        # prefetch) — the first batch must still be capped, not the full feed
        r = ChangesStreamReader(_Options({"path": feed_path, "eventsperbatch": "150"}))
        first = r.latestOffset()["0"]
        assert first < r._max_seq(0)

    def test_offset_regression_raises(self, feed_path):
        r = ChangesStreamReader(_Options({"path": feed_path}))
        with pytest.raises(AssertionError, match="regression"):
            r.partitions({"0": 10}, {"0": 5})
        assert r.partitions({"0": 10}, {"0": 10}) == []


class TestStreamExactlyOnce:
    def test_capped_drain_multi_batch_exactly_once(self, ds, feed_path, feed_df, tmp_path):
        got: list = []

        def apply(df, _eid):
            got.append(df.drop("_feed_partition").toPandas())

        n_batches = drain(ds, feed_path, str(tmp_path / "ck"), apply, events_per_batch=150)
        assert n_batches >= 2  # caps actually split the drain
        import pandas as pd

        all_rows = pd.concat(got, ignore_index=True)
        assert len(all_rows) == feed_df.count()
        assert not all_rows.duplicated(["seq", "source", "id"]).any()
        # re-drain from the same checkpoint: nothing re-delivered
        again: list = []
        assert drain(ds, feed_path, str(tmp_path / "ck"), lambda df, e: again.append(df.count())) == 0
        assert sum(again) == 0
        # the committed offsets ARE the feed cursors (readable back like the
        # reference's couchdb_progress probe)
        offs = stream_offsets(str(tmp_path / "ck"))
        assert offs == {0: feed_df.agg(F.max("seq")).first()[0]}

    def test_available_now_restart_delivers_growth_once(self, ds, feed_df, tmp_path):
        from cht_sync_spark.sources.feedgen import write_feed

        feed2 = str(tmp_path / "feed2")
        half = int(feed_df.approxQuantile("seq", [0.5], 0.001)[0])
        write_feed(feed_df.where(f"seq <= {half}"), feed2, n_files=4)
        sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck2")

        def run():
            q = (
                ds.readStream.format("cht_changes").option("path", feed2).load()
                .writeStream.format("parquet").option("path", sink)
                .option("checkpointLocation", ck).trigger(availableNow=True).start()
            )
            assert q.awaitTermination(300)

        run()
        write_feed(feed_df, feed2, n_files=4)  # feed grows (files REWRITTEN)
        run()
        got = ds.read.parquet(sink)
        n, nd = got.count(), got.dropDuplicates(["seq", "source", "id"]).count()
        assert n == nd == feed_df.count()


class TestReplayParity:
    def test_streaming_replay_via_datasource_matches_file_stream(
        self, spark, feed_path, tmp_path
    ):
        from cht_sync_spark.sources.feedgen import feed_sources
        from cht_sync_spark.streaming.stream import StreamingReplay

        from tests.oracle import COMPARE_COLS, table_to_state

        def state(table):
            return table_to_state([r.asDict() for r in table.read_current().collect()])

        a = StreamingReplay(
            spark, feed_path, str(tmp_path / "t_file"), str(tmp_path / "ck_file"),
            max_files_per_trigger=2, num_buckets=8, sources=feed_sources(),
        )
        a.run_available_now()
        b = StreamingReplay(
            spark, feed_path, str(tmp_path / "t_ds"), str(tmp_path / "ck_ds"),
            num_buckets=8, sources=feed_sources(),
            source_format="cht_changes", events_per_trigger=200,
        )
        b.run_available_now()
        sa, sb = state(a.table), state(b.table)
        assert set(sa) == set(sb) and len(sa) > 0
        for k in sa:
            for c in COMPARE_COLS:
                assert sa[k][c] == sb[k][c], f"{k}.{c}"
        # the capped drain really ran multiple epochs (cuts land on
        # row-group boundaries: ~190-row groups, cap 200 -> 2 batches here)
        assert int(b.table.snapshot().properties["epoch.stream"]) >= 1
