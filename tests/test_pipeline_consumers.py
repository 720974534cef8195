"""In-loop changelog consumers on the ingest pipeline (pipeline.consumers).

Pins: the drain loop gives every attached consumer a catch-up cycle after
each applied batch, so one process keeps a mirror table and a term index
fresh alongside the ingest; a consumer left behind (crash window between
the landing commit and its cycle) heals on the next run() even when the
feed is already drained; exactly-once is untouched — consumers own their
atomically-committed cursors, the pipeline only schedules them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cht_sync_spark.sources import ChangesFeedSource, synth_changes, write_feed
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming import ChangelogConsumer, ReplayPipeline
from cht_sync_spark.streaming.term_index import TermIndexConsumer, bm25_index_topk
from cht_sync_spark.tables.format import SnapshotTable


def test_pipeline_schedules_consumers_and_heals_lag(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    write_feed(synth_changes(spark, n_convs=24), feed_dir, n_files=3)
    feed = ChangesFeedSource(spark, feed_dir, sources=feed_sources())

    # first pipeline instance creates the landing table so the consumers
    # can be wired to it before any batch runs
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
        mode="mor",
    )
    t = pipe.table
    mirror = ChangelogConsumer.create_target(spark, t, str(tmp_path / "mirror"), "mirror")
    mc = ChangelogConsumer(spark, t, mirror, "mirror")
    tidx = TermIndexConsumer.create_index(spark, t, str(tmp_path / "tidx"), num_buckets=8)
    tc = TermIndexConsumer(spark, t, tidx, "tix")
    pipe.consumers = [mc, tc]

    results = pipe.run()
    assert results  # batches applied
    # consumers ran inside the loop and are fully caught up
    assert mc.pending_versions() == 0 and tc.pending_versions() == 0
    a = t.read_current(drop_tombstones=True)
    b = mirror.read_current(drop_tombstones=True)
    assert a.count() == b.count() and a.exceptAll(b).count() == 0
    hits = bm25_index_topk(tidx, ["turn"], k=5)
    assert hits.count() == 5  # synthetic turns all contain the token

    # crash window: a landing commit the consumers never saw (simulated by
    # a direct append), then a resume over the DRAINED feed — no batches
    # apply, but the catch-up pass still heals both consumers
    extra = a.limit(1).withColumn("text", F.lit("healing probe row")).withColumn(
        "seq", F.col("seq") + F.lit(10**15)
    )
    t.append_delta(extra.select(*[f.name for f in t.snapshot().schema.fields]))
    assert mc.pending_versions() > 0
    pipe2 = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
        mode="mor", consumers=[mc, tc],
    )
    assert pipe2.run() == []  # feed drained: nothing to ingest
    assert mc.pending_versions() == 0 and tc.pending_versions() == 0
    assert mirror.read_current(drop_tombstones=True).where(
        F.col("text") == "healing probe row"
    ).count() == 1
