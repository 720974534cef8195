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


def test_pipeline_schedules_scd2_and_distinct(spark, tmp_path):
    """The new consumer kinds compose with the same duck-typed wiring:
    one ingest process keeps the SCD2 history table and an exact
    distinct-count aggregate fresh alongside the landing upserts, and
    both end exactly equal to their full-recompute forms."""
    from cht_sync_spark.streaming import DistinctCountConsumer, Scd2Consumer, scd2_intervals

    feed_dir = str(tmp_path / "feed")
    write_feed(synth_changes(spark, n_convs=24), feed_dir, n_files=3)
    feed = ChangesFeedSource(spark, feed_dir, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8, mode="mor",
    )
    t = pipe.table
    hist = Scd2Consumer.create_target(spark, t, str(tmp_path / "hist"))
    sc = Scd2Consumer(spark, t, hist, "hist")
    dct = DistinctCountConsumer.create_distinct_target(
        spark, t, str(tmp_path / "dc"), ["conv_id"], "role", num_buckets=8
    )
    dc = DistinctCountConsumer(spark, t, dct, "dc", ["conv_id"], "role")
    pipe.consumers = [sc, dc]
    assert pipe.run()
    assert sc.pending_versions() == 0 and dc.pending_versions() == 0

    # SCD2: the incrementally-maintained history == batch derivation over
    # ALL revisions (base ∪ delta files are exactly the revision set in mor)
    revs = t.read(levels=("base", "delta"))
    want = scd2_intervals(revs, list(t.snapshot().key_cols), sc.order_col,
                          tiebreak=t.snapshot().lww_order)
    got = hist.read_current()
    cols = got.columns
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0

    # distinct: summary rows == COUNT(DISTINCT role) over live landing rows
    live = t.read_current(drop_tombstones=True).where(F.col("role").isNotNull())
    want_dc = {
        r.conv_id: r.n
        for r in live.groupBy("conv_id").agg(F.countDistinct("role").alias("n")).collect()
    }
    got_dc = {r.conv_id: r.n_distinct for r in dc.counts().collect()}
    assert got_dc == want_dc


def test_pipeline_schedules_join_consumer(spark, tmp_path):
    """JoinConsumer composes with the in-loop wiring too: the ingest keeps
    a dimension-enriched join table fresh per applied batch, and a dim
    change between resumes heals through the drained-feed catch-up pass."""
    from pyspark.sql import types as T

    from cht_sync_spark.streaming import JoinConsumer

    feed_dir = str(tmp_path / "feed")
    write_feed(synth_changes(spark, n_convs=24), feed_dir, n_files=3)
    feed = ChangesFeedSource(spark, feed_dir, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8, mode="mor",
    )
    t = pipe.table
    dim_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("owner", T.StringType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
            T.StructField("ver", T.LongType(), True),
        ]
    )
    dims = SnapshotTable.create(
        spark, str(tmp_path / "dim"), dim_schema, key_cols=["conv_id"],
        num_buckets=4, lww_order=[("ver", False)],
    )
    dims.append_delta(spark.createDataFrame(
        [(f"c{i:07d}", f"team-{i % 3}", False, 1) for i in range(24)], dim_schema
    ))
    tgt = JoinConsumer.create_target(spark, t, dims, str(tmp_path / "j"), ["conv_id"])
    jc = JoinConsumer(spark, t, dims, tgt, "enrich", ["conv_id"], how="left",
                      right_cols=["owner"])
    pipe.consumers = [jc]
    assert pipe.run()
    assert jc.pending_versions() == 0

    def recompute():
        return t.read_current(drop_tombstones=True).join(
            dims.read_current(drop_tombstones=True).select("conv_id", "owner"),
            on="conv_id", how="left",
        )

    got = tgt.read_current(drop_tombstones=True).drop("__join_ver")
    want = recompute()
    cols = sorted(want.columns)
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0

    # dim-side change while the feed is drained: the resume's catch-up
    # pass alone (no batches) must propagate the new enrichment
    dims.append_delta(spark.createDataFrame(
        [("c0000003", "team-X", False, 2)], dim_schema))
    assert jc.pending_versions() > 0
    pipe2 = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
        mode="mor", consumers=[jc],
    )
    assert pipe2.run() == []
    assert jc.pending_versions() == 0
    assert (
        tgt.read_current(drop_tombstones=True)
        .where(F.col("conv_id") == "c0000003")
        .select("owner").distinct().collect()[0][0] == "team-X"
    )
