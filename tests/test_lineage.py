"""I4 per-(source, partition) lineage + checkpoint wiring (north_rule):
every micro-batch must emit lineage rows keyed by (epoch, source, feed
partition) whose counts are the PRE-dedup ingested events, and the
per-partition checkpoints must be decodable as a CHECKPOINT-schema frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline


def test_lineage_per_source_partition(spark, feed_df, tmp_path):
    # two feed-partition directories (the Kafka-partition analogue), split
    # by conversation hash — both sources appear in both partitions
    dirs = []
    for p in range(2):
        d = str(tmp_path / f"part{p}")
        feed_df.where(F.pmod(F.xxhash64("id"), F.lit(2)) == p).write.parquet(d)
        dirs.append(d)

    feed = ChangesFeedSource(spark, dirs, sources=feed_sources())
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=400, num_buckets=8,
        lineage_path=str(tmp_path / "lineage"),
    )
    results = pipe.run()
    assert len(results) >= 2

    lin = pipe.lineage.read_current()
    rows = [r.asDict() for r in lin.collect()]
    # both feed partitions and both sources appear
    assert {r["partition_id"] for r in rows} == {0, 1}
    assert len({r["source"] for r in rows}) == 2

    # lineage counts are PRE-dedup ingested events: summed over epochs they
    # must equal the raw feed count per (source, partition)
    want = {
        (r["source"], r["p"]): r["n"]
        for r in (
            feed_df.withColumn("p", F.pmod(F.xxhash64("id"), F.lit(2)).cast("int"))
            .groupBy("source", "p")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    got: dict = {}
    for r in rows:
        k = (r["source"], r["partition_id"])
        got[k] = got.get(k, 0) + r["rows_upserted"]
    assert got == want

    # total events processed per batch == sum of its lineage rows
    by_epoch: dict = {}
    for r in rows:
        by_epoch[r["epoch_id"]] = by_epoch.get(r["epoch_id"], 0) + r["rows_upserted"]
    for res in results:
        assert by_epoch[res.epoch] == res.rows

    # per-partition checkpoints decode into the CHECKPOINT schema, seqs are
    # the max raw seq ingested per (source, partition)
    ckpt_rows = pipe.checkpoints().collect()
    # liveness: every checkpoint carries a commit-time updated_at (the
    # couchdb_progress.updated_at analogue driving the freshness metric)
    assert all(r["updated_at"] is not None for r in ckpt_rows)
    cps = {(r["source"], r["partition_id"]): r["seq"] for r in ckpt_rows}
    want_seq = {
        (r["source"], r["p"]): r["hi"]
        for r in (
            feed_df.withColumn("p", F.pmod(F.xxhash64("id"), F.lit(2)).cast("int"))
            .groupBy("source", "p")
            .agg(F.max("seq").alias("hi"))
            .collect()
        )
    }
    assert cps == want_seq
