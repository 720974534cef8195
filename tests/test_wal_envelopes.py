"""WAL/binlog (Debezium-shaped) envelope adapter: normalization semantics,
binlog-position packing, strict-mode gating, and full replay through the
unchanged pipeline converging to the log's final state (north_rule:
"binlog/WAL tail → lake upsert")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.json_doc import parse_rev
from cht_sync_spark.schemas import CHANGE_EVENT
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.envelopes import (
    binlog_seq,
    debezium_to_events,
    expected_wal_state,
    generate_wal_envelopes,
)
from cht_sync_spark.streaming.pipeline import ReplayPipeline

N_KEYS = 400


@pytest.fixture(scope="module")
def wal_pg(spark):
    return generate_wal_envelopes(spark, N_KEYS, flavor="pg").cache()


@pytest.fixture(scope="module")
def wal_events(wal_pg):
    return debezium_to_events(wal_pg).cache()


def test_normalize_shape_and_ops(wal_pg, wal_events):
    assert [f.name for f in wal_events.schema.fields] == [f.name for f in CHANGE_EVENT.fields]
    ops = {r["op"] for r in wal_events.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}  # c and r both map to insert
    # deletes carry no doc (tombstone path parity); upserts always do
    assert wal_events.where((F.col("op") == "delete") & F.col("doc").isNotNull()).count() == 0
    assert wal_events.where((F.col("op") != "delete") & F.col("doc").isNull()).count() == 0
    # the synthesized rev vector IS the log position: height == seq, never null
    bad = wal_events.where(
        parse_rev(F.col("rev")).isNull() | (parse_rev(F.col("rev")) != F.col("seq"))
    )
    assert bad.count() == 0
    # delete ids are recoverable (come from the BEFORE image)
    assert wal_events.where((F.col("op") == "delete") & (F.col("id") == "")).count() == 0
    # scenario coverage: the generator really emits snapshot reads + deletes
    assert wal_pg.where(F.col("op") == "r").count() > 0
    assert wal_pg.where(F.col("op") == "d").count() > 0


def test_mysql_binlog_order_matches_pg(spark, wal_pg):
    """(file, pos) packing preserves the log's total order: both flavors of
    the same tap normalize to the same (id, op) sequence."""
    my = debezium_to_events(generate_wal_envelopes(spark, N_KEYS, flavor="mysql"))
    pg_seqd = [
        (r["id"], r["op"]) for r in debezium_to_events(wal_pg).orderBy("seq", "id").collect()
    ]
    my_seqd = [(r["id"], r["op"]) for r in my.orderBy("seq", "id").collect()]
    assert pg_seqd == my_seqd
    # packing sanity on the raw helper
    row = (
        spark.range(1)
        .select(binlog_seq(F.lit("mysql-bin.000002"), F.lit(7)).alias("s"))
        .first()
    )
    assert row["s"] == (2 << 32) + 7


def test_strict_mode_gates_malformed(spark, wal_pg):
    broken = wal_pg.limit(5).withColumn("op", F.lit("z"))
    with pytest.raises(Exception, match="unknown op"):
        debezium_to_events(broken).collect()
    no_pos = wal_pg.limit(5).withColumn(
        "source", F.col("source").withField("lsn", F.lit(None).cast("long"))
    )
    with pytest.raises(Exception, match="log position"):
        debezium_to_events(no_pos).collect()
    # lenient mode: malformed rows become null-op rows for DLQ routing —
    # unknown ops AND missing log positions alike (one filter catches both)
    lenient = debezium_to_events(broken, strict=False)
    assert lenient.where(F.col("op").isNull()).count() == 5
    lenient_pos = debezium_to_events(no_pos, strict=False)
    bad = lenient_pos.where(F.col("op").isNull())
    assert bad.count() == 5
    # and no half-formed rev escapes (would corrupt LWW height parsing)
    assert lenient_pos.where(F.col("seq").isNull() & F.col("rev").isNotNull()).count() == 0


def test_wal_replay_converges_to_log_state(spark, wal_pg, wal_events, tmp_path):
    """The WHOLE pipeline — batch planning, doc→row, LWW merge, checkpoints —
    runs unchanged on the normalized WAL tail and lands exactly the state at
    the log head (highest-LSN image per key, deletes applied)."""
    feed_path = str(tmp_path / "walfeed")
    from cht_sync_spark.sources.feedgen import write_feed

    write_feed(wal_events, feed_path, n_files=4)
    feed = ChangesFeedSource(spark, feed_path, sources=["waldb"])
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=300, num_buckets=8)
    pipe.run()

    live = pipe.table.read_current().where(~F.col("_deleted"))
    got = {
        (r["source"], r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"], r["seq"])
        for r in live.collect()
    }
    want = {
        (r["source"], r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"], r["seq"])
        for r in expected_wal_state(wal_pg).collect()
    }
    assert set(got) == set(want), (
        f"key sets differ: extra={sorted(set(got) - set(want))[:4]} "
        f"missing={sorted(set(want) - set(got))[:4]}"
    )
    assert got == want
    # deletes really deleted (tombstones retained in landing, absent live)
    dels = pipe.table.read_current().where(F.col("_deleted")).count()
    assert dels > 0
    # snapshot/tail overlap (op 'r' after 'c') converged idempotently:
    # edited keys show the edit, not the re-read insert image
    assert any(v[1].startswith("edit") for v in got.values())


def test_wal_tail_streaming_form(spark, wal_pg, wal_events, tmp_path):
    """The Structured Streaming form tails the normalized WAL feed unchanged
    (readStream → foreachBatch merge) and lands the same log-head state —
    the live "binlog tail" deployment shape, not just batch replay."""
    from cht_sync_spark.sources.feedgen import write_feed
    from cht_sync_spark.streaming.stream import StreamingReplay

    feed_path = str(tmp_path / "walfeed")
    write_feed(wal_events, feed_path, n_files=3)
    sr = StreamingReplay(
        spark, feed_path, str(tmp_path / "t"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, sources=["waldb"],
    )
    sr.run_available_now()
    live = sr.table.read_current().where(~F.col("_deleted"))
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["seq"]) for r in live.collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["seq"])
        for r in expected_wal_state(wal_pg).collect()
    }
    assert got == want
    # several micro-batches actually ran and checkpoints advanced
    props = sr.table.snapshot().properties
    assert int(props["epoch.stream"]) >= 1 and "checkpoint.waldb" in props
