"""Dead-letter quarantine: poison events must not stall ingest or dirty
the landing table.

Pins (1) classifier reasons and their priority order, (2) the pipeline
split — landing state equals a clean-feed run, poison rows land in the
DLQ table with reasons, the seq cursor advances PAST the poison, (3) the
crash window between the landing commit and the DLQ write (resume heals
it exactly-once), (4) replay idempotence, and (5) batch/stream parity.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.functions.dlq import malformed_reason
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import write_feed
from cht_sync_spark.streaming.pipeline import ReplayPipeline

SRC = "synthhost/db0"


def _doc(conv, turn, text, extra=None):
    d = {"conv_id": conv, "turn_idx": turn, "role": "user", "text": text,
         "ts": 1704067200000 + turn}
    d.update(extra or {})
    return json.dumps(d)


CLEAN = [
    (1, SRC, "insert", "cA:0", "1-a0", _doc("cA", 0, "t0")),
    (2, SRC, "insert", "cA:1", "1-a1", _doc("cA", 1, "t1")),
    (3, SRC, "insert", "cA:2", "1-a2", _doc("cA", 2, "t2")),
    (4, SRC, "insert", "cA:3", "1-a3", _doc("cA", 3, "t3")),
    (5, SRC, "update", "cA:0", "2-b0", _doc("cA", 0, "t0v2")),
    (6, SRC, "delete", "cA:3", "2-d3", None),
    (200, SRC, "insert", "cA:4", "1-a4", _doc("cA", 4, "t4")),
]
POISON = [
    (100, SRC, "insert", "cB:0", "1-x0", '{"conv_id": "cB", "turn_idx"'),  # invalid_json
    (101, SRC, "insert", "cB:1", "1-x1", None),  # null_doc_live
    (102, SRC, "insert", "cB:2", "garbage", _doc("cB", 2, "x")),  # bad_rev
    (103, SRC, "insert", "weird", "1-x3", "{}"),  # bad_key (turn unrecoverable)
    (104, SRC, "delete", "cB:4", None, None),  # bad_rev (missing rev)
]
EXPECT_REASONS = {
    100: "invalid_json",
    101: "null_doc_live",
    102: "bad_rev",
    103: "bad_key",
    104: "bad_rev",
}
SCHEMA = "seq long, source string, op string, id string, rev string, doc string"


@pytest.fixture(scope="module")
def poison_feed(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dlqfeed") / "changes")
    write_feed(spark.createDataFrame(CLEAN + POISON, SCHEMA), p, n_files=2)
    return p


@pytest.fixture(scope="module")
def clean_feed(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dlqfeed_clean") / "changes")
    write_feed(spark.createDataFrame(CLEAN, SCHEMA), p, n_files=2)
    return p


def _content(table):
    rows = table.read_current(drop_tombstones=True).collect()
    return sorted((r["conv_id"], r["turn_idx"], r["role"], r["text"]) for r in rows)


def test_classifier_reasons_and_priority(spark):
    got = {
        r["seq"]: r["reason"]
        for r in spark.createDataFrame(CLEAN + POISON, SCHEMA)
        .select("seq", malformed_reason().alias("reason"))
        .collect()
    }
    for seq, _, _, _, _, _ in CLEAN:
        assert got[seq] is None, f"clean seq {seq} misclassified as {got[seq]}"
    for seq, want in EXPECT_REASONS.items():
        assert got[seq] == want, f"seq {seq}: {got[seq]} != {want}"
    # priority: bad_rev wins over null_doc_live/invalid_json/bad_key
    multi = spark.createDataFrame([(900, SRC, "insert", "weird", "junk", None)], SCHEMA)
    assert multi.select(malformed_reason().alias("r")).first()["r"] == "bad_rev"


def test_pipeline_quarantines_and_advances(spark, poison_feed, clean_feed, tmp_path):
    feed = ChangesFeedSource(spark, poison_feed, sources=[SRC])
    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=4, num_buckets=4,
        mode="mor", dlq_path=str(tmp_path / "dlq"),
    )
    results = pipe.run()
    # every raw event (poison included) counts as processed
    assert sum(r.rows for r in results) == len(CLEAN) + len(POISON)

    # landing state == a run over the clean-only feed
    ref = ReplayPipeline(
        spark, ChangesFeedSource(spark, clean_feed, sources=[SRC]),
        str(tmp_path / "ref"), batch_size=4, num_buckets=4, mode="mor",
    )
    ref.run()
    assert _content(pipe.table) == _content(ref.table)

    # DLQ holds exactly the poison rows with the right reasons
    dlq = {r["seq"]: r for r in pipe.dlq.read_current().collect()}
    assert {s: r["reason"] for s, r in dlq.items()} == EXPECT_REASONS
    assert all(r["source"] == SRC and r["partition_id"] == 0 for r in dlq.values())

    # the cursor advanced PAST the poison block to the final clean event
    ck = {(r["source"], r["partition_id"]): r["seq"] for r in pipe.checkpoints().collect()}
    assert ck[(SRC, 0)] == 200

    # replay is a no-op for every component
    again = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=4, num_buckets=4,
        mode="mor", dlq_path=str(tmp_path / "dlq"),
    )
    assert all(r.skipped for r in again.run())
    assert {r["seq"] for r in again.dlq.read_current().collect()} == set(EXPECT_REASONS)


def test_crash_between_landing_and_dlq_commit(spark, poison_feed, tmp_path, monkeypatch):
    feed = ChangesFeedSource(spark, poison_feed, sources=[SRC])

    def _boom(self, epoch, lo, hi, bad_n=None):
        raise RuntimeError("injected crash before DLQ write")

    pipe = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=100, num_buckets=4,
        mode="mor", dlq_path=str(tmp_path / "dlq"),
    )
    monkeypatch.setattr(ReplayPipeline, "_write_dlq", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.run()
    monkeypatch.undo()
    # landing committed, DLQ did not
    assert pipe.table.read_current().count() > 0
    assert pipe.dlq.read_current().count() == 0

    resumed = ReplayPipeline(
        spark, feed, str(tmp_path / "t"), batch_size=100, num_buckets=4,
        mode="mor", dlq_path=str(tmp_path / "dlq"),
    )
    resumed.run()
    dlq = {r["seq"]: r["reason"] for r in resumed.dlq.read_current().collect()}
    assert dlq == EXPECT_REASONS  # healed, exactly once — no duplicates


def test_streaming_parity(spark, poison_feed, clean_feed, tmp_path):
    from cht_sync_spark.streaming.stream import StreamingReplay

    s = StreamingReplay(
        spark, poison_feed, str(tmp_path / "t"), str(tmp_path / "ckpt"),
        num_buckets=4, mode="mor", sources=[SRC], dlq_path=str(tmp_path / "dlq"),
    )
    s.run_available_now()
    ref = ReplayPipeline(
        spark, ChangesFeedSource(spark, clean_feed, sources=[SRC]),
        str(tmp_path / "ref"), batch_size=4, num_buckets=4, mode="mor",
    )
    ref.run()
    assert _content(s.table) == _content(ref.table)
    dlq = {r["seq"]: r["reason"] for r in s.dlq.read_current().collect()}
    assert dlq == EXPECT_REASONS
