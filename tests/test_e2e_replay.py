"""End-to-end replay correctness vs the sequential-apply oracle.

The port of the reference's golden e2e contract (tests/e2e-test.spec.js):
final-table-state equality after full replay, tombstone retention in the
landing table, conflict winners, delete-vs-edit semantics, kill/resume
convergence, and per-turn text equality under stable (conv_id, turn_idx)
ordering (BASELINE.json input_hint).
"""

from __future__ import annotations

import pytest

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline

from tests.oracle import COMPARE_COLS, expected_state, table_to_state


@pytest.fixture(scope="module")
def oracle(feed_df):
    events = [r.asDict() for r in feed_df.collect()]
    return expected_state(events)


def _run(spark, feed_path, path, **kw):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(path), batch_size=300, num_buckets=8, **kw)
    pipe.run()
    return pipe


def _assert_state_equal(got: dict, want: dict):
    assert set(got) == set(want), (
        f"id sets differ: extra={sorted(set(got) - set(want))[:5]} missing={sorted(set(want) - set(got))[:5]}"
    )
    for _id in want:
        for c in COMPARE_COLS:
            assert got[_id][c] == want[_id][c], f"{_id}.{c}: {got[_id][c]!r} != {want[_id][c]!r}"


def test_full_replay_matches_oracle(spark, feed_path, tmp_path, oracle):
    pipe = _run(spark, feed_path, tmp_path / "t1")
    rows = [r.asDict() for r in pipe.table.read_current().collect()]
    got = table_to_state(rows)
    _assert_state_equal(got, oracle)
    # tombstones retained in landing (e2e-test.spec.js:203-204)
    assert any(r["_deleted"] for r in rows)


def test_replay_scenarios_covered(oracle):
    # the generator must actually exercise every e2e scenario class
    revs = [v["_rev"] for v in oracle.values()]
    assert any(r.startswith("3-") for r in revs), "height-3 deletes missing"
    texts = [v["text"] for v in oracle.values() if v["text"]]
    assert any("(edited)" in t for t in texts)
    assert any("(branch" in t for t in texts), "conflict winners missing"
    assert any("(live edit)" in t for t in texts), "delete-vs-edit live winner missing"
    assert any(v["_deleted"] for v in oracle.values())
    assert any(v["tool"] for v in oracle.values()), "tool field never materialized"
    # sanitiser: no NUL sequences survive
    for v in oracle.values():
        if v["text"]:
            assert "\x00" not in v["text"] and "\\u0000" not in v["text"]


def test_replay_is_idempotent(spark, feed_path, tmp_path, oracle):
    """Re-running the whole pipeline over an up-to-date table is a no-op."""
    pipe = _run(spark, feed_path, tmp_path / "t2")
    v1 = pipe.table.current_version()
    pipe2 = _run(spark, feed_path, tmp_path / "t2")  # same path, fresh pipeline
    got = table_to_state([r.asDict() for r in pipe2.table.read_current().collect()])
    _assert_state_equal(got, oracle)
    # watermark made every batch a skip -> no new data commits
    assert pipe2.table.current_version() == v1


def test_kill_resume_byte_identical(spark, feed_path, tmp_path, oracle):
    """Stop after 2 micro-batches, resume with a fresh pipeline; final state
    must equal a single-shot replay (SURVEY.md §2.5 I2)."""
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t3"), batch_size=300, num_buckets=8)
    partial = pipe.run(max_batches=2)
    assert len(partial) == 2
    wm, epoch = pipe.state()
    assert epoch == 1 and wm == partial[-1].seq_hi

    resumed = ReplayPipeline(spark, feed, str(tmp_path / "t3"), batch_size=300, num_buckets=8)
    rest = resumed.run()
    assert all(r.epoch > 1 for r in rest if not r.skipped)
    got = table_to_state([r.asDict() for r in resumed.table.read_current().collect()])
    _assert_state_equal(got, oracle)


def test_replayed_batch_is_skipped_by_epoch_marker(spark, feed_path, tmp_path):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    pipe = ReplayPipeline(spark, feed, str(tmp_path / "t4"), batch_size=300, num_buckets=8)
    cuts = feed.plan_batches(300)
    r0 = pipe.run_batch(0, -1, cuts[0])
    assert not r0.skipped and r0.rows > 0
    replay = pipe.run_batch(0, -1, cuts[0])  # crash-replay of epoch 0
    assert replay.skipped


def test_stable_turn_ordering(spark, feed_path, tmp_path, oracle):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the input_hint's per-row invariant, on the flagship reconstruction."""
    pipe = _run(spark, feed_path, tmp_path / "t5")
    live = pipe.table.read_current(drop_tombstones=True)
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in live.orderBy("conv_id", "turn_idx").collect()
    ]
    want = sorted(
        (v["conv_id"], v["turn_idx"], v["text"]) for v in oracle.values() if not v["_deleted"]
    )
    assert got == want


def test_arrow_transform_parity(spark, feed_path, tmp_path, oracle):
    """The Arrow pandas-UDF doc->row path must agree with the Catalyst path."""
    pipe = _run(spark, feed_path, tmp_path / "t6", transform="arrow")
    got = table_to_state([r.asDict() for r in pipe.table.read_current().collect()])
    _assert_state_equal(got, oracle)


def test_mor_mode_matches_cow(spark, feed_path, tmp_path, oracle):
    """Merge-on-read ingest (append_delta + read-time LWW) must produce the
    same reconciled state as copy-on-write MERGE, before and after compact."""
    pipe = _run(spark, feed_path, tmp_path / "t7", mode="mor")
    got = table_to_state([r.asDict() for r in pipe.table.read_current().collect()])
    _assert_state_equal(got, oracle)
    pipe.table.compact()
    got2 = table_to_state([r.asDict() for r in pipe.table.read_current().collect()])
    _assert_state_equal(got2, oracle)
