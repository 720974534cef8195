"""Structured Streaming replay: parity with the batch pipeline, exactly-once
across crash/resume, idempotent re-run.

The streaming form must land the IDENTICAL final table state as the batch
replay (the reference's downtime-convergence e2e tests,
tests/e2e-test.spec.js:358-419, re-expressed as crash injection inside
foreachBatch + resume from the Spark checkpoint).
"""

from __future__ import annotations

import pytest

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.streaming.stream import StreamingReplay

from tests.oracle import COMPARE_COLS, table_to_state


def _state(table):
    return table_to_state([r.asDict() for r in table.read_current().collect()])


def _assert_equal(got, want):
    assert set(got) == set(want)
    for _id in want:
        for c in COMPARE_COLS:
            assert got[_id][c] == want[_id][c], f"{_id}.{c}"


@pytest.fixture(scope="module")
def batch_state(spark, feed_path, tmp_path_factory):
    p = tmp_path_factory.mktemp("sbatch")
    pipe = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=feed_sources()), str(p / "t"),
        batch_size=300, num_buckets=8,
    )
    pipe.run()
    return _state(pipe.table)


def test_streaming_available_now_matches_batch(spark, feed_path, tmp_path, batch_state):
    # declared sources -> checkpoint stats ride the write as Observation
    # metrics (the reference's statically-configured DB list, db.js:45)
    sr = StreamingReplay(
        spark, feed_path, str(tmp_path / "t"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, num_buckets=8,
        sources=["synthhost/db0", "synthhost/db1"],
    )
    sr.run_available_now()
    _assert_equal(_state(sr.table), batch_state)
    # multiple micro-batches actually ran (4 feed files, 1 per trigger)
    props = sr.table.snapshot().properties
    assert int(props["epoch.stream"]) >= 1
    assert "checkpoint.synthhost/db0" in props and "checkpoint.synthhost/db1" in props


def test_streaming_crash_resume_exactly_once(spark, feed_path, tmp_path, batch_state):
    """Kill the query mid-replay; resuming from the Spark checkpoint must
    converge to the same final state with no duplicate effects."""
    table_path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    crashing = StreamingReplay(
        spark, feed_path, table_path, ckpt,
        max_files_per_trigger=1, num_buckets=8, fail_after_batches=2,
    )
    with pytest.raises(Exception, match="injected crash"):
        crashing.run_available_now()
    v_crashed = crashing.table.current_version()
    assert v_crashed > 1  # some batches landed before the crash

    resumed = StreamingReplay(
        spark, feed_path, table_path, ckpt, max_files_per_trigger=1, num_buckets=8
    )
    resumed.run_available_now()
    _assert_equal(_state(resumed.table), batch_state)


def test_streaming_maintains_model_dag(spark, feed_path, tmp_path):
    """The streaming form maintains the SAME model DAG inside foreachBatch
    (T14/T16 parity): final chained-model state must equal the batch
    pipeline's, including a mid-stream crash/resume."""
    from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS

    # batch reference
    bp = ReplayPipeline(
        spark, ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "b" / "landing"), batch_size=300, num_buckets=8,
        models=[
            (CONVERSATIONS, str(tmp_path / "b" / "conv")),
            (CONV_PROFILES, str(tmp_path / "b" / "prof")),
        ],
    )
    bp.run()
    want = {
        r["conv_id"]: (r["n_turns"], r["has_tool_calls"], r["first_user_text"])
        for r in bp._runners_by_name["conv_profiles"].table.read_current().collect()
    }

    s_models = [
        (CONVERSATIONS, str(tmp_path / "s" / "conv")),
        (CONV_PROFILES, str(tmp_path / "s" / "prof")),
    ]
    crashing = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, fail_after_batches=2,
        models=s_models,
    )
    with pytest.raises(Exception, match="injected crash"):
        crashing.run_available_now()
    resumed = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, models=s_models,
    )
    resumed.run_available_now()
    got = {
        r["conv_id"]: (r["n_turns"], r["has_tool_calls"], r["first_user_text"])
        for r in resumed.runners_by_name["conv_profiles"].table.read_current().collect()
    }
    assert got == want


def test_streaming_rerun_is_noop(spark, feed_path, tmp_path, batch_state):
    """Re-starting a fully drained stream commits nothing new."""
    sr = StreamingReplay(
        spark, feed_path, str(tmp_path / "t"), str(tmp_path / "ckpt"), num_buckets=8
    )
    sr.run_available_now()
    v1 = sr.table.current_version()
    again = StreamingReplay(
        spark, feed_path, str(tmp_path / "t"), str(tmp_path / "ckpt"), num_buckets=8
    )
    again.run_available_now()
    assert again.table.current_version() == v1
    _assert_equal(_state(again.table), batch_state)


def test_streaming_maintenance_cadence_crash_safe(spark, feed_path, tmp_path, batch_state):
    """In-loop maintenance inside foreachBatch (MOR fold + expiry + vacuum
    every batch) must not disturb exactly-once: crash mid-replay, resume,
    and the final reconciled state still equals the batch replay — with
    bounded live deltas and manifest history."""
    table_path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    crashing = StreamingReplay(
        spark, feed_path, table_path, ckpt,
        max_files_per_trigger=1, num_buckets=8, mode="mor",
        fail_after_batches=2, maintenance_every=1, maintenance_keep_snapshots=2,
    )
    with pytest.raises(Exception, match="injected crash"):
        crashing.run_available_now()

    resumed = StreamingReplay(
        spark, feed_path, table_path, ckpt,
        max_files_per_trigger=1, num_buckets=8, mode="mor",
        maintenance_every=1, maintenance_keep_snapshots=2,
    )
    resumed.run_available_now()
    _assert_equal(_state(resumed.table), batch_state)

    snap = resumed.table.snapshot()
    assert not [f for f in snap.files if f["level"] == "delta"]  # folded
    assert len(resumed.table.history()) <= 2 + 1  # expiry policy bounds manifests
