"""Multi-row grouped models (key_cols ⊋ group_cols) and the built-in
SFT-examples model: training-example assembly maintained incrementally
under CDC. Pins: incremental == one-shot function application over the
final reconciled state, within-group delete-by-absence (an edited turn
that changed role or a deleted turn RETRACTS its example row while the
conversation survives), context re-derivation on neighbor edits, model
reads pruned to the touched groups' buckets, and spec validation
(group_cols must be a subset of key_cols)."""

from __future__ import annotations

import json as _json

import pytest

from cht_sync_spark.functions.transcripts import sft_examples
from cht_sync_spark.operators.models import (
    SFT_CONTEXT_TURNS,
    SFT_EXAMPLES_MODEL,
    ModelSpec,
)
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline


def _runner(pipe, name):
    return pipe._runners_by_name[name]


def _model_state(pipe):
    return {
        (r["conv_id"], r["turn_idx"]): (r["n_context_turns"], r["context_text"], r["target_text"])
        for r in _runner(pipe, "sft_examples").table.read_current().collect()
    }


def _expected(landing_live_df):
    return {
        (r["conv_id"], r["turn_idx"]): (r["n_context_turns"], r["context_text"], r["target_text"])
        for r in sft_examples(landing_live_df, context_turns=SFT_CONTEXT_TURNS).collect()
    }


def test_validation_group_subset_of_key():
    with pytest.raises(ValueError, match="subset of key_cols"):
        ModelSpec(**{**SFT_EXAMPLES_MODEL.__dict__, "name": "bad", "group_cols": ["role"]})


def test_sft_incremental_matches_one_shot(spark, feed_path, tmp_path):
    """Maintaining the SFT model batch-by-batch over the synthetic feed
    (edits, rev conflicts, deletes, hot conversations) must land on exactly
    the state one application of sft_examples over the final reconciled
    landing produces."""
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "landing"),
        batch_size=300,
        num_buckets=8,
        models=[(SFT_EXAMPLES_MODEL, str(tmp_path / "sft"))],
    )
    results = pipe.run()
    assert len(results) >= 2, "must exercise multiple increments"

    got = _model_state(pipe)
    want = _expected(pipe.table.read_current(drop_tombstones=True))
    assert got == want
    assert len(got) > 0


def _ev(seq, conv, turn, op, rev, role="user", text="t"):
    doc = (
        None
        if op == "delete"
        else _json.dumps(
            {"conv_id": conv, "turn_idx": turn, "role": role, "text": text, "ts": seq * 1000}
        )
    )
    return (seq, "synthhost/db0", op, f"{conv}:{turn}", rev, doc)


def test_within_group_retraction_and_context_rederivation(spark, tmp_path):
    """The judge cases for delete-by-absence:
    - a turn EDITED from assistant to user retracts its example but stays
      in every later example's context (with the new text);
    - a DELETED assistant turn retracts its example while the conversation
      survives;
    - deleting the last remaining turns retracts the whole group."""
    b1 = [
        _ev(1, "A", 0, "insert", "1-a", role="user", text="q0"),
        _ev(2, "A", 1, "insert", "1-b", role="assistant", text="a1"),
        _ev(3, "A", 2, "insert", "1-c", role="user", text="q2"),
        _ev(4, "A", 3, "insert", "1-d", role="assistant", text="a3"),
        _ev(5, "B", 0, "insert", "1-e", role="user", text="hi"),
        _ev(6, "B", 1, "insert", "1-f", role="assistant", text="yo"),
    ]
    b2 = [
        # A:1 re-roled assistant -> user with new text: example (A,1) must
        # vanish; (A,3)'s context must now render "user: a1x"
        _ev(7, "A", 1, "update", "2-b", role="user", text="a1x"),
        # B:1 deleted: example (B,1) must vanish; conversation B survives
        _ev(8, "B", 1, "delete", "2-f"),
    ]
    b3 = [_ev(9, "B", 0, "delete", "2-e")]  # B fully gone
    cols = "seq long, source string, op string, id string, rev string, doc string"
    fdir = str(tmp_path / "feed")
    spark.createDataFrame(b1 + b2 + b3, cols).write.parquet(fdir)

    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, fdir, sources=["synthhost/db0"]),
        str(tmp_path / "landing"),
        num_buckets=4,
        models=[(SFT_EXAMPLES_MODEL, str(tmp_path / "sft"))],
    )
    pipe.run_batch(0, -(2**62), 6)
    s1 = _model_state(pipe)
    assert set(s1) == {("A", 1), ("A", 3), ("B", 1)}
    assert s1[("A", 3)][1] == "user: q0\nassistant: a1\nuser: q2"

    pipe.run_batch(1, 6, 8)
    s2 = _model_state(pipe)
    assert set(s2) == {("A", 3)}, "re-roled and deleted targets must retract"
    assert s2[("A", 3)][1] == "user: q0\nuser: a1x\nuser: q2", "neighbor edit re-derives context"
    assert s2 == _expected(pipe.table.read_current(drop_tombstones=True))

    pipe.run_batch(2, 8, 9)
    assert _model_state(pipe) == {("A", 3): s2[("A", 3)]}, "gone group fully retracted"


def test_streaming_crash_resume_matches_batch(spark, feed_path, tmp_path):
    """Streaming form with mid-stream crash + resume: re-delivered files
    arrive under NEW epoch ids, so touched groups are recomputed again from
    current landing — within-group delete-by-absence must be idempotent
    under that re-delivery and land on the batch pipeline's state."""
    import pytest as _pt

    from cht_sync_spark.streaming.stream import StreamingReplay

    bp = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "b" / "landing"),
        batch_size=300,
        num_buckets=8,
        models=[(SFT_EXAMPLES_MODEL, str(tmp_path / "b" / "sft"))],
    )
    bp.run()
    want = _model_state(bp)

    s_models = [(SFT_EXAMPLES_MODEL, str(tmp_path / "s" / "sft"))]
    crashing = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, fail_after_batches=2, models=s_models,
    )
    with _pt.raises(Exception, match="injected crash"):
        crashing.run_available_now()
    resumed = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, models=s_models,
    )
    resumed.run_available_now()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_context_turns"], r["context_text"], r["target_text"])
        for r in resumed.runners_by_name["sft_examples"].table.read_current().collect()
    }
    assert got == want


def test_model_read_prunes_to_touched_buckets(spark, feed_path, tmp_path):
    """The within-group reconciliation read of the MODEL table must pass a
    bucket list derived from the touched groups (file-level pruning), not
    scan the whole model table."""
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "landing"),
        batch_size=300,
        num_buckets=8,
        models=[(SFT_EXAMPLES_MODEL, str(tmp_path / "sft"))],
    )
    cuts = pipe.feed.plan_batches(300)
    pipe.run_batch(0, -(2**62), cuts[0])

    runner = _runner(pipe, "sft_examples")
    assert runner.table.snapshot().bucket_cols == ["conv_id"]

    batch2 = pipe.feed.batch(cuts[0], cuts[1])
    rows = pipe._transform(batch2)
    from cht_sync_spark.operators.lww import lww_dedup

    rows = lww_dedup(rows)
    n_convs = rows.select("conv_id").distinct().count()

    seen: list = []
    orig = runner.table.read_current

    def spy(*a, **kw):
        seen.append(kw.get("buckets"))
        return orig(*a, **kw)

    runner.table.read_current = spy
    try:
        runner.run_increment(pipe.table, rows, epoch=1)
    finally:
        runner.table.read_current = orig
    pruned = [b for b in seen if b is not None]
    assert pruned, "within-group read must prune by bucket"
    assert all(len(b) <= max(n_convs, 1) for b in pruned)

    # exactly-once: replaying the same epoch is a no-op
    v = runner.table.snapshot().version
    runner.run_increment(pipe.table, rows, epoch=1)
    assert runner.table.snapshot().version == v
