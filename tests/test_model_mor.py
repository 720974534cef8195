"""Merge-on-read model plane (ModelRunner mode='mor').

The COW model merge reads + rewrites every touched model bucket per
micro-batch — O(table) on feeds whose keys spread uniformly. MOR appends
the recomputed slice as delta files instead (O(slice), no target read) and
lets the read-time LWW fold + the maintenance compaction cadence reconcile
— the same sustained-ingest design the landing table uses. These tests pin
that the two modes are STATE-EQUIVALENT on the conflict/delete-heavy
synthetic feed, that delete-by-absence tombstones shadow in the fold and
are physically dropped at compaction (tombstones.retain=false), that the
crash-window exactly-once semantics carry over, and that the maintenance
cadence bounds the model tables' delta accretion.
"""

from __future__ import annotations

import pytest

from cht_sync_spark.operators.models import (
    CONV_PROFILES,
    CONVERSATIONS,
    SFT_EXAMPLES_MODEL,
    TOOL_CALLS,
)
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline


MODELS = [CONVERSATIONS, CONV_PROFILES, TOOL_CALLS, SFT_EXAMPLES_MODEL]


def _pipe(spark, feed_path, root, model_mode, **kw):
    kw.setdefault("batch_size", 300)
    return ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(root / "landing"),
        num_buckets=8,
        mode="mor",
        models=[(m, str(root / m.name)) for m in MODELS],
        model_mode=model_mode,
        **kw,
    )


def _states_of(runners):
    """{model: {key tuple: row tuple}} over the reconciled live state."""
    out = {}
    for m in runners:
        rows = m.table.read_current().collect()
        key = m.spec.key_cols
        cols = [f.name for f in m.spec.schema.fields if f.name != "_deleted"]
        out[m.spec.name] = {
            tuple(r[k] for k in key): tuple(r[c] for c in cols) for r in rows
        }
        assert len(out[m.spec.name]) == len(rows), "reconciled keys must be unique"
    return out


def _states(pipe):
    return _states_of(pipe.models)


def test_mor_models_match_cow(spark, feed_path, tmp_path):
    """Same feed, same batching: MOR-model pipeline state == COW-model
    pipeline state for every model (grouped, chained, row-wise, multi-row
    grouped) — before AND after compaction."""
    cow = _pipe(spark, feed_path, tmp_path / "cow", "cow")
    cow.run()
    mor = _pipe(spark, feed_path, tmp_path / "mor", "mor")
    mor.run()

    want = _states(cow)
    assert _states(mor) == want, "pre-compaction fold must match COW"
    for m in mor.models:
        m.table.compact()
    assert _states(mor) == want, "compaction must preserve state"


def test_mor_tombstones_hidden_then_physically_dropped(spark, feed_path, tmp_path):
    """Delete-by-absence tombstones: invisible to every reconciled read
    (tombstones.retain=false), present in the raw delta files until
    compaction, physically gone after it."""
    from pyspark.sql import functions as F

    mor = _pipe(spark, feed_path, tmp_path / "m", "mor")
    mor.run()
    tc = next(m for m in mor.models if m.spec.name == "tool_calls")

    # the row-wise tool_calls transform emits tombstones for every non-tool
    # winner, so the feed is guaranteed to have produced some
    raw_dead = tc.table.read().where(F.col("_deleted")).count()
    assert raw_dead > 0, "expected tombstone rows in the MOR deltas"
    assert tc.table.read_current().where(F.col("_deleted")).count() == 0

    tc.table.compact()
    assert tc.table.read().where(F.col("_deleted")).count() == 0, (
        "compaction must physically drop shadowed tombstones"
    )
    snap = tc.table.snapshot()
    assert not any(f["level"] == "delta" for f in snap.files)


def test_mor_crash_resume_exactly_once(spark, feed_path, tmp_path):
    """Stop after one batch, resume with a fresh pipeline: final MOR model
    state equals an uninterrupted run's (per-model epoch markers commit
    atomically with the delta append)."""
    root = tmp_path / "r"
    first = _pipe(spark, feed_path, root, "mor")
    first.run(max_batches=1)
    resumed = _pipe(spark, feed_path, root, "mor")
    resumed.run()

    clean = _pipe(spark, feed_path, tmp_path / "c", "mor")
    clean.run()
    assert _states(resumed) == _states(clean)


def test_mor_maintenance_bounds_model_deltas(spark, feed_path, tmp_path):
    """With maintenance_every=2 the model tables' live delta-file count is
    bounded by the cadence (compaction folds them), and state matches an
    unmaintained run."""
    plain = _pipe(spark, feed_path, tmp_path / "p", "mor", batch_size=120)
    res = plain.run()
    assert len(res) >= 4, "feed must span several batches for the cadence to fire"

    kept = _pipe(
        spark, feed_path, tmp_path / "k", "mor", batch_size=120,
        maintenance_every=2, maintenance_keep_snapshots=5,
    )
    kept.run()
    assert _states(kept) == _states(plain)
    for m in kept.models:
        n_delta = sum(1 for f in m.table.snapshot().files if f["level"] == "delta")
        # at most (maintenance_every - 1) epochs since the last fold, each
        # touching <= num_buckets buckets
        assert n_delta <= 2 * m.spec.num_buckets, (
            f"{m.spec.name}: {n_delta} live delta files — cadence not folding"
        )


def test_mor_streaming_redelivery_matches_batch(spark, feed_path, tmp_path):
    """Streaming form with MOR models, crash + resume: re-delivered files
    arrive under NEW epoch ids, so touched groups recompute again and
    append value-identical delta rows — the fold must still land on the
    batch pipeline's state (ties are value-identical by determinism)."""
    from cht_sync_spark.operators.models import SFT_EXAMPLES_MODEL
    from cht_sync_spark.streaming.stream import StreamingReplay

    bp = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "b" / "landing"),
        batch_size=300, num_buckets=8, mode="mor",
        models=[(SFT_EXAMPLES_MODEL, str(tmp_path / "b" / "sft"))],
        model_mode="mor",
    )
    bp.run()
    want = _states(bp)["sft_examples"]

    s_models = [(SFT_EXAMPLES_MODEL, str(tmp_path / "s" / "sft"))]
    crashing = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, mode="mor",
        fail_after_batches=2, models=s_models, model_mode="mor",
    )
    with pytest.raises(Exception, match="injected crash"):
        crashing.run_available_now()
    resumed = StreamingReplay(
        spark, feed_path, str(tmp_path / "s" / "t"), str(tmp_path / "s" / "ckpt"),
        max_files_per_trigger=1, num_buckets=8, mode="mor",
        models=s_models, model_mode="mor",
    )
    resumed.run_available_now()
    got = _states_of(resumed.models)["sft_examples"]
    assert got == want


def test_mor_increment_never_reads_model_table(spark, feed_path, tmp_path):
    """The O(slice) claim, pinned: a MOR increment of a single-row grouped
    model with data tests disabled performs ZERO reads of its own model
    table (append-only write path), while the COW merge must read the
    touched buckets. (Multi-row grouped models legitimately read the model
    for within-group delete-by-absence; data tests read it in both modes.)"""
    from dataclasses import replace

    from cht_sync_spark.operators.models import CONVERSATIONS

    spec = replace(
        CONVERSATIONS, name="conv_notest", unique_test=False, not_null=[],
    )
    counts = {}

    def _instrument(runner, tag):
        orig_read, orig_rc = runner.table.read, runner.table.read_current
        counts[tag] = 0

        def read(*a, **k):
            counts[tag] += 1
            return orig_read(*a, **k)

        def read_current(*a, **k):
            counts[tag] += 1
            return orig_rc(*a, **k)

        runner.table.read, runner.table.read_current = read, read_current

    for tag, mode in (("cow", "cow"), ("mor", "mor")):
        pipe = ReplayPipeline(
            spark,
            ChangesFeedSource(spark, feed_path, sources=feed_sources()),
            str(tmp_path / tag / "landing"),
            batch_size=300, num_buckets=8, mode="mor",
            models=[(spec, str(tmp_path / tag / "m"))],
            model_mode=mode,
        )
        pipe.run(max_batches=1)          # full refresh epoch (reads none)
        _instrument(pipe.models[0], tag)  # count only the increment epochs
        pipe.run()
    assert counts["mor"] == 0, "MOR increment must not read the model table"
    assert counts["cow"] > 0, "COW merge reads the touched model buckets"


def test_mor_rank_unique_under_commit_race(spark, feed_path, tmp_path):
    """_fold_rank stays strictly increasing when a concurrent writer lands
    between the rank read and the append: the pinned expected_version
    surfaces CommitConflict, the increment re-stamps from the new tip and
    retries — no two delta commits may share a rank."""
    from cht_sync_spark.operators.models import CONVERSATIONS

    pipe = _pipe(spark, feed_path, tmp_path / "r", "mor", batch_size=10_000)
    pipe.run()
    conv = next(m for m in pipe.models if m.spec.name == "conversations")

    orig = conv.table.append_delta
    raced = {"n": 0}

    def append_delta(df, **kw):
        if raced["n"] == 0:
            raced["n"] += 1
            # competing marker-only commit advances the tip after the rank
            # was computed (kw carries the stale expected_version)
            conv.table.commit(add_files=[], properties_update={"race": "x"})
        return orig(df, **kw)

    conv.table.append_delta = append_delta
    batch = pipe.table.read_current().limit(40)
    conv.run_increment(pipe.table, batch, epoch=99)
    assert raced["n"] == 1

    from pyspark.sql import functions as F

    raw = conv.table.read().where(F.col("_fold_rank").isNotNull())
    per_commit = {
        f["commit"] for f in conv.table.snapshot().files if f["level"] == "delta"
    }
    ranks = [r[0] for r in raw.select("_fold_rank").distinct().collect()]
    assert len(ranks) == len(per_commit), "one distinct rank per delta commit"
    assert conv.last_epoch() == 99, "retried append still committed the epoch"


def test_mode_validation():
    with pytest.raises(ValueError, match="'cow' or 'mor'"):
        from cht_sync_spark.operators.models import ModelRunner

        ModelRunner(None, CONVERSATIONS, "/tmp/x", mode="bogus")
