"""Model run-stats + model latency — the dbt observability plane
(reference sql-exporter-config.yaml:63-90: per-model dbt_results status/
execution_time records and the dbt-latency model-vs-landing freshness gap).

The engine records one (model, epoch) run record per DAG epoch into a
bookkeeping table (micro-append, same shape as lineage), keyed with LWW on
``completed`` DESC so a crash-resumed batch's 'skipped' replay record can
never shadow a completed run's record. ``model_latency()`` diffs each
model's covered seq bound against the landing checkpoints' frontier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline

LO0 = -(2**62)


def _pipe(spark, feed_path, work, with_models=True, runs=True, **kw):
    models = (
        [(CONVERSATIONS, f"{work}/conv"), (CONV_PROFILES, f"{work}/prof")]
        if with_models
        else []
    )
    return ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        f"{work}/t",
        batch_size=400,
        num_buckets=8,
        models=models,
        model_runs_path=f"{work}/runs" if runs else None,
        **kw,
    )


def _plan(pipe):
    cuts = pipe.feed.plan_batches(pipe.batch_size)
    out, lo = [], LO0
    for hi in cuts:
        out.append((lo, hi))
        lo = hi
    return out


def test_run_stats_recorded_per_model_per_epoch(spark, feed_path, tmp_path):
    work = str(tmp_path)
    pipe = _pipe(spark, feed_path, work)
    results = pipe.run()
    n_epochs = len(results)
    assert n_epochs >= 2
    runs = pipe.model_runs().collect()
    # one record per model per epoch, all completed
    assert len(runs) == 2 * n_epochs
    assert {(r["model"], r["epoch"]) for r in runs} == {
        (m, e) for m in ("conversations", "conv_profiles") for e in range(n_epochs)
    }
    assert all(r["completed"] == 1 for r in runs)
    # epoch 0 on a fresh table is the transform-hash full refresh; later
    # epochs are incremental successes
    by = {(r["model"], r["epoch"]): r for r in runs}
    assert by[("conversations", 0)]["status"] == "full_refresh"
    assert all(
        by[(m, e)]["status"] == "success"
        for m in ("conversations", "conv_profiles")
        for e in range(1, n_epochs)
    )
    assert all(r["exec_ms"] >= 0 and r["updated_at"] is not None for r in runs)
    # rows: a grouped model writes one row per touched group per epoch
    # (live recomputes + gone tombstones == the batch's distinct groups);
    # the epoch-0 full refresh writes LIVE groups only (<= touched)
    bounds = sorted((b.seq_lo, b.seq_hi) for b in results)
    for e, (lo, hi) in enumerate(bounds):
        batch = pipe.feed.df().where((F.col("seq") > lo) & (F.col("seq") <= hi))
        touched = pipe._transform(batch).select("conv_id").distinct().count()
        for m in ("conversations", "conv_profiles"):
            got = by[(m, e)]["rows"]
            if e == 0:
                assert 0 < got <= touched
            else:
                assert got == touched
    # covered bound = the batch's planned hi
    assert all(by[("conversations", e)]["hi_seq"] == bounds[e][1] for e in range(n_epochs))


def test_skipped_replay_never_overwrites_completed(spark, feed_path, tmp_path):
    work = str(tmp_path)
    pipe = _pipe(spark, feed_path, work)
    pipe.run()
    before = {(r["model"], r["epoch"]): r["status"] for r in pipe.model_runs().collect()}
    assert before and all(s in ("success", "full_refresh") for s in before.values())
    # replay the whole feed through a fresh pipeline over the same tables:
    # every model skips every epoch, appending completed=0 records that must
    # all LOSE the fold to the completed ones
    pipe2 = _pipe(spark, feed_path, work)
    assert pipe2.run() == []  # run() returns only non-skipped batches
    after = {(r["model"], r["epoch"]): r for r in pipe2.model_runs().collect()}
    assert len(after) == len(before)
    for k, status in before.items():
        assert after[k]["status"] == status and after[k]["completed"] == 1


def test_crash_window_records_skipped_honestly(spark, feed_path, tmp_path):
    """Crash-window semantics, both halves:

    1. A crash MID-DAG (some models committed, the stats append never ran):
       the resumed batch re-enters the model plane — already-committed
       models record 'skipped' (completed=0), lagging models record their
       real run. Stats are observability, not lineage-of-record.
    2. A FULLY-done batch short-circuits before the model plane and records
       nothing — replays never manufacture phantom run records."""
    work = str(tmp_path)
    # batch 0 commits the landing + ONLY the upstream model (== crash before
    # conv_profiles and before any stats append)
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        f"{work}/t",
        batch_size=400,
        num_buckets=8,
        models=[(CONVERSATIONS, f"{work}/conv")],
    )
    lo, hi = _plan(pipe)[0]
    pipe.run_batch(0, lo, hi)
    # resume with the FULL DAG + stats configured: the landing and the
    # upstream skip, the lagging downstream runs for real
    pipe2 = _pipe(spark, feed_path, work)
    pipe2.run_batch(0, lo, hi)
    runs = {r["model"]: r for r in pipe2.model_runs().collect()}
    assert set(runs) == {"conversations", "conv_profiles"}
    up, down = runs["conversations"], runs["conv_profiles"]
    assert up["status"] == "skipped" and up["completed"] == 0 and up["rows"] == 0
    assert down["status"] == "full_refresh" and down["completed"] == 1 and down["rows"] > 0
    # a now-fully-done replay records nothing new
    assert pipe2.run_batch(0, lo, hi).skipped
    assert pipe2.model_runs().count() == 2


def test_model_latency_tracks_detached_models(spark, feed_path, tmp_path):
    work = str(tmp_path)
    pipe = _pipe(spark, feed_path, work)
    plan = _plan(pipe)
    assert len(plan) >= 2
    pipe.run_batch(0, *plan[0])
    lat0 = {r["model"]: r for r in pipe.model_latency().collect()}
    assert set(lat0) == {"conversations", "conv_profiles"}
    assert all(r["seq_lag"] == 0 for r in lat0.values())
    # the landing advances WITHOUT the models (a models-less worker drains
    # the rest of the feed into the same table): lag = frontier - covered
    pipe2 = _pipe(spark, feed_path, work, with_models=False, runs=False)
    for e, (lo, hi) in enumerate(plan[1:], start=1):
        pipe2.run_batch(e, lo, hi)
    lat = {r["model"]: r for r in pipe.model_latency().collect()}
    tip = max(hi for _, hi in plan)
    for m in ("conversations", "conv_profiles"):
        assert lat[m]["last_epoch"] == 0
        assert lat[m]["model_hi_seq"] == plan[0][1]
        assert lat[m]["tip_hi_seq"] == tip
        assert lat[m]["seq_lag"] == tip - plan[0][1] > 0


def test_completed_beats_skipped_in_the_fold(spark, feed_path, tmp_path):
    """The LWW-on-completed guarantee, pinned on a REAL coexistence: widening
    the model list re-enters the model plane for an epoch the upstream
    already committed, appending a 'skipped' (completed=0) record for the
    exact (model, epoch) key that already holds a completed one — the fold
    must keep the completed record. Then the same property pinned directly
    with a hand-appended skip row."""
    work = str(tmp_path)
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        f"{work}/t",
        batch_size=400,
        num_buckets=8,
        models=[(CONVERSATIONS, f"{work}/conv")],
        model_runs_path=f"{work}/runs",
    )
    lo, hi = _plan(pipe)[0]
    pipe.run_batch(0, lo, hi)
    first = {r["model"]: r for r in pipe.model_runs().collect()}
    assert first["conversations"]["completed"] == 1
    # widen the DAG: conversations is already at epoch 0, conv_profiles lags
    pipe2 = _pipe(spark, feed_path, work)
    pipe2.run_batch(0, lo, hi)
    runs = {r["model"]: r for r in pipe2.model_runs().collect()}
    assert runs["conversations"]["status"] == first["conversations"]["status"]
    assert runs["conversations"]["completed"] == 1, (
        "a replayed skip shadowed the completed record"
    )
    assert runs["conv_profiles"]["completed"] == 1
    # direct pin: a later-appended skip row for the same key loses the fold
    pipe2.model_runs_table.append_rows_local(
        [("conv_profiles", 0, "skipped", 0, 0, None, 0, 0)]
    )
    again = {r["model"]: r for r in pipe2.model_runs().collect()}
    assert again["conv_profiles"]["completed"] == 1
    assert again["conv_profiles"]["status"] != "skipped"


def test_rows_stat_identical_across_model_modes(spark, feed_path, tmp_path):
    """`rows` counts the recomputed slice INCLUDING retraction tombstones —
    by design identical across cow/mor model modes (MOR physically appends
    the tombstones, the COW merge counts then drops them). The synthetic
    feed contains deletes, so this pins the deleting-batch case too."""
    runs = {}
    for mode in ("cow", "mor"):
        work = str(tmp_path / mode)
        pipe = _pipe(spark, feed_path, work, model_mode=mode)
        pipe.run()
        runs[mode] = {
            (r["model"], r["epoch"]): r["rows"] for r in pipe.model_runs().collect()
        }
    assert runs["cow"] == runs["mor"]
    assert any(v > 0 for v in runs["cow"].values())


def test_model_latency_surfaces_never_completed_models(spark, feed_path, tmp_path):
    """A declared model with NO completed record (never ran, or only
    crash-window skips) must appear in the latency view with null bounds —
    the most-lagged model is exactly the one the metric must not hide."""
    work = str(tmp_path)
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        f"{work}/t",
        batch_size=400,
        num_buckets=8,
        models=[(CONVERSATIONS, f"{work}/conv")],
        model_runs_path=f"{work}/runs",
    )
    lo, hi = _plan(pipe)[0]
    pipe.run_batch(0, lo, hi)
    # a second handle declares a WIDER DAG without having run it
    wide = _pipe(spark, feed_path, work)
    lat = {r["model"]: r for r in wide.model_latency().collect()}
    assert set(lat) == {"conversations", "conv_profiles"}
    assert lat["conversations"]["seq_lag"] == 0
    assert lat["conv_profiles"]["model_hi_seq"] is None
    assert lat["conv_profiles"]["seq_lag"] is None


def test_model_runs_requires_configuration(spark, feed_path, tmp_path):
    pipe = _pipe(spark, feed_path, str(tmp_path), runs=False)
    with pytest.raises(ValueError):
        pipe.model_runs()


def test_streaming_form_records_runs(spark, feed_path, tmp_path):
    """StreamingReplay(model_runs_path=): same record shape as the batch
    pipeline; the covered bound is the batch's OBSERVED max seq (streaming
    batches have no planned seq range)."""
    from cht_sync_spark.streaming.stream import StreamingReplay

    work = str(tmp_path)
    sr = StreamingReplay(
        spark, feed_path, f"{work}/t", f"{work}/ckpt",
        max_files_per_trigger=2, num_buckets=8,
        sources=feed_sources(),
        models=[(CONVERSATIONS, f"{work}/conv"), (CONV_PROFILES, f"{work}/prof")],
        model_runs_path=f"{work}/runs",
    )
    sr.run_available_now()
    runs = sr.model_runs().collect()
    n_epochs = int(sr.table.snapshot().properties["epoch.stream"]) + 1
    assert n_epochs >= 2
    assert len(runs) == 2 * n_epochs
    assert all(r["completed"] == 1 for r in runs)
    assert all(r["hi_seq"] is not None and r["rows"] > 0 for r in runs)
    # the batches jointly cover the whole feed: the max observed bound per
    # model equals the feed's max seq (file-stream batch ORDER follows file
    # listing, not seq bands, so per-epoch bounds need not be monotone)
    feed_hi = spark.read.parquet(feed_path).agg(F.max("seq")).first()[0]
    for m in ("conversations", "conv_profiles"):
        assert max(r["hi_seq"] for r in runs if r["model"] == m) == feed_hi
