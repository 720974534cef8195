"""Typed downstream models: incremental maintenance, cascade delete,
full-refresh-on-code-change (SURVEY.md §2.3 T1-T9, T12)."""

from __future__ import annotations

from datetime import timezone

import pytest

from cht_sync_spark.operators.models import CONVERSATIONS, TOOL_CALLS, ModelSpec
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline

from tests.oracle import expected_state


@pytest.fixture(scope="module")
def oracle_live(feed_df):
    events = [r.asDict() for r in feed_df.collect()]
    return expected_state(events, drop_tombstones=True)


def _pipe(spark, feed_path, path, **kw):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    return ReplayPipeline(
        spark,
        feed,
        str(path / "landing"),
        batch_size=300,
        num_buckets=8,
        models=[(CONVERSATIONS, str(path / "conversations")), (TOOL_CALLS, str(path / "tool_calls"))],
        **kw,
    )


def _conv_oracle(oracle_live):
    convs: dict[str, dict] = {}
    for v in oracle_live.values():
        c = convs.setdefault(
            v["conv_id"], {"n_turns": 0, "first_ts": None, "last_ts": None, "has_tool_calls": False}
        )
        c["n_turns"] += 1
        ts = v["ts_ms"]
        c["first_ts"] = ts if c["first_ts"] is None else min(c["first_ts"], ts)
        c["last_ts"] = ts if c["last_ts"] is None else max(c["last_ts"], ts)
        c["has_tool_calls"] |= v["role"] == "tool"
    return convs


def test_models_match_oracle(spark, feed_path, tmp_path, oracle_live):
    pipe = _pipe(spark, feed_path, tmp_path)
    pipe.run()

    conv_want = _conv_oracle(oracle_live)
    conv_got = {
        r["conv_id"]: r.asDict()
        for r in pipe.models[0].table.read_current().collect()
    }
    assert set(conv_got) == set(conv_want)
    for cid, w in conv_want.items():
        g = conv_got[cid]
        assert g["n_turns"] == w["n_turns"], cid
        assert int(g["first_ts"].replace(tzinfo=timezone.utc).timestamp() * 1000) == w["first_ts"]
        assert int(g["last_ts"].replace(tzinfo=timezone.utc).timestamp() * 1000) == w["last_ts"]
        assert g["has_tool_calls"] == w["has_tool_calls"], cid
        assert not g["_deleted"]

    tc_want = {
        (v["conv_id"], v["turn_idx"]): v for v in oracle_live.values() if v["role"] == "tool"
    }
    tc_got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in pipe.models[1].table.read_current().collect()
    }
    assert set(tc_got) == set(tc_want)
    for k, w in tc_want.items():
        assert tc_got[k]["tool"] == w["tool"]
        assert tc_got[k]["text"] == w["text"]


def test_cascade_delete_reflected(spark, feed_path, tmp_path, feed_df, oracle_live):
    """Turns whose winner is a tombstone must be absent from both models
    (the FK-cascade semantics, contacts.yml:49-51 / e2e-test.spec.js:199-253)."""
    pipe = _pipe(spark, feed_path, tmp_path / "c")
    pipe.run()
    all_state = expected_state([r.asDict() for r in feed_df.collect()])
    deleted_ids = {k for k, v in all_state.items() if v["_deleted"]}
    assert deleted_ids, "fixture must contain deletions"
    tc = {
        (r["conv_id"], r["turn_idx"])
        for r in pipe.models[1].table.read_current().collect()
    }
    for _id in deleted_ids:
        conv, _, turn = _id.rpartition(":")
        assert (conv, int(turn)) not in tc


def test_model_catchup_after_partial_commit(spark, feed_path, tmp_path, oracle_live):
    """Landing fully committed, models never ran (crash window between the
    two commits): a resumed pipeline replays only the model side."""
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    bare = ReplayPipeline(spark, feed, str(tmp_path / "p" / "landing"), batch_size=300, num_buckets=8)
    bare.run()
    v_landing = bare.table.current_version()

    pipe = _pipe(spark, feed_path, tmp_path / "p")
    results = pipe.run()
    assert all(r.rows == 0 for r in results), "landing must not re-ingest"
    assert pipe.table.current_version() == v_landing
    conv_want = _conv_oracle(oracle_live)
    got = {r["conv_id"]: r["n_turns"] for r in pipe.models[0].table.read_current().collect()}
    assert got == {k: v["n_turns"] for k, v in conv_want.items()}


def test_transform_hash_triggers_full_refresh(spark, feed_path, tmp_path):
    """Changed model code ⇒ full rebuild (T12, dbt state:modified)."""
    pipe = _pipe(spark, feed_path, tmp_path / "h")
    pipe.run()
    runner = pipe.models[0]
    assert not runner.needs_full_refresh()

    def other_transform(df):
        from pyspark.sql import functions as F

        live = df.where(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return (
            live.groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.lit(True).alias("has_tool_calls"),  # changed logic
                F.max("seq").alias("seq"),
            )
            .withColumn("_deleted", F.lit(False))
        )

    runner.spec = ModelSpec(**{**CONVERSATIONS.__dict__, "transform": other_transform})
    assert runner.needs_full_refresh()
    runner.run_increment(pipe.table, pipe.table.read_current().limit(0))
    got = pipe.models[0].table.read_current().select("has_tool_calls").distinct().collect()
    assert [r["has_tool_calls"] for r in got] == [True]
    assert not runner.needs_full_refresh()


def test_periodic_deep_test_cadence_and_detector(spark, feed_path, tmp_path, monkeypatch):
    """ADVICE r4: incremental epochs test only the recomputed slice, whose
    sufficiency rests on merge/fold being bug-free. `deep_test_every=N`
    keeps a detector: every Nth epoch re-runs unique/not_null against the
    reconciled post-merge READ VIEW (the full_refresh form). Pins (a) the
    cadence — `_run_data_tests(buckets=None)` fires exactly on the
    configured epochs, never between, and (b) the detector — a read view
    with a duplicated key raises ContractViolation through that path."""
    import pytest as _pytest

    from cht_sync_spark.operators import models as M
    from cht_sync_spark.operators.contracts import ContractViolation

    pipe = _pipe(spark, feed_path, tmp_path / "deep")
    pipe.run()
    runner = pipe.models[0]
    runner.spec.deep_test_every = 2  # not part of transform_hash: no rebuild
    assert not runner.needs_full_refresh()

    calls: list = []
    orig = M.ModelRunner._run_data_tests

    def spy(self, buckets):
        calls.append(buckets)
        return orig(self, buckets)

    monkeypatch.setattr(M.ModelRunner, "_run_data_tests", spy)
    last = runner.last_epoch()
    odd = last + 1 if (last + 1) % 2 == 1 else last + 2
    even = odd + 1
    empty = pipe.table.read_current().limit(0)

    # off-cadence epoch: slice test only — _run_data_tests never called
    runner.run_increment(pipe.table, empty, epoch=odd)
    assert calls == []
    # on-cadence epoch: exactly one deep call over the FULL read view
    runner.run_increment(pipe.table, empty, epoch=even)
    assert calls == [None]

    # detector: a fold regression surfacing two versions of a key in the
    # read view must fail the deep test (drop_tombstones read wiring)
    orig_read = runner.table.read_current

    def corrupted(*a, **kw):
        df = orig_read(*a, **kw)
        return df.unionAll(df.limit(1))

    monkeypatch.setattr(runner.table, "read_current", corrupted)
    with _pytest.raises(ContractViolation):
        orig(runner, None)
