"""Model->model dependency DAG (the reference's persons.sql capability:
tests/dbt/package/models/contacts/persons.sql:13-22 selects FROM the
contacts MODEL joined to the landing table; dbt orders runs by the ref()
graph). Pins: topological ordering + parallelism within a level, dependent
incremental == full rebuild, O(touched groups) upstream reads (scan-file
assertions), tombstone cascade THROUGH the chain, crash-window replay
between DAG levels, and cycle/undeclared-dependency rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.operators.models import (
    CONV_PROFILES,
    CONVERSATIONS,
    TOOL_CALLS,
    ModelSpec,
)
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline

from tests.oracle import expected_state


def _pipe(spark, feed_path, path, **kw):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    return ReplayPipeline(
        spark,
        feed,
        str(path / "landing"),
        batch_size=300,
        num_buckets=8,
        models=[
            # declared intentionally OUT of topological order: the pipeline
            # must schedule conversations before conv_profiles regardless
            (CONV_PROFILES, str(path / "conv_profiles")),
            (CONVERSATIONS, str(path / "conversations")),
            (TOOL_CALLS, str(path / "tool_calls")),
        ],
        **kw,
    )


def _profiles_oracle(feed_df):
    events = [r.asDict() for r in feed_df.collect()]
    live = expected_state(events, drop_tombstones=True)
    out: dict[str, dict] = {}
    for v in live.values():
        c = out.setdefault(
            v["conv_id"],
            {"n_turns": 0, "has_tool_calls": False, "first_user": None},
        )
        c["n_turns"] += 1
        c["has_tool_calls"] |= v["role"] == "tool"
        if v["role"] == "user":
            cand = (v["turn_idx"], v["text"])
            if c["first_user"] is None or cand < c["first_user"]:
                c["first_user"] = cand
    return out


def test_dag_levels_and_validation(spark, feed_path, tmp_path):
    pipe = _pipe(spark, feed_path, tmp_path / "lv")
    names = [[m.spec.name for m in lvl] for lvl in pipe._model_levels]
    assert sorted(names[0]) == ["conversations", "tool_calls"]
    assert names[1] == ["conv_profiles"]

    bad = ModelSpec(**{**CONV_PROFILES.__dict__, "name": "x", "depends_on": ["nope"]})
    with pytest.raises(ValueError, match="undeclared model"):
        ReplayPipeline(
            spark,
            ChangesFeedSource(spark, feed_path, sources=feed_sources()),
            str(tmp_path / "bad" / "landing"),
            models=[(bad, str(tmp_path / "bad" / "x"))],
        )

    # a dependent model must be grouped: the touched-group set is the scope
    with pytest.raises(ValueError, match="group_cols"):
        ModelSpec(**{**CONV_PROFILES.__dict__, "name": "y", "group_cols": None})

    # cycle: two models depending on each other never become ready
    a = ModelSpec(**{**CONV_PROFILES.__dict__, "name": "a", "depends_on": ["b"]})
    b = ModelSpec(**{**CONV_PROFILES.__dict__, "name": "b", "depends_on": ["a"]})
    with pytest.raises(ValueError, match="cycle"):
        ReplayPipeline(
            spark,
            ChangesFeedSource(spark, feed_path, sources=feed_sources()),
            str(tmp_path / "cyc" / "landing"),
            models=[(a, str(tmp_path / "cyc" / "a")), (b, str(tmp_path / "cyc" / "b"))],
        )


def test_chained_incremental_matches_oracle_and_full_rebuild(
    spark, feed_path, feed_df, tmp_path
):
    pipe = _pipe(spark, feed_path, tmp_path / "inc", model_parallelism=2)
    results = pipe.run()
    assert len(results) >= 2, "DAG must be maintained across multiple increments"

    prof = {r["conv_id"]: r.asDict() for r in _runner(pipe, "conv_profiles").table.read_current().collect()}
    want = _profiles_oracle(feed_df)
    assert set(prof) == set(want)
    for cid, w in want.items():
        g = prof[cid]
        assert g["n_turns"] == w["n_turns"], cid
        assert g["has_tool_calls"] == w["has_tool_calls"], cid
        first = None if w["first_user"] is None else w["first_user"][1]
        assert g["first_user_text"] == first, cid
        assert not g["_deleted"]

    # incremental chain == full rebuild: force-refresh a fresh copy of the
    # dependent model from the FINAL landing + upstream state
    fresh = _pipe(spark, feed_path, tmp_path / "full")
    fresh.run_batch(0, -(2**62), 2**62)  # one giant batch = full-ish build
    prof2 = {
        r["conv_id"]: r.asDict()
        for r in _runner(fresh, "conv_profiles").table.read_current().collect()
    }
    assert {k: (v["n_turns"], v["first_user_text"]) for k, v in prof.items()} == {
        k: (v["n_turns"], v["first_user_text"]) for k, v in prof2.items()
    }


def _runner(pipe, name):
    return pipe._runners_by_name[name]


def test_dependent_increment_prunes_upstream_scan(spark, feed_path, tmp_path):
    """The upstream (conversations) read inside a dependent increment must
    open only the buckets the batch's conv_ids hash into — O(touched
    groups), not O(upstream table)."""
    pipe = _pipe(spark, feed_path, tmp_path / "pr")
    cuts = pipe.feed.plan_batches(300)
    pipe.run_batch(0, -(2**62), cuts[0])

    conv_t = _runner(pipe, "conversations").table
    total_files = len([f for f in conv_t.snapshot().files])
    # run one more small increment and capture the scan size of the
    # dependent model's upstream read
    batch2 = pipe.feed.batch(cuts[0], cuts[1])
    rows = pipe._transform(batch2)
    from cht_sync_spark.operators.lww import lww_dedup

    rows = lww_dedup(rows)
    n_convs = rows.select("conv_id").distinct().count()
    _runner(pipe, "conversations").run_increment(pipe.table, rows, epoch=1, upstreams=pipe._runners_by_name)
    _runner(pipe, "conv_profiles").run_increment(pipe.table, rows, epoch=1, upstreams=pipe._runners_by_name)
    assert conv_t.last_scan_files <= max(n_convs, 1), (
        f"upstream read opened {conv_t.last_scan_files} files for {n_convs} convs "
        f"(table has {total_files})"
    )


def test_tombstone_cascades_through_chain(spark, tmp_path):
    """Deleting EVERY turn of a conversation must remove it from the
    upstream model AND the dependent model (the FK cascade of persons,
    contacts.yml:49-51, carried through the DAG)."""
    import json as _json

    def ev(seq, conv, turn, op, role="user", text="t"):
        doc = (
            None
            if op == "delete"
            else _json.dumps(
                {"conv_id": conv, "turn_idx": turn, "role": role, "text": text, "ts": seq * 1000}
            )
        )
        return (seq, "synthhost/db0", op, f"{conv}:{turn}", f"{2 if op == 'delete' else 1}-r", doc)

    batch1 = [ev(1, "A", 0, "insert"), ev(2, "A", 1, "insert", role="tool"),
              ev(3, "B", 0, "insert", text="hello")]
    batch2 = [ev(4, "A", 0, "delete"), ev(5, "A", 1, "delete")]
    cols = "seq long, source string, op string, id string, rev string, doc string"
    fdir = str(tmp_path / "feed")
    spark.createDataFrame(batch1 + batch2, cols).write.parquet(fdir)

    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, fdir, sources=["synthhost/db0"]),
        str(tmp_path / "landing"),
        num_buckets=4,
        models=[
            (CONVERSATIONS, str(tmp_path / "conversations")),
            (CONV_PROFILES, str(tmp_path / "conv_profiles")),
        ],
    )
    pipe.run_batch(0, -(2**62), 3)
    prof1 = {r["conv_id"] for r in _runner(pipe, "conv_profiles").table.read_current().collect()}
    assert prof1 == {"A", "B"}

    pipe.run_batch(1, 3, 5)
    conv2 = {r["conv_id"] for r in _runner(pipe, "conversations").table.read_current().collect()}
    prof2 = {r["conv_id"]: r for r in _runner(pipe, "conv_profiles").table.read_current().collect()}
    assert conv2 == {"B"}, "conv A fully deleted upstream"
    assert set(prof2) == {"B"}, "cascade must reach the dependent model"
    assert prof2["B"]["first_user_text"] == "hello"


def test_crash_between_dag_levels_replays_downstream_only(spark, feed_path, tmp_path):
    """Upstream committed epoch k, crash before the dependent level: the
    resumed run must not re-run the upstream (epoch marker) and must bring
    the dependent model to the same state a clean run produces."""
    pipe = _pipe(spark, feed_path, tmp_path / "cr")
    cuts = pipe.feed.plan_batches(300)

    # landing commits batch 0 first (as run_batch always does), then ONLY
    # level 0 of the model DAG runs (simulated crash before level 1)
    bare = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(tmp_path / "cr" / "landing"),
        batch_size=300,
        num_buckets=8,
    )
    bare.run_batch(0, -(2**62), cuts[0])
    batch = pipe.feed.batch(-(2**62), cuts[0])
    from cht_sync_spark.operators.lww import lww_dedup

    rows = lww_dedup(pipe._transform(batch))
    for m in pipe._model_levels[0]:
        m.run_increment(pipe.table, rows, epoch=0, upstreams=pipe._runners_by_name)
    assert _runner(pipe, "conversations").last_epoch() == 0
    assert _runner(pipe, "conv_profiles").last_epoch() == -1
    v_conv = _runner(pipe, "conversations").table.current_version()

    # resume: the full pipeline run catches the dependent model up
    pipe2 = _pipe(spark, feed_path, tmp_path / "cr")
    pipe2.run()
    assert _runner(pipe2, "conv_profiles").last_epoch() >= 0

    # clean reference run
    ref = _pipe(spark, feed_path, tmp_path / "cr_ref")
    ref.run()
    got = {
        r["conv_id"]: (r["n_turns"], r["first_user_text"])
        for r in _runner(pipe2, "conv_profiles").table.read_current().collect()
    }
    want = {
        r["conv_id"]: (r["n_turns"], r["first_user_text"])
        for r in _runner(ref, "conv_profiles").table.read_current().collect()
    }
    assert got == want
    # upstream epoch-0 work was NOT redone on resume (version advanced only
    # by later epochs' commits, not a duplicate epoch-0 merge)
    hist_props = [
        s.properties.get("model.epoch") for s in _runner(pipe2, "conversations").table.history()
    ]
    assert hist_props.count("0") == 1, f"epoch-0 upstream work redone: {hist_props} (v was {v_conv})"
