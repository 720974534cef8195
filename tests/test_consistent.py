"""Cross-table snapshot-isolation reads (tables/consistent.py): epoch
alignment across landing + model tables, frontier semantics, compaction
transparency, and marker detection errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.tables.consistent import (
    epoch_frontier,
    epoch_of,
    read_consistent,
    version_at_epoch,
)


@pytest.fixture(scope="module")
def run(spark, feed_path, tmp_path_factory):
    """Replay the feed batch-by-batch, snapshotting the EXPECTED per-epoch
    states of landing + both models as plain dicts."""
    from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS

    p = tmp_path_factory.mktemp("cons")
    pipe = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, feed_path, sources=feed_sources()),
        str(p / "t"),
        batch_size=400,
        num_buckets=8,
        mode="mor",
        models=[(CONVERSATIONS, str(p / "conv")), (CONV_PROFILES, str(p / "prof"))],
        model_mode="mor",
    )
    cuts = pipe.feed.plan_batches(pipe.batch_size)
    states: dict[int, dict[str, set]] = {}
    lo = -(2**62)
    for epoch, hi in enumerate(cuts):
        pipe.run_batch(epoch, lo, hi)
        lo = hi
        states[epoch] = {
            "landing": {
                (r["_id"], r["_rev"])
                for r in pipe.table.read_current(drop_tombstones=True).collect()
            },
            "conversations": {
                (r["conv_id"], r["n_turns"])
                for r in pipe._runners_by_name["conversations"]
                .table.read_current(drop_tombstones=True)
                .collect()
            },
            "conv_profiles": {
                (r["conv_id"], r["n_turns"], r["first_user_text"])
                for r in pipe._runners_by_name["conv_profiles"]
                .table.read_current(drop_tombstones=True)
                .collect()
            },
        }
    # compaction AFTER the fact must be transparent to epoch-pinned reads
    pipe.table.compact()
    return pipe, states


def _tables(pipe):
    return {
        "landing": pipe.table,
        "conversations": pipe._runners_by_name["conversations"].table,
        "conv_profiles": pipe._runners_by_name["conv_profiles"].table,
    }


def test_read_consistent_reproduces_every_epoch(spark, run):
    pipe, states = run
    for epoch, want in states.items():
        got = read_consistent(_tables(pipe), epoch=epoch, drop_tombstones=True)
        g_land = {(r["_id"], r["_rev"]) for r in got["landing"][1].collect()}
        assert g_land == want["landing"], f"landing mismatch at epoch {epoch}"
        g_conv = {(r["conv_id"], r["n_turns"]) for r in got["conversations"][1].collect()}
        assert g_conv == want["conversations"], f"conversations mismatch at epoch {epoch}"
        g_prof = {
            (r["conv_id"], r["n_turns"], r["first_user_text"])
            for r in got["conv_profiles"][1].collect()
        }
        assert g_prof == want["conv_profiles"], f"conv_profiles mismatch at epoch {epoch}"


def test_frontier_and_lag(spark, run):
    pipe, states = run
    last = max(states)
    tabs = _tables(pipe)
    assert epoch_frontier(tabs) == last
    # simulate a landing-ahead commit (a batch whose model catch-up hasn't
    # happened yet): frontier pins back to the lagging models
    pipe.table.commit(
        add_files=[], properties_update={pipe._epoch_prop: str(last + 1)}
    )
    assert epoch_of(pipe.table) == last + 1
    assert epoch_frontier(tabs) == last
    # default read (no epoch) aligns everything at the frontier
    got = read_consistent(tabs, drop_tombstones=True)
    g_land = {(r["_id"], r["_rev"]) for r in got["landing"][1].collect()}
    assert g_land == states[last]["landing"]
    # pinning PAST the frontier would be a torn read — rejected, naming lag
    with pytest.raises(ValueError, match="past the consistent frontier"):
        read_consistent(tabs, epoch=last + 1)
    # pinning BELOW the first marked commit is unknowable — rejected too
    with pytest.raises(ValueError, match="no retained version"):
        version_at_epoch(pipe.table, -1)


def test_version_walk_and_marker_errors(spark, run, tmp_path):
    pipe, states = run
    # pinned version really is older than the tip after late commits
    v0 = version_at_epoch(pipe.table, 0)
    assert v0 < pipe.table.current_version()
    # a table with no epoch markers refuses alignment
    from cht_sync_spark.tables.format import SnapshotTable
    from pyspark.sql import types as T

    bare = SnapshotTable.create(
        spark, str(tmp_path / "bare"),
        T.StructType([T.StructField("k", T.StringType(), False)]), key_cols=["k"],
    )
    with pytest.raises(ValueError, match="no epoch marker"):
        epoch_of(bare)
