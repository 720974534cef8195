"""Snapshot bootstrap (ReplayPipeline.bootstrap): initial load at a
changelog position, then tail — the Debezium snapshot-then-stream flow.

Pins: a pipeline bootstrapped from a mid-replay snapshot + frontier ends
byte-equal to a full from-zero replay; the watermark guard skips covered
cuts even under a DIFFERENT batch size (cut plans need not align — a
straddling cut over-delivers only rows the idempotent fold discards);
seeded checkpoint rows surface in checkpoints(); a bootstrap over a
landing table with existing progress is refused.
"""

from __future__ import annotations

import pytest

from cht_sync_spark.sources import ChangesFeedSource, synth_changes, write_feed
from cht_sync_spark.sources.feedgen import feed_sources
from cht_sync_spark.streaming import ReplayPipeline


def _state(t):
    return {
        tuple(r) for r in t.read_current(drop_tombstones=True).collect()
    }


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bfeed") / "changes")
    write_feed(synth_changes(spark, n_convs=30), d, n_files=4)
    return ChangesFeedSource(spark, d, sources=feed_sources())


def test_bootstrap_equals_full_replay(spark, feed, tmp_path):
    # reference run: full from-zero replay
    full = ReplayPipeline(spark, feed, str(tmp_path / "full"), batch_size=60, num_buckets=8)
    full.run()

    # donor: replay only the first two batches, then snapshot
    donor = ReplayPipeline(spark, feed, str(tmp_path / "donor"), batch_size=60, num_buckets=8)
    donor.run(max_batches=2)
    frontier, _ = donor.state()
    assert 0 <= frontier
    snap = donor.table.read_current()  # tombstones kept: landing-shaped
    ckpt = [
        (r.source, r.partition_id, r.seq) for r in donor.checkpoints().collect()
    ]

    # adopt the snapshot at the frontier, then tail with a DIFFERENT batch
    # size so the cut plan cannot align with the donor's epochs
    boot = ReplayPipeline.bootstrap(
        spark, feed, str(tmp_path / "boot"), snap, frontier,
        checkpoint_rows=ckpt, batch_size=100, num_buckets=8,
    )
    # seeded cursor surface
    got_ck = {(r.source, r.partition_id, r.seq) for r in boot.checkpoints().collect()}
    assert got_ck == set(ckpt)

    results = boot.run()
    assert results, "post-frontier batches must apply"
    assert _state(boot.table) == _state(full.table)
    # resume over the drained feed: everything skips
    assert ReplayPipeline(
        spark, feed, str(tmp_path / "boot"), batch_size=100, num_buckets=8
    ).run() == []


def test_bootstrap_refuses_live_table(spark, feed, tmp_path):
    live = ReplayPipeline(spark, feed, str(tmp_path / "live"), batch_size=300, num_buckets=8)
    live.run(max_batches=1)
    snap = live.table.read_current()
    # refused under the SAME marker...
    with pytest.raises(ValueError, match="requires a fresh path"):
        ReplayPipeline.bootstrap(
            spark, feed, str(tmp_path / "live"), snap, 10, batch_size=300, num_buckets=8
        )
    # ...and under a DIFFERENT marker too: the overwrite would destroy the
    # first marker's ingested rows while its watermark blocks re-landing
    with pytest.raises(ValueError, match="requires a fresh path"):
        ReplayPipeline.bootstrap(
            spark, feed, str(tmp_path / "live"), snap, 10,
            marker="adopt", batch_size=300, num_buckets=8,
        )


def test_resume_with_changed_batch_size_is_refused(spark, feed, tmp_path):
    """Epoch markers are positions in the cut plan; a resume under a
    different batch_size would re-number ranges and silently skip unlanded
    data (the epoch guard aliases a new, wider range). The plan-stability
    fence refuses it instead."""
    p1 = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=60, num_buckets=8)
    p1.run(max_batches=2)
    with pytest.raises(ValueError, match="batch_size"):
        ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=300, num_buckets=8).run()
    # same size resumes fine and drains the rest
    rest = ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=60, num_buckets=8).run()
    assert rest
    full = ReplayPipeline(spark, feed, str(tmp_path / "full"), batch_size=60, num_buckets=8)
    full.run()
    assert _state(ReplayPipeline(spark, feed, str(tmp_path / "t"), batch_size=60,
                                 num_buckets=8).table) == _state(full.table)
