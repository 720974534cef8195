"""ChangesFeedSource source-list contract: declared sources never trigger a
feed scan; discovery (O(feed) DISTINCT) is an explicit opt-in (VERDICT r2
missing #3 — the reference's source set is static config, db.js:45)."""

from __future__ import annotations

import pytest

from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.feedgen import feed_sources


def test_declared_sources_no_feed_job(spark, feed_path):
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    assert feed.sources() == feed_sources()
    # the source list came from config: the feed DataFrame (and with it the
    # directory listing / any Spark job) was never even planned
    assert feed._df is None


def test_undeclared_sources_require_optin(spark, feed_path):
    with pytest.raises(ValueError, match="discover_sources"):
        ChangesFeedSource(spark, feed_path).sources()
    got = ChangesFeedSource(spark, feed_path, discover_sources=True).sources()
    assert got == feed_sources()


def test_plan_batches_from_footers_no_spark_job(spark, feed_path, feed_df):
    """The batch schedule comes from parquet footer statistics — zero Spark
    jobs at pipeline startup (the Iceberg-style metadata scan plan): valid
    ascending cuts, exact coverage of every event, Spark never planned."""
    feed = ChangesFeedSource(spark, feed_path, sources=feed_sources())
    cuts = feed.plan_batches(300)
    assert feed._df is None, "footer planning must not touch Spark"
    assert cuts == sorted(set(cuts)), "cuts must be strictly ascending"
    n_total = feed_df.count()
    hi = feed_df.agg({"seq": "max"}).first()[0]
    assert cuts[-1] == hi
    # ranges partition the feed exactly
    lo, covered = -(2**62), 0
    for c in cuts:
        covered += feed.batch(lo, c).count()
        lo = c
    assert covered == n_total

    # determinism: same feed + batch_size -> identical schedule
    assert ChangesFeedSource(spark, feed_path, sources=feed_sources()).plan_batches(300) == cuts

    # oversized-row-group subdivision: a batch_size far below one row group
    # still yields multiple ~even batches, not one giant batch
    tiny = feed.plan_batches(50)
    assert len(tiny) > len(cuts)
