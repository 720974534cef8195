from cht_sync_spark.sources.feedgen import synth_changes, write_feed
from cht_sync_spark.sources.changes import ChangesFeedSource

__all__ = ["synth_changes", "write_feed", "ChangesFeedSource"]
