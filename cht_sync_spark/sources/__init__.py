from cht_sync_spark.sources.feedgen import synth_changes, write_feed
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.naming import source_name, source_name_col

__all__ = ["synth_changes", "write_feed", "ChangesFeedSource", "source_name", "source_name_col"]
