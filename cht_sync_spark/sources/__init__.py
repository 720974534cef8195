from cht_sync_spark.sources.feedgen import synth_changes, write_feed
from cht_sync_spark.sources.changes import ChangesFeedSource
from cht_sync_spark.sources.datasource import ChangesDataSource, drain, register, stream_offsets
from cht_sync_spark.sources.naming import source_name, source_name_col

__all__ = [
    "synth_changes",
    "write_feed",
    "ChangesFeedSource",
    "ChangesDataSource",
    "register",
    "drain",
    "stream_offsets",
    "source_name",
    "source_name_col",
]
