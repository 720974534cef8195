from cht_sync_spark.tables.format import SnapshotTable
from cht_sync_spark.tables.merge import MergeStats, merge_upsert

__all__ = ["SnapshotTable", "MergeStats", "merge_upsert"]
