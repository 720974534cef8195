from cht_sync_spark.streaming.pipeline import ReplayPipeline

__all__ = ["ReplayPipeline"]
