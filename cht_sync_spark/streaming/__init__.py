from cht_sync_spark.streaming.cms import CmsConsumer
from cht_sync_spark.streaming.consumer import ChangelogConsumer
from cht_sync_spark.streaming.hll import HllDistinctConsumer
from cht_sync_spark.streaming.ivm import AggregateConsumer, DistinctCountConsumer, Measure
from cht_sync_spark.streaming.join import JoinConsumer
from cht_sync_spark.streaming.metrics import metrics_text
from cht_sync_spark.streaming.pipeline import ReplayPipeline
from cht_sync_spark.streaming.scd2 import Scd2Consumer, scd2_intervals
from cht_sync_spark.streaming.stream import StreamingReplay

__all__ = [
    "AggregateConsumer",
    "ChangelogConsumer",
    "CmsConsumer",
    "DistinctCountConsumer",
    "HllDistinctConsumer",
    "JoinConsumer",
    "Measure",
    "ReplayPipeline",
    "Scd2Consumer",
    "StreamingReplay",
    "metrics_text",
    "scd2_intervals",
]
