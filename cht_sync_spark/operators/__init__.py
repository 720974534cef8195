from cht_sync_spark.operators.lww import lww_dedup, lww_order_cols

__all__ = ["lww_dedup", "lww_order_cols"]
