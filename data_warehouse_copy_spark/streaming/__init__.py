from data_warehouse_copy_spark.streaming.events import (
    sessionize,
    stream_events_to_managed_table,
    tumbling_window_agg,
)

__all__ = ["tumbling_window_agg", "sessionize", "stream_events_to_managed_table"]
