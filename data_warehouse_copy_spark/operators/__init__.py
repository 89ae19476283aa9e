from data_warehouse_copy_spark.operators.copy import (
    copy_table,
    exclude_columns,
    windowed_scan,
)
from data_warehouse_copy_spark.operators.upsert import changed_keys, update_table

__all__ = [
    "copy_table",
    "exclude_columns",
    "windowed_scan",
    "changed_keys",
    "update_table",
]
