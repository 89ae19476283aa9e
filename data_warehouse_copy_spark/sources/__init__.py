from data_warehouse_copy_spark.sources.catalog import load_table, register_views
from data_warehouse_copy_spark.sources.managed_table import ManagedTable

__all__ = ["ManagedTable", "load_table", "register_views"]
