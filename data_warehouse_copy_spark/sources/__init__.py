from data_warehouse_copy_spark.sources.catalog import load_table, register_views
from data_warehouse_copy_spark.sources.datasource import (
    drain_available,
    register as register_data_source,
)
from data_warehouse_copy_spark.sources.managed_table import ManagedTable
from data_warehouse_copy_spark.sources.names import NamedCatalog

__all__ = [
    "ManagedTable",
    "NamedCatalog",
    "drain_available",
    "load_table",
    "register_data_source",
    "register_views",
]
