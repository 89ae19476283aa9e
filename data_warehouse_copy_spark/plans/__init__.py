from data_warehouse_copy_spark.plans.audit import AuditLog
from data_warehouse_copy_spark.plans.pipeline import RunResult, TableOutcome, run
from data_warehouse_copy_spark.plans.sprocs import SprocRegistry

__all__ = ["AuditLog", "RunResult", "TableOutcome", "run", "SprocRegistry"]
