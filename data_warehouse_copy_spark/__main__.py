"""CLI entry point — the reference's ``Program.Main`` (``Program.cs:6-40``):
load the JSON job config, bootstrap logging, run the configured pipeline,
exit non-zero on failure.

    python -m data_warehouse_copy_spark appsettings.json
    python -m data_warehouse_copy_spark job.json --date-from 1995-03-01 \
        --date-to 1995-03-07

Accepts both the reference's ``appsettings.json`` key layout
(``ConnectionStrings`` + PascalCase ``BulkCopyConfig``) and the flat
snake_case layout (see ``config.load_config``). Unlike the reference —
which aborts the whole run on a sproc error but swallows per-table copy
errors (``StoreProcRunService.cs:32-36`` vs ``TableCopyService.cs:178``) —
the exit code reflects BOTH: any Failed outcome exits 1.
"""

from __future__ import annotations

import argparse
import sys

from data_warehouse_copy_spark.config import load_config
from data_warehouse_copy_spark.plans.pipeline import run
from data_warehouse_copy_spark.session import get_spark


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m data_warehouse_copy_spark",
        description="Run the configured warehouse-copy pipeline.",
    )
    p.add_argument("config", help="path to the job config JSON")
    p.add_argument("--date-from", help="override the window start (yyyy-MM-dd)")
    p.add_argument("--date-to", help="override the window end (yyyy-MM-dd)")
    p.add_argument(
        "--no-audit", action="store_true", help="skip audit-table bracketing"
    )
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    if args.date_from or args.date_to:
        if not (args.date_from and args.date_to):
            p.error("--date-from and --date-to must be given together")
        import dataclasses

        cfg = dataclasses.replace(
            cfg, date_from=args.date_from, date_to=args.date_to, schedule_mode=None
        )

    owns_session = spark is None
    spark = spark or get_spark(app_name="dwcs-run")
    try:
        result = run(spark, cfg, audit=not args.no_audit)
    finally:
        if owns_session:
            spark.stop()
    failed = [o for o in result.outcomes if o.status == "Failed"]
    for o in result.outcomes:
        print(f"{o.table}\t{o.process}\t{o.status}\t{o.records}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
