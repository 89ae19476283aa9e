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

A ``maintenance`` subcommand (no reference counterpart — lakehouse
extension surface) serves the ManagedTable upkeep a long-lived target
needs: ``compact``/``vacuum``/``history``/``restore``/``detail`` on a
table path.

    python -m data_warehouse_copy_spark maintenance compact /path/to/table
    python -m data_warehouse_copy_spark maintenance vacuum /path/to/table \
        --retention-hours 168
    python -m data_warehouse_copy_spark maintenance history /path/to/table
    python -m data_warehouse_copy_spark maintenance detail /path/to/table
"""

from __future__ import annotations

import argparse
import json
import sys

from data_warehouse_copy_spark.config import load_config
from data_warehouse_copy_spark.plans.pipeline import run
from data_warehouse_copy_spark.session import get_spark


def _maintenance(argv: list[str], spark=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m data_warehouse_copy_spark maintenance",
        description="ManagedTable upkeep: compact / vacuum / history / restore / detail.",
    )
    p.add_argument(
        "action", choices=["compact", "vacuum", "history", "restore", "detail"]
    )
    p.add_argument("table", help="path to the ManagedTable root")
    p.add_argument(
        "--max-files-per-partition", type=int, default=1,
        help="compact: target files per partition (default 1)",
    )
    p.add_argument(
        "--retention-hours", type=float, default=168.0,
        help="vacuum: skip unreferenced files younger than this "
        "(default 7 days; pass 0 only on a quiesced table)",
    )
    p.add_argument(
        "--version", type=int, default=None,
        help="restore: the version to roll back to",
    )
    args = p.parse_args(argv)
    if args.action == "restore" and args.version is None:
        p.error("restore requires --version")  # before paying Spark startup

    from data_warehouse_copy_spark.sources.managed_table import ManagedTable

    owns_session = spark is None
    if args.action in ("history", "detail"):
        # manifest-only: no Spark session needed
        t = ManagedTable(None, args.table)
        if not t.exists():
            print(f"no managed table at {args.table}", file=sys.stderr)
            return 1
        if args.action == "detail":
            print(json.dumps(t.detail(), indent=1))
            return 0
        for m in t.history():
            print(f"{m.version}\t{m.ts}\t{m.op}\t{m.n_files} files\t{m.total_rows} rows")
        return 0
    spark = spark or get_spark(app_name="dwcs-maintenance")
    try:
        t = ManagedTable(spark, args.table)
        if not t.exists():
            print(f"no managed table at {args.table}", file=sys.stderr)
            return 1
        if args.action == "compact":
            before, after = t.compact(args.max_files_per_partition)
            print(f"compact\t{before} -> {after} files")
        elif args.action == "restore":
            head = t.restore(args.version)
            print(f"restore\tv{args.version} contents recommitted as v{head}")
        else:
            removed = t.vacuum(retention_seconds=args.retention_hours * 3600)
            print(f"vacuum\t{removed} files removed")
        return 0
    finally:
        if owns_session:
            spark.stop()


def main(argv: list[str] | None = None, spark=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "maintenance":
        return _maintenance(argv[1:], spark=spark)
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
