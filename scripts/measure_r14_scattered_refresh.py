"""Round-14 (optimization round 1) before/after probe for the
scattered-day matview REFRESH: re-runs ONLY the stress harness's
window-MV day case (scripts/measure_round14_stress.py case 2) so the
one-commit day-set refresh (ManagedTable.overwrite_days) can be compared
against the recorded per-run baseline (SCALING.md round 14: contiguous
120 days 3.18 s, scattered 60 days 19.53 s).

Run: python scripts/measure_r14_scattered_refresh.py   (idle box)
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.session import get_spark  # noqa: E402
from measure_round14_stress import stress_matview_days  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="dwcs-scattered-refresh-r14")
    with tempfile.TemporaryDirectory(prefix="dwcs_scat_") as td:
        for row in stress_matview_days(spark, Path(td) / "mv"):
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
