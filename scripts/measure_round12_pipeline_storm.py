"""Round-12 scaling drill (round-11 verdict item 5): the FULL configured
pipeline — facts + dims + the shared audit table — run by THREE real OS
processes concurrently, every log commit travelling through the
network-boundary object store (HttpObjectStore over a localhost socket)
with injected CAS latency, lost acks (apply-then-drop-connection) and
503s, against the 10x dataset (.scaling/sf1.0).

Workers split the work the way a real multi-source curation deployment
would: two fact workers load DISJOINT date windows of lineitem into ONE
shared fact table, a third reloads the dims — all three bracketing their
work in the SAME audit table, whose appends race through the socket
store's conditional PUT.

Records (for SCALING.md): wall per worker, total CAS attempts/losses
observed server-side, injected faults, audit exactly-once (one Completed
finish row per (table, process)), and fact-row exactness vs the source
windows.

Run: python scripts/measure_round12_pipeline_storm.py [--sf01]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_WORKER = r"""
import json, sys, time
from pathlib import Path

sys.path.insert(0, sys.argv[6])
import data_warehouse_copy_spark as dwcs
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.plans import run
from data_warehouse_copy_spark.sources import commit_protocol as cp
from data_warehouse_copy_spark.sources.http_store import HttpObjectStore

port, target, src, spec = int(sys.argv[1]), sys.argv[2], sys.argv[3], json.loads(sys.argv[4])
wid = sys.argv[5]
cp.register_commit_protocol(
    target, cp.ConditionalPutCommitProtocol(HttpObjectStore(port, timeout=10.0))
)
spark = get_spark(shuffle_partitions=8, app_name=f"storm-{wid}")
cfg = dwcs.load_config({
    "source": src, "target": target,
    "date_from": spec["date_from"], "date_to": spec["date_to"],
    "tables": spec["tables"],
})
t0 = time.time()
res = run(spark, cfg)
wall = time.time() - t0
print("WORKER_RESULT " + json.dumps({
    "wid": wid, "wall": round(wall, 2),
    "outcomes": [(o.table, o.process, o.status, o.records) for o in res.outcomes],
}))
"""


def main() -> None:
    from data_warehouse_copy_spark.session import get_spark
    from data_warehouse_copy_spark.sources import commit_protocol as cp
    from data_warehouse_copy_spark.sources.http_store import (
        FaultPlan,
        HttpObjectStoreServer,
    )
    from data_warehouse_copy_spark.sources.managed_table import ManagedTable
    from data_warehouse_copy_spark.plans.audit import AuditLog

    repo = Path(__file__).resolve().parents[1]
    sf_dir = (
        "/root/testdata/sf0.1"
        if "--sf01" in sys.argv
        else str(repo / ".scaling" / "sf1.0")
    )
    target = tempfile.mkdtemp(prefix="dwcs_storm_")
    specs = [
        {
            "date_from": "1995-03-01",
            "date_to": "1995-03-10",
            "tables": [
                {
                    "table_name": "lineitem",
                    "table_type": "fact",
                    "date_column": "l_shipdate",
                }
            ],
        },
        {
            "date_from": "1995-03-11",
            "date_to": "1995-03-20",
            "tables": [
                {
                    "table_name": "lineitem",
                    "table_type": "fact",
                    "date_column": "l_shipdate",
                }
            ],
        },
        {
            "date_from": "1995-03-01",
            "date_to": "1995-03-10",
            "tables": [
                {"table_name": "customer", "table_type": "dim"},
                {"table_name": "supplier", "table_type": "dim"},
            ],
        },
    ]
    with HttpObjectStoreServer() as srv:
        srv.faults.latency_cas_s = 0.02  # every CAS ack delayed 20 ms
        srv.faults.drop_after_next_cas = 4  # lost acks (applied, no resp)
        srv.faults.fail_before_next_cas = 4  # clean 503s (not applied)
        # count CAS traffic server-side (the honest place: client retries
        # and recovery reads all funnel here)
        store = srv.store
        counts = {"attempts": 0, "losses": 0}
        orig = store.put_if_absent

        def counted(key, data):
            counts["attempts"] += 1
            won = orig(key, data)
            if not won:
                counts["losses"] += 1
            return won

        store.put_if_absent = counted
        t0 = time.time()
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _WORKER,
                    str(srv.port),
                    target,
                    sf_dir,
                    json.dumps(spec),
                    f"w{i}",
                    str(repo),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for i, spec in enumerate(specs)
        ]
        results = []
        for p in procs:
            out, err = p.communicate(timeout=3600)
            if p.returncode != 0:
                print(err[-4000:])
                raise SystemExit(f"worker failed rc={p.returncode}")
            line = next(
                ln for ln in out.splitlines() if ln.startswith("WORKER_RESULT ")
            )
            results.append(json.loads(line[len("WORKER_RESULT "):]))
        wall = time.time() - t0

        # verification reads go through the SAME store
        cp.register_commit_protocol(
            target,
            cp.ConditionalPutCommitProtocol(
                __import__(
                    "data_warehouse_copy_spark.sources.http_store",
                    fromlist=["HttpObjectStore"],
                ).HttpObjectStore(srv.port, timeout=10.0)
            ),
        )
        spark = get_spark(shuffle_partitions=8, app_name="storm-verify")
        li = ManagedTable(spark, f"{target}/lineitem")
        got_rows = li.read().count()
        src_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        want = src_li.where(
            "l_shipdate >= '1995-03-01' AND l_shipdate < '1995-03-21'"
        ).count()
        audit = AuditLog(
            spark, f"{target}/_audit/tbl_dw_copy_logs"
        ).current_status()
        finished = audit.where("status = 'Completed'").count()
        statuses = sorted(
            (r["table_name"], r["process"], r["status"])
            for r in audit.collect()
        )
        cp.unregister_commit_protocol(target)
    out = {
        "sf_dir": sf_dir,
        "wall_total": round(wall, 2),
        "workers": results,
        "fact_rows": got_rows,
        "fact_rows_expected": want,
        "fact_exact": got_rows == want,
        "audit_completed_rows": finished,
        "audit_rows": statuses,
        "cas_attempts": counts["attempts"],
        "cas_losses": counts["losses"],
        "faults_injected": {"lost_acks": 4, "fail_503": 4,
                            "cas_latency_s": 0.02},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
