"""Round-12 verdict item 5: the full configured pipeline driven by
CONCURRENT OS processes whose every log commit travels through the
network-boundary object store (HttpObjectStore over a real socket) with
injected lost acks, 503s and CAS latency — convergence pinned: every
table lands Completed with exact rows, the shared audit table stays
exactly-once per (table, process), and the injected faults are absorbed
by the commit protocol's retry/recovery-read. The 10x measurement twin
lives in scripts/measure_round12_pipeline_storm.py (SCALING.md row).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_warehouse_copy_spark.plans.audit import AuditLog  # noqa: E402
from data_warehouse_copy_spark.sources import commit_protocol as cp  # noqa: E402
from data_warehouse_copy_spark.sources.http_store import (  # noqa: E402
    HttpObjectStore,
    HttpObjectStoreServer,
)
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)

_WORKER = r"""
import json, sys

sys.path.insert(0, sys.argv[5])
import data_warehouse_copy_spark as dwcs
from data_warehouse_copy_spark.session import get_spark
from data_warehouse_copy_spark.plans import run
from data_warehouse_copy_spark.sources import commit_protocol as cp
from data_warehouse_copy_spark.sources.http_store import HttpObjectStore

port, target, src, spec = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], json.loads(sys.argv[4])
)
cp.register_commit_protocol(
    target, cp.ConditionalPutCommitProtocol(HttpObjectStore(port, timeout=10.0))
)
spark = get_spark(shuffle_partitions=4)
cfg = dwcs.load_config({
    "source": src, "target": target,
    "date_from": spec["date_from"], "date_to": spec["date_to"],
    "tables": spec["tables"],
})
res = run(spark, cfg)
print("RESULT " + json.dumps(
    [(o.table, o.process, o.status, o.records) for o in res.outcomes]
))
"""


def test_concurrent_pipeline_processes_converge_over_socket_store(
    spark, tmp_path
):
    src = "/root/testdata/sf0.001"
    target = str(tmp_path / "tgt")
    specs = [
        {
            "date_from": "1995-03-01",
            "date_to": "1995-03-07",
            "tables": [
                {
                    "table_name": "lineitem",
                    "table_type": "fact",
                    "date_column": "l_shipdate",
                }
            ],
        },
        {
            "date_from": "1995-03-08",
            "date_to": "1995-03-14",
            "tables": [
                {
                    "table_name": "lineitem",
                    "table_type": "fact",
                    "date_column": "l_shipdate",
                },
                {"table_name": "customer", "table_type": "dim"},
            ],
        },
    ]
    with HttpObjectStoreServer() as srv:
        srv.faults.latency_cas_s = 0.02
        srv.faults.drop_after_next_cas = 3  # lost acks
        srv.faults.fail_before_next_cas = 3  # clean 503s
        env = dict(__import__("os").environ)
        env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _WORKER,
                    str(srv.port),
                    target,
                    src,
                    json.dumps(spec),
                    str(Path(__file__).resolve().parents[1]),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
            )
            for spec in specs
        ]
        outcomes = []
        for p in procs:
            out, err = p.communicate(timeout=420)
            assert p.returncode == 0, err[-2000:]
            line = next(
                ln for ln in out.splitlines() if ln.startswith("RESULT ")
            )
            outcomes.extend(json.loads(line[len("RESULT "):]))
        # every unit Completed under the fault barrage
        assert all(o[2] == "Completed" for o in outcomes), outcomes
        # verification reads go through the SAME socket store
        cp.register_commit_protocol(
            target,
            cp.ConditionalPutCommitProtocol(
                HttpObjectStore(srv.port, timeout=10.0)
            ),
        )
        try:
            li = ManagedTable(spark, f"{target}/lineitem")
            want = (
                spark.read.parquet(f"{src}/lineitem.parquet")
                .where(
                    "l_shipdate >= '1995-03-01' AND "
                    "l_shipdate < '1995-03-15'"
                )
                .count()
            )
            assert li.read().count() == want  # disjoint windows, exact
            status = AuditLog(
                spark, f"{target}/_audit/tbl_dw_copy_logs"
            ).current_status()
            rows = [
                (r["table_name"], r["status"]) for r in status.collect()
            ]
            # exactly-once: one Completed run per pipeline unit
            assert sorted(rows) == [
                ("customer", "Completed"),
                ("lineitem", "Completed"),
                ("lineitem", "Completed"),
            ]
        finally:
            cp.unregister_commit_protocol(target)
