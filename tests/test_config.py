"""Unit tests for config loading and table classification
(reference BulkCopyManager.cs:87-104, appsettings.json)."""

import json

import pytest

from data_warehouse_copy_spark.config import (
    JobConfig,
    TableSpec,
    classify_tables,
    load_config,
)


def spec(**kw):
    kw.setdefault("table_name", "t")
    kw.setdefault("table_type", "fact")
    return TableSpec(**kw)


def test_classification_five_lists():
    tables = [
        spec(table_name="f_plain", table_type="fact", date_column="d"),
        spec(
            table_name="f_upd",
            table_type="fact",
            date_column="d",
            update_date_column="u",
            primary_key="pk",
        ),
        spec(table_name="dim1", table_type="dim"),
        spec(table_name="sp1", table_type="sproc"),
        spec(table_name="hist1", table_type="historical", update_date_column="u"),
        spec(table_name="hist_no_upd", table_type="historical"),
    ]
    c = classify_tables(tables)
    assert [t.table_name for t in c.normal] == ["f_plain"]
    assert [t.table_name for t in c.copy_update] == ["f_upd"]
    assert [t.table_name for t in c.truncate] == ["dim1"]
    assert [t.table_name for t in c.sproc] == ["sp1"]
    # historical requires update_date_column (BulkCopyManager.cs:104)
    assert [t.table_name for t in c.historical] == ["hist1"]


def test_fact_with_only_one_of_update_or_pk_falls_in_no_list():
    # Exact reference behavior: fact + update_date_column but no primary_key
    # matches NEITHER normal NOR copy_update (BulkCopyManager.cs:100-101).
    c = classify_tables(
        [spec(table_name="half", table_type="fact", update_date_column="u")]
    )
    assert c.normal == () and c.copy_update == ()


def test_nameless_entries_dropped():
    c = classify_tables([spec(table_name="", table_type="dim")])
    assert c.truncate == ()


def test_config_validation():
    with pytest.raises(ValueError, match="Source location missing"):
        JobConfig(source="", target="/tmp/t")
    with pytest.raises(ValueError, match="Target location missing"):
        JobConfig(source="/tmp/s", target="")


def test_load_reference_layout(tmp_path):
    cfg_json = {
        "ConnectionStrings": {"Source": "/data/src", "Target": "/data/tgt"},
        "BulkCopyConfig": {
            "SourceSchema": "dbo",
            "TargetSchema": "bronze",
            "ScheduleMode": "hourly",
            "DateFrom": None,
            "DateTo": None,
            "Tables": [
                {
                    "table_name": "tbl_sample",
                    "table_type": "fact",
                    "date_column": "transaction_date",
                }
            ],
        },
    }
    p = tmp_path / "appsettings.json"
    p.write_text(json.dumps(cfg_json))
    cfg = load_config(p)
    assert cfg.source == "/data/src"
    assert cfg.target_schema == "bronze"
    assert cfg.schedule_mode == "hourly"
    assert cfg.tables[0] == TableSpec(
        table_name="tbl_sample", table_type="fact", date_column="transaction_date"
    )


def test_load_flat_layout():
    cfg = load_config(
        {
            "source": "/s",
            "target": "/t",
            "schedule_mode": "daily",
            "tables": [{"table_name": "x", "table_type": "dim"}],
        }
    )
    assert cfg.tables[0].table_type == "dim"
    assert cfg.audit_table_path.endswith("_audit/tbl_dw_copy_logs")
