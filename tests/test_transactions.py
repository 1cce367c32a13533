"""Batch transaction-assembly tests: commit gating, rollback discard,
partial-rollback pair repair, CSF reassembly, implicit txn creation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.operators.transactions import assemble_transactions
from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows

INS = 'insert into "TPCH"."T"("A") values ({})'


def _events(spark, rows):
    return redo_events_from_rows(spark, rows)


def test_commit_gating_and_rollback(spark):
    redo = _events(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(1), row_id="r1"),
            dict(scn=3, operation="START", xid="B"),
            dict(scn=4, operation="INSERT", xid="B", table_name="T", sql_redo=INS.format(2), row_id="r2"),
            dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
            dict(scn=6, operation="ROLLBACK", xid="B"),
        ],
    )
    out = assemble_transactions(redo).collect()
    assert len(out) == 1
    assert out[0]["xid"] == "A"
    assert out[0]["commit_scn"] == 5


def test_partial_rollback_pair_removed(spark):
    redo = _events(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(1), row_id="r1"),
            dict(scn=3, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(2), row_id="r2"),
            # compensating row undoing scn=3 (LogMinerThread2.java:163-185)
            dict(scn=4, operation="DELETE", xid="A", table_name="T", rollback="1",
                 sql_redo='delete from "TPCH"."T" where "A" = 2', row_id="r2"),
            dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
        ],
    )
    out = assemble_transactions(redo).orderBy("scn").collect()
    assert [r["scn"] for r in out] == [2]  # pair (3,4) removed


def test_dml_without_start_creates_txn(spark):
    # mining session starting mid-transaction (LogMinerThread2.java:292-297)
    redo = _events(
        spark,
        [
            dict(scn=2, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(1), row_id="r1"),
            dict(scn=3, operation="COMMIT", xid="A", commit_scn=3),
        ],
    )
    assert assemble_transactions(redo).count() == 1


def test_csf_reassembly(spark):
    full = INS.format(12345)
    redo = _events(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T",
                 sql_redo=full[:20], csf=True, row_id="r1", rs_id="a.1"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T",
                 sql_redo=full[20:], csf=False, row_id="r1", rs_id="a.2"),
            dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
        ],
    )
    out = assemble_transactions(redo).collect()
    assert len(out) == 1
    assert out[0]["sql_redo"] == full


def test_junk_rows_dropped(spark):
    redo = _events(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T",
                 sql_redo="insert ... temporary tables ...", row_id="r1"),
            dict(scn=3, operation="DDL", xid="A", table_name="T",
                 sql_redo="alter table T ...", info="INTERNAL DDL xyz", row_id="r2"),
            dict(scn=4, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(1), row_id="r3"),
            dict(scn=5, operation="COMMIT", xid="A", commit_scn=5),
        ],
    )
    out = assemble_transactions(redo).collect()
    assert [r["scn"] for r in out] == [4]


def test_commit_stamps_metadata(spark):
    redo = _events(
        spark,
        [
            dict(scn=1, operation="START", xid="A"),
            dict(scn=2, operation="INSERT", xid="A", table_name="T", sql_redo=INS.format(1), row_id="r1"),
            dict(scn=9, operation="COMMIT", xid="A", commit_scn=99,
                 commit_timestamp="2026-01-02 03:04:05"),
        ],
    )
    row = assemble_transactions(redo).first()
    assert row["commit_scn"] == 99
    assert str(row["commit_timestamp"]) == "2026-01-02 03:04:05"


def test_kafka_records_projection(spark, sf_dir):
    """SourceRecord analog: key = change identity JSON, value = envelope
    JSON, topic = dynamic route — the Kafka sink's native contract."""
    import json

    from kafka_connect_logminer2_spark.operators.envelope import kafka_records
    from kafka_connect_logminer2_spark.plans.cdc import cdc_envelope, default_config
    from kafka_connect_logminer2_spark.sources.redo import redo_inserts_from_customer

    env = cdc_envelope(redo_inserts_from_customer(spark, sf_dir))
    rec = kafka_records(env, default_config()).first()
    key = json.loads(rec["key"])
    assert key == {"owner": "TPCH", "table": "CUSTOMER", "row_id": key["row_id"]}
    val = json.loads(rec["value"])
    assert val["OPERATION"] == "INSERT"
    assert json.loads(val["data_json"])["C_CUSTKEY"]
    assert rec["topic"] == "ORCL.TPCH.CUSTOMER"
