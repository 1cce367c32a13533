"""Kafka transport contract (streaming/pipeline.py::kafka_reader_options):
the exact reader options, brokerless — the sandbox has no Kafka, so parity
with the reference's operative transport (OracleSourceTask2.java:286) is
pinned at the options layer where it is deterministic.

Precedence must match operators/offsets.py::resolve_start_scn, which is the
reference's own A3 resolution order (OracleSourceTask2.java:137-192)."""

from __future__ import annotations

import json

from kafka_connect_logminer2_spark.config import EngineConfig
from kafka_connect_logminer2_spark.streaming.pipeline import (
    kafka_reader_options,
    kafka_writer_options,
)

BOOT = "broker1:9092,broker2:9092"


def test_fresh_start_reads_earliest_with_fetch_size_pacing():
    cfg = EngineConfig(db_name_alias="orcl", db_fetch_size=5000)
    opts = kafka_reader_options(cfg, BOOT)
    assert opts == {
        "kafka.bootstrap.servers": BOOT,
        "subscribe": "orcl.redo",  # db_name_alias-derived default topic
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "5000",  # db.fetch.size → per-trigger cap
        "failOnDataLoss": "true",
    }


def test_stored_offset_resumes_at_exact_position():
    cfg = EngineConfig(topic="redo.events", db_fetch_size=10_000)
    opts = kafka_reader_options(cfg, BOOT, stored_offset=123_456)
    assert opts["subscribe"] == "redo.events"  # explicit topic wins
    assert json.loads(opts["startingOffsets"]) == {"redo.events": {"0": 123_456}}


def test_start_scn_override_beats_stored_offset():
    cfg = EngineConfig(topic="t", start_scn="999")
    opts = kafka_reader_options(cfg, BOOT, stored_offset=5)
    assert json.loads(opts["startingOffsets"]) == {"t": {"0": 999}}


def test_reset_offset_jumps_to_head():
    cfg = EngineConfig(topic="t", reset_offset=True, start_scn="999")
    opts = kafka_reader_options(cfg, BOOT, stored_offset=5, current_offset=10_000)
    assert opts["startingOffsets"] == "latest"


def test_multi_partition_resume_pins_every_partition():
    cfg = EngineConfig(topic="t")
    opts = kafka_reader_options(cfg, BOOT, stored_offset=7, partitions=(0, 1, 2))
    assert json.loads(opts["startingOffsets"]) == {"t": {"0": 7, "1": 7, "2": 7}}


def test_from_connect_map_round_trip():
    """A Kafka-Connect properties file drives the same options — the
    config-surface parity path end to end."""
    cfg = EngineConfig.from_connect_map(
        {"db.name.alias": "cdb1", "db.fetch.size": "250", "reset.offset": "false"}
    )
    opts = kafka_reader_options(cfg, BOOT)
    assert opts["subscribe"] == "cdb1.redo"
    assert opts["maxOffsetsPerTrigger"] == "250"


# --------------------------------------------------------------------------
# sink half of the transport contract (operators/envelope.py::kafka_records
# + streaming/pipeline.py::kafka_writer_options) — reference:
# OracleSourceTask2.java:300 SourceRecord(topic, key, value)
# --------------------------------------------------------------------------


def test_writer_options_route_by_topic_column_by_default():
    """No pinned topic → the option map must NOT set ``topic``: Spark's
    Kafka sink then routes every record by its topic COLUMN, which is how
    A18's per-table dynamic routing reaches the wire."""
    opts = kafka_writer_options(EngineConfig(db_name_alias="orcl"), BOOT)
    assert opts == {"kafka.bootstrap.servers": BOOT, "kafka.acks": "all"}


def test_writer_options_pinned_topic_and_checkpoint():
    opts = kafka_writer_options(
        EngineConfig(topic="redo.events"), BOOT, checkpoint_dir="/ckpt/sink"
    )
    assert opts["topic"] == "redo.events"
    assert opts["checkpointLocation"] == "/ckpt/sink"
    assert opts["kafka.acks"] == "all"


def test_kafka_records_exact_projection(spark, sf_dir):
    """The sink projection, value by value: key = change identity JSON
    (owner/table/row_id — per-row log compaction), value = the 11-field
    envelope JSON, topic = dynamic UPPER(alias.owner.table). Exactly the
    (key, value, topic) triple Spark's Kafka sink serializes."""
    from kafka_connect_logminer2_spark.operators.envelope import kafka_records
    from kafka_connect_logminer2_spark.plans.cdc import cdc_envelope, default_config
    from kafka_connect_logminer2_spark.sources.redo import (
        redo_inserts_from_customer,
    )

    cfg = default_config()
    cfg.db_name_alias = "orcl"
    env = cdc_envelope(redo_inserts_from_customer(spark, sf_dir), cfg)
    recs = kafka_records(env, cfg)
    assert recs.columns == ["key", "value", "topic"]

    rows = recs.collect()
    assert len(rows) == env.count()
    r = min(rows, key=lambda r: json.loads(r["value"])["SCN"])
    key = json.loads(r["key"])
    assert set(key) == {"owner", "table", "row_id"}
    assert key["owner"] == "TPCH" and key["table"] == "CUSTOMER"
    assert r["topic"] == "ORCL.TPCH.CUSTOMER"
    value = json.loads(r["value"])
    assert set(value) == {
        "CONNECTOR", "SCN", "COMMIT_SCN", "ROW_ID", "SEG_OWNER", "TABLE_NAME",
        "TIMESTAMP", "SQL_REDO", "OPERATION", "data_json", "before_json",
    } - {"before_json"}  # to_json drops null fields: INSERT has no before
    assert value["OPERATION"] == "INSERT"
    assert value["SEG_OWNER"] == "TPCH"
    # envelope images are untyped strings by design — coercion (A13) is the
    # SINK's job via apply_table_schema, exactly like the reference's JSON
    assert json.loads(value["data_json"])["C_CUSTKEY"] == "0"


def test_kafka_records_pinned_topic_wins(spark, sf_dir):
    from kafka_connect_logminer2_spark.operators.envelope import kafka_records
    from kafka_connect_logminer2_spark.plans.cdc import cdc_envelope, default_config
    from kafka_connect_logminer2_spark.sources.redo import (
        redo_inserts_from_customer,
    )

    cfg = default_config()
    cfg.topic = "pinned.redo"
    env = cdc_envelope(redo_inserts_from_customer(spark, sf_dir), cfg)
    topics = {r["topic"] for r in kafka_records(env, cfg).select("topic").collect()}
    assert topics == {"pinned.redo"}
