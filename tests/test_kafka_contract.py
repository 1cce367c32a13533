"""Kafka transport contract (streaming/pipeline.py::kafka_reader_options):
the exact reader options, brokerless — the sandbox has no Kafka, so parity
with the reference's operative transport (OracleSourceTask2.java:286) is
pinned at the options layer where it is deterministic.

Precedence must match operators/offsets.py::resolve_start_scn, which is the
reference's own A3 resolution order (OracleSourceTask2.java:137-192)."""

from __future__ import annotations

import json

from kafka_connect_logminer2_spark.config import EngineConfig
from kafka_connect_logminer2_spark.streaming.pipeline import kafka_reader_options

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
