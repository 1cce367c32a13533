"""Offset resolution (A3), gap detection (A23), streaming analytics windows."""

from __future__ import annotations

from kafka_connect_logminer2_spark.config import EngineConfig
from kafka_connect_logminer2_spark.operators.offsets import (
    resolve_start_scn,
    sequence_gap_check,
)
from kafka_connect_logminer2_spark.sources.redo import redo_events_from_rows


def test_offset_precedence():
    # stored resume
    assert resolve_start_scn(EngineConfig(), stored_scn=500).scn == 500
    # start.scn overrides stored (OracleSourceTask2.java:168-173)
    r = resolve_start_scn(EngineConfig(start_scn="1000"), stored_scn=500)
    assert (r.scn, r.source) == (1000, "start_scn")
    # reset.offset wins over everything (:175-180)
    r = resolve_start_scn(
        EngineConfig(start_scn="1000", reset_offset=True), stored_scn=500, current_scn=9999
    )
    assert (r.scn, r.source) == (9999, "reset")
    # nothing → earliest
    assert resolve_start_scn(EngineConfig(), None).source == "earliest"


def test_sequence_gap_check(spark):
    rows = [
        dict(scn=1, operation="INSERT", xid="A", rbasqn=1),
        dict(scn=2, operation="INSERT", xid="A", rbasqn=2),
        dict(scn=3, operation="INSERT", xid="A", rbasqn=5),  # gap 2→5
        dict(scn=4, operation="INSERT", xid="A", rbasqn=5),
    ]
    gaps = sequence_gap_check(redo_events_from_rows(spark, rows)).collect()
    assert len(gaps) == 1
    assert (gaps[0]["prev_rbasqn"], gaps[0]["next_rbasqn"]) == (2, 5)


def test_streaming_session_window(spark, sf_dir, tmp_path):
    """session_window streaming op: sanity vs the batch lag+cumsum session
    count (same gap) — totals must agree."""
    from kafka_connect_logminer2_spark.plans.queries import q15_sessionize
    from kafka_connect_logminer2_spark.sources.tables import load_table
    from kafka_connect_logminer2_spark.streaming.analytics import session_counts

    events = load_table(spark, sf_dir, "events")
    events.write.parquet(f"{tmp_path}/events")
    stream = spark.readStream.schema(events.schema).parquet(f"{tmp_path}/events")
    q = (
        session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("sessions_t")
    batch = q15_sessionize(spark, sf_dir)
    # same number of sessions and same total event count
    assert got.count() == batch.count()
    assert got.agg({"n_events": "sum"}).first()[0] == batch.agg({"n_events": "sum"}).first()[0]
