"""Structured Streaming CDC pipeline — the reference's full non-CM dataflow
(SURVEY §3.3) as readStream → state op → envelope → routed sinks.

  readStream (Kafka topic / parquet-file dir of redo events)
    → source filters (A5-A8, Catalyst-pushed)
    → groupBy(xid).applyInPandasWithState  (A9, A15-A17)
    → parse UDF + envelope projection      (A10-A14, A18)
    → foreachBatch fan-out: per-table typed sinks + heartbeat branch (A19)

Checkpointing gives offset resume (A3) for free; the skip-replay guard (A4)
is the source's own exactly-once offset tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig
from ..operators.envelope import to_envelope
from ..operators.filters import dml_types_predicate, source_predicate
from ..operators.schema_registry import SchemaRegistry, apply_table_schema
from ..sources.redo import REDO_SCHEMA
from .transactions import assemble_transactions_stream


def read_redo_stream_files(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based redo source (tests / replay): each parquet file under
    ``path`` is a bounded mining session's output. ``maxFilesPerTrigger``
    is the db.fetch.size analog (A25 pacing).

    ORDERING CONTRACT: like the reference's single scn-ordered cursor
    (LogMinerThread2.java:142), redo events must arrive in SCN order across
    micro-batches — a COMMIT surfacing before its transaction's DML rows is
    silently dropped (same as the reference seeing a commit for an unknown
    xid). FileStreamSource picks files by modification time, so writers must
    produce session files with strictly increasing mtimes (the natural case
    for sequential mining sessions; tests use os.utime). The Kafka source
    guarantees order per partition — put one logical redo stream per
    partition, mirroring the reference's one-cursor-per-connector design."""
    reader = spark.readStream.schema(REDO_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def kafka_reader_options(
    config: EngineConfig,
    bootstrap_servers: str,
    topic: str | None = None,
    stored_offset: int | None = None,
    current_offset: int | None = None,
    partitions: tuple[int, ...] = (0,),
) -> dict[str, str]:
    """The exact options map the Kafka redo reader runs with — a pure
    function so transport parity with the reference is testable without a
    broker (reference: OracleSourceTask2.java:286 poll loop + the A3 offset
    resolution at :137-192).

    Mapping contract:
    - ``subscribe``: ``config.topic``, else ``<db_name_alias>.redo`` (one
      logical redo stream per partition — the reader's ordering contract);
    - ``startingOffsets``: from operators/offsets.py::resolve_start_scn in
      the reference's precedence order — a stored position or ``start.scn``
      override becomes explicit per-partition JSON offsets; ``reset.offset``
      jumps to the head (``latest``); otherwise ``earliest``;
    - ``maxOffsetsPerTrigger``: ``db.fetch.size`` — the reference's per-poll
      row cap as micro-batch pacing (A25);
    - ``failOnDataLoss`` stays true: a truncated topic is the log-gap
      condition (A23) and must surface, not be skipped.
    """
    import json as _json

    from ..operators.offsets import resolve_start_scn

    topic = topic or config.topic or f"{config.db_name_alias}.redo"
    resolved = resolve_start_scn(config, stored_offset, current_offset)
    if resolved.source == "earliest":
        starting = "earliest"
    elif resolved.source == "reset":
        starting = "latest"
    else:  # stored resume or start.scn override → explicit offsets
        starting = _json.dumps({topic: {str(p): resolved.scn for p in partitions}})
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting,
        "maxOffsetsPerTrigger": str(config.db_fetch_size),
        "failOnDataLoss": "true",
    }


def kafka_writer_options(
    config: EngineConfig,
    bootstrap_servers: str,
    checkpoint_dir: str | None = None,
) -> dict[str, str]:
    """The exact options map the Kafka envelope SINK runs with — the
    reader-options twin (kafka_reader_options above), pure so the write
    half of the transport contract is testable without a broker.

    Mapping contract:
    - ``kafka.bootstrap.servers``: the cluster;
    - ``topic`` is set ONLY when ``config.topic`` pins a single topic —
      otherwise it is omitted and Spark's Kafka sink routes each record by
      its ``topic`` COLUMN (operators/envelope.py::kafka_records carries
      it), which is how A18's per-table dynamic routing reaches the wire
      (reference: OracleSourceTask2.java:300 SourceRecord topic field);
    - ``checkpointLocation``: exactly-once resume for the streaming write
      (A3/A4's sink half);
    - ``kafka.acks=all``: a source connector must not lose committed
      transactions to a broker failover — durability over latency, the
      reference's implicit Connect-producer default.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
    }
    if config.topic:
        opts["topic"] = config.topic
    if checkpoint_dir is not None:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def read_redo_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str | None = None,
    config: EngineConfig | None = None,
    stored_offset: int | None = None,
    current_offset: int | None = None,
) -> DataFrame:
    """Kafka redo source (production path): JSON redo records on a topic.
    The Kafka offset is the SCN-position analog; checkpointing resumes it
    (A3), making the reference's offset table / skip-replay loop (A4)
    built-in. Options come from :func:`kafka_reader_options` (contract
    tested without a broker in tests/test_kafka_contract.py)."""
    config = config or EngineConfig()
    opts = kafka_reader_options(
        config, bootstrap_servers, topic, stored_offset, current_offset
    )
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("value").cast("string"), REDO_SCHEMA).alias("r")
    ).select("r.*")


def read_archived_changes(
    spark: SparkSession,
    out_dir: str,
    owner: str,
    table: str,
    scn_min: int | None = None,
    scn_max: int | None = None,
    scn_range_size: int | None = None,
) -> DataFrame:
    """SCN-bounded read of a table's archived change stream (the
    `write_per_table` sink). When the archive was written with
    ``scn_range_size``, the bound becomes a PARTITION filter on
    ``scn_range`` — whole directories drop out at planning time
    (PartitionFilters in the scan; audit in tests/test_scn_pruning.py) —
    plus the exact ``COMMIT_SCN`` predicate pushed into the parquet reader
    for the residual rows of the boundary ranges."""
    df = spark.read.parquet(f"{out_dir}/{owner}.{table}")
    if scn_range_size is not None and "scn_range" in df.columns:
        if scn_min is not None:
            df = df.filter(F.col("scn_range") >= scn_min // scn_range_size)
        if scn_max is not None:
            df = df.filter(F.col("scn_range") <= scn_max // scn_range_size)
    if scn_min is not None:
        df = df.filter(F.col("COMMIT_SCN") >= scn_min)
    if scn_max is not None:
        df = df.filter(F.col("COMMIT_SCN") <= scn_max)
    return df


def cdc_stream(
    redo_stream: DataFrame,
    config: EngineConfig | None = None,
    continuous: bool = False,
    assembler: str = "apply",
) -> DataFrame:
    """Streaming redo events → streaming envelope rows.

    ``continuous=True`` arms the abandoned-transaction state timeout (for
    long-running streams); leave False for availableNow/replay runs, where a
    ProcessingTimeTimeout would keep the query alive indefinitely.

    ``assembler`` picks the stateful transaction operator:
      - ``"apply"``: applyInPandasWithState (works on any Spark 3.4+)
      - ``"tws"``: transformWithStateInPandas (Spark 4; ListState buffer is
        O(new rows) per batch instead of rewriting the whole GroupState
        buffer — the designed fix for per-group overhead on long txns).
        Requires google.protobuf in the python workers
        (session.enable_vendored_protobuf).
    """
    config = config or EngineConfig(table_whitelist="TPCH.*", db_name_alias="orcl")
    filtered = redo_stream.filter(
        source_predicate(config.table_whitelist, config.table_blacklist)
    )
    timeout = config.txn_state_timeout_ms if continuous else None
    if assembler == "tws":
        from .transactions_tws import assemble_transactions_tws

        assembled = assemble_transactions_tws(filtered, timeout)
    else:
        assembled = assemble_transactions_stream(filtered, timeout)
    committed = assembled.filter(dml_types_predicate(config.dml_type_set()))
    return to_envelope(committed, config)


def write_per_table(
    envelope_stream: DataFrame,
    registry: SchemaRegistry,
    out_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    trigger_available_now: bool = True,
    scn_range_size: int | None = None,
):
    """foreachBatch fan-out (A18 routing + A12 typed materialization + DDL
    invalidation ordering): every batch, DDL events invalidate their table's
    cached schema *before* that table's DML materializes (SURVEY §7 hard
    part 4); each (owner, table) partition is written to
    ``out_dir/owner.table/batch=<id>/`` as typed parquet.

    foreachBatch is at-least-once: a failed-then-retried batch re-runs with
    the SAME batch_id, so the write targets a batch-keyed partition dir with
    overwrite — the retry replaces its own output instead of appending a
    duplicate copy. Combined with the checkpointed source offsets this gives
    end-to-end exactly-once to the parquet sink (the A3/A4 resume contract).

    ``scn_range_size`` (optional) additionally partitions each table's
    archive by ``scn_range = floor(COMMIT_SCN / size)`` — the SURVEY §4
    SCN-range layout. An SCN-bounded replay/audit query then PRUNES whole
    partition directories at planning time (PartitionFilters) instead of
    scanning the full change history; see :func:`read_archived_changes` and
    the pruning audit in tests/test_scn_pruning.py. Size the ranges so one
    range ≈ one compaction unit (at 100 TB: ~10-100 files per range).
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # DDL first: invalidate before materializing this batch's DML —
            # keyed on SRC_TABLE (the pre-_GENERIC_DDL-rewrite name)
            for r in (
                batch.filter(F.col("OPERATION") == "DDL")
                .select("SEG_OWNER", "SRC_TABLE")
                .distinct()
                .collect()
            ):
                if r["SRC_TABLE"]:
                    registry.invalidate(r["SEG_OWNER"], r["SRC_TABLE"])
            tables = (
                batch.filter(F.col("OPERATION") != "DDL")
                .select("SEG_OWNER", "TABLE_NAME")
                .distinct()
                .collect()
            )
            for r in tables:
                owner, table = r["SEG_OWNER"], r["TABLE_NAME"]
                if not registry.ensure(owner, table):
                    continue  # no dictionary metadata — envelope-only table
                typed = apply_table_schema(
                    batch,
                    registry,
                    owner,
                    table,
                    float64_numbers=(config or EngineConfig()).float64_numbers,
                )
                writer = typed
                if scn_range_size is not None:
                    writer = typed.withColumn(
                        "scn_range",
                        F.floor(F.col("COMMIT_SCN") / F.lit(scn_range_size)).cast("long"),
                    )
                    writer.write.mode("overwrite").partitionBy("scn_range").parquet(
                        f"{out_dir}/{owner}.{table}/batch={batch_id}"
                    )
                else:
                    writer.write.mode("overwrite").parquet(
                        f"{out_dir}/{owner}.{table}/batch={batch_id}"
                    )
        finally:
            batch.unpersist()

    writer = envelope_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
