"""Connector lifecycle facade — the reference's entry-point surface on Spark.

A user of the reference interacts with three things: a Kafka-Connect
properties map, `connector.start(map)`, and task shutdown. This module is
the 1:1 analog (reference flow at OracleSourceConnector2.java:23-51 →
OracleSourceTask2.java:111-241):

  start(map)  → validate required keys (db.name, table.whitelist — the
                reference's exact check, OracleSourceConnector2.java:23-36)
              → resolve the start position (A3 precedence,
                operators/offsets.py — stored offset, start.scn override,
                reset.offset, else earliest; OracleSourceTask2.java:135-192)
              → append a run-manifest row with the serialized config (A20,
                :198-205) and register the status listener (A21, :315-367)
              → fork by path (:207-235): CM-style bounded input runs the
                batch pipeline; non-CM streams via one of the three
                assemblers (applyInPandasWithState / transformWithState /
                foreachBatch carry-over) into per-table typed sinks with
                the heartbeat branch split off (A19)
  stop()      → graceful: stop the query, flip status, unregister (A26;
                the reference's shutdown hook + 20 s drain,
                OracleSourceTask2.java:215-235)

One deliberate divergence: the reference hard-codes exactly ONE task
(OracleSourceConnector2.java:45-51); here parallelism comes from Spark's
own scheduler, so there is nothing to configure.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .config import EngineConfig
from .operators.heartbeat import StatusListener, split_heartbeat, write_run_manifest
from .operators.offsets import resolve_start_scn
from .operators.schema_registry import SchemaRegistry


class ConfigError(ValueError):
    """Missing/invalid connector properties (the reference throws
    ConnectException from the same checks)."""


REQUIRED_PROPS = ("db.name", "table.whitelist")  # OracleSourceConnector2.java:23-36

# Oracle 19c de-supported CONTINUOUS_MINE (OracleConnectorSchema.java:65)
ORA_DESUPPORT_CM_VERSION = 190000


def db_version_number(version: str) -> int:
    """Engine twin of the reference's DB-version probe
    (OracleConnectorSQL2.java:14: ``select to_number(replace(version,'.',''))
    from v$instance``): '18.4.0.0.0' → 184000... i.e. digits concatenated.
    The Spark engine has no live Oracle connection; the caller passes the
    probed version string through start()."""
    return int(version.replace(".", ""))


def cm_path_selected(config: EngineConfig, db_version: int | None) -> bool:
    """The reference's fork, verbatim semantics (OracleSourceTask2.java:
    127-131): the CONTINUOUS_MINE path is taken only when ``using.cm`` is
    set AND the DB version predates the de-support cut — otherwise the
    de-support (streaming-assembly) path runs. ``None`` version (no probe
    available) trusts the config flag alone."""
    if not config.using_cm:
        return False
    return db_version is None or db_version < ORA_DESUPPORT_CM_VERSION


class _CompletedBatch:
    """Query-handle shim for the CM fork: the bounded COMMITTED_DATA_ONLY
    batch finishes inside start(), so the handle is already terminal —
    awaitTermination/stop are no-ops with streaming-compatible shapes."""

    def __init__(self) -> None:
        import uuid

        self.id = uuid.uuid4()
        self.isActive = False

    def awaitTermination(self, timeout: float | None = None) -> bool:
        return True

    def stop(self) -> None:
        return None


class LogMinerConnector:
    """Lifecycle wrapper tying config → offset resolution → manifest →
    stream → sinks → shutdown into the reference's start/stop shape."""

    def __init__(self, props: dict[str, str], spark: SparkSession | None = None):
        missing = [k for k in REQUIRED_PROPS if not props.get(k)]
        if missing:
            raise ConfigError(f"missing required connector properties: {missing}")
        self.props = props
        self.config = EngineConfig.from_connect_map(props)
        if spark is None:
            from .session import get_spark

            spark = get_spark(app_name=f"logminer-{self.config.name}")
        self.spark = spark
        self.query = None
        self._listener: StatusListener | None = None
        self.resolved = None

    def start(
        self,
        source_path: str,
        registry: SchemaRegistry,
        out_dir: str,
        checkpoint_dir: str,
        meta_dir: str | None = None,
        assembler: str = "fb",
        stored_offset: int | None = None,
        current_offset: int | None = None,
        max_files_per_trigger: int | None = None,
        scn_range_size: int | None = None,
        db_version: str | None = None,
    ):
        """Begin mining ``source_path`` (a directory of SCN-ordered redo
        parquet files) into per-table typed sinks under ``out_dir``.
        Returns the StreamingQuery handle.

        The CM/non-CM fork is CONFIG-DRIVEN, matching the reference
        (OracleSourceTask2.java:127-131): ``using.cm=true`` plus a DB
        version below the 19c de-support cut (``db_version`` carries the
        probed ``v$instance`` version string; None trusts the flag) routes
        the bounded COMMITTED_DATA_ONLY batch path — no assembly, the
        input is already commit-ordered — writing the same per-table typed
        sinks and returning an already-terminal handle."""
        from .streaming.pipeline import cdc_stream, read_redo_stream_files, write_per_table

        self.resolved = resolve_start_scn(self.config, stored_offset, current_offset)
        meta_dir = meta_dir or f"{out_dir}/_meta"
        write_run_manifest(self.spark, self.config, meta_dir, self.resolved.scn)
        self._listener = StatusListener(self.spark, self.config, meta_dir)
        self._listener.register()

        if cm_path_selected(
            self.config, None if db_version is None else db_version_number(db_version)
        ):
            self.query = self._run_cm_path(source_path, registry, out_dir)
            return self.query

        stream = read_redo_stream_files(self.spark, source_path, max_files_per_trigger)
        if self.resolved.scn:
            # A4 skip-replay analog on resume: discard already-delivered SCNs
            from pyspark.sql import functions as F

            stream = stream.filter(F.col("scn") > self.resolved.scn)

        if assembler == "fb":
            from .streaming.transactions_fb import write_cdc_foreachbatch

            self.query = write_cdc_foreachbatch(
                stream, registry, out_dir, checkpoint_dir,
                f"{out_dir}/_txn_state", self.config,
            )
        else:
            envelope = cdc_stream(stream, self.config, assembler=assembler)
            data, _hb = split_heartbeat(envelope, self.config)
            self.query = write_per_table(
                data, registry, out_dir, checkpoint_dir, self.config,
                scn_range_size=scn_range_size,
            )
        return self.query

    def start_kafka(
        self,
        source_path: str,
        bootstrap_servers: str,
        checkpoint_dir: str,
        meta_dir: str,
        assembler: str = "apply",
        stored_offset: int | None = None,
        current_offset: int | None = None,
        max_files_per_trigger: int | None = None,
        trigger_available_now: bool = True,
        _sink_format: str = "kafka",
        _query_name: str | None = None,
    ):
        """The reference's ACTUAL output shape end to end: mine redo into a
        stream of (key, value, topic) Kafka records — A18's dynamic
        per-table routing carried by the topic COLUMN, writer options from
        the pure ``kafka_writer_options`` builder (acks=all, checkpointed).

        ``_sink_format`` exists because the sandbox has no broker: tests
        substitute the ``memory`` sink, which receives the IDENTICAL
        projection the Kafka sink would serialize — the transport contract
        stays pinned value-by-value while only the wire format is mocked
        (reference: OracleSourceTask2.java:300 SourceRecord emission)."""
        from pyspark.sql import functions as F

        from .operators.envelope import kafka_records
        from .streaming.pipeline import (
            cdc_stream,
            kafka_writer_options,
            read_redo_stream_files,
        )

        self.resolved = resolve_start_scn(self.config, stored_offset, current_offset)
        write_run_manifest(self.spark, self.config, meta_dir, self.resolved.scn)
        self._listener = StatusListener(self.spark, self.config, meta_dir)
        self._listener.register()

        stream = read_redo_stream_files(self.spark, source_path, max_files_per_trigger)
        if self.resolved.scn:
            stream = stream.filter(F.col("scn") > self.resolved.scn)
        envelope = cdc_stream(stream, self.config, assembler=assembler)
        # heartbeats ride the SAME record stream with their re-topiced name
        # (LogMinerThread2.java:207) — the re-topic is an inline conditional,
        # not split_heartbeat's two-branch split: both branches of a split
        # would reference the one stateful assembly ("multiple
        # applyInPandasWithStates" is rejected on a streaming plan), and the
        # Kafka sink routes per row by the topic column anyway
        if self.config.heartbeat_table:
            is_hb = F.col("TABLE_NAME") == F.lit(self.config.heartbeat_table)
            envelope = envelope.withColumn(
                "topic",
                F.when(
                    is_hb,
                    F.concat_ws(".", F.col("topic"), F.lit(self.config.name.upper())),
                ).otherwise(F.col("topic")),
            )
        recs = kafka_records(envelope, self.config)

        writer = recs.writeStream
        if _sink_format == "kafka":
            writer = writer.format("kafka").options(
                **kafka_writer_options(self.config, bootstrap_servers, checkpoint_dir)
            )
        else:
            writer = writer.format(_sink_format).option(
                "checkpointLocation", checkpoint_dir
            )
            if _query_name:
                writer = writer.queryName(_query_name)
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        self.query = writer.start()
        return self.query

    def _run_cm_path(
        self, source_path: str, registry: SchemaRegistry, out_dir: str
    ) -> "_CompletedBatch":
        """The config-selected CM fork inside start(): read the bounded
        COMMITTED_DATA_ONLY redo directory as a batch, apply the A4
        skip-replay bound, and land the same per-table typed sinks
        write_per_table maintains (``out_dir/OWNER.TABLE``)."""
        from pyspark.sql import functions as F

        from .operators.schema_registry import apply_table_schema
        from .plans.cdc import cdc_envelope_cm

        redo = self.spark.read.parquet(source_path)
        if self.resolved.scn:
            redo = redo.filter(F.col("scn") > self.resolved.scn)
        envelope = cdc_envelope_cm(redo, self.config)
        # DDL first: invalidate before this run's DML is typed — the same
        # ordering contract as write_per_table / _net_changes_for_table
        # (a stale cached schema would silently drop DDL-added columns)
        for r in (
            envelope.filter(F.col("OPERATION") == "DDL")
            .select("SEG_OWNER", "SRC_TABLE")
            .distinct()
            .collect()
        ):
            if r["SRC_TABLE"]:
                registry.invalidate(r["SEG_OWNER"], r["SRC_TABLE"])
        # bounded collect: one row per mined table, never per event
        tables = [
            (r["SEG_OWNER"], r["TABLE_NAME"])
            for r in envelope.filter(F.col("OPERATION") != "DDL")
            .select("SEG_OWNER", "TABLE_NAME")
            .distinct()
            .collect()
        ]
        for owner, table in sorted(tables):
            if not registry.ensure(owner, table):
                continue
            typed = apply_table_schema(
                envelope.filter(
                    (F.col("OPERATION") != "DDL")
                    & (F.col("SEG_OWNER") == owner)
                    & (F.col("TABLE_NAME") == table)
                ),
                registry,
                owner,
                table,
                float64_numbers=self.config.float64_numbers,
            )
            # overwrite, not append: a crashed/re-run CM start() with the
            # same offsets must land byte-identical output, never
            # duplicate rows (the bounded-batch twin of the streaming
            # path's retry-idempotent batch=<id> overwrite)
            typed.write.mode("overwrite").parquet(f"{out_dir}/{owner}.{table}")
        return _CompletedBatch()

    def run_cm_batch(self, redo, registry: SchemaRegistry, owner: str, table: str):
        """The CM fork (Oracle <19c, OracleSourceTask2.java:207-214):
        COMMITTED_DATA_ONLY input needs no assembly — filters → parse →
        envelope → typed, as a bounded batch."""
        from .operators.schema_registry import apply_table_schema
        from .plans.cdc import cdc_envelope_cm

        return apply_table_schema(
            cdc_envelope_cm(redo, self.config), registry, owner, table,
            float64_numbers=self.config.float64_numbers,
        )

    def stop(self, timeout_s: int = 20) -> None:
        """Graceful shutdown (A26): the reference's hook drains for 20 s
        (OracleSourceTask2.java:228); here stop() is synchronous and the
        checkpoint guarantees the resume point. The terminal status event
        (A21) is delivered on the listener callback thread, so unregistering
        waits (bounded) until the STOPPED/FAILED row landed — otherwise the
        status log would claim the run never ended."""
        import time

        qid = str(self.query.id) if self.query is not None else None
        if self.query is not None and self.query.isActive:
            self.query.stop()
            self.query.awaitTermination(timeout_s)
        if self._listener is not None:
            if qid is not None:
                deadline = time.time() + timeout_s
                path = self._listener.status_path
                while time.time() < deadline:
                    try:
                        import json as _json

                        with open(path) as f:
                            done = any(
                                r.get("query_id") == qid
                                and r.get("event") in ("STOPPED", "FAILED")
                                for r in map(_json.loads, f)
                            )
                    except FileNotFoundError:
                        done = False
                    if done:
                        break
                    time.sleep(0.2)
            self._listener.unregister()
            self._listener = None
