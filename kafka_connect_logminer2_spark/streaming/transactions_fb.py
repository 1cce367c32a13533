"""Batch-speed streaming CDC: foreachBatch transaction assembly with
carry-over state — the third assembler, built to close the measured
streaming-vs-batch throughput gap.

Why: both stateful operators (applyInPandasWithState, transformWithState)
pay a per-GROUP Python round trip; a redo stream is dominated by tiny
transactions, so at sf0.1 that's 12k group calls per batch and ~1.5k ev/s
against the batch path's ~23k (BASELINE.md). This assembler instead runs
the BATCH single-pass window program (operators/transactions.py — whole
stage codegen, zero Python in assembly) inside foreachBatch, and carries
only the OPEN transactions' rows forward as a versioned parquet state:

  per batch:  all = pending(parent) ∪ micro-batch
              emit    = cdc_envelope(all)        # committed txns only
              pending = all − closed xids        # COMMIT/ROLLBACK seen
              state_dir/v=<batch_id> ← pending   # same parent-version
                                                 # retry idempotence as
                                                 # streaming/snapshot.py

Exactly-once: a retried batch re-runs with the same batch_id, re-reads the
same parent state (largest v strictly below) and overwrites its own state
version and batch-keyed sink dirs — byte-identical output (the pattern
proven in tests/test_snapshot.py::test_merge_retry_same_batch_id).

Semantics: identical committed rows to the sequential assemblers for
SCN-ordered input with unique xids (the reference's real-redo guarantee,
operators/transactions.py PRECONDITION) — proven by the parity test in
tests/test_streaming_fb.py. A transaction spanning N micro-batches has its
DML re-scanned each batch until it closes (cost O(open rows) per batch);
``pending_ttl_batches`` evicts abandoned transactions the way the
state-timeout does in the stateful operators. Use this path for
throughput; the transformWithState path when open-set sizes are huge
(its ListState appends are O(increment)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig
from ..operators.schema_registry import SchemaRegistry, apply_table_schema
from ..plans.cdc import cdc_envelope
from .snapshot import latest_version


def write_cdc_foreachbatch(
    redo_stream: DataFrame,
    registry: SchemaRegistry,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    config: EngineConfig | None = None,
    trigger_available_now: bool = True,
    pending_ttl_batches: int | None = None,
    _fault_injector=None,
):
    """Streaming redo events → per-table typed parquet sinks, assembled at
    batch speed (see module docstring). Returns the StreamingQuery.

    ``_fault_injector(point, batch_id)`` is a TEST hook invoked at the two
    crash windows of the carry-over contract — ``after_sink`` (typed sinks
    written, state not yet) and ``after_state`` (state written, checkpoint
    not yet committed); raising from it simulates a kill at that instant.
    The chaos test restarts from the checkpoint and must land byte-equal
    to the uncrashed run: both windows re-run under the SAME batch_id,
    re-read the same parent state (latest_version is strictly below
    batch_id, so a half-written v=<batch_id> is never its own parent), and
    overwrite their own outputs."""
    config = config or EngineConfig(table_whitelist="TPCH.*", db_name_alias="orcl")
    spark = redo_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        parent = latest_version(state_dir, below=batch_id)
        if parent is not None:
            pending_prev = spark.read.parquet(f"{state_dir}/v={parent}")
        else:
            pending_prev = batch.limit(0).withColumn("_first_batch", F.lit(0).cast("long"))

        cur = batch.withColumn("_first_batch", F.lit(batch_id).cast("long"))
        allrows = pending_prev.unionByName(cur).persist()
        try:
            # closed = any COMMIT/ROLLBACK for the xid in this window; the
            # batch assembler emits exactly the committed subset
            closed = (
                allrows.filter(F.col("operation").isin("COMMIT", "ROLLBACK"))
                .select("xid")
                .distinct()
            )
            envelope = cdc_envelope(allrows.drop("_first_batch"), config).persist()
            try:
                # DDL-before-DML invalidation ordering (same contract as
                # pipeline.py::write_per_table)
                for r in (
                    envelope.filter(F.col("OPERATION") == "DDL")
                    .select("SEG_OWNER", "SRC_TABLE")
                    .distinct()
                    .collect()
                ):
                    if r["SRC_TABLE"]:
                        registry.invalidate(r["SEG_OWNER"], r["SRC_TABLE"])
                for r in (
                    envelope.filter(F.col("OPERATION") != "DDL")
                    .select("SEG_OWNER", "TABLE_NAME")
                    .distinct()
                    .collect()
                ):
                    owner, table = r["SEG_OWNER"], r["TABLE_NAME"]
                    if not registry.ensure(owner, table):
                        continue
                    typed = apply_table_schema(
                        envelope, registry, owner, table,
                        float64_numbers=config.float64_numbers,
                    )
                    typed.write.mode("overwrite").parquet(
                        f"{out_dir}/{owner}.{table}/batch={batch_id}"
                    )
                if _fault_injector is not None:
                    _fault_injector("after_sink", batch_id)

                pending = allrows.join(closed, "xid", "left_anti")
                if pending_ttl_batches is not None:
                    # abandoned-transaction eviction (the reference's missing
                    # guard; state-timeout analog of the stateful operators)
                    pending = pending.filter(
                        F.col("_first_batch") > batch_id - pending_ttl_batches
                    )
                pending.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
                if _fault_injector is not None:
                    _fault_injector("after_state", batch_id)
            finally:
                envelope.unpersist()
        finally:
            allrows.unpersist()

    writer = redo_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_cdc_snapshots_foreachbatch(
    redo_stream: DataFrame,
    registry: SchemaRegistry,
    pk_map: dict[tuple[str, str], list[str]],
    snap_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    config: EngineConfig | None = None,
    trigger_available_now: bool = True,
    pending_ttl_batches: int | None = None,
):
    """End-to-end batch-speed pipeline: raw redo stream → (carry-over
    transaction assembly, module docstring) → typed changes → incrementally
    maintained per-table SNAPSHOTS — redo in, current table state out, one
    stream, one checkpoint, zero per-group Python.

    The fold is streaming/snapshot.py::merge_step on net per-key changes,
    with the same versioned-parent retry idempotence for BOTH state kinds
    (open-transaction carry-over AND each table's snapshot chain): a
    retried batch re-reads parent versions strictly below its batch_id and
    overwrites only its own outputs. Snapshot layout per table:
    ``snap_dir/<owner>.<table>/v=<batch_id>``."""
    from ..operators.merge import net_changes
    from .snapshot import merge_step

    config = config or EngineConfig(table_whitelist="TPCH.*", db_name_alias="orcl")
    spark = redo_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        parent = latest_version(state_dir, below=batch_id)
        if parent is not None:
            pending_prev = spark.read.parquet(f"{state_dir}/v={parent}")
        else:
            pending_prev = batch.limit(0).withColumn("_first_batch", F.lit(0).cast("long"))

        cur = batch.withColumn("_first_batch", F.lit(batch_id).cast("long"))
        allrows = pending_prev.unionByName(cur).persist()
        try:
            closed = (
                allrows.filter(F.col("operation").isin("COMMIT", "ROLLBACK"))
                .select("xid")
                .distinct()
            )
            envelope = cdc_envelope(allrows.drop("_first_batch"), config).persist()
            try:
                for r in (
                    envelope.filter(F.col("OPERATION") == "DDL")
                    .select("SEG_OWNER", "SRC_TABLE")
                    .distinct()
                    .collect()
                ):
                    if r["SRC_TABLE"]:
                        registry.invalidate(r["SEG_OWNER"], r["SRC_TABLE"])
                for (owner, table), pk_cols in pk_map.items():
                    if not registry.ensure(owner, table):
                        continue
                    rows = envelope.filter(
                        (F.col("OPERATION") != "DDL")
                        & (F.col("SEG_OWNER") == owner)
                        & (F.col("TABLE_NAME") == table)
                    )
                    typed = apply_table_schema(
                        rows, registry, owner, table,
                        float64_numbers=config.float64_numbers,
                    )
                    net = net_changes(typed, pk_cols)
                    if not net.take(1):
                        continue  # nothing for this table; version unchanged
                    tdir = f"{snap_dir}/{owner}.{table}"
                    tparent = latest_version(tdir, below=batch_id)
                    prev = (
                        None if tparent is None
                        else spark.read.parquet(f"{tdir}/v={tparent}")
                    )
                    merge_step(prev, net, pk_cols).write.mode("overwrite").parquet(
                        f"{tdir}/v={batch_id}"
                    )

                pending = allrows.join(closed, "xid", "left_anti")
                if pending_ttl_batches is not None:
                    pending = pending.filter(
                        F.col("_first_batch") > batch_id - pending_ttl_batches
                    )
                pending.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
            finally:
                envelope.unpersist()
        finally:
            allrows.unpersist()

    writer = redo_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
