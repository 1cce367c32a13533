"""Incrementally-maintained JOIN materialized view — the streaming MV one
level above ``write_aggregate``: alongside per-table snapshots of BOTH
join sides, ``mv_dir`` holds a versioned equi-join of the two tables that
is folded forward each micro-batch from the batch's TOUCHED KEYS ONLY,
never recomputed from scratch.

Classic delta-join maintenance for FACT ⋈ DIM on dim's primary key
(orders ⋈ customer on custkey), specialised to upsert/delete change
streams: with L' = L + ΔL and R' = R + ΔR (merge semantics per pk),

    MV' = (MV − rows keyed by touched-left pks
              − rows whose join key is a touched-right pk)
          ∪ (L' restricted to those touched sets) ⋈ R'

which covers every case by construction: a deleted left row is in the
removal set and absent from L' (never re-added); a deleted right key
removes all its MV rows and the inner re-join adds nothing back; a left
update whose JOIN KEY changed is removed under its pk and re-added under
the new key; a right non-pk update rewrites exactly the MV rows of that
key. Per-batch join cost is O(changed keys + left rows per changed right
key) — at 100 TB the difference between touching the change set and
re-running the full join every batch. The one full-MV-width operation is
the anti-join against the touched-key sets, which broadcasts the (small)
key sets and streams the MV once — the same per-batch cost contract as
``merge_step``'s snapshot rewrite; for MV sizes where even that scan
dominates, the bucketed-store layout (streaming/snapshot.py
write_snapshot_bucketed) is the drop-in shape, same as for snapshots.

Versioning/retry matches the snapshot contract: the MV writes
``v=<batch_id>`` with parent = largest version strictly below, so a
retried foreachBatch recomputes identical deltas and overwrites only its
own output.

The reference has no MV machinery at all — this is north-star surface;
the CDC semantics it rides (commit gating, rollback discard, typed
images) are LogMinerThread2.java:142-309 / OracleSourceConnectorUtils2.
java:156-252 parity, checked by cdc20's relational oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig
from ..operators.schema_registry import SchemaRegistry
from .snapshot import _merge_one_table, latest_version


def _read_latest(
    spark: SparkSession, snap_dir: str, batch_id: int
) -> DataFrame | None:
    v = latest_version(snap_dir, below=batch_id + 1)
    return None if v is None else spark.read.parquet(f"{snap_dir}/v={v}")


def join_mv_step(
    base: DataFrame | None,
    left_new: DataFrame,
    right_new: DataFrame,
    touched_left: DataFrame | None,
    touched_right: DataFrame | None,
    left_pk: list[str],
    join_key: str,
    right_pk: str,
) -> DataFrame:
    """One incremental fold of the join MV (pure function — property-
    tested directly in tests/test_join_mv.py against a full re-join).
    ``touched_*`` are pk-keyed DataFrames of the batch's net-changed keys
    (None ⇒ that side unchanged this batch). ``base`` None ⇒ first
    materialization: fold everything (both touched sets must then cover
    all keys, which _merge_one_table guarantees on the first batch)."""
    right_sel = right_new.withColumnRenamed(right_pk, join_key)
    if base is None:
        return left_new.join(right_sel, join_key, "inner")
    kept = base
    refresh = None
    if touched_left is not None:
        kept = kept.join(F.broadcast(touched_left), left_pk, "left_anti")
        refresh = left_new.join(F.broadcast(touched_left), left_pk, "left_semi")
    if touched_right is not None:
        tr = touched_right.withColumnRenamed(right_pk, join_key)
        kept = kept.join(F.broadcast(tr), join_key, "left_anti")
        from_right = left_new.join(F.broadcast(tr), join_key, "left_semi")
        refresh = from_right if refresh is None else refresh.unionByName(from_right)
    if refresh is None:
        return base
    # a left row can be touched on both sides (its own change + its
    # customer's) — fold to one copy per left pk before the re-join
    refresh = refresh.dropDuplicates(left_pk)
    # allowMissingColumns: add-only schema evolution (merge_step's
    # contract) — a column new to this batch backfills NULL in old MV rows
    return kept.unionByName(
        refresh.join(right_sel, join_key, "inner"), allowMissingColumns=True
    )


def write_join_mv(
    envelope_stream: DataFrame,
    registry: SchemaRegistry,
    owner: str,
    left_table: str,
    left_pk: list[str],
    join_key: str,
    right_table: str,
    right_pk: str,
    snap_root: str,
    mv_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    trigger_available_now: bool = True,
):
    """Maintain snapshots of ``left_table`` and ``right_table`` plus the
    continuously-folded inner join MV (left ⋈ right ON left.join_key =
    right.right_pk). Snapshots land under ``snap_root/<OWNER>.<TABLE>``
    (same layout as write_snapshots); the MV under ``mv_dir/v=<batch>``.

    A batch that touches neither table writes no new MV version; a batch
    before the first appearance of either table writes none either (an
    inner join with an absent side is empty — materialization starts when
    both sides exist)."""
    spark = envelope_stream.sparkSession
    l_dir = f"{snap_root}/{owner}.{left_table}"
    r_dir = f"{snap_root}/{owner}.{right_table}"

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            _, l_keys = _merge_one_table(
                spark, batch, batch_id, registry, owner, left_table,
                left_pk, l_dir, config,
            )
            _, r_keys = _merge_one_table(
                spark, batch, batch_id, registry, owner, right_table,
                [right_pk], r_dir, config,
            )
        finally:
            batch.unpersist()
        if l_keys is None and r_keys is None:
            return  # nothing touched either table; MV version unchanged
        left_new = _read_latest(spark, l_dir, batch_id)
        right_new = _read_latest(spark, r_dir, batch_id)
        if left_new is None or right_new is None:
            return  # one side has never appeared; inner MV not yet live
        mv_parent = latest_version(mv_dir, below=batch_id)
        base = (
            None
            if mv_parent is None
            else spark.read.parquet(f"{mv_dir}/v={mv_parent}")
        )
        out = join_mv_step(
            base, left_new, right_new, l_keys, r_keys, left_pk, join_key, right_pk
        )
        out.write.mode("overwrite").parquet(f"{mv_dir}/v={batch_id}")

    writer = envelope_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_join_mv(spark: SparkSession, mv_dir: str) -> DataFrame | None:
    """Latest MV version (VERSION AS OF = pass ``below`` via
    latest_version + a direct read, same as snapshots)."""
    v = latest_version(mv_dir)
    return None if v is None else spark.read.parquet(f"{mv_dir}/v={v}")
