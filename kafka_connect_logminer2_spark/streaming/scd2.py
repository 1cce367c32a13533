"""Continuously-maintained SCD Type-2 dimension history — the streaming
form of operators/scd.py::scd2_history, folded forward per micro-batch
with O(batch-changes) store writes.

Why not "re-run scd2_history each batch": the history table only ever
GROWS, and each batch touches a vanishing fraction of keys — re-deriving
(or even re-writing, snapshot-style) the whole history per batch is the
O(history) write amplification the ingest stores were redesigned to
avoid. The history's mutation pattern is narrower than a snapshot's:
closed versions are IMMUTABLE; the only in-place change a batch can cause
is closing a previously-open version. So the store is:

* ``b=<k>/v=<batch_id>`` — append-only delta segments of NEW version rows
  (pk cols, value cols, valid_from, valid_to-within-batch), bucketed by
  the pk hash (corpus_ingest's delta-chain machinery, reused directly);
* ``_closes/v=<batch_id>`` — tiny patch segments ``(pk..., valid_from,
  valid_to)`` closing previously-open versions; the read side left-joins
  patches over rows (merge-on-read), :func:`compact_scd2` applies them
  physically and folds chains.

Per batch, the incremental fold:
1. the batch's typed changes pick their touched pk-hash buckets; ONLY
   those buckets' committed chains are read (the probe discipline of the
   ingest stores — history is never scanned in full);
2. each touched key's still-open version (if any) joins the batch as a
   synthetic SEED event at its ``valid_from``, so (a) the first batch
   change CLOSES it via the same lead() that closes intra-batch versions
   and (b) UPDATE after-images with missing columns inherit its values
   through the same per-generation last(ignorenulls) merge — cross-batch
   inheritance without re-reading any closed history;
3. DELETEs increment the generation (tombstone-scoped inheritance, the
   net_changes rule) and emit no version row.

Correctness contract (test-pinned): for ANY split of a change stream
into batches, read_scd2(store) after streaming == scd2_history(all
changes at once). Retried batches overwrite their own ``v=`` segments;
the commit marker gates visibility. Assumes commit SCNs are monotone
across batches per key (the CDC stream's ordering guarantee, A15).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.schema_registry import SchemaRegistry, apply_table_schema
from .corpus_ingest import (
    _empty_rows,
    _ensure_meta,
    _note_row_schema,
    _store_paths,
    _write_delta,
)
from .snapshot import _last_committed_batch, _mark_committed


def _bucket_of(pk_cols: list[str], num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(num_buckets)).cast(
        "int"
    )


def _read_rows(
    spark: SparkSession, store_dir: str, buckets: list[int] | None, below: int
) -> DataFrame | None:
    paths = [
        p
        for p in _store_paths(store_dir, buckets, below=below)
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        return None
    # leaf-dir read WITHOUT basePath: no b=/v= partition columns are
    # inferred — Spark's case-insensitive resolution would otherwise let
    # the lowercase partition column `v` shadow a user value column `V`
    return spark.read.parquet(*paths)


def _read_closes(
    spark: SparkSession, store_dir: str, below: int
) -> DataFrame | None:
    cdir = os.path.join(store_dir, "_closes")
    if not os.path.isdir(cdir):
        return None
    paths = [
        f"{cdir}/v={v}"
        for v in sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(cdir)
            if d.startswith("v=") and int(d.split("=", 1)[1]) < below
        )
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _apply_closes(rows: DataFrame, closes: DataFrame | None, pk_cols: list[str]) -> DataFrame:
    """Merge-on-read: a close patch overrides the row's open valid_to."""
    if closes is None:
        return rows
    patch = closes.select(
        *pk_cols, "valid_from", F.col("valid_to").alias("_patch_to")
    )
    return (
        rows.join(patch, [*pk_cols, "valid_from"], "left")
        .withColumn("valid_to", F.coalesce(F.col("_patch_to"), F.col("valid_to")))
        .drop("_patch_to")
    )


def scd2_batch_step(
    spark: SparkSession,
    typed: DataFrame,
    batch_id: int,
    store_dir: str,
    pk_cols: list[str],
    num_buckets: int = 16,
) -> None:
    """One incremental SCD2 fold (public foreachBatch body). ``typed`` is
    the apply_table_schema output for ONE table."""
    _ensure_meta(
        store_dir,
        {"kind": "scd2", "num_buckets": num_buckets, "pk_cols": pk_cols},
    )
    value_cols = [f.name for f in typed.schema["data"].dataType.fields]
    non_pk = [c for c in value_cols if c not in pk_cols]
    vtype = {
        f.name: f.dataType.simpleString()
        for f in typed.schema["data"].dataType.fields
    }
    _note_row_schema(
        store_dir,
        ", ".join(
            [f"{c} {vtype[c]}" for c in pk_cols]
            + [f"{c} {vtype[c]}" for c in non_pk]
            + ["valid_from bigint", "valid_to bigint"]
        ),
    )

    key_exprs = [
        F.coalesce(F.col(f"data.{c}"), F.col(f"before.{c}")).alias(c) for c in pk_cols
    ]
    ev = typed.select(
        *key_exprs,
        F.col("OPERATION").alias("_op"),
        F.col("COMMIT_SCN").cast("long").alias("_cscn"),
        F.col("SCN").cast("long").alias("_scn"),
        *[F.col(f"data.{c}").alias(c) for c in non_pk],
    ).withColumn("_b", _bucket_of(pk_cols, num_buckets)).persist()
    try:
        if ev.isEmpty():
            # an empty batch still COMMITS: an all-empty stream must read
            # as an empty history (the batch twin's answer), not None
            _mark_committed(store_dir, batch_id)
            return
        touched = sorted(r["_b"] for r in ev.select("_b").distinct().collect())
        prior = _read_rows(spark, store_dir, touched, below=batch_id)
        if prior is not None:
            open_rows = _apply_closes(
                prior, _read_closes(spark, store_dir, below=batch_id), pk_cols
            ).filter(F.col("valid_to").isNull())
            # only keys this batch touches can seed (left_semi keeps the
            # probe bounded by the batch, not the history)
            seed = (
                open_rows.join(ev.select(*pk_cols).distinct(), pk_cols, "left_semi")
                .select(
                    *pk_cols,
                    F.lit("SEED").alias("_op"),
                    F.col("valid_from").alias("_cscn"),
                    F.lit(-1).cast("long").alias("_scn"),
                    *non_pk,
                )
                .withColumn("_b", _bucket_of(pk_cols, num_buckets))
            )
            allev = seed.unionByName(ev)
        else:
            allev = ev

        w_cum = (
            Window.partitionBy(*pk_cols)
            .orderBy("_cscn", "_scn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        allev = allev.withColumn(
            "_gen", F.sum((F.col("_op") == "DELETE").cast("int")).over(w_cum)
        )
        w_merge = (
            Window.partitionBy(*pk_cols, "_gen")
            .orderBy("_cscn", "_scn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_next = Window.partitionBy(*pk_cols).orderBy("_cscn", "_scn")
        staged = allev.select(
            *pk_cols,
            "_op",
            "_b",
            F.col("_cscn").alias("valid_from"),
            F.lead("_cscn").over(w_next).alias("valid_to"),
            *[
                F.last(F.col(c), ignorenulls=True).over(w_merge).alias(c)
                for c in non_pk
            ],
        ).persist()
        try:
            new_rows = staged.filter(F.col("_op").isin("INSERT", "UPDATE")).select(
                *pk_cols, *non_pk, "valid_from", "valid_to", "_b"
            )
            _write_delta(new_rows, store_dir, batch_id)
            closes = staged.filter(
                (F.col("_op") == "SEED") & F.col("valid_to").isNotNull()
            ).select(*pk_cols, "valid_from", "valid_to")
            cdst = os.path.join(store_dir, "_closes", f"v={batch_id}")
            shutil.rmtree(cdst, ignore_errors=True)
            if not closes.isEmpty():
                closes.coalesce(1).write.mode("overwrite").parquet(cdst)
            _mark_committed(store_dir, batch_id)
        finally:
            staged.unpersist()
    finally:
        ev.unpersist()


def write_scd2(
    envelope_stream: DataFrame,
    registry: SchemaRegistry,
    owner: str,
    table: str,
    pk_cols: list[str],
    store_dir: str,
    checkpoint_dir: str,
    config=None,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
):
    """Maintain ``store_dir`` as the continuously-folded SCD2 history of
    ``owner.table`` implied by the committed envelope stream. Returns the
    StreamingQuery.

    ``max_chain`` schedules store maintenance in-line (r6 verdict #6): a
    listdir-cheap check after each batch compacts once any bucket's chain
    (or the pending close-patch overlay) exceeds the bound, so a
    long-running stream's read cost stays O(buckets · max_chain) segments
    instead of O(batches). None disables (external scheduler owns it)."""
    spark = envelope_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        for r in (
            batch.filter(
                (F.col("OPERATION") == "DDL") & (F.col("SEG_OWNER") == owner)
            )
            .select("SRC_TABLE")
            .distinct()
            .collect()
        ):
            if r["SRC_TABLE"] == table:
                registry.invalidate(owner, table)
        rows = batch.filter(
            (F.col("OPERATION") != "DDL")
            & (F.col("SEG_OWNER") == owner)
            & (F.col("TABLE_NAME") == table)
        )
        if not registry.ensure(owner, table):
            return
        typed = apply_table_schema(rows, registry, owner, table)
        scd2_batch_step(
            spark, typed, batch_id, store_dir, pk_cols, num_buckets=num_buckets
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            # protect=batch_id: this batch may still be REPLAYED (store
            # marker lands before Spark's commit log) — the fold must not
            # touch its version (see compact_chains)
            maintain_store(spark, store_dir, max_chain=max_chain,
                           max_overlays=max_chain, protect=batch_id)

    writer = envelope_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_scd2(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The committed history: version rows with patches applied
    (merge-on-read) and ``is_current`` derived."""
    last = _last_committed_batch(store_dir)
    if last is None:
        return None
    meta_pk = None
    from .snapshot import _read_meta

    meta = _read_meta(store_dir)
    if meta:
        meta_pk = meta.get("pk_cols")
    rows = _read_rows(spark, store_dir, None, below=last + 1)
    if rows is None:
        # committed but segmentless (delete-only first batch / all-empty
        # stream): the history EXISTS and is empty — return it typed, the
        # same answer the one-shot scd2_history gives for that change set
        rows = _empty_rows(spark, store_dir)
        if rows is None:
            return None
    # no read-side distinct() needed: _committed_versions prunes every
    # version below a committed _FOLD segment, so a compaction crash can
    # no longer surface duplicate version rows (the old crash window this
    # read used to pay a full extra shuffle to tolerate)
    pk_cols = meta_pk or [rows.columns[0]]
    out = _apply_closes(rows, _read_closes(spark, store_dir, below=last + 1), pk_cols)
    return out.withColumn("is_current", F.col("valid_to").isNull())


def compact_scd2(
    spark: SparkSession, store_dir: str, protect: int | None = None
) -> int | None:
    """Fold every bucket's chain to one segment with close patches applied
    PHYSICALLY, then drop the consumed patch segments — the shared
    :func:`~.corpus_ingest.compact_chains` skeleton with a patch-apply
    fold. With patches pending, even single-segment chains rewrite.
    Returns the fold version, or None on an empty store.

    ``protect`` (the in-line scheduling contract, see compact_chains):
    only versions and close patches strictly below it are folded /
    consumed — safe while batch ``protect`` may still be replayed. Close
    patches target ``(pk, valid_from)`` rows written strictly before
    them, so every patch below ``protect`` lands inside the fold; apply
    is idempotent with the merge-on-read path (same valid_to)."""
    from .corpus_ingest import compact_chains
    from .snapshot import _read_meta

    last = _last_committed_batch(store_dir)
    if last is None:
        return None
    meta = _read_meta(store_dir) or {}
    pk_cols = meta.get("pk_cols")
    nb = meta.get("num_buckets", 16)
    closes = _read_closes(
        spark, store_dir, below=(last + 1 if protect is None else protect)
    )

    def fold(df):
        return _apply_closes(df, closes, pk_cols).distinct()

    return compact_chains(
        spark,
        store_dir,
        _bucket_of(pk_cols, nb),
        fold=fold,
        force_single=closes is not None,
        cleanup_dirs=("_closes",),
        protect=protect,
    )
