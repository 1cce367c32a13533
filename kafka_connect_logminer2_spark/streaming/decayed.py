"""Continuously-maintained time-decayed counters — the feature-store
"half-life engagement" aggregate (q151) kept fresh over an event stream,
with per-batch store writes of O(touched keys), never O(all keys).

Why the decay makes this STREAMABLE: e^(−λ(T−t)) = e^(−λ(T−E)) · e^(λ(t−E))
for any fixed epoch E, so each event's contribution in an epoch-normalized
domain (value·e^(λ(t−E))) is a CONSTANT — per-key state is a plain additive
pair (Σ value·w, Σ w) and "as of T" is a read-side scalar multiply. No
re-aggregation, no per-key time ordering, ever.

Store layout — the shared delta-chain skeleton (corpus_ingest), like the
ingest stores, the SCD2 history, and the inverted index:

* ``b=<k>/v=<batch_id>`` delta segments hold ONLY the batch's per-key
  contributions, bucketed by the key hash — per-batch write cost is
  O(keys touched by the batch), not O(all keys ever seen). (The first
  design overwrote the FULL counter table per micro-batch after a
  full-outer join with parent state: at 10⁹ users with minutely triggers
  that is O(keys × batches) write amplification — the same failure class
  the ingest stores were redesigned out of.) Contributions are ADDITIVE,
  so the write side needs NO parent read and NO join at all; the read
  side folds a key's chain with one groupBy-sum, and
  :func:`compact_decayed` folds chains back to one segment per bucket.

* THE EPOCH IS DATA, NOT METADATA: every segment row carries ``epoch_s``,
  the day-aligned reference epoch its sums are expressed in, derived from
  the batch's own max timestamp (deterministic on retry). Two problems
  die at once:

  - overflow: weights e^(λ(t−E)) grow without bound as a stream runs
    past a FIXED creation-time epoch (λ·(t−E) ≈ 36/year at a 7-day
    half-life → doubles overflow within a few decades, precision decays
    long before). With per-batch epochs the write-side exponent is
    bounded by λ·86400 forever, and every read/compaction rescale
    normalizes OLDER epochs to a NEWER one — factors ≤ e^(λ·86400),
    never large;
  - re-base crash-safety: a "multiply sums by e^(−λ(E′−E)) and update
    _meta.json" compaction has a torn state — some buckets rescaled,
    some not, one authoritative epoch — that readers cannot detect.
    With the epoch in-row, mixed-epoch chains are WELL-DEFINED at every
    instant (each row self-describes its domain). Compaction crash-safety
    for this store's ADDITIVE fold comes from compact_chains' ``_FOLD``
    markers: a committed fold hides the bucket's older versions from
    every reader and re-run, so leftover segments from a crashed
    deletion are never double-counted (sum folds have no byte-identical
    duplicates for a distinct() to absorb — the marker is what makes an
    additive fold safe).

* parquet ``_SUCCESS`` per segment + batch-level commit markers gate
  visibility; a retried batch overwrites only its own ``v=`` segments
  (the _write_delta contract). ``half_life_s``/``key_col``/
  ``num_buckets`` are pinned in ``_meta.json`` — resuming with a
  different λ would silently mix incompatible weight domains, a
  different bucket count would split keys across buckets; both raise.

Reference: no equivalent in the reference (its surface stops at CDC
envelopes); this is §2C feature-store surface, the streaming twin of q151.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus_ingest import (
    _empty_rows,
    _ensure_meta,
    _note_row_schema,
    _store_paths,
    _write_delta,
    compact_chains,
)
from .snapshot import _last_committed_batch, _mark_committed, _read_meta

_LN2 = 0.6931471805599453
_DAY = 86400.0


def _key_bucket(key_col: str, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def _committed_rows(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Union of every committed delta segment (the chain read)."""
    last = _last_committed_batch(out_dir)
    if last is None:
        return None
    paths = [
        p
        for p in _store_paths(out_dir, None, below=last + 1)
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    if not paths:
        return None
    # leaf-dir read withOUT basePath: never infer b=/v= partition columns
    # (the case-insensitive shadowing trap, see compact_chains docstring)
    return spark.read.parquet(*paths)


def decayed_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    half_life_s: float = 7 * 86400,
    num_buckets: int = 16,
) -> None:
    """One additive fold (public foreachBatch body): aggregate the batch's
    per-key epoch-domain contributions and land them as touched-bucket
    delta segments. NO parent read, NO join — additivity means the store
    write is a pure append of O(batch keys) rows.

    The batch epoch is its max timestamp floored to the day — bounded
    write-side exponents (≤ λ·86400 ≈ 0.07 at a 7-day half-life) no
    matter how far the stream runs, and deterministic on retry (same
    batch content → same epoch → byte-identical segments). The epoch
    scalar costs one extra O(batch) aggregate — a single double to the
    driver, not data."""
    _ensure_meta(
        out_dir,
        {"kind": "decayed", "half_life_s": half_life_s, "key_col": key_col,
         "num_buckets": num_buckets},
    )
    _note_row_schema(
        out_dir,
        f"{key_col} {batch.schema[key_col].dataType.simpleString()}, "
        "s_vw double, s_w double, n_events bigint, epoch_s double",
    )
    tsd = F.col(ts_col).cast("timestamp").cast("double")
    tmax = batch.agg(F.max(tsd)).first()[0]
    if tmax is None:  # empty batch: nothing to fold, still commit
        _mark_committed(out_dir, batch_id)
        return
    epoch_b = math.floor(tmax / _DAY) * _DAY
    lam = _LN2 / half_life_s
    w = F.exp(F.lit(lam) * (tsd - F.lit(epoch_b)))
    contrib = (
        batch.groupBy(key_col)
        .agg(
            F.sum(F.col(value_col) * w).alias("s_vw"),
            F.sum(w).alias("s_w"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .withColumn("epoch_s", F.lit(epoch_b))
        .withColumn("_b", _key_bucket(key_col, num_buckets))
    )
    _write_delta(contrib, out_dir, batch_id)
    _mark_committed(out_dir, batch_id)


def write_decayed_counters(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    half_life_s: float = 7 * 86400,
    num_buckets: int = 16,
    trigger_available_now: bool = True,
    max_chain: int | None = 64,
):
    """Event stream → continuously-folded decayed-counter state. Returns
    the StreamingQuery. ``max_chain`` schedules in-line maintenance (see
    streaming/maintenance.py): compact once any bucket's chain exceeds
    the bound — the read-side groupBy-sum folds O(buckets · max_chain)
    segments on an unbounded stream, not O(batches); None leaves
    scheduling to an external sweep."""
    spark = events_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        decayed_batch_step(
            spark, batch, batch_id, out_dir,
            key_col=key_col, value_col=value_col, ts_col=ts_col,
            half_life_s=half_life_s, num_buckets=num_buckets,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            # protect=batch_id: a replayed batch must find its own delta
            # and the pre-batch history intact (see compact_chains)
            maintain_store(spark, out_dir, max_chain=max_chain,
                           max_overlays=max_chain, protect=batch_id)

    writer = events_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_decayed(
    spark: SparkSession, out_dir: str, protect: int | None = None
) -> int | None:
    """Fold each bucket's delta chain into one segment (compact_chains
    skeleton). The fold normalizes every row to the chain's max epoch
    (scale factors e^(λ(epoch_s − E_max)) ≤ 1) and groupBy-sums per key.

    Crash-idempotence of an ADDITIVE fold is the hard case — leftover
    chain segments are not byte-identical no-ops a distinct() could
    absorb but double-counted contributions, and a re-fold would compound
    them. compact_chains' ``_FOLD`` markers close this structurally:
    every reader and re-run prunes a bucket's versions below its newest
    committed fold, so a crash between fold placement and old-version
    deletion can never double-count (test-pinned in
    tests/test_compaction_crash.py), and the read side's groupBy-sum
    domain stays well-defined because every surviving row still carries
    its own epoch."""
    meta = _read_meta(out_dir) or {}
    key_col = meta.get("key_col", "user_id")
    nb = meta.get("num_buckets", 16)
    lam = _LN2 / meta.get("half_life_s", 7 * 86400)

    def fold(df: DataFrame) -> DataFrame:
        emax = df.agg(F.max("epoch_s")).first()[0]
        if emax is None:
            return df
        scale = F.exp(F.lit(lam) * (F.col("epoch_s") - F.lit(emax)))
        return (
            df.groupBy("_b", key_col)
            .agg(
                F.sum(F.col("s_vw") * scale).alias("s_vw"),
                F.sum(F.col("s_w") * scale).alias("s_w"),
                F.sum("n_events").cast("long").alias("n_events"),
            )
            .withColumn("epoch_s", F.lit(float(emax)))
        )

    return compact_chains(
        spark, out_dir, _key_bucket(key_col, nb), fold=fold, protect=protect
    )


def read_decayed(
    spark: SparkSession, out_dir: str, as_of_ts: str | None = None
) -> DataFrame | None:
    """Latest committed counter state: one groupBy-sum over the committed
    chain, each row rescaled from its own epoch. With ``as_of_ts``,
    returns decayed values at that instant (decayed_value =
    Σ s_vw·e^(−λ(T−epoch_s)) — exact regardless of how many distinct
    epochs the chain holds). Without it, returns epoch-domain sums
    normalized to the chain's max epoch, exposed as ``epoch_s`` so the
    result self-describes its weight domain. Querying as-of an instant
    many half-lives BEFORE the data's own time range is out of contract
    (the rescale factor e^(λ(epoch−T)) grows; at 700+ half-lives it
    overflows) — decayed counters are read at-or-after the data."""
    df = _committed_rows(spark, out_dir)
    if df is None:
        # committed but segmentless (empty-batch-only stream): the store
        # EXISTS with zero keys — an empty typed frame, not None
        df = _empty_rows(spark, out_dir)
        if df is None:
            return None
    meta = _read_meta(out_dir) or {}
    key_col = meta.get("key_col", "user_id")
    lam = _LN2 / meta.get("half_life_s", 7 * 86400)
    if as_of_ts is None:
        emax = df.agg(F.max("epoch_s")).first()[0]
        if emax is None:  # zero rows: epoch of the empty domain is moot
            emax = 0.0
        scale = F.exp(F.lit(lam) * (F.col("epoch_s") - F.lit(float(emax))))
        return (
            df.groupBy(key_col)
            .agg(
                F.sum(F.col("s_vw") * scale).alias("s_vw"),
                F.sum(F.col("s_w") * scale).alias("s_w"),
                F.sum("n_events").cast("long").alias("n_events"),
            )
            .withColumn("epoch_s", F.lit(float(emax)))
        )
    t_ref = F.lit(as_of_ts).cast("timestamp").cast("double")
    scale = F.exp(-F.lit(lam) * (t_ref - F.col("epoch_s")))
    return df.groupBy(key_col).agg(
        F.sum(F.col("s_vw") * scale).alias("decayed_value"),
        F.sum(F.col("s_w") * scale).alias("decayed_count"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
