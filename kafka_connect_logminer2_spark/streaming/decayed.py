"""Continuously-maintained time-decayed counters — the feature-store
"half-life engagement" aggregate (q151) kept fresh over an event stream.

Why the decay makes this STREAMABLE: e^(−λ(T−t)) = e^(−λ(T−E)) · e^(λ(t−E))
for any fixed epoch E, so each event's contribution in the epoch-normalized
domain (value·e^(λ(t−E))) is a CONSTANT — the per-key state is a plain
additive pair (Σ value·w, Σ w) folded per micro-batch, and "as of T" is a
read-side scalar multiply. No re-aggregation, no per-key time ordering,
ever. The epoch must sit near the data's time range: exponents are
λ·(t−E) ≤ ~36 for a year at a 7-day half-life — comfortably inside double
range and precision (a naive E=0 would overflow e^(λ·epoch-seconds)).

State layout: each version ``v=<batch_id>`` is the FULL counter table —
O(distinct keys) rows, the correct cost model for a counter MV (state is
key-sized, never event-sized); parquet's _SUCCESS gates visibility and a
retried batch re-reads the parent strictly below its own id (the
write_aggregate contract). Epoch and half-life are pinned in
``_meta.json`` — resuming with different values would silently mix
incompatible weight domains; it raises instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus_ingest import _ensure_meta
from .snapshot import latest_version

_LN2 = 0.6931471805599453


def _weight(ts_col: str, epoch: str, lam: float) -> F.Column:
    t = F.col(ts_col).cast("timestamp").cast("double")
    e = F.lit(epoch).cast("timestamp").cast("double")
    return F.exp(F.lit(lam) * (t - e))


def decayed_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    epoch: str = "2026-01-01",
    half_life_s: float = 7 * 86400,
) -> None:
    """One additive fold (public foreachBatch body): the batch's per-key
    epoch-domain contributions merge into the parent state by a null-safe
    full outer join; the new FULL state lands as ``v=<batch_id>``."""
    _ensure_meta(
        out_dir,
        {"kind": "decayed", "epoch": epoch, "half_life_s": half_life_s,
         "key_col": key_col},
    )
    lam = _LN2 / half_life_s
    w = _weight(ts_col, epoch, lam)
    contrib = batch.groupBy(key_col).agg(
        F.sum(F.col(value_col) * w).alias("_c_vw"),
        F.sum(w).alias("_c_w"),
        F.count(F.lit(1)).alias("_c_n"),
    )
    parent = latest_version(out_dir, below=batch_id)
    if parent is None:
        merged = contrib.select(
            key_col,
            F.col("_c_vw").alias("s_vw"),
            F.col("_c_w").alias("s_w"),
            F.col("_c_n").alias("n_events"),
        )
    else:
        prev = spark.read.parquet(f"{out_dir}/v={parent}")
        merged = (
            prev.join(contrib, key_col, "full_outer")
            .select(
                key_col,
                (F.coalesce("s_vw", F.lit(0.0)) + F.coalesce("_c_vw", F.lit(0.0))).alias("s_vw"),
                (F.coalesce("s_w", F.lit(0.0)) + F.coalesce("_c_w", F.lit(0.0))).alias("s_w"),
                (F.coalesce("n_events", F.lit(0)) + F.coalesce("_c_n", F.lit(0))).cast("long").alias("n_events"),
            )
        )
    merged.write.mode("overwrite").parquet(f"{out_dir}/v={batch_id}")


def write_decayed_counters(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    epoch: str = "2026-01-01",
    half_life_s: float = 7 * 86400,
    trigger_available_now: bool = True,
):
    """Event stream → continuously-folded decayed-counter state. Returns
    the StreamingQuery."""
    spark = events_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        decayed_batch_step(
            spark, batch, batch_id, out_dir,
            key_col=key_col, value_col=value_col, ts_col=ts_col,
            epoch=epoch, half_life_s=half_life_s,
        )

    writer = events_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_decayed(
    spark: SparkSession, out_dir: str, as_of_ts: str | None = None
) -> DataFrame | None:
    """Latest committed counter state. With ``as_of_ts``, project the
    epoch-domain sums to decayed values at that instant — the read-side
    scalar multiply that makes 'as of now' free: decayed_value =
    s_vw · e^(−λ(T−E))."""
    from .snapshot import _read_meta

    last = latest_version(out_dir)
    if last is None:
        return None
    df = spark.read.parquet(f"{out_dir}/v={last}")
    if as_of_ts is None:
        return df
    meta = _read_meta(out_dir) or {}
    lam = _LN2 / meta.get("half_life_s", 7 * 86400)
    scale = F.exp(
        -F.lit(lam)
        * (
            F.lit(as_of_ts).cast("timestamp").cast("double")
            - F.lit(meta.get("epoch", "2026-01-01")).cast("timestamp").cast("double")
        )
    )
    return df.select(
        df.columns[0],
        (F.col("s_vw") * scale).alias("decayed_value"),
        (F.col("s_w") * scale).alias("decayed_count"),
        "n_events",
    )
