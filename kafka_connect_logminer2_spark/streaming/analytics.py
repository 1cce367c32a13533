"""Streaming analytics over the CDC/event stream (SURVEY §2C): watermarked
tumbling/sliding/session event-time windows — the operators a consumer of the
engine's change topics runs downstream.

These mirror the batch q14/q15 queries but as true streaming plans with late
-data handling; the batch/stream pair shares semantics so the DuckDB oracle
for the batch version validates the logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) event-time window aggregation with
    a watermark bounding state for late data."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    # watermarks require TIMESTAMP (ltz); under the engine's UTC session tz
    # the ntz→ltz cast is value-identity
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication on ``keys`` with state bounded by the
    watermark — the streaming face of functions.dedup.exact_dedup.

    ``within_watermark=True`` uses dropDuplicatesWithinWatermark: duplicates
    are only guaranteed dropped if they arrive within the watermark delay of
    the first occurrence, and state for a key is evicted once the watermark
    passes it — bounded state, the only viable contract on an unbounded
    100 TB/day stream. ``False`` falls back to dropDuplicates (exact forever,
    state grows without bound — test/backfill use only).
    """
    keys = keys or ["event_id"]
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = events.withWatermark("ts", watermark)
    if within_watermark:
        return deduped.dropDuplicatesWithinWatermark(keys)
    return deduped.dropDuplicates(keys)


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to the
    same user's clicks in the preceding ``attribution_window``.

    Both sides carry a watermark and the join condition bounds purchase time
    to (click_ts, click_ts + window], so Spark can derive state-cleanup
    thresholds for BOTH sides — without the time bound the join state grows
    forever. This is the canonical funnel-attribution join; batch twin with
    a DuckDB oracle: q60_attribution."""
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = c.join(
        p,
        F.expr(
            "user_id = p_user_id AND purchase_ts > click_ts "
            f"AND purchase_ts <= click_ts + interval {attribution_window}"
        ),
        "inner",
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_seconds"),
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user via the built-in session_window operator
    (state bounded by the watermark)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


class RunningCountProcessor:
    """transformWithStateInPandas processor: per-key running event count in
    a ValueState, cumulative count emitted every batch (monotone — the final
    value is the max, which makes a bounded run relationally checkable:
    max(running_n) == count(*) per key). The minimal composable-state
    example next to the CDC TransactionProcessor; import stays inside the
    methods' module so pickling ships only this class."""

    def init(self, handle) -> None:
        self._n = handle.getValueState("n", "n long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        total = sum(len(pdf) for pdf in rows)
        prev = int(self._n.get()[0]) if self._n.exists() else 0
        cur = prev + total
        self._n.update((cur,))
        yield pd.DataFrame({"user_id": [key[0]], "running_n": [cur]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def running_counts_tws(events_stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running counts on the transformWithState runtime (requires
    google.protobuf in workers — session.enable_vendored_protobuf, called by
    get_spark). Output: one (key, running_n) row per touched key per batch."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    # subclass at call time so importing this module never requires the
    # streaming runtime bits
    proc_cls = type("_RunningCount", (StatefulProcessor,), dict(RunningCountProcessor.__dict__))
    schema = StructType(
        [StructField(key_col, LongType()), StructField("running_n", LongType())]
    )
    return events_stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType=schema,
        outputMode="Append",
        timeMode="None",
    )
