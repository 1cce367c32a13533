"""Offset resolution + sequence-gap checks (A3, A23).

The reference resolves its resume position at task start
(OracleSourceTask2.java:137-192): last stored ``{scnposition,
commitscnposition, rowid}`` → rewind to the containing log's FIRST_CHANGE# →
``start.scn`` override → ``reset.offset`` → else CURRENT_SCN. On Spark,
Structured Streaming checkpoints already resume the *source* exactly; this
module provides the same explicit policy for batch/replay runs over archived
redo (where the caller owns the lower bound), plus the reference's log-gap
detection (LogMinerThread2.java:144-148) as a data-quality operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..config import EngineConfig


@dataclass(frozen=True)
class ResolvedOffset:
    scn: int
    source: str  # "stored" | "start_scn" | "reset" | "earliest"


def resolve_start_scn(
    config: EngineConfig,
    stored_scn: int | None,
    current_scn: int | None = None,
) -> ResolvedOffset:
    """A3 policy, in the reference's precedence order:

    1. stored offset (resume; OracleSourceTask2.java:137-150)
    2. ``start.scn`` config override (:168-173)
    3. ``reset.offset`` → jump to current head (:175-180)
    4. else: earliest (batch replay reads everything; the reference's
       CURRENT_SCN probe :182-192 maps to "head" only for live streams)
    """
    if config.reset_offset and current_scn is not None:
        return ResolvedOffset(current_scn, "reset")
    if config.start_scn:
        return ResolvedOffset(int(config.start_scn), "start_scn")
    if stored_scn is not None:
        return ResolvedOffset(stored_scn, "stored")
    return ResolvedOffset(0, "earliest")


def sequence_gap_check(redo: DataFrame) -> DataFrame:
    """A23 analog: the reference breaks its mining loop when the log
    sequence number (RBASQN) jumps by more than 1 (LogMinerThread2.java:144-148),
    re-discovering log files. With gapless sources (Kafka offsets) this
    becomes a data-quality assertion: return the gap rows (empty = healthy).
    """
    w = Window.orderBy("scn")
    prev = F.lag("rbasqn").over(w)
    return (
        redo.select("scn", "rbasqn")
        .withColumn("_prev_rbasqn", prev)
        .filter(F.col("_prev_rbasqn").isNotNull() & ((F.col("rbasqn") - F.col("_prev_rbasqn")) > 1))
        .select(
            F.col("scn"),
            F.col("_prev_rbasqn").alias("prev_rbasqn"),
            F.col("rbasqn").alias("next_rbasqn"),
        )
    )
