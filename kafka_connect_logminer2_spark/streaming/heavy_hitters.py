"""Continuously-maintained heavy-hitter n-grams — the boilerplate-discovery
pass (q135) kept fresh over a document stream, with BOUNDED sketch state at
any vocabulary size.

Why this is streamable at all: Misra-Gries summaries are MERGEABLE
(Agarwal et al., "Mergeable Summaries", PODS 2012) — adding two summaries'
counters and re-truncating to capacity k yields a valid MG(k) summary of
the combined stream, with total undercount ≤ N/(k+1). That makes the
per-batch summary an ADDITIVE delta: the store never needs a parent read
or a join on the write path, exactly like the decayed counters.

Store layout (the shared delta-chain skeleton, corpus_ingest):

* ``{root}/counts`` — kind ``hh_counts``: ``b=<k>/v=<batch_id>`` segments
  of (gram, w) rows, bucketed by the gram hash. Each batch writes its OWN
  MG(cap) summary (≤ cap rows — per-partition weighted MG inside
  mapInPandas, one cap×partitions-row sum, one truncation), so write cost
  is O(cap) regardless of batch vocabulary. The chain read is a plain
  groupBy-sum (counter addition = valid MG merge without truncation);
  :func:`compact_heavy_hitters` folds chains AND re-truncates to cap, so
  compacted state is ≤ cap rows total while remaining a valid MG(cap)
  summary of the whole history.

* ``{root}/docs`` — kind ``hh_docs``: the raw document archive (the
  corpus an ingest pipeline retains anyway), appended per batch. The
  archive is what makes the MV's answer EXACT: candidates come from the
  sketch, counts come from one candidate-pruned recount pass — an
  approximate ALGORITHM with an exact ANSWER, the q135 discipline, which
  is what lets cdc30 pair with a plain GROUP BY/HAVING oracle.

Commit order is a correctness rule, not a convention: counts BEFORE docs.
A crash after the counts marker but before the docs marker leaves extra
sketch mass for documents no reader sees — harmless (candidates stay a
superset). The reverse order could archive documents whose grams never
reached the sketch, and a heavy gram from that batch could be MISSED by
the candidate set — a wrong (not just stale) answer.

Superset guarantee (cap ≥ denom, default 2·denom): for any gram with true
count c ≥ N/denom, the folded sketch weight w ≥ c − N/(cap+1), so
w·denom·(cap+1) ≥ N·(cap+1−denom) — the integer candidate rule
:func:`heavy_hitters_asof` applies before the exact recount.

Reference: no equivalent in the reference (its surface stops at CDC
envelopes); §2C curation surface, the streaming twin of q135.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.search import _mg_fold
from .corpus_ingest import (
    _committed_union,
    _ensure_meta,
    _note_row_schema,
    _write_delta,
    compact_chains,
)
from .snapshot import _mark_committed, _read_meta


def _counts_bucket(num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("gram")), F.lit(num_buckets)).cast("int")


def _docs_bucket(id_col: str, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")


def bigram_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One ``gram`` row per adjacent lowercase token pair — built with
    ZERO shuffles (adjacent-pair array transform; binding the token array
    once per row is the q135 lesson: a lambda that re-splits per element
    is O(tokens²))."""
    return docs.select(
        F.split(F.lower(F.col(text_col)), " ").alias("_a")
    ).select(
        F.explode(
            F.expr(
                "transform(slice(_a, 1, size(_a) - 1),"
                " (x, i) -> concat(x, ' ', _a[i + 1]))"
            )
        ).alias("gram")
    )


def _batch_summary(grams: DataFrame, cap: int) -> DataFrame:
    """The batch's own MG(cap) summary as a (gram, w) DataFrame with at
    most ``cap`` rows. Phase 1: per-partition weighted MG over the REAL
    gram strings (the store recounts by string, so the sketch must carry
    strings, unlike q135's hash-only candidates). Phase 2: one global sum
    of ≤ cap×partitions rows, then the mergeable-summaries truncation —
    subtract the (cap+1)-th largest weight from everything, drop ≤ 0."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        for b in batches:
            vc = b["gram"].value_counts()
            counter = _mg_fold(counter, vc.index.to_list(), vc.to_list(), cap)
        yield pd.DataFrame(
            {"gram": list(counter.keys()),
             "w": pd.Series(list(counter.values()), dtype="int64")}
        )

    summed = (
        grams.mapInPandas(sketch, schema="gram string, w long")
        .groupBy("gram")
        .agg(F.sum("w").alias("w"))
    )
    summed = summed.localCheckpoint()  # ≤ cap × partitions rows
    # ONE TakeOrdered job answers both questions the truncation needs:
    # are there more than cap rows (count of the top cap+1), and what is
    # the (cap+1)-th largest weight (their min) — the separate count()
    # job the old shape paid per batch is gone
    top = (
        summed.orderBy(F.desc("w"), "gram")
        .limit(cap + 1)
        .agg(F.count(F.lit(1)).alias("n"), F.min("w").alias("m"))
        .first()
    )
    if top["n"] > cap:
        m = top["m"]
        summed = summed.filter(F.col("w") > m).select(
            "gram", (F.col("w") - F.lit(m)).alias("w")
        )
    return summed


def hh_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    root: str,
    capacity: int = 1600,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialized: bool = False,
) -> None:
    """One fold (public foreachBatch body): land the batch's MG summary as
    counts deltas, then archive the batch's documents. Retry-idempotent —
    both writes overwrite only their own ``v=<batch_id>`` segments, and
    the summary is deterministic up to MG-validity (any replay's summary
    obeys the same deficit bound, and the recount makes the answer
    identical either way). Pass ``materialized=True`` when the caller
    already localCheckpointed the batch (write_summary_suite) so the two
    consumers here don't pay a SECOND eager materialization."""
    counts_dir, docs_dir = f"{root}/counts", f"{root}/docs"
    _ensure_meta(
        counts_dir,
        {"kind": "hh_counts", "capacity": capacity, "num_buckets": num_buckets},
    )
    _ensure_meta(
        docs_dir,
        {"kind": "hh_docs", "num_buckets": num_buckets,
         "text_col": text_col, "id_col": id_col},
    )
    _note_row_schema(counts_dir, "gram string, w bigint")
    _note_row_schema(
        docs_dir,
        f"{id_col} {batch.schema[id_col].dataType.simpleString()}, "
        f"{text_col} string",
    )
    batch = batch.select(id_col, text_col)
    if not materialized:
        batch = batch.localCheckpoint()
    summary = _batch_summary(bigram_rows(batch, text_col), capacity)
    _write_delta(
        summary.withColumn("_b", _counts_bucket(num_buckets)),
        counts_dir,
        batch_id,
    )
    _mark_committed(counts_dir, batch_id)
    _write_delta(
        batch.withColumn("_b", _docs_bucket(id_col, num_buckets)),
        docs_dir,
        batch_id,
    )
    _mark_committed(docs_dir, batch_id)


def write_heavy_hitters(
    doc_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    capacity: int = 1600,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chain: int | None = 64,
    trigger_available_now: bool = True,
):
    """Maintain the heavy-hitter sketch + document archive over a
    streaming source. ``max_chain`` self-schedules PROTECTED in-line
    compaction of the counts store (the replay-safety contract every
    streaming writer here follows); the docs archive is append-only and
    is never folded."""

    def process(batch: DataFrame, batch_id: int) -> None:
        hh_batch_step(
            batch.sparkSession,
            batch,
            batch_id,
            root,
            capacity=capacity,
            num_buckets=num_buckets,
            text_col=text_col,
            id_col=id_col,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(
                batch.sparkSession,
                f"{root}/counts",
                max_chain=max_chain,
                protect=batch_id,
            )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_state(spark: SparkSession, root: str) -> DataFrame | None:
    """The folded (gram, w) sketch — a valid MG(cap) summary of every
    committed batch (groupBy-sum of the chain; counter addition is a
    valid merge, truncation only ever happens at write/compact time)."""
    rows = _committed_union(spark, f"{root}/counts")
    if rows is None:
        return None
    return rows.groupBy("gram").agg(F.sum("w").alias("w"))


def heavy_hitters_asof(
    spark: SparkSession, root: str, denom: int = 800
) -> DataFrame | None:
    """The EXACT heavy hitters of everything committed: all bigrams with
    count × denom ≥ total, with exact counts — (bigram, n), the q135
    output shape. Candidates come from the sketch via the integer
    superset rule w·denom·(cap+1) ≥ N·(cap+1−denom); counts come from one
    candidate-pruned pass over the archive (broadcast semi-join — the
    full-vocabulary exchange never happens)."""
    meta = _read_meta(f"{root}/counts") or {}
    cap = meta.get("capacity", 1600)
    if cap < denom:
        raise ValueError(
            f"store capacity {cap} < denom {denom}: the sketch cannot "
            "guarantee a candidate superset at this threshold"
        )
    docs = _committed_union(spark, f"{root}/docs")
    state = sketch_state(spark, root)
    if docs is None or state is None:
        return None
    text_col = (_read_meta(f"{root}/docs") or {}).get("text_col", "text")
    grams = bigram_rows(docs, text_col).localCheckpoint(eager=False)
    total = grams.count()
    if total == 0:
        return spark.createDataFrame([], "bigram string, n bigint")
    # threshold computed DRIVER-SIDE in Python big-int arithmetic:
    # w·denom·(cap+1) ≥ N·(cap+1−denom)  ⇔  w ≥ ceil(N·(cap+1−denom) /
    # (denom·(cap+1))) for integer w — the in-plan product form would
    # silently wrap 64-bit once N exceeds ~2^63/(denom·(cap+1)) (≈7e12
    # grams at the defaults, i.e. exactly the advertised scale) and start
    # DROPPING true heavy hitters (self-review r9 finding)
    thr = -(-(total * (cap + 1 - denom)) // (denom * (cap + 1)))
    cands = state.filter(F.col("w") >= F.lit(thr)).select(
        F.col("gram").alias("bigram")
    )
    return (
        grams.select(F.col("gram").alias("bigram"))
        .join(F.broadcast(cands), "bigram", "left_semi")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        # same overflow-safe ceil form: n·denom ≥ N ⇔ n ≥ ceil(N/denom)
        .filter(F.col("n") >= F.lit(-(-total // denom)))
    )


def compact_heavy_hitters(
    spark: SparkSession, counts_dir: str, protect: int | None = None
) -> int | None:
    """Fold the counts chains to one segment per bucket AND re-truncate
    the merged summary to capacity (the mergeable-summaries rule), so
    compacted sketch state is ≤ cap rows total no matter how many batches
    ran. Truncation changes stored weights (never upward), but every
    intermediate state is a valid MG(cap) summary, so the candidate rule
    keeps its superset guarantee and :func:`heavy_hitters_asof` returns
    the identical exact answer before and after (test-pinned). Takes the
    ``{root}/counts`` dir itself (the maintain_store dispatch unit)."""
    meta = _read_meta(counts_dir) or {}
    cap = meta.get("capacity", 1600)
    nb = meta.get("num_buckets", 8)

    def fold(df: DataFrame) -> DataFrame:
        merged = df.groupBy("gram").agg(F.sum("w").alias("w"))
        merged = merged.localCheckpoint()
        # fused size-probe + threshold (same one-job shape as
        # _batch_summary): count>cap ⇔ the top cap+1 slice holds cap+1 rows
        top = (
            merged.orderBy(F.desc("w"), "gram")
            .limit(cap + 1)
            .agg(F.count(F.lit(1)).alias("n"), F.min("w").alias("m"))
            .first()
        )
        if top["n"] > cap:
            m = top["m"]
            merged = merged.filter(F.col("w") > m).select(
                "gram", (F.col("w") - F.lit(m)).alias("w")
            )
        return merged.withColumn("_b", _counts_bucket(nb))

    return compact_chains(
        spark,
        counts_dir,
        _counts_bucket(nb),
        fold=fold,
        force_single=True,
        protect=protect,
    )
