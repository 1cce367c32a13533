"""Mergeable-sketch materialized views: a deterministic bottom-k sample
and per-group HLL distinct-count sketches, each continuously maintained
over a document stream on the shared delta-chain store skeleton.

These complete the streaming summary family (counts: decayed.py, heavy
hitters: heavy_hitters.py) with the two other summaries a training-data
pipeline keeps warm over an ingest stream:

* **bottom-k sample** — THE reproducible corpus sample ("give me 10k
  uniformly sampled docs of everything ingested so far"). The key insight
  is that a bottom-k sample by a FIXED hash is a mergeable summary with an
  EXACT merge: bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)). Per
  batch the store gains only the batch's own k smallest rows (O(k) write,
  distributed TakeOrdered — never a global sort), the read is one k-row
  fold, and the result is VALUE-EXACT against ``ORDER BY hash LIMIT k``
  over the full corpus — a real oracle, not a distribution gate. The hash
  is the engine-portable md5 60-bit prefix (md5_bucket's big sibling), so
  DuckDB lands on the identical sample.

* **HLL distinct sketches** — per-group distinct counts (the q146 rollup)
  maintained incrementally: per batch ONE (group, sketch) row per touched
  group (hll_sketch_agg, lgK pinned in _meta), fold/read by
  hll_union_agg. HLL registers merge by max, so streaming adds
  essentially no error over the one-shot sketch — *essentially*, not
  byte-for-byte: datasketches unions can shift an estimate by ±1 at
  sparse/dense mode transitions (measured: a 60-sketch union said 501
  where the 20-sketch post-compaction union said 500), so contracts gate
  on tolerance (±5% vs exact), never on estimate equality.

Both stores follow the replay-safety contract: versioned retry-idempotent
``b=/v=`` segments, commit markers, PROTECTED in-line compaction via
``maintain_store`` (kinds ``bottomk`` / ``hll_sketch``).

Reference: no equivalent in the reference (its surface stops at CDC
envelopes); §2C curation surface — streaming twins of q141/q125 (sampling)
and q146 (sketch rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .corpus_ingest import (
    _committed_union,
    _ensure_meta,
    _note_row_schema,
    _write_delta,
    compact_chains,
)
from .snapshot import _mark_committed, _read_meta


def sample_key(id_col: str) -> F.Column:
    """Engine-portable 60-bit uniform key: the first 15 hex digits of
    md5(id as string) — 15, not 16, so the value always fits a SIGNED
    64-bit int on every engine (16 digits can exceed 2^63)."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def sample_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`sample_key` — same md5 prefix, same width."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def _id_bucket(id_col: str, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------- bottom-k


def bottomk_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    k: int = 1000,
    num_buckets: int = 8,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> None:
    """One fold: land the batch's own k smallest (skey, id, payload) rows
    as delta segments. bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B),
    so the chain read loses nothing; a replayed batch overwrites its own
    deterministic segment (the key is a pure hash of the id)."""
    _ensure_meta(
        store_dir,
        {"kind": "bottomk", "k": k, "num_buckets": num_buckets,
         "id_col": id_col, "payload_cols": list(payload_cols)},
    )
    cols = [id_col, *payload_cols]
    _note_row_schema(
        store_dir,
        "skey bigint, "
        + ", ".join(f"{c} {batch.schema[c].dataType.simpleString()}" for c in cols),
    )
    delta = (
        batch.select(sample_key(id_col).alias("skey"), *cols)
        .orderBy("skey", id_col)
        .limit(k)
    )
    _write_delta(
        delta.withColumn("_b", _id_bucket(id_col, num_buckets)),
        store_dir,
        batch_id,
    )
    _mark_committed(store_dir, batch_id)


def sample_asof(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The k corpus-wide smallest-hash rows over everything committed —
    value-identical to ``ORDER BY skey, id LIMIT k`` over the full ingested
    history (the exact-merge property of bottom-k)."""
    meta = _read_meta(store_dir) or {}
    k = meta.get("k", 1000)
    id_col = meta.get("id_col", "doc_id")
    rows = _committed_union(spark, store_dir)
    if rows is None:
        return None
    return rows.orderBy("skey", id_col).limit(k)


def compact_bottomk(
    spark: SparkSession, store_dir: str, protect: int | None = None
) -> int | None:
    """Fold every chain into the GLOBAL bottom-k (≤ k rows total after a
    full fold) — the sample never needs more than k rows of state."""
    meta = _read_meta(store_dir) or {}
    k = meta.get("k", 1000)
    nb = meta.get("num_buckets", 8)
    id_col = meta.get("id_col", "doc_id")

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.orderBy("skey", id_col)
            .limit(k)
            .withColumn("_b", _id_bucket(id_col, nb))
        )

    return compact_chains(
        spark, store_dir, _id_bucket(id_col, nb), fold=fold,
        force_single=True, protect=protect,
    )


def write_bottomk_sample(
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    k: int = 1000,
    num_buckets: int = 8,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
    max_chain: int | None = 64,
    trigger_available_now: bool = True,
):
    """Maintain the deterministic corpus sample over a streaming source,
    with PROTECTED in-line compaction (the replay-safety contract)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        bottomk_batch_step(
            batch.sparkSession, batch, batch_id, store_dir,
            k=k, num_buckets=num_buckets, id_col=id_col,
            payload_cols=payload_cols,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(
                batch.sparkSession, store_dir, max_chain=max_chain,
                protect=batch_id,
            )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------- HLL


def hll_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    group_col: str = "source",
    value_col: str = "text",
    lg_k: int = 12,
    num_buckets: int = 8,
) -> None:
    """One fold: per touched group, ONE (group, sketch) delta row
    (hll_sketch_agg over the batch's values). Registers merge by max, so
    the chain's hll_union_agg matches the one-shot sketch of the union up
    to datasketches mode-transition jitter (±1; see module docstring)."""
    _ensure_meta(
        store_dir,
        {"kind": "hll_sketch", "group_col": group_col, "value_col": value_col,
         "lg_k": lg_k, "num_buckets": num_buckets},
    )
    _note_row_schema(
        store_dir,
        f"{group_col} {batch.schema[group_col].dataType.simpleString()}, sk binary",
    )
    delta = batch.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
    )
    _write_delta(
        delta.withColumn("_b", _id_bucket(group_col, num_buckets)),
        store_dir,
        batch_id,
    )
    _mark_committed(store_dir, batch_id)


def distinct_estimates(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Per-group distinct estimates over everything committed, plus the
    cross-group union under the reserved group ``__all__`` (sketch algebra
    — the corpus is never re-scanned)."""
    meta = _read_meta(store_dir) or {}
    group_col = meta.get("group_col", "source")
    rows = _committed_union(spark, store_dir)
    if rows is None:
        return None
    per_group = rows.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    overall = rows.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(F.lit("__all__").alias(group_col), "est")
    return per_group.unionByName(overall)


def compact_hll(
    spark: SparkSession, store_dir: str, protect: int | None = None
) -> int | None:
    """Fold each group's sketch chain into one row (hll_union_agg) — state
    is O(groups) sketches after a full fold, independent of batch count.
    Crash-safety of this non-idempotent-looking fold is the compact_chains
    ``_FOLD``-marker contract (union with a leftover pre-fold segment
    cannot happen); the union itself is idempotent anyway (register max)."""
    meta = _read_meta(store_dir) or {}
    group_col = meta.get("group_col", "source")
    nb = meta.get("num_buckets", 8)

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(group_col)
            .agg(F.hll_union_agg("sk").alias("sk"))
            .withColumn("_b", _id_bucket(group_col, nb))
        )

    return compact_chains(
        spark, store_dir, _id_bucket(group_col, nb), fold=fold,
        force_single=True, protect=protect,
    )


def write_hll_sketches(
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    group_col: str = "source",
    value_col: str = "text",
    lg_k: int = 12,
    num_buckets: int = 8,
    max_chain: int | None = 64,
    trigger_available_now: bool = True,
):
    """Maintain per-group HLL distinct sketches over a streaming source,
    with PROTECTED in-line compaction (the replay-safety contract)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        hll_batch_step(
            batch.sparkSession, batch, batch_id, store_dir,
            group_col=group_col, value_col=value_col, lg_k=lg_k,
            num_buckets=num_buckets,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(
                batch.sparkSession, store_dir, max_chain=max_chain,
                protect=batch_id,
            )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------- histogram


def _bin_col(value_col: str, lo: float, width: float, n_bins: int) -> F.Column:
    """Clamped equi-width bin index. IEEE double subtraction/division are
    exactly rounded and identical on JVM and DuckDB, so the SAME doubles
    land in the SAME bins on both engines — what makes the histogram (and
    therefore the quantile answer) exactly relational, unlike every other
    sketch here."""
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def hist_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 200,
    num_buckets: int = 8,
) -> None:
    """One additive fold: the batch's per-bin counts (≤ n_bins rows) land
    as delta segments. Pure counter addition — no parent read, no join,
    state bounded by n_bins at any corpus size (the q24 percentile
    question kept warm with fixed-width error instead of a re-sort)."""
    width = (hi - lo) / n_bins
    _ensure_meta(
        store_dir,
        {"kind": "hist", "value_col": value_col, "lo": lo, "hi": hi,
         "n_bins": n_bins, "num_buckets": num_buckets},
    )
    _note_row_schema(store_dir, "bin int, c bigint")
    delta = (
        batch.filter(F.col(value_col).isNotNull())
        .select(_bin_col(value_col, lo, width, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    _write_delta(
        delta.withColumn("_b", _id_bucket("bin", num_buckets)),
        store_dir,
        batch_id,
    )
    _mark_committed(store_dir, batch_id)


def hist_asof(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The folded (bin, c) histogram over everything committed."""
    rows = _committed_union(spark, store_dir)
    if rows is None:
        return None
    return rows.groupBy("bin").agg(F.sum("c").alias("c"))


def quantiles_asof(
    spark: SparkSession, store_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame | None:
    """Per requested quantile: the bin holding the rank-ceil(q·N) value
    (1-indexed, interpolation-free), its [bin_lo, bin_hi) edges, and the
    cumulative count — every output value integer- or
    exact-double-derivable, so the whole answer is oracle-exact; the
    true quantile is guaranteed inside [bin_lo, bin_hi) (error ≤ one bin
    width by construction). One window over ≤ n_bins rows."""
    from pyspark.sql import Window

    meta = _read_meta(store_dir) or {}
    lo, hi = meta.get("lo", 0.0), meta.get("hi", 1000.0)
    n_bins = meta.get("n_bins", 200)
    width = (hi - lo) / n_bins
    h = hist_asof(spark, store_dir)
    if h is None:
        return None
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("bin", "c", F.sum("c").over(w).alias("cum")).localCheckpoint()
    total = cum.agg(F.max("cum")).first()[0] or 0
    spec = spark.createDataFrame([(q,) for q in qs], "q double").withColumn(
        "target", F.ceil(F.col("q") * F.lit(total)).cast("long")
    )
    # smallest bin whose cumulative count reaches the target rank
    joined = spec.join(cum, cum["cum"] >= spec["target"], "left")
    return (
        joined.groupBy("q", "target")
        .agg(F.min("bin").alias("bin"))
        .join(cum, "bin")
        .select(
            "q",
            "target",
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.col("cum").alias("cum_n"),
            F.lit(total).alias("n_total"),
        )
        .orderBy("q")
    )


def compact_hist(
    spark: SparkSession, store_dir: str, protect: int | None = None
) -> int | None:
    """Fold each bin's chain by summation — ≤ n_bins rows total after a
    full fold (the additive-fold crash-safety is compact_chains' _FOLD
    marker contract, same as the decayed counters)."""
    nb = (_read_meta(store_dir) or {}).get("num_buckets", 8)

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("bin")
            .agg(F.sum("c").alias("c"))
            .withColumn("_b", _id_bucket("bin", nb))
        )

    return compact_chains(
        spark, store_dir, _id_bucket("bin", nb), fold=fold,
        force_single=True, protect=protect,
    )


def write_histogram(
    event_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 200,
    num_buckets: int = 8,
    max_chain: int | None = 64,
    trigger_available_now: bool = True,
):
    """Maintain the equi-width histogram over a streaming source, with
    PROTECTED in-line compaction (the replay-safety contract)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        hist_batch_step(
            batch.sparkSession, batch, batch_id, store_dir,
            value_col=value_col, lo=lo, hi=hi, n_bins=n_bins,
            num_buckets=num_buckets,
        )
        if max_chain is not None:
            from .maintenance import maintain_store

            maintain_store(
                batch.sparkSession, store_dir, max_chain=max_chain,
                protect=batch_id,
            )

    writer = event_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------------- summary suite


def write_summary_suite(
    doc_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    hh_capacity: int = 1600,
    sample_k: int = 100,
    lg_k: int = 12,
    hist_bins: int = 40,
    hist_hi: float = 200.0,
    num_buckets: int = 8,
    max_chain: int = 4,
    trigger_available_now: bool = True,
):
    """ONE document stream maintaining the WHOLE summary family per
    micro-batch — heavy-hitter bigrams (+ doc archive), per-source HLL
    distinct sketches, the deterministic bottom-k sample, and a
    token-count histogram — then ONE :func:`maintenance.maintain_stores`
    sweep over all of them with ``protect_last=True`` (each store's
    newest committed batch is the one just written, so the sweep is
    replay-safe exactly like per-store in-line maintenance). This is the
    realistic deployment shape: a corpus ingest keeps ALL its health
    summaries warm from a single pass over each batch, and one policy
    sweep bounds every store's chains."""
    from ..functions.text import token_count
    from .heavy_hitters import hh_batch_step
    from .maintenance import maintain_stores

    dirs = {
        "hh": root + "/hh",
        "hll": root + "/hll",
        "sample": root + "/sample",
        "hist": root + "/hist",
    }

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint()  # four consumers, one materialization
        hh_batch_step(
            spark, batch, batch_id, dirs["hh"],
            capacity=hh_capacity, num_buckets=num_buckets,
            materialized=True,
        )
        hll_batch_step(
            spark, batch, batch_id, dirs["hll"],
            lg_k=lg_k, num_buckets=num_buckets,
        )
        bottomk_batch_step(
            spark, batch, batch_id, dirs["sample"],
            k=sample_k, num_buckets=num_buckets,
        )
        hist_batch_step(
            spark,
            batch.select(token_count(F.col("text")).cast("double").alias("value")),
            batch_id,
            dirs["hist"],
            lo=0.0, hi=hist_hi, n_bins=hist_bins, num_buckets=num_buckets,
        )
        maintain_stores(
            spark,
            [dirs["hh"] + "/counts", dirs["hll"], dirs["sample"], dirs["hist"]],
            max_chain=max_chain,
            protect_last=True,
        )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
