"""The end-to-end training-corpus pipeline as a LIBRARY API (SURVEY §2C
composition): clean → span dedup → near-dup clusters → leakage-safe split →
packing → sharding, each stage consuming only the previous stage's
survivors. ``q119_corpus_pipeline`` (plans/queries.py) runs this verbatim
and value-hash-checks the whole chain against one SQL oracle at sf0.01 and
sf0.1 — a caller gets the same audited semantics with knobs.

Stage frames are returned individually (not just the ledger) so a real
pipeline can materialize any of them; barriers (`localCheckpoint`) sit
exactly where a frame feeds multiple consumers, so no stage's subtree is
recomputed per consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup as D
from .sharding import knuth_bucket, shard_export, two_level_cumsum


def corpus_pipeline(
    docs: DataFrame,
    min_tokens: int = 8,
    span_tokens: int = 8,
    span_dup_max: float = 0.5,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.05,
    max_shingle_freq: int | None = None,
    train_pct: int = 90,
    pack_tokens: int = 2048,
    n_shards: int = 8,
) -> dict[str, DataFrame]:
    """Returns the stage frames ``{clean, kept, reps, train, bins, shards,
    ledger}``. ``max_shingle_freq`` is the stop-shingle skew cap (q104's
    production form) — default None because the span stage has already
    removed boilerplate, the cap's usual target."""
    raw = docs.select("doc_id", "source", "text", "n_chars")
    n_tok_sp = F.size(F.split(F.lower(F.col("text")), " "))
    clean = (
        raw.withColumn("n_tok_sp", n_tok_sp)
        .filter(F.col("n_tok_sp") >= min_tokens)
        .localCheckpoint(eager=False)  # feeds span stats + kept join + ledger
    )

    frac = D.dup_span_stats(clean, span_tokens=span_tokens).select(
        "doc_id", "dup_frac"
    )
    kept = (
        clean.join(frac, "doc_id")
        .filter(F.col("dup_frac") <= span_dup_max)
        .drop("dup_frac")
        .localCheckpoint(eager=False)  # feeds pair graph + ledgers
    )

    pairs = D.jaccard_pairs(
        kept,
        k=shingle_k,
        threshold=jaccard_threshold,
        max_shingle_freq=max_shingle_freq,
    )
    clusters = D.dup_clusters(pairs)
    labeled = kept.join(clusters, "doc_id", "left").withColumn(
        "cluster", F.coalesce("cluster_id", "doc_id")
    )
    reps = labeled.filter(F.col("doc_id") == F.col("cluster")).localCheckpoint(
        eager=False
    )  # feeds train + ledger (the kept⋈clusters join runs once, not twice)
    train = (
        reps.filter(knuth_bucket(F.col("cluster"), 100) < train_pct)
        .withColumn("n_tok_ws", F.size(F.split(F.trim("text"), r"\s+")))
        .localCheckpoint(eager=False)  # feeds packing + sharding + ledger
    )

    # packing cumsum via the exact two-level decomposition — a naive
    # per-source window would sort each source in ONE task (parallelism =
    # n_sources at 100 TB); identical bin ids, audited sort width
    bins = (
        two_level_cumsum(train, "source", "doc_id", "n_tok_ws")
        .withColumn("bin", F.floor(F.col("cum_excl") / F.lit(pack_tokens)))
        .groupBy("source", "bin")
        .agg(F.sum("n_tok_ws").alias("bt"))
    )
    shards = shard_export(train.select("doc_id", "n_chars"), n_shards=n_shards)

    def ledger(df: DataFrame, stage: str, checksum: F.Column) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
            checksum.cast("long").alias("checksum"),
        )

    full_ledger = (
        ledger(raw, "00_raw", F.sum("n_chars"))
        .unionByName(ledger(clean, "01_quality", F.sum("n_chars")))
        .unionByName(ledger(kept, "02_span_dedup", F.sum("n_chars")))
        .unionByName(ledger(reps, "03_neardup_reps", F.sum("n_chars")))
        .unionByName(ledger(train, "04_train_split", F.sum("n_chars")))
        .unionByName(ledger(bins, "05_packed", F.sum("bt")))
        .unionByName(ledger(shards, "06_shards", F.sum("order_sig")))
    )
    return {
        "clean": clean,
        "kept": kept,
        "reps": reps,
        "train": train,
        "bins": bins,
        "shards": shards,
        "ledger": full_ledger,
    }
