"""Relational Bloom filter — the membership PRE-SCREEN for history-wide
dedup at 100 TB.

The incremental ingest stores answer "have we seen this fingerprint?"
with an anti-join against the touched buckets' delta chains
(streaming/corpus_ingest.py). At cluster scale the cheap win before that
join is a Bloom pre-screen: a bitmap over the history's fingerprints that
is ~1.2 bytes/element at 1% FPR, MERGEABLE across shards/batches by
bitwise OR, and broadcastable — "definitely new" documents (the vast
majority of a fresh crawl) skip the store probe entirely; only
might-contain rows pay the exact anti-join. No false negatives means the
pre-screen can never drop a true duplicate on the floor — the exactness
of the pipeline is untouched.

Spark-first construction — the filter IS a DataFrame, not driver state:

* ``bloom_build``: k salted positions per value (engine-portable
  md5_bucket hashing — functions/sharding.py), positions fold to a
  ``(word_idx, bits)`` relation via one hash aggregate (bit_or of 32-bit
  set masks). m bits = m/32 rows ≈ KBs — broadcast-sized by
  construction, and two filters over the same (m, k) merge by
  word_idx-aligned bit_or (mergeable-sketch contract, like the HLL
  rollup q146);
* ``bloom_probe``: k exploded positions per row, broadcast-joined
  against the bitmap, one bool_and per row — map-side work only, no
  shuffle of the probed relation beyond the k-row explode and its
  partial aggregate.

Bit layout uses 32-bit words (mask = 2^bit as an exact double → long) so
the identical arithmetic runs in DuckDB (``1::BIGINT << bit``) without
signed-overflow divergence at bit 63 — the oracle reproduces the bitmap
and the probe bit-for-bit (q165).

Reference: no equivalent in the reference (§2C training-data surface);
the construction is the standard Bloom (1970) on DataFrame primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sharding import md5_bucket, md5_bucket_sql

WORD_BITS = 32


def _positions(
    df: DataFrame, col: F.Column, keep: list[str], num_bits: int, num_hashes: int
) -> DataFrame:
    """One row per (input row, hash i): the salted portable hash position
    ``md5(value || '#b' || i) % num_bits`` plus its word/bit split."""
    rows = df.select(
        *keep,
        col.alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("_i"),
    )
    p = md5_bucket(
        F.concat(F.col("_v"), F.lit("#b"), F.col("_i").cast("string")),
        num_bits,
    )
    return rows.select(
        *keep,
        F.floor(p / WORD_BITS).cast("long").alias("word_idx"),
        (p % WORD_BITS).cast("int").alias("bit"),
    )


def _mask() -> F.Column:
    # 2^bit is exact in a double for bit <= 31 (the WORD_BITS=32 layout's
    # whole point: no engine disagrees on the sign bit of 1<<63)
    return F.pow(F.lit(2.0), F.col("bit")).cast("long")


def bloom_build(
    df: DataFrame,
    col: F.Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Fold the values into the ``(word_idx long, bits long)`` bitmap
    relation. Distinct-safe by construction (bit_or is idempotent).
    Merge two filters of the same (num_bits, num_hashes) with
    :func:`bloom_merge`."""
    return (
        _positions(df, col, [], num_bits, num_hashes)
        .groupBy("word_idx")
        .agg(F.bit_or(_mask()).alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two bitmaps (same num_bits/num_hashes): the union filter —
    exactly the filter bloom_build would produce over the unioned values
    (test-pinned), so shard/batch-local filters roll up losslessly."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: F.Column,
    bloom: DataFrame,
    keep: list[str],
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """``keep`` columns + ``might_contain``: TRUE iff every one of the
    row's k bits is set. Guaranteed no false negatives (an inserted
    value's bits are set by construction); false positives at the
    standard (1 − e^(−kn/m))^k rate — the q165 gate measures it."""
    pos = _positions(df, col, keep, num_bits, num_hashes)
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(_mask()) != 0).alias(
        "_hit"
    )
    return (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .select(*keep, hit)
        .groupBy(*keep)
        .agg(F.bool_and("_hit").alias("might_contain"))
    )


def bloom_positions_sql(expr: str, num_bits: int, num_hashes: int) -> str:
    """DuckDB twin of :func:`_positions`' hash arithmetic: a FROM-clause
    fragment producing columns (word_idx, bit) per i in range(k)."""
    p = md5_bucket_sql(f"{expr} || '#b' || i", num_bits)
    return (
        f"SELECT *, ({p}) // {WORD_BITS} AS word_idx, "
        f"CAST(({p}) % {WORD_BITS} AS INTEGER) AS bit "
        f"FROM __SRC__, range({num_hashes}) t(i)"
    )
