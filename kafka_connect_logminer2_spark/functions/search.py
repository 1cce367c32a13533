"""Full-text search and frequency-sketch operators over the corpus —
positional inverted index + phrase search, and exact heavy hitters via a
per-partition Misra-Gries sketch with an exact recount pass.

Both are SURVEY §2C training-data extensions a 100 TB corpus pipeline
needs: phrase search drives targeted decontamination / leakage audits
("which documents contain this eval prompt verbatim?"), and heavy hitters
finds boilerplate n-grams (nav bars, cookie banners, license headers)
worth stripping before training — at corpus scale the full n-gram
vocabulary is too large to shuffle, which is exactly what the sketch pass
avoids.

Scale design:
- Postings shuffle fixed-width rows only: (doc_id, term_idx tinyint, pos
  int) for one-shot phrase search, (term_hash, doc_id, pos) for a
  persisted index — token text never crosses an exchange.
- Phrase matching is ONE exchange: conditional position collects per
  phrase term inside a single groupBy(doc_id), then a JVM-side
  array_intersect of shifted position arrays. No self-join chain, no
  per-term shuffle.
- Misra-Gries runs inside mapInPandas with Arrow-batched pandas
  value_counts doing the heavy counting in C; the Python dict only sees
  (distinct-item, weight) pairs per batch. Each partition emits at most
  `capacity` candidates, so the merge step moves capacity × partitions
  rows instead of the vocabulary. The recount pass broadcasts the
  candidate set and re-counts exactly, so the final answer is EXACT
  (sketch superset guarantee: an item absent from every partition's
  output has global count < N/(capacity+1) < threshold), which is why
  q135 can be oracle-paired despite using a sketch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# positional inverted index + phrase search
# ---------------------------------------------------------------------------


def positional_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build positional postings ``(h, doc_id, pos)`` — the persisted
    inverted-index form. Terms are 64-bit-hashed BEFORE the implicit
    exchange of any downstream groupBy/bucketed write, so index
    construction shuffles fixed-width rows only (same discipline as
    q116's unigram LM). Positions are 1-based."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos0", "tok"),
    ).select(
        F.xxhash64("tok").alias("h"),
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
    )


def _shift(col: F.Column, k: int) -> F.Column:
    """``transform(col, x -> x - k)``. A separate helper because a
    ``lambda x, k=i:`` default-arg closure silently becomes the
    two-parameter ``(element, index)`` form of ``F.transform`` — the
    index, not the intended constant, lands in ``k``."""
    return F.transform(col, lambda x: x - F.lit(k))


def phrase_match_counts(
    docs: DataFrame, phrase: list[str], text_col: str = "text"
) -> DataFrame:
    """Exact token-boundary phrase search: per-document count of
    occurrences of ``phrase`` (consecutive tokens, case-folded). Returns
    only matching docs: ``(doc_id, n_matches)``.

    Plan shape: a conjunctive substring pre-filter on the STORED text
    column (a doc lacking any term as a substring cannot match; this
    row-level prune runs at the scan, BEFORE posexplode multiplies rows
    ~tokens-per-doc-fold) → posexplode → IN-filter to exactly the
    phrase's terms → ONE groupBy(doc_id) with a conditional
    position-collect per term → array_intersect of shifted arrays.
    Total exchange cost: one fixed-width shuffle of only the
    phrase-term postings of candidate documents."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [t.lower() for t in phrase]
    for t in set(terms):
        docs = docs.filter(F.lower(F.col(text_col)).contains(t))
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "tok"),
    ).filter(F.col("tok").isin(*set(terms)))
    # conditional collects: positions of term i (duplicate phrase terms
    # share the same position set; the shifted intersect still works)
    aggs = [
        F.collect_list(F.when(F.col("tok") == t, F.col("pos"))).alias(f"_p{i}")
        for i, t in enumerate(terms)
    ]
    g = toks.groupBy("doc_id").agg(*aggs)
    hits = F.col("_p0")
    for i in range(1, len(terms)):
        hits = F.array_intersect(hits, _shift(F.col(f"_p{i}"), i))
    return (
        g.select("doc_id", F.size(hits).cast("long").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def phrase_match_counts_indexed(
    postings: DataFrame, phrase: list[str], spark=None
) -> DataFrame:
    """Same answer as :func:`phrase_match_counts` but over a prebuilt
    postings table (``positional_postings`` output, typically persisted
    and bucketed by ``h``). The filter is on the 64-bit term hashes —
    computed engine-side here via a literal one-row projection so the
    client never needs to replicate xxhash64 — and prunes to the phrase's
    posting lists before the single groupBy(doc_id) exchange."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [t.lower() for t in phrase]
    sess = spark or postings.sparkSession
    hashes = (
        sess.range(1)
        .select([F.xxhash64(F.lit(t)).alias(f"h{i}") for i, t in enumerate(terms)])
        .collect()[0]
    )
    h_of = {t: hashes[f"h{i}"] for i, t in enumerate(terms)}
    sub = postings.filter(F.col("h").isin(*set(h_of.values())))
    aggs = [
        F.collect_list(F.when(F.col("h") == h_of[t], F.col("pos"))).alias(f"_p{i}")
        for i, t in enumerate(terms)
    ]
    g = sub.groupBy("doc_id").agg(*aggs)
    hits = F.col("_p0")
    for i in range(1, len(terms)):
        hits = F.array_intersect(hits, _shift(F.col(f"_p{i}"), i))
    return (
        g.select("doc_id", F.size(hits).cast("long").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------


def _mg_fold(counter: dict, items, weights, capacity: int) -> dict:
    """Weighted Misra-Gries fold: add (item, weight) pairs; whenever the
    summary exceeds ``capacity`` entries, subtract the minimum count from
    every entry and drop the zeros (the classic decrement step,
    generalized to weighted updates). Guarantee: true_count - est ≤
    (total weight)/(capacity+1) for every item."""
    for it, w in zip(items, weights):
        counter[it] = counter.get(it, 0) + int(w)
        if len(counter) > capacity:
            dmin = min(counter.values())
            counter = {k: v - dmin for k, v in counter.items() if v > dmin}
    return counter


def heavy_hitters_exact(
    items: DataFrame, col: str, total: int, denom: int, capacity: int | None = None
) -> DataFrame:
    """EXACT frequency-threshold heavy hitters without a full-vocabulary
    shuffle: all items whose count × ``denom`` ≥ ``total`` (i.e. relative
    frequency ≥ 1/denom), with exact counts.

    Phase 1 (sketch): per-partition weighted Misra-Gries inside
    mapInPandas — per Arrow batch, pandas value_counts (C-speed) reduces
    the batch to (distinct, weight) pairs before the Python dict fold.
    Capacity defaults to 2·denom, so an item missed by EVERY partition
    has global count < total/(capacity+1) < total/denom: phase 1's union
    is a guaranteed superset of the true answer.
    Phase 2 (recount): broadcast the candidate set (≤ capacity ×
    partitions rows), semi-join, exact count, threshold filter — the
    result is exact, not approximate, which is what lets the caller pair
    it with a plain GROUP BY/HAVING oracle.

    At 100 TB this moves O(capacity × partitions) rows for phase 1 and
    only candidate-item postings for phase 2, vs a full-vocab exchange
    for the naive GROUP BY — the standard two-pass production pattern for
    boilerplate-n-gram discovery."""
    if total <= 0:
        raise ValueError("total must be positive")
    cap = int(capacity) if capacity is not None else 2 * denom
    if cap < denom:
        raise ValueError(
            f"capacity {cap} < denom {denom} breaks the superset guarantee"
        )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        for b in batches:
            vc = b["_h"].value_counts()
            counter = _mg_fold(counter, vc.index.to_list(), vc.to_list(), cap)
        yield pd.DataFrame({"_h": pd.Series(list(counter.keys()), dtype="int64")})

    # sketch over the 64-bit item hash, not the item itself: Arrow moves
    # 8-byte ints instead of strings (the measured sf1 hot spot) and the
    # dict folds ints. Collisions only ADD mass to a hash slot, so the
    # slot count ≥ every colliding item's count — the superset guarantee
    # is preserved; phase 2 recounts by the REAL item value, so collisions
    # cannot corrupt the final answer, only admit an extra candidate.
    hashed = items.withColumn("_h", F.xxhash64(col))
    candidates = hashed.select("_h").mapInPandas(sketch, schema="_h long").distinct()
    return (
        hashed.join(F.broadcast(candidates), "_h", "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        # overflow-safe ceil form of n·denom ≥ total: the in-plan product
        # wraps 64-bit once total/denom-scale counts reach ~2^63/denom,
        # silently dropping true heavy hitters (self-review r9)
        .filter(F.col("n") >= F.lit(-(-total // denom)))
    )
