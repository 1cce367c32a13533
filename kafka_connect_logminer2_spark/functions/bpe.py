"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the
iterative-algorithm member of the training-data family (q33's bpe_tokens
only APPLIES a regex approximation; a pipeline that ships its own corpus
ships its own merges).

Spark-first decomposition — the part that matters at 100 TB:

* the corpus is touched ONCE: one shuffle folds it to the distinct-word
  symbol table (word → char symbols + </w>, count). Everything after is
  vocab-sized, not corpus-sized — the same collapse real trainers
  (HuggingFace tokenizers, SentencePiece BPE) rely on, because merge
  decisions depend only on word *types* weighted by frequency;
* each merge round is one count-weighted pair aggregation over the word
  table + one Arrow-batched rewrite of the symbol arrays. Rounds are
  inherently sequential (merge i+1 counts pairs that merge i created —
  there is no legal fan-out across rounds), so the scale axis is the
  vocab-sized table staying distributed, never the round count;
* lineage is truncated per round (localCheckpoint) — without it round k
  replays k-1 rewrite UDFs and training goes quadratic in rounds, the
  classic iterative-Spark trap (same fix as functions/clustering.py).

Determinism: ties on pair count break by (left, right) lexicographic
ascending — pinned so the differential test against a from-scratch
pure-Python reference (tests/test_bpe.py) is exact, not approximate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (symbols array<string>, n long): distinct
    lowered whitespace words with counts, each word split to characters
    with the end-of-word marker appended (the marker keeps word-final
    merges distinct from word-internal ones — 'e' ending a word is a
    different symbol than 'e' inside one)."""
    return (
        docs.select(F.explode(F.split(F.lower(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.split("w", ""), F.array(F.lit(END))).alias("symbols"),
            "n",
        )
    )


def pair_counts(word_table: DataFrame) -> DataFrame:
    """Count-weighted adjacent-pair frequencies over the symbol table:
    (left, right, count). All occurrences inside a word count — including
    overlapping runs ('aaa' contributes (a,a) twice), matching the
    reference counting rule."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        word_table.select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("count"))
    )


def _merge_pair_udf(left: str, right: str):
    """Arrow-batched rewrite: merge every non-overlapping left-to-right
    (left, right) adjacency into one symbol — the same scan order the
    pure-Python reference uses, so 'aaa' under merge (a,a) becomes
    ['aa','a'] in both."""
    merged = left + right

    @pandas_udf("array<string>")
    def apply(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            res = []
            i, m = 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return apply


def _merge_loop_driver(
    words: dict[tuple, int], num_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The merge loop over an in-memory ``{symbols_tuple: count}`` vocab —
    semantics identical to the distributed loop (same pair counting incl.
    overlapping runs, same (count desc, left, right) tie-break, same
    non-overlapping left-to-right rewrite, same ``min_count`` early stop).
    Incremental: a round only touches words indexed under the merged pair,
    so cost per round is O(affected words), not O(vocab)."""
    from collections import Counter, defaultdict

    word_list = [list(s) for s in words]
    counts = list(words.values())
    pc: Counter = Counter()
    where: dict = defaultdict(set)  # pair -> word indices (may go stale)
    for i, syms in enumerate(word_list):
        n = counts[i]
        for p in zip(syms, syms[1:]):
            pc[p] += n
            where[p].add(i)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((left, right, int(cnt)))
        merged = left + right
        for i in where.pop((left, right), ()):  # stale ids no-op below
            syms, n = word_list[i], counts[i]
            for p in zip(syms, syms[1:]):
                pc[p] -= n
                if not pc[p]:
                    del pc[p]
            res: list[str] = []
            j, m = 0, len(syms)
            while j < m:
                if j + 1 < m and syms[j] == left and syms[j + 1] == right:
                    res.append(merged)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            word_list[i] = res
            for p in zip(res, res[1:]):
                pc[p] += n
                where[p].add(i)
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_count: int = 2,
    max_driver_vocab: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    [(left, right, count_at_merge_time)] in merge order. Stops early when
    the best pair's count falls below ``min_count`` (merging hapax pairs
    memorizes the corpus instead of compressing it).

    Two regimes, split by VOCAB size (never corpus size — the corpus is
    always folded to the distinct-word count table in one distributed
    pass first):

    * vocab ≤ ``max_driver_vocab``: the merge loop runs IN MEMORY on the
      collected word-count table — the architecture real trainers
      (HuggingFace tokenizers, SentencePiece) use, because merge
      decisions depend only on word types × frequency. This removes the
      2-jobs-per-round scheduler latency of the distributed loop (a real
      8k-merge vocabulary would otherwise pay 16k sequential Spark jobs
      of pure latency). The collect is bounded by ``limit(cap + 1)``.
    * vocab > ``max_driver_vocab`` (or cap = 0/None): the distributed
      loop — driver state stays O(num_merges); the top pair comes back
      via orderBy(...).limit(1) (a tree-reduced top-1, not a sort of the
      pair table). Differential-tested equal to the driver loop
      (tests/test_bpe.py)."""
    wt_df = word_symbol_table(docs, text_col)
    if max_driver_vocab:
        rows = wt_df.limit(max_driver_vocab + 1).collect()
        if len(rows) <= max_driver_vocab:
            words = {tuple(r["symbols"]): int(r["n"]) for r in rows}
            return _merge_loop_driver(words, num_merges, min_count)
    wt = wt_df.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            pair_counts(wt)
            .orderBy(F.col("count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["count"] < min_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["count"])
        merges.append((left, right, cnt))
        wt = wt.withColumn(
            "symbols", _merge_pair_udf(left, right)(F.col("symbols"))
        ).localCheckpoint()
    return merges


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encoding of one word: repeatedly merge ALL
    non-overlapping occurrences (left-to-right) of the lowest-rank
    adjacent pair present. PROVABLY identical to applying every merge in
    training order (the pre-r9 implementation): a merge at rank k only
    ever creates adjacencies involving its new symbol, and any merge
    consuming that symbol was necessarily learned later (rank > k), so
    no merge ≤ k becomes applicable again once passed — the two orders
    fire exactly the same merges (differential-tested in tests/test_bpe.py).
    Cost: O(len² dict lookups) per word, INDEPENDENT of vocabulary size —
    the training-order loop was O(num_merges × len) per word, which at a
    realistic 8k-merge vocabulary made apply ~500× the work per word
    (tools/bpe_scale_probe.py measurements in BASELINE.md)."""
    syms = list(w) + [END]
    while len(syms) > 1:
        best_rank = None
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        left, right = best
        merged = left + right
        res: list[str] = []
        i, m = 0, len(syms)
        while i < m:
            if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                res.append(merged)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe",
) -> DataFrame:
    """Tokenize with a learned merge list (standard greedy application —
    see :func:`_encode_word` for the rank-greedy equivalence). One Arrow
    UDF over the text column — merge RANKS ship to the workers as a
    closure constant (O(num_merges) bytes, driver-sized by construction);
    distinct words are memoized per Arrow batch, so a word's encoding is
    paid once per batch, not once per occurrence."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    @pandas_udf("array<string>")
    def tokenize(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in col:
            toks: list[str] = []
            for w in (text or "").lower().split(" "):
                if not w:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return docs.withColumn(out_col, tokenize(F.col(text_col)))
