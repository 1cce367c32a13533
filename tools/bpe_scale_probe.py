"""apply_bpe at realistic vocabulary scale (r8 verdict #4).

The engine's corpora (testdata documents) reuse ~31 distinct words, so a
realistic 8k-merge vocabulary cannot be TRAINED from them — this probe
synthesizes a Zipf-weighted 30k-word vocabulary (seeded, deterministic),
trains 8k merges with an incremental pure-python trainer (same counting
and tie-break rules as functions/bpe.py::train_bpe), and measures
tokenization cost over a synthetic corpus through Spark for BOTH
applicators:

* ``legacy``  — the pre-r9 training-order loop: O(num_merges × len) per
  word occurrence;
* ``current`` — functions/bpe.py::apply_bpe (rank-greedy + per-batch
  word memoization): O(len²) dict lookups per DISTINCT word per batch,
  independent of merge count.

Also asserts the two applicators produce byte-identical tokens at every
probed merge count (the correctness claim behind the switch), then
prints ONE JSON line for BASELINE.md.

Usage: python tools/bpe_scale_probe.py [num_merges ...]   (default 12 8000)
"""

from __future__ import annotations

import heapq
import json
import os
import sys
import time
from collections import Counter

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from kafka_connect_logminer2_spark.functions.bpe import END, apply_bpe  # noqa: E402
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402

SEED = 7
VOCAB = 30_000
DOCS = 2_000
WORDS_PER_DOC = 150


def synth_vocab(rng: np.random.Generator) -> tuple[list[str], np.ndarray]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words: set[str] = set()
    while len(words) < VOCAB:
        n = VOCAB - len(words)
        lens = rng.integers(3, 13, size=n)
        for ln in lens:
            words.add("".join(rng.choice(letters, size=ln)))
    vocab = sorted(words)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    weights = 1.0 / ranks  # Zipf
    return vocab, weights / weights.sum()


def train_merges(word_counts: dict[str, int], num_merges: int):
    """Incremental BPE trainer: pair-count heap with lazy invalidation +
    per-pair posting sets, so each round costs O(words containing the
    merged pair), not O(vocabulary). Counting rule and (count desc, pair
    lex asc) tie-break match functions/bpe.py::train_bpe."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, n in word_counts.items():
        words.append(list(w) + [END])
        counts.append(n)

    pair_counts: Counter = Counter()
    postings: dict[tuple[str, str], set[int]] = {}
    for idx, syms in enumerate(words):
        n = counts[idx]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            postings.setdefault((a, b), set()).add(idx)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges and heap:
        negc, pair = heapq.heappop(heap)
        c = pair_counts.get(pair, 0)
        if c != -negc or c == 0:
            continue  # stale heap entry
        if c < 2:
            break
        left, right = pair
        merged = left + right
        merges.append((left, right, c))
        touched = set()
        for idx in list(postings.get(pair, ())):
            syms = words[idx]
            n = counts[idx]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                touched.add((a, b))
            res, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[idx] = res
            for a, b in zip(res, res[1:]):
                pair_counts[(a, b)] += n
                postings.setdefault((a, b), set()).add(idx)
                touched.add((a, b))
        for p in touched:
            c2 = pair_counts.get(p, 0)
            if c2 > 0:
                heapq.heappush(heap, (-c2, p))
    return merges


def legacy_apply(docs, merges, text_col="text", out_col="bpe"):
    """The pre-r9 apply_bpe, kept verbatim as the probe's baseline."""
    seq = [(l, r) for l, r, _ in merges]

    @pandas_udf("array<string>")
    def tokenize(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            toks: list[str] = []
            for w in (text or "").lower().split(" "):
                if not w:
                    continue
                syms = list(w) + [END]
                for left, right in seq:
                    i, res = 0, []
                    m = len(syms)
                    while i < m:
                        if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                            res.append(left + right)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                toks.extend(syms)
            out.append(toks)
        return pd.Series(out)

    return docs.withColumn(out_col, tokenize(F.col(text_col)))


def main() -> None:
    merge_counts = [int(a) for a in sys.argv[1:]] or [12, 8000]
    rng = np.random.default_rng(SEED)
    vocab, probs = synth_vocab(rng)
    # Zipf word counts for training (types weighted by frequency)
    draws = rng.choice(len(vocab), size=2_000_000, p=probs)
    wc = Counter(int(i) for i in draws)
    word_counts = {vocab[i]: n for i, n in wc.items()}

    t0 = time.time()
    merges = train_merges(word_counts, max(merge_counts))
    train_s = round(time.time() - t0, 2)

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    doc_words = rng.choice(
        np.array(vocab), size=(DOCS, WORDS_PER_DOC), p=probs
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(DOCS), "text": [" ".join(r) for r in doc_words]}
        )
    ).repartition(32).localCheckpoint()

    out: dict = {
        "metric": "bpe_apply_scale",
        "unit": "sec",
        "vocab": len(vocab),
        "docs": DOCS,
        "words_per_doc": WORDS_PER_DOC,
        "trained_merges": len(merges),
        "train_sec": train_s,
        "timings": {},
    }
    # warm the Python-worker/Arrow path so the first timed entry isn't
    # paying session startup
    apply_bpe(docs, merges[:1]).select(F.sum(F.size("bpe"))).first()
    for nm in merge_counts:
        sub = merges[:nm]
        for name, fn in (("current", apply_bpe), ("legacy", legacy_apply)):
            t0 = time.time()
            n = fn(docs, sub).select(F.sum(F.size("bpe"))).first()[0]
            out["timings"][f"{name}_m{nm}"] = round(time.time() - t0, 2)
            out["timings"].setdefault(f"tokens_m{nm}", int(n))
        # identity: both applicators must tokenize identically
        a = apply_bpe(docs.limit(50), sub).select("doc_id", "bpe").collect()
        b = legacy_apply(docs.limit(50), sub).select("doc_id", "bpe").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), nm
    print(json.dumps(out))


if __name__ == "__main__":
    main()
