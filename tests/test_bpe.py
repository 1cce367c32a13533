"""Distributed BPE training (functions/bpe.py) vs an INDEPENDENT
pure-Python reference implementation — merge-for-merge equality, then
apply-side token equality. The reference is written from the algorithm
statement (count adjacent pairs over frequency-weighted word types, merge
the most frequent, repeat), not from the Spark code, so agreement is
evidence, not tautology."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.bpe import (
    END,
    apply_bpe,
    train_bpe,
    word_symbol_table,
)


def _ref_word_counts(texts):
    wc = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                wc[w] += 1
    return {tuple(list(w) + [END]): n for w, n in wc.items()}


def _ref_train(texts, num_merges, min_count=2):
    words = _ref_word_counts(texts)
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        # max count, ties broken by (left, right) ascending
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((left, right, cnt))
        new = {}
        for syms, n in words.items():
            res, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + n
        words = new
    return merges


def _ref_apply(text, merges):
    toks = []
    for w in text.lower().split(" "):
        if not w:
            continue
        syms = list(w) + [END]
        for left, right, _ in merges:
            res, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        toks.extend(syms)
    return toks


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    """20 merges over the documents fixture: the distributed trainer must
    reproduce the reference merge sequence exactly (counts included), and
    apply_bpe must tokenize exactly like the reference application."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]

    got = train_bpe(docs, num_merges=20)
    want = _ref_train(texts, num_merges=20)
    assert got == want and len(got) == 20

    sample = docs.orderBy("doc_id").limit(10)
    toks = {
        r["doc_id"]: r["bpe"]
        for r in apply_bpe(sample, got).select("doc_id", "bpe").collect()
    }
    for r in sample.select("doc_id", "text").collect():
        assert toks[r["doc_id"]] == _ref_apply(r["text"], got), r["doc_id"]


def test_bpe_overlapping_runs_and_early_stop(spark):
    """'aaa' counts the (a,a) pair twice but merges left-to-right into
    ['aa','a','</w>']; training stops before hapax pairs."""
    docs = spark.createDataFrame(
        [("aaa aaa aaa ab",), ("aaa zq",)], "text string"
    )
    merges = train_bpe(docs, num_merges=10)
    # (a,a) appears 2x per 'aaa' (4 types-weighted occurrences * 2)
    assert merges[0][:2] == ("a", "a") and merges[0][2] == 8
    out = apply_bpe(spark.createDataFrame([("aaa",)], "text string"), merges[:1])
    assert out.select("bpe").first()[0] == ["aa", "a", END]
    ref = _ref_train(["aaa aaa aaa ab", "aaa zq"], 10)
    assert merges == ref
    # every learned merge met the min_count floor
    assert all(c >= 2 for _, _, c in merges)


def test_rank_greedy_equals_training_order_application():
    """r9: apply_bpe switched from the O(num_merges × len) training-order
    loop to rank-greedy _encode_word (cost independent of vocabulary
    size). Property check over randomized corpora: for ANY trained merge
    list the two application orders produce identical tokens — including
    overlapping-run words ('aaa') and words sharing prefixes with merges
    learned at very different ranks."""
    import random

    from kafka_connect_logminer2_spark.functions.bpe import _encode_word

    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(40):
        n_words = rng.randint(2, 30)
        vocab = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(n_words)
        ]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
            for _ in range(rng.randint(1, 8))
        ]
        merges = _ref_train(texts, num_merges=rng.randint(1, 25), min_count=2)
        ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        for w in set(vocab) | {"aaa", "aaaa", "ababa"}:
            want = _ref_apply(w, merges)
            got = _encode_word(w, ranks)
            assert got == want, (trial, w, merges, got, want)


def test_bpe_word_table_is_vocab_sized(spark, sf_dir):
    """The corpus collapses to DISTINCT words before any iteration — the
    scale contract (rounds never rescan the corpus)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wt = word_symbol_table(docs)
    n_types = wt.count()
    n_tokens = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "").count()
    assert n_types < n_tokens / 10  # the fixture reuses a small vocabulary
    assert wt.agg(F.sum("n")).first()[0] == n_tokens


def test_bpe_driver_and_distributed_paths_agree(spark, sf_dir):
    """train_bpe's in-memory fast path (vocab fits max_driver_vocab) and
    the distributed merge loop (forced via max_driver_vocab=0) must learn
    the IDENTICAL merge sequence — counts, order, early stop."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    fast = train_bpe(docs, num_merges=15)
    dist = train_bpe(docs, num_merges=15, max_driver_vocab=0)
    assert fast == dist and len(fast) > 0
    # a vocab larger than the cap falls back to the distributed loop
    tiny_cap = train_bpe(docs, num_merges=5, max_driver_vocab=1)
    assert tiny_cap == train_bpe(docs, num_merges=5)[:5][: len(tiny_cap)]
