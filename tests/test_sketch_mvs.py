"""Mergeable-sketch MVs (streaming/sketches.py): the bottom-k sample must
be VALUE-EXACT against ORDER BY hash LIMIT k under any batch split, retry,
and compaction; the HLL distinct sketches must stay within the accuracy
gate under the same operations (tolerance, never estimate equality — the
datasketches mode-transition jitter is a documented ±1)."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.streaming.sketches import (
    bottomk_batch_step,
    compact_bottomk,
    compact_hll,
    distinct_estimates,
    hll_batch_step,
    sample_asof,
    write_bottomk_sample,
)

SCHEMA = "doc_id long, text string, source string"


def _mk_docs(n=120):
    return [
        (i, f"text body {i % 37} of {i}", f"s{i % 4}") for i in range(n)
    ]


def _py_key(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _truth_sample(docs, k):
    return sorted(((_py_key(d), d) for d, _, _ in docs))[:k]


def _got_sample(spark, store):
    return [(r["skey"], r["doc_id"]) for r in sample_asof(spark, store).collect()]


def _fold_bk(spark, store, docs, mod, k=30, start=0):
    for i in range(mod):
        rows = [d for d in docs if d[0] % mod == i]
        bottomk_batch_step(
            spark, spark.createDataFrame(rows, SCHEMA), start + i, store,
            k=k, num_buckets=4, payload_cols=("text", "source"),
        )


def test_bottomk_exact_under_any_split(spark, tmp_path):
    docs = _mk_docs()
    truth = _truth_sample(docs, 30)
    for mod in (2, 3, 5):
        store = str(tmp_path / f"bk{mod}")
        _fold_bk(spark, store, docs, mod)
        assert _got_sample(spark, store) == truth, f"split mod={mod}"


def test_bottomk_deltas_retry_and_compaction(spark, tmp_path):
    docs = _mk_docs()
    store = str(tmp_path / "bk")
    _fold_bk(spark, store, docs, 3)
    truth = _truth_sample(docs, 30)
    assert _got_sample(spark, store) == truth
    # per-batch delta bounded by k
    for v in (0, 1, 2):
        n = sum(
            spark.read.parquet(s).count()
            for s in glob.glob(f"{store}/b=*/v={v}")
        )
        assert n <= 30
    # replay the last batch — idempotent
    rows = [d for d in docs if d[0] % 3 == 2]
    bottomk_batch_step(
        spark, spark.createDataFrame(rows, SCHEMA), 2, store, k=30, num_buckets=4,
        payload_cols=("text", "source"),
    )
    assert _got_sample(spark, store) == truth
    # compaction folds to ≤ k rows total, answer unchanged
    assert compact_bottomk(spark, store) == 2
    total = sum(
        spark.read.parquet(s).count() for s in glob.glob(f"{store}/b=*/v=*")
    )
    assert total <= 30
    assert _got_sample(spark, store) == truth
    # rows arriving AFTER compaction still displace larger keys
    extra = [(10_000 + i, f"late {i}", "s9") for i in range(40)]
    bottomk_batch_step(
        spark, spark.createDataFrame(extra, SCHEMA), 3, store, k=30, num_buckets=4,
        payload_cols=("text", "source"),
    )
    assert _got_sample(spark, store) == _truth_sample(docs + extra, 30)


def test_bottomk_param_guard_and_payload(spark, tmp_path):
    store = str(tmp_path / "bk")
    docs = _mk_docs(40)
    _fold_bk(spark, store, docs, 2)
    with pytest.raises(ValueError, match="different parameters"):
        bottomk_batch_step(
            spark, spark.createDataFrame(docs[:5], SCHEMA), 7, store,
            k=99, num_buckets=4, payload_cols=("text", "source"),
        )
    by_id = {d[0]: d for d in docs}
    for r in sample_asof(spark, store).collect():
        assert r["text"] == by_id[r["doc_id"]][1]
        assert r["source"] == by_id[r["doc_id"]][2]


def test_bottomk_file_stream_restart_and_maintenance(spark, tmp_path):
    tmp = str(tmp_path)
    docs = _mk_docs(160)
    batches = [[d for d in docs if d[0] % 4 == i] for i in range(4)]
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(batches[i], SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_bottomk_sample(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/store", f"{tmp}/ckpt", k=30, num_buckets=4, max_chain=2,
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2), stage(3)
    assert run().awaitTermination(600)
    assert _got_sample(spark, f"{tmp}/store") == _truth_sample(docs, 30)
    for b in glob.glob(f"{tmp}/store/b=*"):
        vs = [d for d in os.listdir(b) if d.startswith("v=")]
        assert len(vs) <= 3, f"{b}: chain {len(vs)} not bounded"


def _exact_distinct(docs):
    out: dict[str, set] = {}
    for _, text, src in docs:
        out.setdefault(src, set()).add(text)
    exact = {s: len(v) for s, v in out.items()}
    exact["__all__"] = len({t for _, t, _ in docs})
    return exact


def test_hll_estimates_within_gate_under_splits_and_compaction(spark, tmp_path):
    docs = _mk_docs(200)
    exact = _exact_distinct(docs)
    for mod in (2, 4):
        store = str(tmp_path / f"hll{mod}")
        for i in range(mod):
            rows = [d for d in docs if d[0] % mod == i]
            hll_batch_step(
                spark, spark.createDataFrame(rows, SCHEMA), i, store,
                num_buckets=4,
            )
        est = {r["source"]: r["est"] for r in
               distinct_estimates(spark, store).collect()}
        for s, n in exact.items():
            assert abs(est[s] / n - 1) <= 0.05, (mod, s, est[s], n)
        pre = est
        assert compact_hll(spark, store) == mod - 1
        post = {r["source"]: r["est"] for r in
                distinct_estimates(spark, store).collect()}
        for s in pre:
            # mode-transition jitter is the documented ±1
            assert abs(post[s] - pre[s]) <= max(1, 0.01 * pre[s]), s
        # one sketch row per group after the fold
        total = sum(
            spark.read.parquet(p).count()
            for p in glob.glob(f"{store}/b=*/v=*")
        )
        assert total == len(exact) - 1  # groups, excluding __all__


def test_hll_retry_and_param_guard(spark, tmp_path):
    docs = _mk_docs(80)
    store = str(tmp_path / "hll")
    for i in range(2):
        rows = [d for d in docs if d[0] % 2 == i]
        hll_batch_step(spark, spark.createDataFrame(rows, SCHEMA), i, store,
                       num_buckets=4)
    before = {r["source"]: r["est"] for r in
              distinct_estimates(spark, store).collect()}
    rows = [d for d in docs if d[0] % 2 == 1]
    hll_batch_step(spark, spark.createDataFrame(rows, SCHEMA), 1, store,
                   num_buckets=4)
    after = {r["source"]: r["est"] for r in
             distinct_estimates(spark, store).collect()}
    assert after == before
    with pytest.raises(ValueError, match="different parameters"):
        hll_batch_step(spark, spark.createDataFrame(rows, SCHEMA), 5, store,
                       lg_k=14, num_buckets=4)


def _py_hist(values, lo, width, n_bins):
    import math

    h: dict[int, int] = {}
    for v in values:
        b = min(max(int(math.floor((v - lo) / width)), 0), n_bins - 1)
        h[b] = h.get(b, 0) + 1
    return h


def _py_quantiles(values, lo, width, n_bins, qs):
    import math

    h = _py_hist(values, lo, width, n_bins)
    total = sum(h.values())
    out = []
    for q in qs:
        target = math.ceil(q * total)
        cum = 0
        for b in sorted(h):
            cum += h[b]
            if cum >= target:
                out.append((q, target, b, lo + b * width, lo + (b + 1) * width,
                            cum, total))
                break
    return out


def test_histogram_quantiles_exact_under_splits(spark, tmp_path):
    from kafka_connect_logminer2_spark.streaming.sketches import (
        compact_hist,
        hist_asof,
        hist_batch_step,
        quantiles_asof,
    )

    vals = [((i * 37) % 97) * 1.25 - 3.0 for i in range(300)]  # some below lo
    rows = [(i, v) for i, v in enumerate(vals)]
    truth_h = _py_hist(vals, 0.0, 10.0, 12)
    truth_q = _py_quantiles(vals, 0.0, 10.0, 12, (0.5, 0.9, 0.99))
    for mod in (2, 3):
        store = str(tmp_path / f"h{mod}")
        for i in range(mod):
            hist_batch_step(
                spark,
                spark.createDataFrame(
                    [r for r in rows if r[0] % mod == i], "event_id long, value double"
                ),
                i, store, lo=0.0, hi=120.0, n_bins=12, num_buckets=4,
            )
        got_h = {r["bin"]: r["c"] for r in hist_asof(spark, store).collect()}
        assert got_h == truth_h, f"split mod={mod}"
        got_q = [
            (r["q"], r["target"], r["bin"], r["bin_lo"], r["bin_hi"],
             r["cum_n"], r["n_total"])
            for r in quantiles_asof(spark, store, (0.5, 0.9, 0.99)).collect()
        ]
        assert got_q == truth_q, f"split mod={mod}"
    # retry idempotence + compaction identity on the mod=3 store
    store = str(tmp_path / "h3")
    hist_batch_step(
        spark,
        spark.createDataFrame(
            [r for r in rows if r[0] % 3 == 2], "event_id long, value double"
        ),
        2, store, lo=0.0, hi=120.0, n_bins=12, num_buckets=4,
    )
    assert {r["bin"]: r["c"] for r in hist_asof(spark, store).collect()} == truth_h
    assert compact_hist(spark, store) == 2
    assert {r["bin"]: r["c"] for r in hist_asof(spark, store).collect()} == truth_h
    total = sum(
        spark.read.parquet(p).count() for p in glob.glob(f"{store}/b=*/v=*")
    )
    assert total <= 12
    with pytest.raises(ValueError, match="different parameters"):
        hist_batch_step(
            spark,
            spark.createDataFrame(rows[:5], "event_id long, value double"),
            9, store, lo=0.0, hi=120.0, n_bins=24, num_buckets=4,
        )


def test_summary_suite_one_stream_four_stores(spark, tmp_path):
    """write_summary_suite: one stream populates all four stores with the
    same answers the standalone writers produce, the single
    maintain_stores sweep bounds every chain, and a restart resumes
    without disturbing any store."""
    from kafka_connect_logminer2_spark.streaming.heavy_hitters import (
        heavy_hitters_asof,
    )
    from kafka_connect_logminer2_spark.streaming.sketches import (
        distinct_estimates,
        hist_asof,
        write_summary_suite,
    )

    tmp = str(tmp_path)
    docs = _mk_docs(160)
    batches = [[d for d in docs if d[0] % 4 == i] for i in range(4)]
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(batches[i], SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_summary_suite(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/store", f"{tmp}/ckpt",
            hh_capacity=64, sample_k=30, num_buckets=4, max_chain=2,
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2), stage(3)
    assert run().awaitTermination(600)

    # sample == truth, heavy hitters == truth
    assert _got_sample(spark, f"{tmp}/store/sample") == _truth_sample(docs, 30)
    got_hh = sorted(
        (r["bigram"], r["n"])
        for r in heavy_hitters_asof(spark, f"{tmp}/store/hh", denom=40).collect()
    )
    from collections import Counter

    grams = []
    for _, text, _ in docs:
        toks = text.lower().split(" ")
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    c = Counter(grams)
    want_hh = sorted(
        (g, n) for g, n in c.items() if n * 40 >= len(grams)
    )
    assert got_hh == want_hh
    # histogram of token counts == python truth
    tok_counts = [float(len(t.split(" "))) for _, t, _ in docs]
    assert {
        r["bin"]: r["c"] for r in hist_asof(spark, f"{tmp}/store/hist").collect()
    } == _py_hist(tok_counts, 0.0, 5.0, 40)
    # hll estimates inside the gate
    exact = _exact_distinct(docs)
    est = {r["source"]: r["est"] for r in
           distinct_estimates(spark, f"{tmp}/store/hll").collect()}
    for s, n in exact.items():
        assert abs(est[s] / n - 1) <= 0.05
    # the ONE sweep bounded every store's chains
    for sub in ("hh/counts", "hll", "sample", "hist"):
        for b in glob.glob(f"{tmp}/store/{sub}/b=*"):
            vs = [d for d in os.listdir(b) if d.startswith("v=")]
            assert len(vs) <= 3, f"{sub}/{os.path.basename(b)}: {len(vs)}"
