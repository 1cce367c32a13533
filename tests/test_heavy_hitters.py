"""Continuously-maintained heavy hitters (streaming/heavy_hitters.py):
the streamed Misra-Gries delta-chain store must land on EXACTLY the plain
GROUP BY/HAVING answer (any batch split), with per-batch sketch deltas
bounded by capacity, retry-idempotent folds, and compaction that
re-truncates the state to capacity without changing the answer."""

from __future__ import annotations

import glob
import os
import shutil
import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.streaming.heavy_hitters import (
    bigram_rows,
    compact_heavy_hitters,
    heavy_hitters_asof,
    hh_batch_step,
    sketch_state,
    write_heavy_hitters,
)

SCHEMA = "doc_id long, text string"


def _mk_docs(n_docs=60, seed=7):
    """Synthetic corpus with planted boilerplate: every 3rd doc carries the
    'cookie banner' bigram run, the rest are low-frequency filler built
    from a deterministic LCG (no two filler bigrams repeat often)."""
    docs, state = [], seed
    words = [f"w{k}" for k in range(50)]
    for i in range(n_docs):
        toks = []
        if i % 3 == 0:
            toks += ["accept", "all", "cookies", "accept", "all"]
        for _ in range(12):
            state = (state * 1103515245 + 12345) % (2**31)
            toks.append(words[state % len(words)])
        docs.append((i, " ".join(toks)))
    return docs


def _truth(docs, denom):
    grams = []
    for _, text in docs:
        toks = text.lower().split(" ")
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    total = len(grams)
    c = Counter(grams)
    return sorted((g, n) for g, n in c.items() if n * denom >= total)


def _split(docs, n_batches, mod):
    return [[d for d in docs if d[0] % mod == i] for i in range(n_batches)]


def _answer(spark, root, denom):
    out = heavy_hitters_asof(spark, root, denom=denom)
    return sorted((r["bigram"], r["n"]) for r in out.collect())


def _fold_batches(spark, root, batches, capacity=64, start=0):
    for i, rows in enumerate(batches, start=start):
        hh_batch_step(
            spark,
            spark.createDataFrame(rows, SCHEMA),
            i,
            root,
            capacity=capacity,
            num_buckets=4,
        )


def test_streamed_equals_batch_truth_any_split(spark, tmp_path):
    docs = _mk_docs()
    truth = _truth(docs, denom=40)
    assert truth, "fixture must produce at least one heavy hitter"
    for mod in (2, 3, 5):
        root = str(tmp_path / f"store_{mod}")
        _fold_batches(spark, root, _split(docs, mod, mod))
        assert _answer(spark, root, denom=40) == truth, f"split mod={mod}"


def test_batch_deltas_bounded_by_capacity(spark, tmp_path):
    root = str(tmp_path / "store")
    cap = 16
    _fold_batches(spark, root, _split(_mk_docs(), 3, 3), capacity=cap)
    for seg in glob.glob(f"{root}/counts/b=*/v=*"):
        n = spark.read.parquet(seg).count()
        assert n <= cap, f"{seg} holds {n} rows > capacity {cap}"
    # the per-batch summary across ALL buckets is also ≤ cap
    for v in (0, 1, 2):
        segs = glob.glob(f"{root}/counts/b=*/v={v}")
        total = sum(spark.read.parquet(s).count() for s in segs)
        assert total <= cap


def test_retry_idempotent(spark, tmp_path):
    docs = _mk_docs()
    batches = _split(docs, 3, 3)
    root = str(tmp_path / "store")
    _fold_batches(spark, root, batches)
    before = _answer(spark, root, denom=40)
    # replay the LAST batch (the foreachBatch retry case)
    hh_batch_step(
        spark,
        spark.createDataFrame(batches[2], SCHEMA),
        2,
        root,
        capacity=64,
        num_buckets=4,
    )
    assert _answer(spark, root, denom=40) == before


def test_compaction_truncates_state_and_keeps_answer(spark, tmp_path):
    docs = _mk_docs()
    root = str(tmp_path / "store")
    cap = 48
    _fold_batches(spark, root, _split(docs, 5, 5), capacity=cap)
    before = _answer(spark, root, denom=40)
    pre_rows = sketch_state(spark, root).count()
    v = compact_heavy_hitters(spark, f"{root}/counts")
    assert v == 4
    post_rows = sketch_state(spark, root).count()
    assert post_rows <= cap, "compacted sketch must re-truncate to capacity"
    assert post_rows <= pre_rows
    # one committed segment per non-empty bucket after the fold
    for b in glob.glob(f"{root}/counts/b=*"):
        vs = [d for d in os.listdir(b) if d.startswith("v=")]
        assert len(vs) <= 1
    assert _answer(spark, root, denom=40) == before


def test_superset_guarantee_at_minimal_capacity(spark, tmp_path):
    """capacity == denom is the theoretical floor of the guarantee: the
    answer must STILL be exact (candidates are a superset, the recount
    filters), even with heavy truncation pressure."""
    docs = _mk_docs(n_docs=90)
    denom = 30
    truth = _truth(docs, denom=denom)
    root = str(tmp_path / "store")
    _fold_batches(spark, root, _split(docs, 5, 5), capacity=denom)
    assert _answer(spark, root, denom=denom) == truth


def test_read_refuses_capacity_below_denom(spark, tmp_path):
    root = str(tmp_path / "store")
    _fold_batches(spark, root, _split(_mk_docs(), 2, 2), capacity=32)
    with pytest.raises(ValueError, match="cannot guarantee"):
        heavy_hitters_asof(spark, root, denom=64)


def test_resume_param_guard(spark, tmp_path):
    root = str(tmp_path / "store")
    _fold_batches(spark, root, _split(_mk_docs(), 2, 2), capacity=32)
    with pytest.raises(ValueError, match="different parameters"):
        hh_batch_step(
            spark,
            spark.createDataFrame(_mk_docs()[:5], SCHEMA),
            9,
            root,
            capacity=99,
            num_buckets=4,
        )


def test_file_stream_with_restart_resume(spark, tmp_path):
    """The real writer: two files arrive, the stream stops, two MORE files
    arrive, a new stream resumes from the checkpoint — the final answer
    equals the all-four-batches truth and in-line compaction (max_chain=2)
    kept the chains bounded."""
    tmp = str(tmp_path)
    docs = _mk_docs(n_docs=80)
    batches = _split(docs, 4, 4)
    os.makedirs(f"{tmp}/in")
    now = time.time()

    def stage(i):
        df = spark.createDataFrame(batches[i], SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        src = sorted(glob.glob(f"{tmp}/s{i}/part*"))[0]
        shutil.copy(src, f"{tmp}/in/f{i}.parquet")
        os.utime(f"{tmp}/in/f{i}.parquet", (now + i * 10,) * 2)

    def run():
        return write_heavy_hitters(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in"),
            f"{tmp}/store",
            f"{tmp}/ckpt",
            capacity=64,
            num_buckets=4,
            max_chain=2,
        )

    stage(0), stage(1)
    assert run().awaitTermination(600)
    stage(2), stage(3)
    assert run().awaitTermination(600)

    assert _answer(spark, f"{tmp}/store", denom=40) == _truth(docs, denom=40)
    for b in glob.glob(f"{tmp}/store/counts/b=*"):
        vs = [d for d in os.listdir(b) if d.startswith("v=")]
        assert len(vs) <= 3, f"{b}: chain {len(vs)} not bounded by maintenance"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_docs=st.integers(min_value=20, max_value=60),
    n_batches=st.integers(min_value=2, max_value=4),
    capacity_extra=st.integers(min_value=0, max_value=16),
    maintain_mask=st.lists(st.booleans(), min_size=4, max_size=4),
    seed=st.integers(min_value=0, max_value=10_000),
    data=st.data(),
)
def test_property_mg_exact_under_any_schedule(
    spark, tmp_path_factory, n_docs, n_batches, capacity_extra,
    maintain_mask, seed, data
):
    """For ANY corpus, ANY batch assignment, ANY inline-compaction subset,
    ANY capacity ≥ denom, and a possible newest-batch replay, the streamed
    heavy-hitter answer equals the plain GROUP BY/HAVING truth — the
    mergeable-summaries guarantee composed with the store's replay/fold
    contracts, adversarially sampled rather than hand-picked."""
    from kafka_connect_logminer2_spark.streaming.maintenance import (
        maintain_store,
    )

    denom = 20
    docs = _mk_docs(n_docs=n_docs, seed=seed)
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=n_docs, max_size=n_docs,
        ),
        label="assign",
    )
    batches = [
        [d for j, d in enumerate(docs) if assign[j] == b]
        for b in range(n_batches)
    ]
    tmp = tmp_path_factory.mktemp("hhprop")
    root = str(tmp / "store")
    cap = denom + capacity_extra
    for b, rows in enumerate(batches):
        hh_batch_step(
            spark,
            spark.createDataFrame(rows, SCHEMA) if rows
            else spark.createDataFrame([], SCHEMA),
            b, root, capacity=cap, num_buckets=4,
        )
        if maintain_mask[b]:
            maintain_store(spark, f"{root}/counts", max_chain=1, protect=b)
    if data.draw(st.booleans(), label="replay"):
        last = n_batches - 1
        hh_batch_step(
            spark,
            spark.createDataFrame(batches[last], SCHEMA) if batches[last]
            else spark.createDataFrame([], SCHEMA),
            last, root, capacity=cap, num_buckets=4,
        )
    assert _answer(spark, root, denom=denom) == _truth(docs, denom=denom)
