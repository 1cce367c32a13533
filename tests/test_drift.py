"""streaming/drift.py: token-distribution drift monitoring.

Gates: KL is ~0 for a batch drawn from the reference distribution and
strictly larger for a shifted batch (the monitor actually detects drift);
KL is exactly 0 when batch == reference (identical histograms, smoothing
included); histogram state is B-bounded; the streamed 3-batch path equals
batch-computed truth and survives the versioned-layout retry contract
(cdc21's oracle covers the full value path at fixture scale).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.streaming.drift import (
    kl_to_reference,
    read_drift_metrics,
    token_histogram,
    write_drift_monitor,
)

B = 64


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _kl(spark, batch, ref):
    row = kl_to_reference(
        token_histogram(batch, B), token_histogram(ref, B), B
    ).collect()[0]
    return row["n_tokens"], row["kl"]


def test_histogram_bounded_and_counts(spark):
    docs = _docs(spark, ["a b a", "c"])
    h = token_histogram(docs, B).collect()
    assert sum(r["c"] for r in h) == 4
    assert len(h) <= B
    assert all(0 <= r["bucket"] < B for r in h)


def test_kl_zero_on_identical(spark):
    docs = _docs(spark, ["alpha beta gamma delta"] * 5)
    n, kl = _kl(spark, docs, docs)
    assert n == 20
    assert kl == pytest.approx(0.0, abs=1e-12)


def test_kl_detects_shift(spark):
    # equal-sized batches so add-1 smoothing weights match: the in-dist
    # batch scores ~0, the shifted batch spikes
    ref = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 20)
    same = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 20, 1000)
    shifted = _docs(spark, ["omega omega omega psi psi chi"] * 20, 2000)
    _, kl_same = _kl(spark, same, ref)
    _, kl_shift = _kl(spark, shifted, ref)
    assert kl_same == pytest.approx(0.0, abs=1e-9)
    assert kl_shift > 0.5  # a real spike, not noise


def test_kl_smoothing_scale_note(spark):
    # documented behavior: with B comparable to n, different batch sizes
    # alone produce nonzero KL from smoothing-weight mismatch — operators
    # should compare batches of similar token volume or raise B
    ref = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 20)
    small_same = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 5, 1000)
    _, kl = _kl(spark, small_same, ref)
    assert 0 < kl < 0.5


def test_streamed_matches_batch_computation(spark, tmp_path):
    texts0 = ["the quick brown fox"] * 4
    texts1 = ["jumps over the lazy dog"] * 4
    all_docs = _docs(spark, texts0 + texts1)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    for i, texts in enumerate((texts0, texts1)):
        stage = str(tmp_path / f"s{i}")
        _docs(spark, texts, i * 100).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(f"{stage}/part*")
        shutil.copy(part, f"{in_dir}/f{i}.parquet")
        os.utime(f"{in_dir}/f{i}.parquet", (now + i * 10,) * 2)
    q = write_drift_monitor(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir),
        all_docs,
        str(tmp_path / "m"),
        str(tmp_path / "ckpt"),
        n_buckets=B,
    )
    assert q.awaitTermination(300)
    m = {r["batch_id"]: r for r in read_drift_metrics(spark, str(tmp_path / "m")).collect()}
    assert sorted(m) == [0, 1]
    for i, texts in enumerate((texts0, texts1)):
        n, kl = _kl(spark, _docs(spark, texts), all_docs)
        assert m[i]["n_tokens"] == n
        assert m[i]["kl"] == pytest.approx(kl, abs=1e-12)
        assert m[i]["n_docs"] == 4


def test_retry_overwrites_own_version(spark, tmp_path):
    # simulate a foreachBatch retry: writing the same batch_id twice must
    # leave exactly one committed row for it (overwrite, not duplicate)
    from kafka_connect_logminer2_spark.streaming import drift as D

    docs = _docs(spark, ["x y z"] * 3)
    ref = docs
    out = str(tmp_path / "m2")
    for _ in range(2):
        row = D.kl_to_reference(
            D.token_histogram(docs, B), D.token_histogram(ref, B), B
        ).select(
            F.lit(0).cast("long").alias("batch_id"),
            F.lit(3).cast("long").alias("n_docs"),
            "n_tokens",
            "kl",
        )
        row.write.mode("overwrite").parquet(f"{out}/v=0")
    m = read_drift_metrics(spark, out).collect()
    assert len(m) == 1 and m[0]["batch_id"] == 0
