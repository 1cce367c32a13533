"""Incrementally-maintained PCA sufficient statistics (streaming/
model_stats.py): streaming the corpus in micro-batches and folding additive
(Gram, sum, count) state must yield the SAME model as a one-shot batch fit —
the corpus is never re-scanned, yet nothing about the model is approximate.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np

from kafka_connect_logminer2_spark.functions import pca as P
from kafka_connect_logminer2_spark.streaming.model_stats import (
    read_gram_state,
    write_gram_stats,
)


def _stage_stream(spark, sf_dir, tmp, n_files=3):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.repartitionByRange(n_files, "vec_id").write.parquet(f"{tmp}/stage")
    os.makedirs(f"{tmp}/vecs")
    now = time.time()
    for i, p in enumerate(sorted(glob.glob(f"{tmp}/stage/part*"))):
        dst = f"{tmp}/vecs/f{i}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return emb, f"{tmp}/vecs"


def test_streamed_stats_equal_batch_fit(spark, sf_dir, tmp_path):
    tmp = str(tmp_path)
    emb, path = _stage_stream(spark, sf_dir, tmp)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = write_gram_stats(stream, f"{tmp}/state", f"{tmp}/ckpt")
    assert q.awaitTermination(300)

    got = read_gram_state(spark, f"{tmp}/state")
    assert got is not None
    gram, s, n = got
    bg, bs, bn = P.gram_stats(emb)
    assert n == bn == emb.count()
    # float addition order differs (per-batch folds vs one pass) — equality
    # up to fp reassociation, far inside the eigensolver's sensitivity
    assert np.allclose(gram, bg, rtol=1e-9)
    assert np.allclose(s, bs, rtol=1e-9)

    streamed_model = P.fit_pca_from_stats(gram, s, n, k=8)
    batch_model = P.fit_pca(emb, k=8)
    assert np.allclose(
        streamed_model["components"], batch_model["components"], atol=1e-7
    )
    assert np.allclose(streamed_model["evals"], batch_model["evals"], rtol=1e-8)

    # version chain: one committed version per non-empty batch, and the
    # as-of read exposes intermediate states (the model time-travels too)
    versions = sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{tmp}/state")
        if d.startswith("v=")
    )
    assert len(versions) == 3
    mid = read_gram_state(spark, f"{tmp}/state", as_of=versions[1])
    assert mid is not None and 0 < mid[2] < n


def test_resume_appends_only_new_batches(spark, sf_dir, tmp_path):
    """Restarting the stream with one more file folds ONLY the new file
    into the state (checkpoint semantics) — the incremental contract."""
    tmp = str(tmp_path)
    emb, path = _stage_stream(spark, sf_dir, tmp)
    stream = lambda: (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    assert write_gram_stats(stream(), f"{tmp}/state", f"{tmp}/ckpt").awaitTermination(300)
    _, _, n1 = read_gram_state(spark, f"{tmp}/state")

    extra = emb.limit(100).withColumn("vec_id", emb.vec_id + 10_000_000)
    extra.coalesce(1).write.parquet(f"{tmp}/extra")
    part = sorted(glob.glob(f"{tmp}/extra/part*"))[0]
    shutil.copy(part, f"{path}/f9.parquet")
    os.utime(f"{path}/f9.parquet", (time.time() + 900,) * 2)

    assert write_gram_stats(stream(), f"{tmp}/state", f"{tmp}/ckpt").awaitTermination(300)
    _, _, n2 = read_gram_state(spark, f"{tmp}/state")
    assert n2 == n1 + 100
