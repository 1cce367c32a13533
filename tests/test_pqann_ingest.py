"""Maintained IVF-PQ index (streaming/pq_ann_ingest.py, r12): the
changelog-maintained packed-code relation. The correctness bar is the
cdc43 identity — maintained state must equal the from-scratch
ivfpq_encode of the final live set under the SAME frozen models — plus
the exactly-once / delete-wins / model-freeze invariants the ann_mor
family pins."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.similarity import (
    ivfpq_encode,
    load_ivf_centroids,
)
from kafka_connect_logminer2_spark.streaming.ann_ingest import read_ann_index
from kafka_connect_logminer2_spark.streaming.pq_ann_ingest import (
    ingest_batch_pqann,
    load_pq_books,
    pqann_index_query,
    write_pqann_ingest,
)

SCHEMA = "op string, vec_id long, embedding array<float>"
M, K = 16, 16


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _changelog_batches(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    b0 = emb.filter(F.col("vec_id") < 200).selectExpr(
        "'I' as op", "vec_id", "embedding"
    )
    b1 = (
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 400))
        .selectExpr("'I' as op", "vec_id", "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") < 50).selectExpr(
                "'D' as op", "vec_id", "cast(null as array<float>) as embedding"
            )
        )
    )
    b2 = (
        emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 100))
        .alias("a")
        .join(
            emb.selectExpr("vec_id - 400 as j", "embedding as e2").alias("b"),
            F.col("a.vec_id") == F.col("b.j"),
        )
        .selectExpr("'U' as op", "a.vec_id as vec_id", "e2 as embedding")
    )
    return [b0, b1, b2]


def _live_set(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    untouched = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 400)
    ).select("vec_id", "embedding")
    updated = (
        emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 100))
        .alias("a")
        .join(
            emb.selectExpr("vec_id - 400 as j", "embedding as e2").alias("b"),
            F.col("a.vec_id") == F.col("b.j"),
        )
        .selectExpr("a.vec_id as vec_id", "e2 as embedding")
    )
    return untouched.unionByName(updated)


def _codes(df):
    return sorted(
        map(tuple, df.select("vec_id", "_cell", "_c0", "_c1").collect())
    )


def test_pqann_state_equals_fresh_encode_and_retry(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    batches = _changelog_batches(spark, sf_dir)
    for i, b in enumerate(batches):
        ingest_batch_pqann(spark, b, i, idx, n_centroids=8, m=M, n_codes=K)

    cmat_n = load_ivf_centroids(spark, idx)
    books = load_pq_books(spark, idx)
    live = read_ann_index(spark, idx)
    want = _codes(ivfpq_encode(_live_set(spark, sf_dir), cmat_n, books, M, K))
    assert _codes(live) == want  # the maintained relation IS the encode

    # replay the last batch (retry past the store commit): byte-identical
    ingest_batch_pqann(spark, batches[2], 2, idx, n_centroids=8, m=M, n_codes=K)
    assert _codes(read_ann_index(spark, idx)) == want

    # models are frozen: a later batch must not retrain
    import numpy as np

    row = _emb(spark, sf_dir).filter(F.col("vec_id") == 450)
    ingest_batch_pqann(
        spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 3, idx,
        n_centroids=8, m=M, n_codes=K,
    )
    assert np.array_equal(load_ivf_centroids(spark, idx), cmat_n)
    assert np.array_equal(load_pq_books(spark, idx), books)

    # resume with different PQ params: meta guard raises, store untouched
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_pqann(
            spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 4,
            idx, n_centroids=8, m=M, n_codes=64,
        )


def test_pqann_delete_wins_readd_and_dup_raise(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_pqann(spark, b, i, idx, n_centroids=8, m=M, n_codes=K)

    emb = _emb(spark, sf_dir)
    row = emb.filter(F.col("vec_id") == 100)
    both = row.selectExpr("'I' as op", "vec_id", "embedding").unionByName(
        row.selectExpr(
            "'D' as op", "vec_id", "cast(null as array<float>) as embedding"
        )
    )
    ingest_batch_pqann(spark, both, 3, idx, n_centroids=8, m=M, n_codes=K)
    assert read_ann_index(spark, idx).filter("vec_id = 100").count() == 0
    ingest_batch_pqann(
        spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 4, idx,
        n_centroids=8, m=M, n_codes=K,
    )
    assert read_ann_index(spark, idx).filter("vec_id = 100").count() == 1

    dup = row.selectExpr("'I' as op", "vec_id", "embedding").unionByName(
        row.selectExpr("'U' as op", "vec_id", "embedding")
    )
    with pytest.raises(ValueError, match="more than once"):
        ingest_batch_pqann(spark, dup, 5, idx, n_centroids=8, m=M, n_codes=K)


def test_pqann_streaming_twin_serve_and_compaction(spark, sf_dir, tmp_path):
    """The foreachBatch stream produces the identical maintained relation;
    serving via pqann_index_query survives offline compaction unchanged
    (maintain_store dispatches pqann_mor to the shared payload-agnostic
    fold, skipping it when protect is set)."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    now = time.time()
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        d = str(tmp_path / f"s{i}")
        b.coalesce(1).write.parquet(d)
        f = sorted(glob.glob(f"{d}/part*"))[0]
        shutil.copy(f, f"{src}/f{i}.parquet")
        os.utime(f"{src}/f{i}.parquet", (now + 10 * i,) * 2)

    idx = str(tmp_path / "idx")
    q = write_pqann_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(src),
        idx,
        str(tmp_path / "ckpt"),
        n_centroids=8, m=M, n_codes=K,
    )
    assert q.awaitTermination(300)

    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    before = [
        tuple(r)
        for r in pqann_index_query(spark, idx, queries, k=5, nprobe=8)
        .orderBy("query_id", "rank").collect()
    ]
    assert len(before) == 20 and all(r[3] <= 5 for r in before)
    assert not any(r[1] < 50 for r in before)  # deletes never served

    from kafka_connect_logminer2_spark.streaming.maintenance import (
        discover_stores,
        maintain_store,
    )

    assert idx in discover_stores(str(tmp_path))
    assert maintain_store(spark, idx, max_chain=1, protect=99) is None  # inline: skipped
    fold = maintain_store(spark, idx, max_chain=1)
    assert fold is not None
    after = [
        tuple(r)
        for r in pqann_index_query(spark, idx, queries, k=5, nprobe=8)
        .orderBy("query_id", "rank").collect()
    ]
    assert after == before


def test_pqann_reindex_lifecycle(spark, sf_dir, tmp_path):
    """r12: the offline model refresh — retrain on the live membership
    (from source-of-truth vectors; codes are lossy), optionally grow the
    bit budget, preserve membership and the resume position, fail loudly
    on missing vectors and stale-parameter resumes, recover from a crash
    mid-swap."""
    import json

    from kafka_connect_logminer2_spark.streaming.pq_ann_ingest import (
        _REINDEX_INTENT,
        reindex_pqann,
    )

    idx = str(tmp_path / "idx")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_pqann(spark, b, i, idx, n_centroids=8, m=M, n_codes=K)
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # the source-of-truth corpus AFTER the changelog applied: live ids
    # carry their CURRENT vectors (ids 50-99 were updated to the +400
    # embedding — handing reindex the raw pre-update table would
    # re-encode stale vectors, the documented consistency contract);
    # extra rows (the deleted ids 0-49) prove the semi-join prunes them
    corpus = _live_set(spark, sf_dir).unionByName(
        emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    )

    # missing-vector guard: a corpus missing live ids refuses
    with pytest.raises(ValueError, match="no vector"):
        reindex_pqann(spark, idx, corpus.filter(F.col("vec_id") >= 200))

    fold = reindex_pqann(spark, idx, corpus, m=32)  # grow 64 -> 128 bits
    assert fold == 2

    # membership preserved; state equals fresh encode under NEW models
    live = read_ann_index(spark, idx)
    assert live.count() == 350
    cmat_n = load_ivf_centroids(spark, idx)
    books = load_pq_books(spark, idx)
    assert books.shape[0] == 32
    want = sorted(
        map(tuple, ivfpq_encode(_live_set(spark, sf_dir), cmat_n, books, 32, K)
            .select("vec_id", "_cell", "_c0", "_c1").collect())
    )
    assert _codes(live) == want

    # serving reflects the new models; a later ingest under the NEW
    # params resumes (fold version preserved the batch counter), while
    # the OLD params now fail the meta guard
    got = pqann_index_query(spark, idx, queries, k=5, nprobe=8).collect()
    assert len(got) == 20
    row = emb.filter(F.col("vec_id") == 450)
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_pqann(
            spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 3,
            idx, n_centroids=8, m=M, n_codes=K,
        )
    ingest_batch_pqann(
        spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 3, idx,
        n_centroids=8, m=32, n_codes=K,
    )
    assert read_ann_index(spark, idx).count() == 351

    # crash recovery: simulate a crash AFTER staging completed but BEFORE
    # the swap — re-running reindex_pqann must finish it
    corpus2 = corpus.unionByName(row.select("vec_id", "embedding"))
    fold2 = reindex_pqann(spark, idx, corpus2, m=32)
    assert fold2 == 3
    # rebuild a staged-but-unswapped state by hand: stage another reindex
    # by copying the committed layout, then write only the intent
    import shutil as _sh

    staging = f"{idx}/_reindex_tmp"
    _sh.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    _sh.copytree(f"{idx}/v=3", f"{staging}/seg")
    _sh.copytree(f"{idx}/_model", f"{staging}/_model")
    _sh.copy(f"{idx}/_meta.json", f"{staging}/_meta.json")
    with open(f"{idx}/{_REINDEX_INTENT}", "w") as f:
        json.dump({"fold": 3}, f)
    before = _codes(read_ann_index(spark, idx))
    assert reindex_pqann(spark, idx, corpus2) == 3  # finishes the swap
    assert not os.path.exists(f"{idx}/{_REINDEX_INTENT}")
    assert _codes(read_ann_index(spark, idx)) == before


def test_pqann_rerank_serve_reduces_to_exact(spark, sf_dir, tmp_path):
    """cdc45's pin as a pytest twin: at full probe and candidates >= the
    live-set size, the maintained-store two-stage serve equals exact
    cosine top-k over the live membership row-for-row; at production
    settings (C=16, nprobe=4) it still returns well-formed top-k with no
    deleted ids."""
    from kafka_connect_logminer2_spark.functions.similarity import (
        cosine_topk,
    )
    from kafka_connect_logminer2_spark.streaming.pq_ann_ingest import (
        pqann_rerank_query,
    )

    idx = str(tmp_path / "idx")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_pqann(spark, b, i, idx, n_centroids=8, m=32, n_codes=K)
    live = _live_set(spark, sf_dir)
    queries = _emb(spark, sf_dir).filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_live = live.count()
    got = [
        tuple(r)
        for r in pqann_rerank_query(
            spark, idx, live, queries, k=5, candidates=n_live, nprobe=8
        ).orderBy("query_id", "rank").collect()
    ]
    want = [
        tuple(r)
        for r in cosine_topk(live, queries, k=5)
        .orderBy("query_id", "rank").collect()
    ]
    assert got == want

    pruned = pqann_rerank_query(
        spark, idx, live, queries, k=5, candidates=16, nprobe=4
    ).collect()
    assert len(pruned) == 20
    assert all(1 <= r["rank"] <= 5 for r in pruned)
    assert not any(r["neighbor_id"] < 50 for r in pruned)
