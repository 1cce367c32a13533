"""Streaming ANN index maintenance (streaming/ann_ingest.py): a changelog
of embedding upserts/deletes maintained as a versioned merge-on-read IVF
index. The correctness bar everywhere is EQUALITY WITH A FLAT REBUILD of
the final live set under the same frozen centroid model — the MOR layout
is bookkeeping, never semantics."""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.similarity import (
    _cell_assign_udf,
    ivf_query_index,
    load_ivf_centroids,
)
from kafka_connect_logminer2_spark.streaming.ann_ingest import (
    ann_index_query,
    compact_ann_index,
    ingest_batch_ann,
    read_ann_index,
    write_ann_ingest,
)

SCHEMA = "op string, vec_id long, embedding array<float>"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _changelog_batches(spark, sf_dir):
    """3 batches: inserts, more inserts + deletes, updates (vector swapped
    for the one at vec_id+400 — a genuinely different embedding, so
    updates that change cells are exercised)."""
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
    """The final live corpus the batches above produce, derived
    relationally (the same derivation cdc19's DuckDB oracle uses)."""
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


def _queries(spark, sf_dir, n=8):
    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def _rebuild_flat(spark, live, cmat, tmp_path, name="flat"):
    flat = str(tmp_path / name)
    live.select(
        "vec_id", "embedding", _cell_assign_udf(cmat)("embedding").alias("_cell")
    ).write.partitionBy("_cell").parquet(flat)
    return flat


def test_ann_ingest_batches_equal_flat_rebuild(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_ann(spark, b, i, idx, n_centroids=16)
    cmat = load_ivf_centroids(spark, idx)
    live = _live_set(spark, sf_dir)

    # membership: exactly the live set, each id exactly once
    got = read_ann_index(spark, idx).select("vec_id", "embedding")
    assert got.count() == live.count() == 350
    assert got.join(live, ["vec_id"], "left_anti").count() == 0
    # updated ids carry the NEW vector (join on id+vec matches everywhere)
    assert got.join(live, ["vec_id", "embedding"], "left_semi").count() == 350

    # query equality vs a flat rebuild of the live set, same model,
    # both at partial nprobe (layout equivalence) and full probe
    flat = _rebuild_flat(spark, live, cmat, tmp_path)
    q = _queries(spark, sf_dir)
    for nprobe in (4, 16):
        want = sorted(
            map(tuple, ivf_query_index(spark, flat, cmat, q, k=5, nprobe=nprobe).collect())
        )
        have = sorted(
            map(tuple, ann_index_query(spark, idx, q, k=5, nprobe=nprobe).collect())
        )
        assert have == want and len(have) == 40

    # deleted ids never served, updated ids served with new similarity
    assert not {t[1] for t in have} & set(range(50))


def test_ann_ingest_retry_idempotent_and_delete_wins(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    batches = _changelog_batches(spark, sf_dir)
    for i, b in enumerate(batches):
        ingest_batch_ann(spark, b, i, idx, n_centroids=16)
    before = sorted(map(tuple, read_ann_index(spark, idx).select("vec_id").collect()))

    # replay the last batch (foreachBatch retry after a crash-past-commit)
    ingest_batch_ann(spark, batches[2], 2, idx, n_centroids=16)
    after = sorted(map(tuple, read_ann_index(spark, idx).select("vec_id").collect()))
    assert after == before

    # same-batch I+D: delete wins; re-add in a LATER batch just works
    emb = _emb(spark, sf_dir)
    row = emb.filter(F.col("vec_id") == 100)
    both = row.selectExpr("'I' as op", "vec_id", "embedding").unionByName(
        row.selectExpr("'D' as op", "vec_id", "cast(null as array<float>) as embedding")
    )
    ingest_batch_ann(spark, both, 3, idx)
    assert read_ann_index(spark, idx).filter("vec_id = 100").count() == 0
    ingest_batch_ann(spark, row.selectExpr("'I' as op", "vec_id", "embedding"), 4, idx)
    assert read_ann_index(spark, idx).filter("vec_id = 100").count() == 1

    # duplicate upsert of one id within a batch raises (unordered frame)
    dup = row.selectExpr("'I' as op", "vec_id", "embedding").unionByName(
        row.selectExpr("'U' as op", "vec_id", "embedding")
    )
    with pytest.raises(ValueError, match="more than once"):
        ingest_batch_ann(spark, dup, 5, idx)


def test_ann_ingest_streaming_twin_and_param_guard(spark, sf_dir, tmp_path):
    """The foreachBatch stream produces the identical index, and a
    resumed run with different parameters raises instead of silently
    mixing cell models."""
    # stage the changelog as one file per batch
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
    q = write_ann_ingest(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src),
        idx,
        str(tmp_path / "ckpt"),
        n_centroids=16,
    )
    assert q.awaitTermination(300)
    live = _live_set(spark, sf_dir)
    got = read_ann_index(spark, idx)
    assert got.count() == 350
    assert got.join(live, ["vec_id", "embedding"], "left_anti").count() == 0

    import numpy as np

    wrong = load_ivf_centroids(spark, idx) + 1.0  # a different quantizer
    with pytest.raises(ValueError, match="different parameters"):
        ingest_batch_ann(
            spark,
            _emb(spark, sf_dir).limit(1).selectExpr("'I' as op", "vec_id", "embedding"),
            99,
            idx,
            cmat=wrong,
        )
    assert isinstance(wrong, np.ndarray)


def test_ann_compact_preserves_queries_and_recovers_from_crash(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_ann(spark, b, i, idx, n_centroids=16)
    q = _queries(spark, sf_dir)
    want = sorted(map(tuple, ann_index_query(spark, idx, q, k=5, nprobe=16).collect()))

    fold = compact_ann_index(spark, idx)
    assert fold == 2
    assert not os.path.isdir(f"{idx}/_tombstones")
    assert sorted(
        d for d in os.listdir(idx) if d.startswith("v=")
    ) == ["v=2"]
    assert sorted(map(tuple, ann_index_query(spark, idx, q, k=5, nprobe=16).collect())) == want
    assert read_ann_index(spark, idx).count() == 350
    # idempotent: compacting a compacted index changes nothing
    compact_ann_index(spark, idx)
    assert sorted(map(tuple, ann_index_query(spark, idx, q, k=5, nprobe=16).collect())) == want

    # crash window: intent written, nothing applied -> rerun finishes
    idx2 = str(tmp_path / "idx2")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_ann(spark, b, i, idx2, n_centroids=16)
    live = read_ann_index(spark, idx2, id_col="vec_id")
    staging = f"{idx2}/_compact_tmp"
    live.drop("v").withColumn("_v", F.lit(2)).write.partitionBy("_v", "_cell").parquet(staging)
    with open(f"{idx2}/_compact_intent.json", "w") as f:
        json.dump({"fold": 2, "versions": [0, 1, 2]}, f)
    assert compact_ann_index(spark, idx2) == 2
    assert sorted(map(tuple, ann_index_query(spark, idx2, q, k=5, nprobe=16).collect())) == want

    # crash window: intent written but staging incomplete -> restarted
    idx3 = str(tmp_path / "idx3")
    for i, b in enumerate(_changelog_batches(spark, sf_dir)):
        ingest_batch_ann(spark, b, i, idx3, n_centroids=16)
    os.makedirs(f"{idx3}/_compact_tmp", exist_ok=True)  # no _SUCCESS
    with open(f"{idx3}/_compact_intent.json", "w") as f:
        json.dump({"fold": 2, "versions": [0, 1, 2]}, f)
    assert compact_ann_index(spark, idx3) == 2
    assert sorted(map(tuple, ann_index_query(spark, idx3, q, k=5, nprobe=16).collect())) == want


def test_ann_ingest_probe_scan_is_payload_blind(spark, sf_dir, tmp_path):
    """Plan audit: the history probe that locates prior rows of touched
    ids reads id/cell/version only — the vector payload (~99% of index
    bytes) never enters the tombstone-discovery scan."""
    idx = str(tmp_path / "idx")
    batches = _changelog_batches(spark, sf_dir)
    ingest_batch_ann(spark, batches[0], 0, idx, n_centroids=16)

    hist = read_ann_index(spark, idx, below=1)
    touched = _emb(spark, sf_dir).filter(F.col("vec_id") < 10).select("vec_id")
    kills = (
        hist.select("vec_id", "_cell", "v")
        .join(touched, "vec_id", "left_semi")
        .withColumnRenamed("v", "v_kill")
    )
    plan = kills._jdf.queryExecution().executedPlan().toString()
    # the index scan is the one producing partition columns (v, _cell);
    # plan strings truncate Location paths, so match on output columns
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l and "_cell#" in l]
    assert scans, plan
    for s in scans:
        assert "embedding" not in s.split("ReadSchema:")[1], s
