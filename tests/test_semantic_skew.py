"""Hot-cluster sub-blocking in semantic_neardup_pairs (functions/similarity.py):
SemDeDup cluster sizes are Zipfian on real corpora, and the r2 version gave
each cluster exactly one applyInPandas task — one hot cluster = one task's
memory. The r3 version hashes rows of a hot cluster into
nb = ceil(size / max_cluster_rows) blocks and runs every (bi <= bj) block
pair as its own bounded tile.

Two properties pinned here:
  1. SEMANTICS UNCHANGED — the split changes task shape, not the result:
     pairs with an aggressive bound equal pairs with the bound effectively
     off, bit-for-bit.
  2. TILES BOUNDED UNDER SKEW — on a fixture where one cluster holds half
     the corpus, the exact blocking rule the operator uses yields per-block
     row counts within a small constant of max_cluster_rows, so no task's
     tile grows with the hot cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.similarity import semantic_neardup_pairs

N = 600
DIM = 8
MAX_ROWS = 32


def _skewed_embeddings(spark):
    """ids 0..N-1; even ids (half the corpus) sit near axis e0 → cluster 0
    is hot; odd ids spread across axis e1 → cluster 1. Deterministic
    perturbations keep every pair's cosine reproducible."""
    rows = []
    for i in range(N):
        v = [0.0] * DIM
        if i % 2 == 0:
            v[0] = 1.0
            v[2] = 0.001 * (i % 7)  # tiny spread, stays in cluster 0
        else:
            v[1] = 1.0
            v[3] = 0.001 * (i % 5)
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0] + [0.0] * (DIM - 1)), (1, [0.0, 1.0] + [0.0] * (DIM - 2))],
        "vec_id long, embedding array<double>",
    )


def test_subblocked_result_identical_to_unsplit(spark):
    emb = _skewed_embeddings(spark).localCheckpoint()
    cents = _centroids(spark)
    split = sorted(
        map(
            tuple,
            semantic_neardup_pairs(
                emb, threshold=0.9, centroids=cents, max_cluster_rows=MAX_ROWS
            ).collect(),
        )
    )
    unsplit = sorted(
        map(
            tuple,
            semantic_neardup_pairs(
                emb, threshold=0.9, centroids=cents, max_cluster_rows=10**9
            ).collect(),
        )
    )
    assert split == unsplit
    # the hot cluster really is hot and really produces pairs
    assert len(split) > 1000
    assert {r[0] for r in split} == {0, 1}


def test_block_sizes_bounded_on_hot_cluster(spark):
    """Replicate the operator's exact blocking rule (nb = ceil(size/max),
    blk = pmod(xxhash64(id), nb)) on the skewed fixture and bound every
    block: per-task tile rows never scale with the hot-cluster size."""
    emb = _skewed_embeddings(spark)
    # assignment is known by construction: even → 0, odd → 1 (both size N/2)
    csize = N // 2
    nb = math.ceil(csize / MAX_ROWS)
    assert nb > 1  # the fixture genuinely triggers sub-blocking
    counts = (
        emb.withColumn("cluster", (F.col("vec_id") % 2).cast("int"))
        .withColumn(
            "blk", F.pmod(F.xxhash64("vec_id"), F.lit(nb)).cast("int")
        )
        .groupBy("cluster", "blk")
        .count()
        .collect()
    )
    assert len(counts) == 2 * nb  # no empty blocks at this size
    worst = max(r["count"] for r in counts)
    # expected csize/nb rows per block; allow 2x hash variance. A task's
    # tile holds one L block + one R block ≤ 2·worst rows.
    assert worst <= 2 * MAX_ROWS
