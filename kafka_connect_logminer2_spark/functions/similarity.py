"""Vector similarity search (SURVEY §2C): brute-force cosine top-k baseline
and an LSH-bucketed scale path over an ``array<float>`` embedding column.

Scale design: brute force is a broadcast-join (queries are small) + per-row
JVM arithmetic + a top-k window — no Python, one shuffle for the window.
At 100 TB the random-hyperplane LSH variant prunes candidates to matching
buckets first; the final exact re-rank is the same operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays (element-wise cast →
    the oracle's unnest-and-sum in double matches bit-for-bit up to fp
    associativity; results are rounded at the query surface)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self-matches excluded). Queries are broadcast — the corpus is
    never shuffled until the per-query top-k window."""
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    scored = embeddings.join(F.broadcast(q), F.col(id_col) != F.col("_qid")).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 5,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    The classic construction: ``num_tables`` independent hash tables, each
    the sign-pattern of ``num_planes`` random hyperplanes; a corpus row is a
    candidate if it collides with the query in ANY table (OR-of-ANDs —
    recall rises with tables, precision with planes). Candidates get an
    exact cosine re-rank. A single table at 8 planes measured recall@5 ≈ 0
    on the fixture corpus — the multi-table OR is what makes LSH usable
    (sweep on sf0.01: 5 planes × 8 tables → recall@5 0.725 probing ~25% of
    the corpus; 5×16 → 0.80. Grow ``num_planes`` with log2(corpus) to hold
    the probed fraction constant at scale).

    Scale shape: the corpus is exploded to ``num_tables`` postings (the LSH
    index, ~L×N rows — at 100 TB this is written once, bucketed by
    (table, bucket)); each query probes L buckets and re-ranks only
    collisions, never scanning the corpus.
    """
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    # all tables' planes stacked: (num_tables*num_planes) × dim. Bucket
    # assignment is ONE NumPy matmul per Arrow batch — L×p×dim interpreted
    # HOF dot products per row were the measured 300× slow path (BASELINE).
    pmat = rng.standard_normal((num_tables * num_planes, dim))
    weights = (1 << np.arange(num_planes - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        signs = (v @ pmat.T >= 0).astype(np.int64)  # n × (L*p)
        per_table = signs.reshape(len(v), num_tables, num_planes) @ weights
        return pd.Series(list(per_table))

    def buckets(vec: Column) -> Column:
        return buckets_udf(vec)

    # corpus → (id, vec, table, bucket) postings; queries likewise (broadcast)
    corpus = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(buckets(F.col(vec_col))).alias("_t", "_bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        F.posexplode(buckets(F.col(vec_col))).alias("_qt", "_qbucket"),
    )
    candidates = (
        corpus.join(
            F.broadcast(q),
            (F.col("_t") == F.col("_qt"))
            & (F.col("_bucket") == F.col("_qbucket"))
            & (F.col(id_col) != F.col("_qid")),
        )
        # collide-in-any-table → dedupe before the (expensive) exact re-rank
        .select(F.col("_qid"), F.col(id_col), F.col("_qvec"), F.col(vec_col))
        .dropDuplicates(["_qid", id_col])
    )
    scored = candidates.select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cell partitioning — the
    second 100 TB ANN path next to :func:`lsh_bucketed_topk`.

    Centroids are a deterministic corpus sample (every ``centroid_stride``-th
    id) standing in for trained k-means centers; like a trained model's
    centers they are small, live on the driver, and ship to executors inside
    the UDF closure. Cell assignment is one Arrow-batched pandas UDF doing a
    single NumPy matmul per batch (centroid count × dim is far too large for
    interpreted HOF expressions — measured 300× slower JVM-side at 1.7k
    cells); each query probes its ``nprobe`` nearest cells and exact-cosine
    re-ranks only those candidates. At scale the cell assignment is computed
    once and persisted alongside the vectors, making every query a
    partition-pruned scan of ~nprobe/C of the corpus.
    """
    from pyspark.sql.functions import pandas_udf

    cents = [
        r[1]
        for r in embeddings.filter((F.col(id_col) % centroid_stride) == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    ]
    cmat = np.asarray(cents, dtype=np.float64)
    cmat_n = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    n_probe = nprobe

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sims = v @ cmat_n.T
        # stable argsort on -sim → deterministic lower-index-wins tie-break
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    corpus = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(probe_cells(F.col(vec_col)), 1).alias("_cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        probe_cells(F.col(vec_col)).alias("_probes"),
    )
    scored = corpus.join(
        F.broadcast(q),
        F.array_contains(F.col("_probes"), F.col("_cell"))
        & (F.col(id_col) != F.col("_qid")),
    ).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (exact; the LSH variant above is the
    scale path). Self-join keeps the upper triangle only."""
    a = embeddings.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = embeddings.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cos_sim", F.round(cosine(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("id1").alias("vec_id1"), F.col("id2").alias("vec_id2"), "cos_sim")
    )
