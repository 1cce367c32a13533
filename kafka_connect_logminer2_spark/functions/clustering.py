"""Embedding clustering (SURVEY §2C extension): distributed Lloyd's k-means.

The IVF ANN path (similarity.py::ivf_topk) uses a deterministic corpus
sample as its cell centers; this module supplies the trained alternative —
and is the template for every "small model, big data" iterative algorithm
on this engine:

* model state (k x dim centroids) lives on the DRIVER and ships to
  executors inside an Arrow pandas-UDF closure — never a join;
* the per-iteration heavy step (assignment) is one NumPy matmul per Arrow
  batch (interpreted HOF expressions over big literal arrays are the
  measured 300x slow path — BASELINE.md);
* the reduce step (new centroids) is a partial-aggregated groupBy over
  (cluster, dim) — one shuffle of k x dim x partitions partial sums, not of
  the vectors;
* lineage is cut per iteration with localCheckpoint (same lesson as
  dedup.py::dup_clusters: iterative plans grow exponentially otherwise).

At 100 TB the assignment pass is embarrassingly parallel and the shuffle
stays O(k x dim x partitions) — independent of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def lloyd_refine(
    vecs: DataFrame,
    cmat: np.ndarray,
    n_iter: int,
    tol: float = 1e-6,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, int]:
    """Run up to ``n_iter`` Lloyd iterations from the given k x dim centroid
    matrix; returns ``(refined_matrix, iterations_run)``. The per-iteration
    cost is one assignment matmul pass over the vectors plus a shuffle of
    (cluster, dim) partial sums — independent of corpus size beyond the scan.
    Shared by :func:`kmeans` and the IVF ANN coarse quantizer
    (similarity.py::ivf_topk), so both train the same way."""
    from pyspark.sql.functions import pandas_udf

    from .similarity import _spread

    # parallelism floor once, outside the loop: a single-split corpus would
    # run every iteration's assignment matmul in ONE task (no-op at scale,
    # where the scan already has >= cores partitions)
    vecs = _spread(vecs.select(vec_col))

    it = 0
    for it in range(1, n_iter + 1):
        cur = cmat  # bind the iteration's matrix into the UDF closure

        @pandas_udf("int")
        def assign(col: pd.Series) -> pd.Series:
            v = np.stack(col.to_numpy()).astype(np.float64)
            # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; argmin over c
            d2 = (
                (v * v).sum(axis=1, keepdims=True)
                - 2.0 * (v @ cur.T)
                + (cur * cur).sum(axis=1)
            )
            return pd.Series(np.argmin(d2, axis=1).astype("int32"))

        new_rows = (
            vecs.select(assign(F.col(vec_col)).alias("cluster"), vec_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("c"))
            .collect()
        )
        new_cmat = cmat.copy()  # empty clusters keep their old center
        for r in new_rows:
            new_cmat[r["cluster"], r["dim"]] = r["c"]
        shift = float(np.abs(new_cmat - cmat).max())
        cmat = new_cmat
        if shift <= tol:
            break
    return cmat, it


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, int]:
    """Lloyd's k-means over an ``array<float>`` column.

    Deterministic init: the k lowest-id vectors. Ties in assignment break
    to the lower cluster index (stable argmin), so the result is
    reproducible across partitionings. Returns ``(assignments, centroids,
    n_iter)`` where assignments is (id_col, cluster, dist) — dist the
    euclidean distance to the winning centroid — and centroids the final
    k x dim float64 matrix.
    """
    from pyspark.sql.functions import pandas_udf

    first = embeddings.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cmat = np.asarray([r[1] for r in first], dtype=np.float64)

    vecs = embeddings.select(id_col, vec_col).localCheckpoint(eager=False)
    cmat, n_iter = lloyd_refine(vecs, cmat, max_iter, tol, vec_col=vec_col)
    final = cmat

    @pandas_udf("struct<cluster: int, dist: double>")
    def assign_final(col: pd.Series) -> pd.DataFrame:
        v = np.stack(col.to_numpy()).astype(np.float64)
        d2 = (
            (v * v).sum(axis=1, keepdims=True)
            - 2.0 * (v @ final.T)
            + (final * final).sum(axis=1)
        )
        best = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(best)), best], 0.0))
        return pd.DataFrame({"cluster": best.astype("int32"), "dist": dist})

    out = vecs.select(id_col, assign_final(F.col(vec_col)).alias("a")).select(
        id_col,
        F.col("a.cluster").alias("cluster"),
        F.round(F.col("a.dist"), 6).alias("dist"),
    )
    return out, cmat, n_iter
