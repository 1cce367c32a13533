"""k-means differential test: the distributed Lloyd's loop must reproduce a
single-process NumPy reference run (same deterministic init, same
first-wins argmin tie-break). This is the oracle for an operator a SQL
engine can't express (iterative fixpoint) — SURVEY §5 strategy applied to
§2C clustering."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.clustering import kmeans
from kafka_connect_logminer2_spark.sources.tables import load_table


def numpy_kmeans(ids: np.ndarray, v: np.ndarray, k: int, max_iter: int, tol: float):
    order = np.argsort(ids, kind="stable")
    ids, v = ids[order], v[order]
    cmat = v[:k].copy()
    for it in range(1, max_iter + 1):
        d2 = (v * v).sum(1, keepdims=True) - 2.0 * (v @ cmat.T) + (cmat * cmat).sum(1)
        best = np.argmin(d2, axis=1)
        new = cmat.copy()
        for c in range(k):
            m = best == c
            if m.any():
                new[c] = v[m].mean(axis=0)
        shift = float(np.abs(new - cmat).max())
        cmat = new
        if shift <= tol:
            break
    d2 = (v * v).sum(1, keepdims=True) - 2.0 * (v @ cmat.T) + (cmat * cmat).sum(1)
    best = np.argmin(d2, axis=1)
    return ids, best, cmat


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    v = np.asarray([r[1] for r in rows], dtype=np.float64)

    ref_ids, ref_assign, ref_cmat = numpy_kmeans(ids, v, k=8, max_iter=10, tol=1e-6)
    assigned, cmat, n_iter = kmeans(emb, k=8, max_iter=10)

    got = (
        assigned.toPandas().set_index("vec_id").loc[ref_ids, "cluster"].to_numpy()
    )
    # Spark's avg reduces in partition order, NumPy pairwise — centroids can
    # differ in final ulps, so allow a handful of boundary flips, not drift
    n_diff = int((got != ref_assign).sum())
    assert n_diff <= max(1, len(ids) // 100), f"{n_diff}/{len(ids)} assignments differ"
    assert np.abs(cmat - ref_cmat).max() < 1e-3
    assert 1 <= n_iter <= 10


def test_kmeans_inertia_decreases(spark, sf_dir):
    """More Lloyd's iterations must never increase total within-cluster
    distance (the convergence invariant)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a1, _, _ = kmeans(emb, k=4, max_iter=1)
    a5, _, _ = kmeans(emb, k=4, max_iter=5)
    i1 = a1.agg(F.sum(F.col("dist") * F.col("dist"))).collect()[0][0]
    i5 = a5.agg(F.sum(F.col("dist") * F.col("dist"))).collect()[0][0]
    assert i5 <= i1 + 1e-9
