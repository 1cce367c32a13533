"""Quality gates for the PCA/whitening operator (functions/pca.py) — the
non-SQL-expressible entry's substitute for a DuckDB oracle, same discipline
as the MinHash/HLL gates: instead of value-hash equality, pin the algebraic
invariants exact PCA must satisfy, against NumPy ground truth computed on
the collected corpus (fine at test scale; the operator itself never
collects)."""

from __future__ import annotations

import numpy as np

from kafka_connect_logminer2_spark.functions import pca as P


def _corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _local(emb):
    return np.stack([r["embedding"] for r in emb.select("embedding").collect()]).astype(
        np.float64
    )


def test_gram_stats_matches_numpy(spark, sf_dir):
    emb = _corpus(spark, sf_dir)
    x = _local(emb)
    gram, s, n = P.gram_stats(emb)
    assert n == len(x)
    assert np.allclose(gram, x.T @ x, rtol=1e-10)
    assert np.allclose(s, x.sum(axis=0), rtol=1e-10)


def test_components_orthonormal_and_sign_pinned(spark, sf_dir):
    model = P.fit_pca(_corpus(spark, sf_dir), k=8)
    c = model["components"]
    assert c.shape[0] == 8
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-10)
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0  # sign pin
    # eigenvalues sorted descending
    assert all(a >= b - 1e-12 for a, b in zip(model["evals"], model["evals"][1:]))


def test_reconstruction_error_equals_discarded_eigenmass(spark, sf_dir):
    """For exact PCA, MSE of the k-dim reconstruction == sum of the
    discarded eigenvalues — an internal cross-check that ties the
    distributed Gram pass, the eigensolve, and the projection map
    together: all three must be consistent for the identity to hold."""
    emb = _corpus(spark, sf_dir)
    model = P.fit_pca(emb, k=8)
    mse = P.reconstruction_error(emb, model)
    discarded = model["total_var"] - float(model["evals"].sum())
    assert np.isclose(mse, discarded, rtol=1e-8)
    # and more components must never reconstruct worse
    assert P.reconstruction_error(emb, P.fit_pca(emb, k=16)) <= mse + 1e-12


def test_whitened_projection_has_unit_covariance(spark, sf_dir):
    emb = _corpus(spark, sf_dir)
    model = P.fit_pca(emb, k=8)
    proj = np.stack(
        [r["proj"] for r in P.pca_project(emb, model, whiten=True).collect()]
    )
    cov = np.cov(proj, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(8), atol=1e-6)


def test_fit_is_deterministic_across_runs_and_partitionings(spark, sf_dir):
    emb = _corpus(spark, sf_dir)
    m1 = P.fit_pca(emb, k=4)
    m2 = P.fit_pca(emb.repartition(7), k=4)
    assert np.allclose(m1["components"], m2["components"], atol=1e-8)
    assert np.allclose(m1["evals"], m2["evals"], rtol=1e-10)


def test_pca_reduced_topk_overlap_on_lowrank_corpus(spark):
    """q123's quality gate. The fixture corpus is near-ISOTROPIC (measured
    var@16 ≈ 0.38 — a flat spectrum), so reducing it can't preserve
    neighbors — that is a property of random data, not of the operator.
    The operator's contract is: WHEN the corpus is low-rank (real
    embedding corpora are — that's why PCA reduction is standard serving
    practice), the reduced top-k recovers the full-dim top-k. Plant an
    8-rank corpus + small noise and require ≥ 0.8 overlap@5 AND ≥ 0.95
    variance captured at k=16."""
    import numpy as np

    import pyspark.sql.functions as F

    from kafka_connect_logminer2_spark.functions.similarity import cosine_topk

    rng = np.random.default_rng(7)
    W = rng.standard_normal((64, 8))
    z = rng.standard_normal((400, 8))
    x = z @ W.T + 0.05 * rng.standard_normal((400, 64))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )

    model = P.fit_pca(emb, k=16)
    assert float(model["evals"].sum() / model["total_var"]) >= 0.95
    proj = P.pca_project(emb, model).withColumnRenamed("proj", "embedding")

    q_full = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q_proj = proj.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q_full, k=5).collect()
    }
    reduced = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(proj, q_proj, k=5).collect()
    }
    overlap = len(exact & reduced) / len(exact)
    assert overlap >= 0.8, f"PCA-reduced top-k overlap collapsed: {overlap}"
