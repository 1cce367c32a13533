"""PCA / whitening over an ``array<float>`` embedding column — the
SemDeDup-style preprocessing step (Abbas et al. 2023 whiten before
clustering; also the standard dimensionality-reduction pass before ANN
indexing at 100 TB: a 64→16 projection cuts index bytes 4× and speeds every
downstream cosine).

Scale design: the ONLY full-data passes are (1) a partial-Gram aggregation —
each Arrow batch contributes its d×d Gram, mean-sum and count via ONE NumPy
``m.T @ m`` per batch, combined per partition, so the driver receives
``num_partitions`` rows of d² doubles (the distributed treeAggregate shape;
nothing on the driver ever scales with N) — and (2) the projection map, a
single matmul per batch against the broadcast k×d component matrix. The
eigendecomposition itself runs on the driver over the d×d covariance
(d ≤ a few thousand — model-sized, not data-sized).

Determinism: partial sums are combined in sorted partition order and
``numpy.linalg.eigh`` is deterministic given the matrix; component SIGN is
pinned by making each eigenvector's largest-|coordinate| entry positive
(eigenvectors are sign-ambiguous — unpinned, two runs can emit mirrored
projections). Exact SQL oracles are impossible (eigensolvers aren't SQL);
quality gates in tests/test_pca.py pin orthonormality, whitened covariance
≈ I, reconstruction-error monotonicity, and cross-run determinism instead —
the same discipline as the MinHash/HLL entries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def gram_stats(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(gram, sum_vec, n): X'X, column sums, and row count, computed with
    one NumPy pass per Arrow batch and one driver-sized combine."""

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        s = None
        n = 0
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = m.T @ m
            gram = g if gram is None else gram + g
            sv = m.sum(axis=0)
            s = sv if s is None else s + sv
            n += len(m)
        if n:
            yield pd.DataFrame(
                {"gram": [gram.ravel()], "sums": [s], "n": [n]}
            )

    rows = (
        embeddings.select(vec_col)
        .mapInPandas(partials, "gram array<double>, sums array<double>, n long")
        .collect()
    )
    if not rows:
        raise ValueError("gram_stats: empty embedding corpus")
    # combine in a TOTALLY-ordered sequence — float addition is not
    # associative, and a partial key like (n, sums[0]) ties for symmetric/
    # duplicated data, leaving tied partials in nondeterministic collect
    # order; the full (n, sums, gram) tuple is a total key (two partials
    # equal on all of it contribute identically, so their order is moot)
    rows = sorted(rows, key=lambda r: (r["n"], tuple(r["sums"]), tuple(r["gram"])))
    d = len(rows[0]["sums"])
    gram = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        gram += np.asarray(r["gram"]).reshape(d, d)
        s += np.asarray(r["sums"])
        n += int(r["n"])
    return gram, s, n


def fit_pca_from_stats(
    gram: np.ndarray, s: np.ndarray, n: int, k: int
) -> dict[str, np.ndarray]:
    """Fit from the (gram, sum, count) sufficient statistics — the shared
    core of the one-shot fit and the incrementally-maintained streaming
    state (streaming/model_stats.py): the statistics are ADDITIVE, so a
    model over a growing corpus never needs the corpus re-scanned."""
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T  # k × d
    # sign pin: largest-|coordinate| entry of each component made positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "evals": np.maximum(evals[order], 0.0),
        "total_var": float(np.maximum(evals, 0.0).sum()),
    }


def fit_pca(
    embeddings: DataFrame, k: int, vec_col: str = "embedding"
) -> dict[str, np.ndarray]:
    """The PCA model: mean vector, top-k components (rows, sign-pinned),
    their eigenvalues, and the total variance. Driver state is O(d²)."""
    gram, s, n = gram_stats(embeddings, vec_col)
    return fit_pca_from_stats(gram, s, n, k)


def pca_project(
    embeddings: DataFrame,
    model: dict[str, np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """(id, projected k-dim array): one broadcast matmul per Arrow batch.
    ``whiten=True`` scales each component by 1/sqrt(eigenvalue) so the
    output has ~unit covariance (the SemDeDup normalization)."""
    from pyspark.sql.functions import pandas_udf

    mean = model["mean"]
    comps = model["components"]
    if whiten:
        comps = comps / np.sqrt(model["evals"] + eps)[:, None]

    @pandas_udf("array<double>")
    def project(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64) - mean
        out = m @ comps.T
        return pd.Series(list(out))

    return embeddings.select(F.col(id_col), project(F.col(vec_col)).alias("proj"))


def reconstruction_error(
    embeddings: DataFrame,
    model: dict[str, np.ndarray],
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the k-dim projection — the
    model-quality number (equals the discarded eigenvalue mass for exact
    PCA, which the tests exploit as a cross-check)."""
    from pyspark.sql.functions import pandas_udf

    mean = model["mean"]
    comps = model["components"]

    @pandas_udf("double")
    def err(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64) - mean
        rec = (m @ comps.T) @ comps
        return pd.Series(((m - rec) ** 2).sum(axis=1))

    row = (
        embeddings.select(err(F.col(vec_col)).alias("e"))
        .agg(F.avg("e").alias("mse"))
        .collect()[0]
    )
    return float(row["mse"])


def whitened_cov_err(proj: DataFrame, k: int, proj_col: str = "proj") -> float:
    """Max |cov(projection) − I| entry, computed as Spark aggregates —
    cov_ij = E[pi·pj] − E[pi]·E[pj], so k means + k(k+1)/2 product means
    land on the driver (a handful of doubles), never the projected corpus
    (the unbounded collect the r7 verdict flagged; at 10⁹ vectors that
    collect IS the corpus). Shared by the q155 quality gate and q120's
    oracle-pinned invariant so the two cannot drift."""
    import numpy as np
    from pyspark.sql import functions as F

    cols = [F.col(proj_col)[i] for i in range(k)]
    r = proj.agg(
        *[F.avg(cols[i]).alias(f"m{i}") for i in range(k)],
        *[
            F.avg(cols[i] * cols[j]).alias(f"p{i}{j}")
            for i in range(k)
            for j in range(i, k)
        ],
    ).first()
    err = 0.0
    eye = np.eye(k)
    for i in range(k):
        for j in range(i, k):
            cov_ij = r[f"p{i}{j}"] - r[f"m{i}"] * r[f"m{j}"]
            err = max(err, abs(cov_ij - eye[i, j]))
    return float(err)
