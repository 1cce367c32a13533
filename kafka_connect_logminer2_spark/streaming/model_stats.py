"""Incrementally-maintained model sufficient statistics — the streaming-MV
idea (snapshot.py) applied to MODEL STATE instead of table state.

A PCA model needs exactly (X'X, Σx, N), and those statistics are ADDITIVE:
a new micro-batch of vectors contributes its own d×d Gram / sum / count and
nothing else. So the model over a 100 TB-and-growing embedding corpus is
maintained at O(batch) cost per batch — the corpus is NEVER re-scanned, and
``fit_pca_from_stats`` turns the current state into the current model in
O(d³) driver time whenever asked. Contrast with re-fitting per batch:
O(corpus) per batch, which is the same non-starter the snapshot MV exists
to avoid for tables.

Versioning/retry contract is snapshot.py's: each batch writes its combined
state to ``v=<batch_id>`` with parent = the largest committed version
strictly below, so a foreachBatch RETRY recomputes the identical addition
and overwrites its own output (exactly-once without transactions). State is
one row of d² + d + 1 doubles — driver-sized by construction, like the IVF
centroid model (`similarity.py::_save_centroids`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..functions.pca import gram_stats
from .snapshot import latest_version


def _write_state(
    spark: SparkSession, state_dir: str, batch_id: int,
    gram: np.ndarray, s: np.ndarray, n: int,
) -> None:
    d = len(s)
    spark.createDataFrame(
        [([float(x) for x in gram.ravel()], [float(x) for x in s], int(n), d)],
        "gram array<double>, sums array<double>, n long, d int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")


def read_gram_state(
    spark: SparkSession, state_dir: str, as_of: int | None = None
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Current (or as-of — the same time-travel contract as read_snapshot)
    accumulated statistics, or None before the first batch."""
    v = latest_version(state_dir, below=None if as_of is None else as_of + 1)
    if v is None:
        return None
    r = spark.read.parquet(f"{state_dir}/v={v}").collect()[0]
    d = r["d"]
    return np.asarray(r["gram"]).reshape(d, d), np.asarray(r["sums"]), int(r["n"])


def write_gram_stats(
    vec_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """Maintain ``state_dir`` as the versioned (Gram, sum, count) of every
    vector that has ever arrived on ``vec_stream``. Each micro-batch: one
    distributed partial-Gram pass over the BATCH (functions/pca.py), one
    driver-sized add against the parent version, one tiny write."""
    spark = vec_stream.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        gram, s, n = gram_stats(batch, vec_col)
        parent = latest_version(state_dir, below=batch_id)
        if parent is not None:
            pg, ps, pn = read_gram_state(spark, state_dir, as_of=parent)
            gram, s, n = gram + pg, s + ps, n + pn
        _write_state(spark, state_dir, batch_id, gram, s, n)

    writer = vec_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
