"""Streaming IVF-PQ index maintenance: the billion-scale composition —
cell-pruned scans over 16-byte packed residual codes (q174/q176 family) —
maintained INCREMENTALLY from a changelog of embedding upserts/deletes.

At 100 TB the raw-vector maintained index (ann_ingest.py) stores ~256 B
of float32 per 64-dim row; production vector stores keep the serving
relation as PQ codes (16 B/row at m=32/K=16 — the measured footprint in
BASELINE.md r12) and fetch raw vectors only for re-ranking. This module
gives that relation the SAME exactly-once versioned merge-on-read layout
as ann_ingest (whose helpers it imports — commit markers, version dirs,
exact-(id, _cell, v) tombstones, the anti-join read):

    index_dir/
      _meta.json                  # kind=pqann_mor, n_centroids/m/K/dim
      _model/centroids.parquet    # frozen coarse quantizer (normalized)
      _model/books.parquet        # frozen residual codebooks (m, K, d/m)
      _commits/<batch_id>
      v=<batch_id>/_cell=<c>/     # (id, _c0, _c1) packed residual codes
      _tombstones/v=<batch_id>/

Both models are FROZEN at first batch (trained on the first batch's
upserts): moving cell boundaries would strand committed rows, and
re-trained codebooks would make old codes unreadable — the same
invariant ann_ingest pins for centroids, extended to the codebooks. The
serve path is functions.similarity.ivfpq_scan — byte-identical math to
the one-shot ivfpq_topk (shared kernel, cannot drift); encode is the
shared ivfpq_encode. Compaction reuses compact_ann_index (the layout is
payload-agnostic: same version/tombstone shape, codes instead of
vectors), dispatched offline-only via maintenance.maintain_store under
kind ``pqann_mor``.

Reference parity: none — §2C similarity-family extension (the r12
"maintained index stores codes, not vectors" step on top of cdc14-19).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.similarity import (
    _kmeans_subspaces,
    _pq_bit_layout,
    _safe_norms,
    ivf_centroids,
    ivfpq_encode,
    ivfpq_scan,
    load_ivf_centroids,
    _save_centroids,
)
from .corpus_ingest import _ensure_meta, _note_row_schema
from .ann_ingest import read_ann_index
from .snapshot import _mark_committed


def _save_books(spark: SparkSession, index_dir: str, books: np.ndarray) -> None:
    """Persist the (m, K, d/m) residual codebook tensor, row order pinned
    by explicit (j, ki) ids like the centroid model."""
    m, k, dsub = books.shape
    rows = [
        (int(j), int(ki), [float(x) for x in books[j][ki]])
        for j in range(m)
        for ki in range(k)
    ]
    spark.createDataFrame(
        rows, "j int, ki int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/_model/books.parquet"
    )


def load_pq_books(spark: SparkSession, index_dir: str) -> np.ndarray:
    rows = spark.read.parquet(f"{index_dir}/_model/books.parquet").collect()
    if not rows:
        raise ValueError(f"no codebook model at {index_dir}/_model")
    m = 1 + max(r["j"] for r in rows)
    k = 1 + max(r["ki"] for r in rows)
    dsub = len(rows[0]["centroid"])
    books = np.empty((m, k, dsub))
    for r in rows:
        books[r["j"]][r["ki"]] = r["centroid"]
    return books


def _train_models(
    ups: DataFrame,
    n_centroids: int,
    m: int,
    n_codes: int,
    train_iters: int,
    train_sample: int,
    id_col: str,
    vec_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """First-batch model fit, mirroring ivfpq_topk's training discipline:
    coarse centroids via the shared ivf_centroids, residual codebooks via
    per-subspace k-means on the hash sample's residuals (bounded collect,
    corpus-size-independent)."""
    cmat = ivf_centroids(
        ups, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
    )
    cmat_n = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    rows = (
        ups.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(train_sample)
        .collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    x /= _safe_norms(x)[:, None]
    cells = np.argsort(-(x @ cmat_n.T), axis=1, kind="stable")[:, 0]
    books = _kmeans_subspaces(x - cmat_n[cells], m, n_codes, 8)
    return cmat_n, books


def ingest_batch_pqann(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str = "op",
    n_centroids: int = 16,
    m: int = 32,
    n_codes: int = 16,
    train_iters: int = 2,
    train_sample: int = 2048,
) -> None:
    """One maintenance step (the foreachBatch body; public so batch
    pipelines and the cdc43 registry entry drive it directly). Changelog
    semantics match ingest_batch_ann exactly: I/U upsert, D deletes,
    in-batch DELETE wins, an id upserted twice in one batch RAISES
    (micro-batch frames are unordered). Retry-idempotent: the batch
    writes only its own ``v=``/tombstone dirs, commit marker last —
    which also covers model training, because the trained models are
    persisted BEFORE the data write and a retry reloads them instead of
    retraining on a possibly-different partition order."""
    import shutil

    ups = batch.filter(F.col(op_col).isin("I", "U")).select(
        F.col(id_col), F.col(vec_col)
    )
    dels = batch.filter(F.col(op_col) == "D").select(F.col(id_col)).distinct()
    ups = ups.join(dels, id_col, "left_anti").persist()
    try:
        dup = (
            ups.groupBy(id_col).count().filter(F.col("count") > 1)
            .limit(3).collect()
        )
        if dup:
            raise ValueError(
                f"batch {batch_id} upserts id(s) {[r[0] for r in dup]} more "
                "than once — in-batch order is undefined; compact the "
                "changelog per batch upstream"
            )
        has_model = os.path.isdir(f"{index_dir}/_model")
        if has_model:
            cmat_n = load_ivf_centroids(spark, index_dir)
            books = load_pq_books(spark, index_dir)
        else:
            cmat_n, books = _train_models(
                ups, n_centroids, m, n_codes, train_iters, train_sample,
                id_col, vec_col,
            )
        b, _per = _pq_bit_layout(m, n_codes)
        _ensure_meta(
            index_dir,
            {
                "kind": "pqann_mor",
                "n_centroids": int(len(cmat_n)),
                "dim": int(cmat_n.shape[1]),
                "m": int(m),
                "n_codes": int(n_codes),
                "code_bits": int(m * b),
            },
        )
        _note_row_schema(
            index_dir,
            f"{id_col} {batch.schema[id_col].dataType.simpleString()}, "
            "_c0 bigint, _c1 bigint, _cell int, v int",
        )
        if not has_model:
            _save_centroids(spark, index_dir, cmat_n)
            _save_books(spark, index_dir, books)

        # prior committed rows of touched ids -> exact-version tombstones
        # (read_ann_index is payload-agnostic: same anti-join layout)
        touched = ups.select(id_col).unionByName(dels)
        hist = read_ann_index(spark, index_dir, id_col=id_col, below=batch_id)
        tdir = f"{index_dir}/_tombstones/v={batch_id}"
        shutil.rmtree(tdir, ignore_errors=True)
        if hist is not None:
            kills = (
                hist.select(id_col, "_cell", "v")
                .join(touched, id_col, "left_semi")
                .withColumnRenamed("v", "v_kill")
            )
            kills.write.parquet(tdir)

        staging = f"{index_dir}/_v_tmp_{batch_id}"
        shutil.rmtree(staging, ignore_errors=True)
        ivfpq_encode(
            ups, cmat_n, books, m, n_codes, id_col=id_col, vec_col=vec_col
        ).write.partitionBy("_cell").parquet(staging)
        dst = f"{index_dir}/v={batch_id}"
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(staging, dst)
        _mark_committed(index_dir, batch_id)
    finally:
        ups.unpersist()


def write_pqann_ingest(
    changelog: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Stream the changelog into the maintained PQ index (foreachBatch
    over :func:`ingest_batch_pqann`; exactly-once by the version-dir +
    commit-marker discipline)."""
    spark = changelog.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_pqann(spark, batch, batch_id, index_dir, **kwargs)

    writer = changelog.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pqann_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve approximate top-k from the maintained code relation: the
    committed live (id, _cell, _c0, _c1) frame (merge-on-read anti-join)
    through the SHARED ivfpq_scan — identical probe order, ADC math,
    rounding, and tie-breaks to the one-shot ivfpq_topk."""
    live = read_ann_index(spark, index_dir, id_col=id_col)
    if live is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, pq_dist double, rank int"
        )
    from .corpus_ingest import _read_meta

    meta = _read_meta(index_dir) or {}
    cmat_n = load_ivf_centroids(spark, index_dir)
    books = load_pq_books(spark, index_dir)
    return ivfpq_scan(
        live.drop("v"), queries, cmat_n, books,
        int(meta["m"]), int(meta["n_codes"]), nprobe=nprobe, k=k,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
