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


def pqann_rerank_query(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    candidates: int = 64,
    nprobe: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The full production serving path over the MAINTAINED store:
    changelog-maintained packed codes select ``candidates`` ≫ k cheap
    approximate candidates (cell-pruned ADC scan), then EXACT cosine
    re-ranks only those against the source-of-truth ``vectors`` relation
    (candidate list broadcast → |Q|·C vector fetch, no corpus shuffle) —
    q176's two-stage shape with the first stage served from the
    incrementally-maintained relation instead of a one-shot encode.
    With nprobe = n_centroids and candidates ≥ live-set size this
    REDUCES TO EXACT cosine top-k over the live membership (the cdc45
    oracle pin); production settings trade candidates/nprobe for cost
    exactly as in q176/q174."""
    from ..functions.similarity import cosine

    from pyspark.sql import Window

    cand = pqann_index_query(
        spark, index_dir, queries, k=candidates, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select("query_id", "neighbor_id")
    nvec = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec")
    )
    qvec = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = (
        nvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qvec"), F.col("_nvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


_REINDEX_INTENT = "_reindex_intent.json"


def reindex_pqann(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    m: int | None = None,
    n_codes: int | None = None,
    train_iters: int = 2,
    train_sample: int = 2048,
) -> int:
    """OFFLINE model refresh — the lifecycle step frozen models need:
    retrain the coarse quantizer + residual codebooks on the CURRENT live
    membership and rewrite the store under the new models (optionally
    with new n_centroids/m/K — e.g. growing the bit budget as the corpus
    grows, the standard PQ operating curve). PQ codes are lossy, so a
    reindex cannot bootstrap from the stored codes: ``vectors`` must be
    the source-of-truth (id, vector) relation — at scale the code store
    is DERIVED data and the corpus lake is where vectors live. The
    CONSISTENCY CONTRACT is the caller's: ``vectors`` must carry each
    live id's CURRENT vector (the state the applied changelog produced);
    codes cannot be compared back to vectors, so a stale corpus relation
    would be re-encoded verbatim and silently serve old embeddings —
    exactly like rebuilding any derived index from a stale snapshot.
    Extra rows (deleted/never-ingested ids) are ignored via semi-join;
    every live id MISSING from ``vectors`` raises (a silent shrink would
    be data loss, not a refresh).

    Stop the stream first (no concurrent readers/writers — the
    compact_ann_index bar). Crash-recoverable: the staged segment +
    models + meta land under ``_reindex_tmp`` before an intent file is
    written; re-running after a crash at any step finishes the swap.
    The resume position is PRESERVED (commit markers untouched, the
    folded segment lands at v=<last committed>), so the changelog stream
    continues exactly where it left off — its next batch validates
    against the NEW meta, making stale-parameter callers fail loudly.
    Returns the fold version."""
    import json as _json
    import shutil

    from .corpus_ingest import _read_meta
    from .snapshot import _last_committed_batch

    staging = os.path.join(index_dir, "_reindex_tmp")
    intent_path = os.path.join(index_dir, _REINDEX_INTENT)
    if os.path.exists(intent_path):
        with open(intent_path) as f:
            intent = _json.load(f)
        if not os.path.exists(os.path.join(staging, "seg", "_SUCCESS")):
            shutil.rmtree(staging, ignore_errors=True)
            os.remove(intent_path)
        else:
            return _finish_reindex(index_dir, intent, staging, intent_path)

    meta = _read_meta(index_dir)
    if not meta or meta.get("kind") != "pqann_mor":
        raise ValueError(f"{index_dir} is not a pqann_mor store")
    last = _last_committed_batch(index_dir)
    if last is None:
        raise ValueError(f"{index_dir} has no committed batches to reindex")
    n_centroids = n_centroids or int(meta["n_centroids"])
    m = m or int(meta["m"])
    n_codes = n_codes or int(meta["n_codes"])

    live_ids = read_ann_index(spark, index_dir, id_col=id_col).select(id_col)
    live_vecs = vectors.select(F.col(id_col), F.col(vec_col)).join(
        live_ids, id_col, "left_semi"
    ).persist()
    try:
        n_live = live_ids.count()
        n_have = live_vecs.count()
        if n_have != n_live:
            raise ValueError(
                f"reindex of {index_dir}: {n_live - n_have} live id(s) have "
                "no vector in the supplied corpus relation — refusing to "
                "silently shrink the index; supply the full source-of-truth "
                "vectors"
            )
        cmat_n, books = _train_models(
            live_vecs, n_centroids, m, n_codes, train_iters, train_sample,
            id_col, vec_col,
        )
        b, _per = _pq_bit_layout(m, n_codes)
        shutil.rmtree(staging, ignore_errors=True)
        ivfpq_encode(
            live_vecs, cmat_n, books, m, n_codes,
            id_col=id_col, vec_col=vec_col,
        ).write.partitionBy("_cell").parquet(os.path.join(staging, "seg"))
        _save_centroids(spark, staging, cmat_n)  # writes staging/_model/...
        _save_books(spark, staging, books)
        new_meta = dict(meta)
        new_meta.update(
            {"n_centroids": int(len(cmat_n)), "dim": int(cmat_n.shape[1]),
             "m": int(m), "n_codes": int(n_codes), "code_bits": int(m * b)}
        )
        with open(os.path.join(staging, "_meta.json"), "w") as f:
            _json.dump(new_meta, f)
        intent = {"fold": int(last)}
        with open(intent_path, "w") as f:
            _json.dump(intent, f)
        return _finish_reindex(index_dir, intent, staging, intent_path)
    finally:
        live_vecs.unpersist()


def _finish_reindex(
    index_dir: str, intent: dict, staging: str, intent_path: str
) -> int:
    """Apply a staged reindex: drop every old version dir, tombstones and
    model, move the new segment/model/meta into place, clear the intent.
    Each step is re-runnable (already-moved pieces are skipped)."""
    import glob as _glob
    import shutil

    fold = int(intent["fold"])
    for vdir in _glob.glob(os.path.join(index_dir, "v=*")):
        shutil.rmtree(vdir, ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "_tombstones"), ignore_errors=True)
    seg = os.path.join(staging, "seg")
    if os.path.isdir(seg):
        # seg carries _cell=... partition dirs + _SUCCESS; land as v=<fold>
        os.replace(seg, os.path.join(index_dir, f"v={fold}"))
    model = os.path.join(staging, "_model")
    if os.path.isdir(model):
        shutil.rmtree(os.path.join(index_dir, "_model"), ignore_errors=True)
        os.replace(model, os.path.join(index_dir, "_model"))
    meta = os.path.join(staging, "_meta.json")
    if os.path.exists(meta):
        os.replace(meta, os.path.join(index_dir, "_meta.json"))
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(intent_path)
    return fold


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
