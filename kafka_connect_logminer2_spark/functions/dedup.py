"""Deduplication operators (SURVEY §2C): exact, n-gram Jaccard, MinHash+LSH,
SimHash — the large-corpus near-dup toolkit.

Scale design notes (the part that matters at 100 TB):
* exact dedup is a hash aggregate on a fingerprint — one shuffle on a 8-byte
  key, never on the full text;
* Jaccard is exact but quadratic-ish — it joins on *shared shingles* so cost
  is bounded by shingle collision counts, not |docs|²; frequent-shingle
  skew is the real risk → ``max_shingle_freq`` drops stop-shingles (the
  standard big-corpus trick) before the self-join;
* MinHash LSH replaces the pairwise join with banded bucket joins —
  candidates only, linear in collisions (pyspark.ml MinHashLSH);
* SimHash packs a document into one 64-bit signature; hamming-ball lookup
  via 4×16-bit band indexes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .similarity import _spread
from .text import fingerprint, shingles, word_ngrams


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per distinct text; count copies.
    Groups on the 64-bit fingerprint (cheap shuffle), verifies on text to be
    hash-collision-safe."""
    return (
        docs.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp", text_col)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.01,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact k-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    shingle-explode → group docs per shingle → expand each posting list into
    ordered id pairs → per-pair intersection count → |A∪B| = |A|+|B|−|A∩B|.
    The posting-list expansion replaces a self-join on shingle: one shuffle
    of the shingle relation instead of two-plus-join (measured ~2× at sf0.1),
    with identical output. ``max_shingle_freq`` drops shingles occurring in
    more than N docs (stop-shingle skew guard for big corpora) — here a free
    size filter on the posting list instead of a df-count semi-join.
    """
    # parallelism floor BEFORE the shingle build: the tokenize+shingle+hash
    # transform is the kernel's priciest map work and a small corpus is one
    # parquet split = one task (no-op at scale — see similarity._spread)
    arr = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        # hash each shingle to 64 bits up front: an 8-byte fixed shuffle key
        # instead of ~25-byte varchars (collision odds at even 10^9 distinct
        # shingles: ~3e-2 per corpus pair-count, ~1e-8 here)
        F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias(
            "arr"
        ),
    )
    # EAGER barrier: arr feeds two consumers (sizes + posting lists) whose
    # exchanges AQE materializes concurrently — lazy, both race into the
    # tokenize-and-shingle subtree (block-lock serialization; the q105
    # profile); eager pays it exactly once
    arr = arr.localCheckpoint()
    # |doc's shingle set| is just the array length — shingles() emits
    # distinct shingles per doc, so no groupBy over the exploded relation
    sizes = arr.select("id", F.size("arr").cast("long").alias("sz"))
    sh = arr.select("id", F.explode("arr").alias("shingle"))

    postings = sh.groupBy("shingle").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    if max_shingle_freq is not None:
        postings = postings.filter(F.size("ids") <= max_shingle_freq)
    # expand each sorted posting list into its (id1 < id2) pairs — ids within
    # a list are distinct because shingles() emits distinct shingles per doc
    ids = F.col("ids")
    pair_array = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    inter = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id1").alias("doc_id1"),
            F.col("id2").alias("doc_id2"),
            F.col("inter").cast("long").alias("n_shared"),
            "jaccard",
        )
    )


def dup_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
) -> DataFrame:
    """Per-document duplicated-substring accounting (the span-level exact
    dedup signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): for every doc, how many of its distinct
    ``span_tokens``-token windows also occur verbatim in at least one OTHER
    document. Doc-level dedup (exact_dedup/minhash) can't see a boilerplate
    license header pasted into a million otherwise-distinct pages; this
    operator is the detection pass for span-level contamination.

    Plan shape: windows are built JVM-side (text.word_ngrams — zip_with
    slices, no interpreted O(n²) lambda), deduped per doc, and hashed to
    64-bit keys BEFORE the exchange, so the only shuffled relation is
    (doc_id, span_hash) — 16 bytes/row regardless of span length. One
    exchange for the per-span doc count (window over span_hash), one for
    the per-doc rollup. Docs shorter than ``span_tokens`` emit no windows
    and are absent from the output (they cannot carry a duplicated span).
    """
    from pyspark.sql import Window

    docs = _spread(docs.select(id_col, text_col))  # window build ∥ floor
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                word_ngrams(F.split(F.lower(F.col(text_col)), " "), span_tokens)
            )
        ).alias("span"),
    ).select("doc_id", F.xxhash64("span").alias("h"))
    # per-doc distinct spans → count(*) per span-hash == docs containing it
    ndocs = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        spans.withColumn("ndocs", ndocs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("n_dup_spans"),
        )
        .withColumn("dup_frac", F.round(F.col("n_dup_spans") / F.col("n_spans"), 6))
    )


def dup_clusters(
    pairs: DataFrame,
    id1_col: str = "doc_id1",
    id2_col: str = "doc_id2",
    max_iter: int = 64,
    driver_max_edges: int | None = 5_000_000,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id, cluster_id)
    with cluster_id = the component's minimum doc id.

    SIZE-ADAPTIVE: after a dedup threshold, the pair graph is usually tiny
    relative to the corpus (edges ∝ true duplicates, not documents) — when
    it fits the driver (≤ ``driver_max_edges``), the edge list is collected
    COLUMNAR (Arrow → two int64 numpy arrays; 5M edges = 80 MB of buffers,
    never 5M boxed Row objects) and resolved by vectorized min-label
    propagation with pointer doubling — O(E) numpy work per pass, O(log
    diameter) passes, zero extra shuffles. Above the bound, the same
    algorithm distributed: each round every node adopts the min label among
    itself, its neighbors, AND its label's own label (the shortcutting
    join), so convergence is O(log diameter) rounds — one extra tiny join
    per round buys chain graphs that plain neighbor-propagation would need
    diameter rounds for. Runs TO FIXPOINT; ``max_iter`` (64 ≥ log2 of any
    representable component) is a safety valve that RAISES rather than
    silently returning unconverged labels (wrong cluster ids would leak
    straight into q118's train/eval split). Identical output on both paths
    (min-label fixpoint == union-find); the skew test, the forced-
    distributed chain property test, and the q38/q118/q119 oracles hold
    for both.
    """
    e = pairs.select(F.col(id1_col).alias("src"), F.col(id2_col).alias("dst"))
    pdf = None
    if driver_max_edges is not None:
        # size probe and edge fetch FUSED into one action (limit + Arrow
        # collect): bound+1 rows decide the path, and in the common small
        # case they already ARE the edge list — one Spark job instead of
        # count + collect, and no RDD checkpoint to materialize. Only an
        # actually-giant graph pays a second (distributed) pass.
        pdf = e.limit(driver_max_edges + 1).toPandas()
        if len(pdf) > driver_max_edges:
            pdf = None
    if pdf is not None:
        src = pdf["src"].to_numpy(dtype=np.int64, copy=False)
        dst = pdf["dst"].to_numpy(dtype=np.int64, copy=False)
        ids = np.unique(np.concatenate([src, dst])) if len(src) else np.empty(
            0, dtype=np.int64
        )
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        # labels[k] = compact index of the minimum-id node reachable so far
        # (ids is sorted, so min compact index == min doc id)
        labels = np.arange(len(ids), dtype=np.int64)
        while True:
            prev = labels.copy()
            np.minimum.at(labels, si, labels[di])
            np.minimum.at(labels, di, labels[si])
            labels = labels[labels]  # pointer doubling
            if np.array_equal(labels, prev):
                break
        out = pd.DataFrame({"doc_id": ids, "cluster_id": ids[labels]})
        return pairs.sparkSession.createDataFrame(
            out, schema="doc_id long, cluster_id long"
        )

    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint(eager=False)

    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("label"))
            .groupBy("id")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
        )
        # shortcutting: label ← label[label]. Every label IS a node id, so
        # the self-join always resolves; this is what turns O(diameter)
        # propagation into O(log diameter) — a 10^6-long chain converges in
        # ~20 rounds instead of 10^6.
        lab2 = stepped.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        new_labels = (
            stepped.join(lab2, stepped.label == lab2._lid, "left")
            .select(
                "id",
                F.least("label", F.coalesce("_llabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iter} shortcutted rounds — "
        "a component needs > 2^64-ish diameter, which indicates a bug, "
        "never silently return wrong cluster ids"
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    max_jaccard_distance: float = 0.95,
    num_features: int = 1 << 18,
) -> DataFrame:
    """MinHash-LSH candidate pairs (pyspark.ml), the sub-quadratic scale path.

    Shingle sets → sparse hashed features → MinHashLSH.approxSimilarityJoin.
    Returns (doc_id1, doc_id2, jaccard_distance_est).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = docs.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(base)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("doc_id1"),
            F.col("datasetB.id").alias("doc_id2"),
            F.round(F.col("dist"), 6).alias("jaccard_distance_est"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, sig) MinHash signatures — the shared kernel of
    :func:`minhash_banded_pairs` and the incremental near-dup ingest
    (streaming/corpus_ingest.py). Vectorized per Arrow batch: the
    variable-length shingle-hash arrays are concatenated once and ALL
    ``num_hashes`` universal hashes ((a_i·x + b_i) mod p over the 64-bit
    shingle hash) reduce per-document with ``np.minimum.reduceat`` — one
    H×total matrix op per batch, no per-row Python loop. Deterministic in
    (k, num_hashes, seed): signatures computed in different batches/runs
    agree bit-for-bit, which is what makes a PERSISTED signature store
    comparable across time."""
    from pyspark.sql.functions import pandas_udf

    p = (1 << 61) - 1  # Mersenne prime; (a*x+b) mod p is a universal family
    rng = np.random.default_rng(seed)
    a = rng.integers(1, p, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, p, size=num_hashes, dtype=np.int64)

    @pandas_udf("array<long>")
    def signature(sh: pd.Series) -> pd.Series:
        arrs = sh.to_numpy()
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
        out = np.full((len(arrs), num_hashes), p, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            concat = np.concatenate([np.asarray(x, dtype=np.int64) for x in arrs[nz]])
            # unsigned view keeps (a*x+b) well-defined under int64 wraparound;
            # mod p afterwards restores the universal-family guarantee
            vals = (
                (a[:, None].astype(np.uint64) * concat.astype(np.uint64))
                + b[:, None].astype(np.uint64)
            ) % np.uint64(p)
            offsets = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            mins = np.minimum.reduceat(vals.astype(np.int64), offsets, axis=1)  # H × n
            out[nz] = mins.T
        return pd.Series(list(out))

    base = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias("sh"),
    ).filter(F.size("sh") > 0)
    return base.select("id", signature(F.col("sh")).alias("sig"))


def minhash_band_keys(
    sigs: DataFrame, num_hashes: int = 16, num_bands: int = 4
) -> DataFrame:
    """(id, band, key) banded LSH keys from an (id, sig) signature frame.
    Band key = xxhash64 over the band's signature slice (hash expressions
    take arrays natively — pure codegen, no ANSI overflow like a
    hand-rolled FNV multiply fold would hit)."""
    assert num_hashes % num_bands == 0, "num_hashes must divide into bands"
    rows_per_band = num_hashes // num_bands
    band_key = F.xxhash64(
        F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band)
    )
    return (
        sigs.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(num_bands - 1))).alias("band"),
            "sig",
        )
        .withColumn("key", band_key)
        .select("id", "band", "key")
    )


def minhash_agree_frac(s1: F.Column, s2: F.Column, num_hashes: int) -> F.Column:
    """Fraction of agreeing signature components — the standard unbiased
    MinHash Jaccard estimator, as a codegen column expression."""
    agree = F.aggregate(
        F.zip_with(s1, s2, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(agree / F.lit(num_hashes), 6)


def minhash_banded_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    star_bucket_size: int | None = None,
) -> DataFrame:
    """DataFrame-native banded MinHash near-dup candidates — the direct
    implementation of the classic construction, built to replace the
    pyspark.ml MinHashLSH path in the hot loop (same recall mechanism,
    ~an order of magnitude faster here: no HashingTF 2^18-dim vectors, no
    ml.linalg boxing, no approxSimilarityJoin overhead).

    Vectorized signature computation: per Arrow batch the variable-length
    shingle-hash arrays are concatenated once and ALL ``num_hashes``
    universal hashes ((a_i*x + b_i) mod p over the 64-bit shingle hash) are
    reduced per-document with ``np.minimum.reduceat`` — one H×total matrix
    op per batch, no per-row Python loop. Signatures split into
    ``num_bands`` bands of ``num_hashes/num_bands`` rows; two documents are
    candidates iff some band matches exactly (OR-of-ANDs). The banded join
    is a posting-list expansion per (band, band-key) bucket — identical
    shuffle shape to jaccard_pairs but over buckets, linear in collisions.
    Output: (doc_id1, doc_id2, jaccard_est) with the estimate = fraction of
    agreeing signature components (the standard unbiased MinHash
    estimator).

    Scale: the signature relation is H longs per doc (written once at
    100 TB and bucketed by (band, key)); candidate generation never touches
    text. Quality is measured, not assumed — tools/minhash_quality.py
    gates pair-recall for BOTH implementations.

    ``star_bucket_size``: the GIANT-BUCKET guard. A bucket of m documents
    expands to m(m−1)/2 candidate pairs — one boilerplate page duplicated
    a million times is a 5·10¹¹-pair array built inside a single row. For
    buckets larger than the bound the expansion switches to STAR edges
    (min id ↔ each other id): O(m) pairs that keep the bucket CONNECTED
    through the hub. CAVEAT (be precise about what is traded): downstream
    thresholding sees only hub-relative estimates — if hub↔spoke
    similarity is below the caller's threshold while spoke↔spoke is
    above it, a component that all-pairs mode would join can split. That
    regime is rare for oversized buckets (sharing a full signature band
    already implies high similarity, and near-identical floods — the case
    the guard exists for — estimate ≈ 1 on every edge, where components
    are provably identical: tests/test_dedup_skew.py::test_star_buckets);
    pick band parameters so the single-band collision similarity ≳ the
    threshold when enabling it. Default None keeps the exact all-pairs
    expansion."""
    sigs = minhash_signatures(
        docs, text_col, id_col, k=k, num_hashes=num_hashes, seed=seed
    ).localCheckpoint()  # EAGER barrier: feeds band keys AND both re-join
    # sides; materialized lazily, AQE runs those exchanges as concurrent
    # jobs that all recompute/lock on the signature UDF subtree (profiled
    # on q105: two simultaneous 2.7 s jobs for one signature pass)
    return _banded_pairs_from_sigs(
        sigs, num_hashes=num_hashes, num_bands=num_bands,
        star_bucket_size=star_bucket_size,
    )


def _banded_pairs_from_sigs(
    sigs: DataFrame,
    num_hashes: int = 16,
    num_bands: int = 4,
    star_bucket_size: int | None = None,
) -> DataFrame:
    """:func:`minhash_banded_pairs` from a PRECOMPUTED ``(id, sig)``
    relation — callers that already materialize signatures (the near-dup
    ingest persists them for the history probe) reuse them here instead
    of paying the shingle+minhash pass twice. ``sigs`` must be barriered
    (persist/localCheckpoint): it feeds both the band keys and the
    verify re-join."""
    bands = minhash_band_keys(sigs, num_hashes=num_hashes, num_bands=num_bands)
    postings = bands.groupBy("band", "key").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    ids = F.col("ids")
    all_pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    if star_bucket_size is None:
        pair_array = all_pairs
    else:
        star = F.transform(
            F.slice(ids, 2, F.size(ids) - 1),
            lambda y: F.struct(F.element_at(ids, 1).alias("id1"), y.alias("id2")),
        )
        pair_array = F.when(F.size(ids) > star_bucket_size, star).otherwise(all_pairs)
    cand = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(pair_array).alias("pr"))
        .select(F.col("pr.id1").alias("id1"), F.col("pr.id2").alias("id2"))
        .distinct()  # collide-in-any-band → once
    )
    s1 = sigs.select(F.col("id").alias("id1"), F.col("sig").alias("_s1"))
    s2 = sigs.select(F.col("id").alias("id2"), F.col("sig").alias("_s2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            F.col("id1").alias("doc_id1"),
            F.col("id2").alias("doc_id2"),
            minhash_agree_frac(F.col("_s1"), F.col("_s2"), num_hashes).alias(
                "jaccard_est"
            ),
        )
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash signature per document, fully with built-in functions:
    token → xxhash64 → per-bit ±1 votes → sign-packed 64-bit signature.

    The bit loop is a fold over 64 positions expressed as array ops — no UDF;
    one explode + one groupBy (single shuffle keyed by doc id).
    """
    tok = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # votes[i] = sum over tokens of (bit i set ? +1 : -1); 64 partial-agg sums
    # (map-side combined — one shuffle keyed by doc id, no collect_list)
    bits = F.expr(
        "transform(sequence(0,63), i -> case when (shiftright(h, i) & 1) = 1 then 1 else -1 end)"
    )
    votes = (
        tok.withColumn("bits", bits)
        .groupBy("id")
        .agg(*[F.sum(F.element_at("bits", i + 1)).alias(f"v{i}") for i in range(64)])
        .select("id", F.array(*[F.col(f"v{i}") for i in range(64)]).alias("votes"))
    )
    sig = F.expr(
        "aggregate(sequence(0,63), 0L, (acc, i) -> acc + "
        "case when votes[i] > 0 then shiftleft(1L, i) else 0L end)"
    )
    return votes.select(F.col("id").alias(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Banding: 4×16-bit bands — two signatures within hamming 3 share at least
    one exact band (pigeonhole), so the join is on band equality (linear in
    band collisions), then exact hamming verify via bit_count(xor).
    """
    sigs = simhash64(docs, text_col, id_col).select(
        F.col(id_col).alias("id"), F.col("simhash")
    )
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0,3), b -> "
                "struct(b as band, shiftright(simhash, b * 16) & 65535 as key))"
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_id1"),
            F.col("b.id").alias("doc_id2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id1", "doc_id2", "hamming")
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS local-fingerprinting algorithm): hash every k-word gram, slide
    a window of ``w`` consecutive gram hashes, keep the MINIMUM hash of
    each window, distinct per doc → (doc_id, fp).

    Why next to dup_span_stats: span dedup keeps EVERY distinct window (a
    (doc_id, span_hash) row per window), so its exchange is O(tokens) rows
    per doc. Winnowing's guarantee — any shared run of w+k-1 tokens yields
    ≥1 shared fingerprint — holds at expected density 2/(w+1), so the
    shuffled relation is ~(w+1)/2× smaller for the same detection floor;
    at 100 TB that factor is the difference between a posting join that
    fits and one that doesn't.

    Determinism across engines: gram hashes are the 32-bit md5 prefix
    (sharding.md5_bucket — DuckDB twin md5_bucket_sql), so the min-of-
    window selection is bit-identical in the oracle; xxhash64 would be
    cheaper but has no cross-engine twin, and this hash runs once per gram.

    Plan shape: the gram-hash array is bound to a column BEFORE the window
    transform references it (a lambda referencing an un-bound outer
    expression re-evaluates it per element — the O(tokens²) trap measured
    in q135); the per-window ``slice`` then reads the bound array, O(w)
    per window. Docs with fewer than k+w-1 tokens emit no fingerprints.
    """
    from .sharding import md5_bucket

    toks = F.split(F.lower(F.col(text_col)), " ")
    hashed = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(
            word_ngrams(toks, k), lambda g: md5_bucket(g, 1 << 32)
        ).alias("_h"),
    )
    return (
        hashed.filter(F.size("_h") >= w)
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(_h) - {w - 1}),"
                        f" j -> array_min(slice(_h, j, {w})))"
                    )
                )
            ).alias("fp"),
        )
    )


def winnow_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowed fingerprints, with
    ``overlap`` = shared / min(|fpA|, |fpB|) — the MOSS plagiarism-candidate
    report over :func:`winnow_fingerprints`.

    Same posting-list expansion as jaccard_pairs (one shuffle of the
    (doc, fp) relation, pairs built inside the posting row, ``max_fp_freq``
    drops boilerplate fingerprints) — but over the winnowed ~2/(w+1)
    density instead of every shingle."""
    fps = winnow_fingerprints(docs, text_col, id_col, k=k, w=w)
    fps = fps.localCheckpoint()  # eager: two concurrent consumers (sizes+postings)
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    postings = fps.groupBy("fp").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    if max_fp_freq is not None:
        postings = postings.filter(F.size("ids") <= max_fp_freq)
    ids = F.col("ids")
    pair_array = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    inter = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .select(
            F.col("id1").alias("doc_id1"),
            F.col("id2").alias("doc_id2"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.least(F.col("sz1"), F.col("sz2")), 6
            ).alias("overlap"),
        )
    )


def containment_pairs(
    query_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC cross-corpus near-dup: for each query doc, every corpus
    doc whose shingle CONTAINMENT C = |S(q) ∩ S(c)| / |S(q)| reaches the
    threshold — "is this incoming document substantially contained in
    something the corpus already has?".

    Why not Jaccard: a short doc pasted verbatim inside a long one has
    tiny Jaccard (union is dominated by the long doc) but containment ≈ 1
    — the subset-copy case doc-level symmetric dedup is blind to
    (Broder 1997 distinguishes resemblance from containment for exactly
    this reason). The denominator is the QUERY side only, so the score is
    directional: C(q→c) ≈ 1, C(c→q) small.

    Plan shape: both sides reduce to (id, shingle-hash) relations; ONE
    equi-join on the 8-byte hash (corpus side never re-keys per query),
    group to (q, c, inter), divide by the query's array length (no second
    aggregation — shingles() emits distinct per doc). ``max_shingle_freq``
    caps posting fan-out on the corpus side the same way jaccard_pairs
    does, here as a count-window filter before the join."""
    q = query_docs.select(
        F.col(id_col).alias("q_id"),
        F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias(
            "arr"
        ),
    ).localCheckpoint()  # eager: two concurrent consumers (sizes + explode)
    qsz = q.select("q_id", F.size("arr").cast("long").alias("q_sz"))
    qsh = q.select("q_id", F.explode("arr").alias("h"))
    csh = _spread(corpus_docs.select(id_col, text_col)).select(
        F.col(id_col).alias("c_id"),
        F.explode(
            F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s))
        ).alias("h"),
    )
    if max_shingle_freq is not None:
        # cap as a hash-agg + left_semi (the q104/q156 shape): a
        # whole-partition count window materializes and SORTS the entire
        # posting relation per h-partition; the semi join against the
        # (small) surviving-hash set is two hash exchanges and no sort
        ok = (
            csh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_shingle_freq)
            .select("h")
        )
        csh = csh.join(ok, "h", "left_semi")
    inter = (
        qsh.join(csh, "h")
        .groupBy("q_id", "c_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(qsz, "q_id")
        .withColumn(
            "containment", F.round(F.col("n_shared") / F.col("q_sz"), 6)
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("corpus_id"),
            F.col("n_shared").cast("long").alias("n_shared"),
            "containment",
        )
    )


def remove_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The APPLICATION half of span-level exact dedup (Lee et al. 2022):
    :func:`dup_span_stats` detects boilerplate spans, this REWRITES the
    corpus without them — every token covered by any ``span_tokens``-gram
    occurring in ≥ ``min_docs`` distinct documents is dropped, and the
    survivors reassemble in order. Doc-level dedup keeps one copy of a
    million boilerplate headers; this removes all of them while keeping
    the distinct prose around them.

    Plan shape (every stage a hash agg or equi-join, nothing quadratic):
    grams are built JVM-side (word_ngrams zip_with slices) and hashed to
    64-bit keys before the frequency exchange — the doc-frequency agg
    shuffles (h, doc_id) pairs only; frequent-span positions explode to a
    (doc_id, pos) cover set; survivors are one anti-join over token rows;
    reassembly is a per-doc sort inside one aggregate (array_sort over
    collected (pos, tok) structs — the order key rides the data, no
    window pass). Docs whose every token is covered still appear, with
    ``n_tokens_after`` 0 and the empty-string signature; docs shorter
    than ``span_tokens`` carry no grams and pass through verbatim.

    Output: (doc_id, n_tokens_before, n_tokens_after, sig) where sig =
    md5 of the rebuilt text — engine-portable, so the DuckDB oracle
    reproduces the REWRITE itself, not just counts (q159)."""
    docs = _spread(docs.select(id_col, text_col))  # 3 consumers, ∥ floor
    toklist = F.split(F.lower(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toklist).alias("pos", "tok"),
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams(toklist, span_tokens)).alias("gpos", "gram"),
    ).select("doc_id", "gpos", F.xxhash64("gram").alias("h"))
    freq = (
        grams.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    covered = grams.join(freq, "h", "left_semi")
    return _rebuild_without(docs, toks, covered, toklist, id_col, span_tokens)


def _rebuild_without(
    docs: DataFrame,
    toks: DataFrame,
    covered_grams: DataFrame,
    toklist,
    id_col: str,
    span_tokens: int,
) -> DataFrame:
    """Shared rewrite tail of the span-removal family: explode the
    condemned gram occurrences ``(doc_id, gpos)`` to their token cover
    set, anti-join the token rows, reassemble in order inside one
    aggregate, and left-join back so fully-covered docs keep a row
    (empty signature) — the (doc_id, n_before, n_after, md5) contract
    both DuckDB oracles reproduce."""
    covered = (
        covered_grams.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + (span_tokens - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    surv = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = surv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens_after"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            )
        ).alias("sig"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toklist).cast("long").alias("n_tokens_before"),
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens_before",
            F.coalesce(F.col("n_tokens_after"), F.lit(0))
            .cast("long")
            .alias("n_tokens_after"),
            F.coalesce(F.col("sig"), F.md5(F.lit(""))).alias("sig"),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
) -> DataFrame:
    """INTRA-document repetition removal, keep-first semantics: a token
    is dropped iff it is covered by an occurrence of a ``span_tokens``-
    gram that ALSO occurs earlier in the same document (the first
    occurrence of every repeated span survives; later copies go). The
    within-doc sibling of :func:`remove_dup_spans` — Gopher's repetition
    RATIOS detect this pathology (q129), this rewrites it away. Same
    plan shape; the only new piece is a per-(doc, gram-hash) min-gpos
    aggregate (hash agg over 20-byte rows) joined back to mark the
    non-first occurrences. Same output contract; DuckDB oracle
    reproduces the rewrite (q160)."""
    docs = _spread(docs.select(id_col, text_col))  # 3 consumers, ∥ floor
    toklist = F.split(F.lower(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toklist).alias("pos", "tok"),
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams(toklist, span_tokens)).alias("gpos", "gram"),
    ).select("doc_id", "gpos", F.xxhash64("gram").alias("h"))
    first = grams.groupBy("doc_id", "h").agg(F.min("gpos").alias("_first"))
    repeats = grams.join(first, ["doc_id", "h"]).filter(
        F.col("gpos") > F.col("_first")
    )
    return _rebuild_without(docs, toks, repeats, toklist, id_col, span_tokens)
