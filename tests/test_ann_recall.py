"""Quality gate for the approximate ANN paths: recall@5 vs the exact
brute-force baseline must clear a floor (an approximate operator with
unmeasured recall is not done — SURVEY §2C similarity search)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from ann_recall import recall_at_k  # noqa: E402


def test_ann_recall_floors(spark, sf_dir):
    r = recall_at_k(spark, sf_dir, k=5, n_queries=8)
    # floors ≈ 60% of measured sf0.001 values (lsh 0.525, ivf 0.50; sf0.01:
    # 0.725 / 0.575 with the trained fixed-64-centroid quantizer at
    # nprobe=5) — absorbs fixture drift, still catches a dead index
    assert r["lsh"] >= 0.30, f"multi-table LSH recall collapsed: {r}"
    assert r["ivf"] >= 0.30, f"IVF recall collapsed: {r}"
    # corpus-size-aware params (ivf_auto_params: k ~ 4*sqrt(N), probed
    # fraction held constant): measured 0.625 at sf0.01 and 0.60 at sf1 —
    # recall stays FLAT across 10x where fixed params fell 0.575 -> 0.40
    assert r["ivf_auto"] >= 0.30, f"auto-param IVF recall collapsed: {r}"


def test_ivf_auto_params_scale_rule():
    from kafka_connect_logminer2_spark.functions.similarity import ivf_auto_params

    k1, p1 = ivf_auto_params(2_000)
    k2, p2 = ivf_auto_params(200_000)  # 100x corpus -> 10x cells
    assert k2 / k1 == pytest.approx(10.0, rel=0.1)  # k ~ sqrt(N)
    assert p1 / k1 == pytest.approx(p2 / k2, rel=0.3)  # probed frac held
    assert ivf_auto_params(10**10)[0] == 65536  # clamp (IVF-PQ territory)
    assert ivf_auto_params(1)[0] == 16


import pytest  # noqa: E402


def test_pq_adc_equals_reconstruction_distance(spark, sf_dir):
    """PQ invariants (r11, q173): codebooks are a fixed-size deterministic
    model; every corpus code indexes real centroids; and the JVM-side ADC
    score of (query, code) equals the NumPy squared-L2 distance between
    the normalized query and the code's reconstruction — the lookup-table
    scan computes exactly the textbook quantity."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.functions.similarity import (
        pq_codebooks,
        pq_topk,
    )
    from kafka_connect_logminer2_spark.sources.tables import load_table

    m, K = 32, 16
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=m, n_codes=K)
    assert books.shape == (m, K, 64 // m)
    # determinism: retraining from the same corpus is bit-identical
    assert np.array_equal(books, pq_codebooks(emb, m=m, n_codes=K))

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(emb, q, k=5, m=m, n_codes=K).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(1 <= r["rank"] <= 5 for r in got)

    # recompute one scored pair by hand: encode neighbor, table the query
    r0 = [r for r in got if r["query_id"] == 0][0]
    fetch = lambda vid: np.asarray(
        emb.filter(F.col("vec_id") == vid).first()["embedding"],
        dtype=np.float64,
    )
    qv, nv = fetch(0), fetch(r0["neighbor_id"])
    qv /= np.linalg.norm(qv)
    nv /= np.linalg.norm(nv)
    dsub = 64 // m
    recon = np.empty(64)
    for j in range(m):
        sub = nv[j * dsub:(j + 1) * dsub]
        code = ((books[j] - sub) ** 2).sum(axis=1).argmin()
        recon[j * dsub:(j + 1) * dsub] = books[j][code]
    want = float(((qv - recon) ** 2).sum())
    assert abs(r0["pq_dist"] - want) < 1e-4


def test_pq_code_packing_roundtrip(spark):
    """r12 (r11 verdict #2): codes are stored BIT-PACKED in two longs
    (m·ceil(log2 K) bits — 16 bytes at the m=32/K=16 defaults, the
    claimed 16×), and the JVM-side shiftrightunsigned+mask extraction
    recovers every sub-code exactly — including codes packed into the
    sign bit of the long (logical, not arithmetic, shift). Checked over
    every swept (m, K) configuration and adversarial all-max codes."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.functions.similarity import (
        _packed_code_at,
        _pack_codes_np,
        _pq_bit_layout,
    )

    rng = np.random.default_rng(7)
    for m, K in [(32, 16), (16, 16), (16, 64), (8, 16)]:
        b, per = _pq_bit_layout(m, K)
        assert m * b <= 128
        codes = rng.integers(0, K, size=(64, m)).astype(np.int32)
        codes[0, :] = K - 1  # all-max: fills the top long's sign bit
        codes[1, :] = 0
        c0, c1 = _pack_codes_np(codes, b, per)
        if per * b == 64 and m >= per:
            # the long is fully used, so all-max codes reach the sign bit
            # (b=6/K=64 leaves 4 top bits unused — no sign-bit case there)
            assert (c0 < 0).any(), "sign-bit case not exercised"
        df = spark.createDataFrame(
            [(int(i), int(c0[i]), int(c1[i])) for i in range(len(codes))],
            "i long, _c0 long, _c1 long",
        )
        got = df.select(
            "i",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: _packed_code_at(j, b, per, K).cast("int"),
            ).alias("codes"),
        ).collect()
        for r in got:
            assert r["codes"] == list(codes[r["i"]]), (m, K, r["i"])

    # the guard: a configuration over the 128-bit budget refuses loudly
    with pytest.raises(ValueError, match="128-bit"):
        _pq_bit_layout(64, 16)


def test_pq_packing_property_numpy_roundtrip():
    """Hypothesis property: for ANY (m, K) within the two-long budget and
    ANY code matrix, the NumPy pack followed by the same shift/mask
    arithmetic the JVM extraction performs recovers every sub-code (the
    JVM path itself is pinned by test_pq_code_packing_roundtrip; this
    drives the bit arithmetic through thousands of random shapes)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from kafka_connect_logminer2_spark.functions.similarity import (
        _pack_codes_np,
        _pq_bit_layout,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=2, max_value=256).filter(
            lambda K: True
        ),
        st.integers(min_value=1, max_value=64),
        st.integers(min_value=0, max_value=2**31),
    )
    def run(K, m, seed):
        b = max(1, (K - 1).bit_length())
        per = 64 // b
        if m > 2 * per:
            import pytest as _pytest

            with _pytest.raises(ValueError):
                _pq_bit_layout(m, K)
            return
        assert _pq_bit_layout(m, K) == (b, per)
        rng = np.random.default_rng(seed)
        codes = rng.integers(0, K, size=(8, m)).astype(np.int32)
        c0, c1 = _pack_codes_np(codes, b, per)
        # the JVM extraction as numpy: logical shift + mask
        u = np.stack([c0.view(np.uint64), c1.view(np.uint64)], axis=1)
        mask = np.uint64((1 << b) - 1)  # full b-bit field, not K-1
        for j in range(m):
            got = (u[:, j // per] >> np.uint64((j % per) * b)) & mask
            assert (got.astype(np.int32) == codes[:, j]).all(), (K, m, j)

    run()


def test_spread_floors_parallelism_of_compute_dense_passes(spark, sf_dir):
    """_spread: a single-split corpus is round-robin spread to the
    session's parallelism floor before the encode/ADC work; an input that
    already meets the floor is returned unchanged (no added exchange)."""
    from pyspark.sql import functions as F

    from kafka_connect_logminer2_spark.functions.similarity import (
        _spread,
        pq_codebooks,
        pq_encode,
    )
    from kafka_connect_logminer2_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    floor = spark.sparkContext.defaultParallelism
    assert emb.rdd.getNumPartitions() < floor  # fixture is one split
    books = pq_codebooks(emb, m=8, n_codes=16)
    codes = pq_encode(emb, books, m=8, n_codes=16)
    assert codes.rdd.getNumPartitions() >= min(floor, 2)
    # already-spread input: no-op (same plan object back)
    wide = emb.select("vec_id", "embedding").repartition(floor)
    assert _spread(wide) is wide
