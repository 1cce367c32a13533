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
