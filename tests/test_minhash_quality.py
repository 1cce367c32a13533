"""Quality gate for the MinHash-LSH near-dup path: candidate recall vs the
exact Jaccard baseline must clear a floor, and the reported distance must
stay honest (an approximate operator with an unmeasured miss rate is not
done — SURVEY §2C dedup)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from minhash_quality import minhash_quality  # noqa: E402


def test_minhash_pair_recall_floor(spark, sf_dir):
    q = minhash_quality(spark, sf_dir, threshold=0.5)
    # measured 1.0 at sf0.001 and sf0.01 (the fixture's planted near-dups are
    # high-jaccard, well above the 32-hash banding miss zone); 0.8 floor
    # still catches a dead signature or a broken band join
    assert q["n_exact_pairs"] > 0, "fixture lost its planted near-dup pairs"
    assert q["pair_recall"] >= 0.8, f"minhash candidate recall collapsed: {q}"
    # distCol is exact-on-features; error above 0.05 means feature hashing
    # is colliding (or the estimate wiring broke)
    assert q["mae"] <= 0.05, f"minhash distance estimate dishonest: {q}"
    # the DataFrame-native banded implementation (3.9x faster at sf0.1,
    # BASELINE.md) must match the ml path's recall; its estimator is the
    # k-agreeing-components fraction, sigma ~ sqrt(J(1-J)/32) ~ 0.09, so the
    # mae ceiling is looser than the exact-on-features distCol
    assert q["banded_pair_recall"] >= 0.8, f"banded minhash recall collapsed: {q}"
    assert q["banded_mae"] <= 0.12, f"banded minhash estimate dishonest: {q}"
