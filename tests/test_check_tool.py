"""Unit tests for tools/check_correctness.py's scoping flags (pure
selection logic — no Spark, no DuckDB). The flags exist so the ~25-min
sf0.1 registry sweep can run per-commit on touched families or as a
deterministic canary sample instead of only at round close."""

import sys

sys.path.insert(0, "tools")

from check_correctness import select_names  # noqa: E402

NAMES = [f"q{i:02d}_thing" for i in range(1, 20)] + ["cdc01_x", "cdc17_ingest"]


def test_family_prefix_filter():
    got = select_names(NAMES, set(), ["q1", "cdc17"], None)
    assert got == [f"q1{i}_thing" for i in range(0, 10)] + ["cdc17_ingest"]


def test_sample_is_deterministic_and_order_preserving():
    a = select_names(NAMES, set(), [], 7)
    b = select_names(NAMES, set(), [], 7)
    assert a == b and len(a) == 7
    # registry order preserved, not md5 order
    assert a == [n for n in NAMES if n in set(a)]
    # oversized sample = everything
    assert select_names(NAMES, set(), [], 999) == NAMES


def test_flags_intersect():
    got = select_names(NAMES, {"q11_thing", "cdc01_x", "q03_thing"}, ["q1"], None)
    assert got == ["q11_thing"]
    got2 = select_names(NAMES, set(), ["q1"], 3)
    assert len(got2) == 3 and all(n.startswith("q1") for n in got2)
