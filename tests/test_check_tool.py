"""Unit tests for tools/check_correctness.py's scoping flags (pure
selection logic — no Spark, no DuckDB). The flags exist so the ~25-min
sf0.1 registry sweep can run per-commit on touched families or as a
deterministic canary sample instead of only at round close."""

import sys

sys.path.insert(0, "tools")

from check_correctness import select_names  # noqa: E402

NAMES = [f"q{i:02d}_thing" for i in range(1, 20)] + ["cdc01_x", "cdc17_ingest"]


def test_family_prefix_filter():
    got = select_names(NAMES, set(), ["q15", "cdc17"], None)
    assert got == ["q15_thing", "cdc17_ingest"]


def test_family_digit_boundary():
    # "q15" must select q15_* only — NOT the 3-digit q150–q159 family
    # (the r5-verdict housekeeping item); a non-digit family like "cdc"
    # still selects every cdcNN
    names = ["q15_sessionize", "q150_video", "q151_decayed", "cdc01_x", "cdc17_y"]
    assert select_names(names, set(), ["q15"], None) == ["q15_sessionize"]
    assert select_names(names, set(), ["q150"], None) == ["q150_video"]
    assert select_names(names, set(), ["cdc"], None) == ["cdc01_x", "cdc17_y"]
    assert select_names(names, set(), ["q15_"], None) == ["q15_sessionize"]


def test_sample_is_deterministic_and_order_preserving():
    a = select_names(NAMES, set(), [], 7)
    b = select_names(NAMES, set(), [], 7)
    assert a == b and len(a) == 7
    # registry order preserved, not md5 order
    assert a == [n for n in NAMES if n in set(a)]
    # oversized sample = everything
    assert select_names(NAMES, set(), [], 999) == NAMES


def test_flags_intersect():
    got = select_names(NAMES, {"q11_thing", "cdc01_x", "q03_thing"}, ["q11"], None)
    assert got == ["q11_thing"]
    got2 = select_names(NAMES, set(), ["cdc"], 1)
    assert len(got2) == 1 and got2[0].startswith("cdc")
