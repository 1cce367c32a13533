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


def test_sample_rotation_partitions_registry():
    """r11 (r10 verdict #7): consecutive rotations of a fixed-size sample
    tile the registry with no repeats until it wraps — a 50-entry hard
    signal rotated per round touches every entry within ceil(total/N)
    rounds."""
    n = 7
    windows = [select_names(NAMES, set(), [], n, rotation=r) for r in range(3)]
    assert all(len(w) == n for w in windows)
    assert len(set(windows[0]) & set(windows[1])) == 0
    assert len(set(windows[1]) & set(windows[2])) == 0
    covered = set().union(*windows)
    assert len(covered) == 21  # 3 rotations x 7 = the whole 21-name registry
    # rotation=0 is byte-identical to the pre-r11 sample (driver continuity)
    assert select_names(NAMES, set(), [], n, rotation=0) == \
        select_names(NAMES, set(), [], n)


def test_flags_intersect():
    got = select_names(NAMES, {"q11_thing", "cdc01_x", "q03_thing"}, ["q11"], None)
    assert got == ["q11_thing"]
    got2 = select_names(NAMES, set(), ["cdc"], 1)
    assert len(got2) == 1 and got2[0].startswith("cdc")


# ---------------------------------------------------------------------------
# --changed-since (r9 verdict #8): diff → touched-entry mapping
# ---------------------------------------------------------------------------


def _map(monkeypatch, changed, spans=None):
    import check_correctness as cc
    from kafka_connect_logminer2_spark.plans.queries import QUERY_REGISTRY

    monkeypatch.setattr(cc, "_git_changed", lambda rev: changed)
    monkeypatch.setattr(cc, "_changed_spans", lambda rev, path: spans or [])
    return cc.entries_for_diff("FAKE", QUERY_REGISTRY)


def test_changed_since_clean_and_unbounded(monkeypatch):
    assert _map(monkeypatch, []) == []
    assert _map(monkeypatch, ["kafka_connect_logminer2_spark/session.py"]) is None
    assert _map(monkeypatch, ["tests/conftest.py"]) is None
    # non-engine files have no entry impact
    assert _map(monkeypatch, ["BASELINE.md", "tools/bench_compare.py"]) == []


def test_changed_since_module_maps_to_its_entries(monkeypatch):
    sel = _map(monkeypatch, ["kafka_connect_logminer2_spark/plans/tpch.py"])
    assert len(sel) == 17 and all(s.startswith("q") for s in sel)
    sel2 = _map(monkeypatch,
                ["kafka_connect_logminer2_spark/functions/multimodal.py"])
    assert "q164_cross_modal_neardup" in sel2
    assert "cdc27_video_ingest" in sel2  # transitive via video_ingest
    assert "q01_pricing_summary" not in sel2


def test_changed_since_sql_span_maps_aliased_oracles(monkeypatch):
    """A diff hunk inside CDC28_SQL selects BOTH cdc28 and cdc29 (whose
    oracle is the alias CDC29_SQL = CDC28_SQL) — string identity in the
    registry, not name matching."""
    import ast

    qpath = "kafka_connect_logminer2_spark/plans/queries.py"
    tree = ast.parse(open(qpath).read())
    span = None
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", "") == "CDC28_SQL" for t in node.targets
        ):
            span = (node.lineno, node.lineno + 1)
    assert span is not None
    sel = _map(monkeypatch, [qpath], spans=[span])
    assert "cdc28_image_ingest" in sel and "cdc29_audio_ingest" in sel
    # cdc27's oracle is byte-identical TEXT (not an alias), which CPython
    # folds to the same constant object — the id-based mapping therefore
    # over-selects it; that's the safe direction, so it's pinned here
    assert "cdc27_video_ingest" in sel
    assert "q01_pricing_summary" not in sel


def test_top_level_imports_resolve_absolute_forms():
    """r10-advice regression: absolute `from pkg.x import y` bindings must
    map to engine files exactly like their relative twins — the level==0
    branch used to return ''/None for them, under-selecting entries."""
    import ast

    import check_correctness as cc

    src = (
        "from kafka_connect_logminer2_spark.functions import text\n"
        "from kafka_connect_logminer2_spark.functions.text import token_count\n"
        "import kafka_connect_logminer2_spark.functions.dedup as dd\n"
        "from ..functions import similarity\n"
        "import os\n"
    )
    qpath = "kafka_connect_logminer2_spark/plans/queries.py"
    names = cc._top_level_imports(qpath, ast.parse(src))
    assert names["text"].endswith("functions/text.py")
    assert names["token_count"].endswith("functions/text.py")
    assert names["dd"].endswith("functions/dedup.py")
    assert names["similarity"].endswith("functions/similarity.py")
    assert names["os"] == ""


def test_changed_since_entry_body_span(monkeypatch):
    """A hunk inside one entry's function body selects that entry."""
    import ast

    qpath = "kafka_connect_logminer2_spark/plans/queries.py"
    tree = ast.parse(open(qpath).read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "q05_global_agg":
            span = (node.lineno + 1, node.lineno + 2)
    sel = _map(monkeypatch, [qpath], spans=[span])
    assert "q05_global_agg" in sel
    assert "q06_distinct" not in sel


def test_registry_rotation_head_is_never_driver_checked():
    """r12 (r11 verdict #1): the registry's iteration order leads with a
    50-entry window over the md5 order restricted to entries the driver
    has NEVER hard-checked — so the driver's first-50 CORRECTNESS sample
    finally lands on the unchecked 167. Rotation windows must partition
    that set (disjoint until wrap), and the mapping itself must be
    untouched (same keys, same callables)."""
    from kafka_connect_logminer2_spark.plans.queries import (
        _DRIVER_CHECKED_R1R11,
        _REGISTRY_ROTATION,
        _rotate_registry,
        QUERY_REGISTRY,
    )

    head = list(QUERY_REGISTRY)[:50]
    assert not set(head) & _DRIVER_CHECKED_R1R11
    assert len(set(head)) == 50

    # consecutive rotations are disjoint until the never-checked set wraps
    h0 = list(_rotate_registry(QUERY_REGISTRY, rotation=0))[:50]
    h1 = list(_rotate_registry(QUERY_REGISTRY, rotation=1))[:50]
    h2 = list(_rotate_registry(QUERY_REGISTRY, rotation=2))[:50]
    assert not set(h0) & set(h1)
    assert not set(h1) & set(h2)
    n_fresh = len(QUERY_REGISTRY) - len(
        set(QUERY_REGISTRY) & _DRIVER_CHECKED_R1R11
    )
    assert len(set(h0) | set(h1) | set(h2)) == min(150, n_fresh)

    # rotation never loses or changes an entry
    rot = _rotate_registry(QUERY_REGISTRY, rotation=_REGISTRY_ROTATION)
    assert rot == QUERY_REGISTRY  # same mapping (order differs, dict == ignores order)
    assert set(rot) == set(QUERY_REGISTRY)


def test_closing_sweep_guard_refuses_dirty_tree(tmp_path, monkeypatch):
    """r12 (r11 verdict #4): the closing-validation record can only be
    produced from a clean tree, and the recorded head must be the swept
    commit — simulated here with a scratch git repo."""
    import subprocess

    import closing_sweep as cs

    repo = tmp_path / "r"
    repo.mkdir()
    run = lambda *a: subprocess.run(
        a, cwd=repo, check=True, capture_output=True
    )
    run("git", "init", "-q")
    run("git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
        "-q", "--allow-empty", "-m", "x")
    (repo / "f.txt").write_text("dirty")
    monkeypatch.chdir(repo)
    monkeypatch.setattr(sys, "argv", ["closing_sweep.py", "99"])
    assert cs.main() == 1  # dirty tree refused, nothing written
    assert not (repo / "CLOSING_r99.json").exists()
