"""Local mini-driver: run every queries() entry on Spark and its oracle on
DuckDB, compare row count + schema-insensitive sorted value hash — a stand-in
for the round driver's CORRECTNESS gate so mismatches surface before commit.

Usage: python tools/check_correctness.py [sf_dir] [query ...] \
           [--family PREFIX[,PREFIX...]] [--sample N] [--changed-since REV]

The full registry at sf0.1 takes ~25 min — too slow per-commit. Scope it:
  --family q1,cdc     only names starting with a listed prefix (touched
                      families after an operator change)
  --sample 20         a deterministic (seeded md5-of-name order, no RNG
                      state) size-N spread across the whole registry — a
                      cheap canary whose selection is stable run-to-run
                      but unbiased by registration order
  --changed-since REV entries touched by `git diff REV` (r9 verdict #8):
                      changed engine modules expand to their transitive
                      dependents via the package import graph, then map
                      to entries through each entry's own imports (local
                      ImportFrom nodes + top-level import names used in
                      the entry source); edits inside plans/queries.py
                      map by line span — entry bodies, helper functions
                      (by name use), and *_SQL constants (including
                      aliased oracles like CDC29_SQL = CDC28_SQL, via
                      string identity in the registry). Changes to
                      unbounded-blast-radius files (session.py,
                      config.py's EngineConfig is graph-handled;
                      __spark_entry__.py, conftest) select the FULL
                      registry. Over-selection is safe; silent
                      under-selection is the only failure mode the
                      mapping guards against.
Explicit positional names compose with all of these (intersection).
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import os
import re
import subprocess
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

PKG = "kafka_connect_logminer2_spark"


def _git_changed(rev: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", rev],
        capture_output=True, text=True, check=True,
    ).stdout
    return [line.strip() for line in out.splitlines() if line.strip()]


def _changed_spans(rev: str, path: str) -> list[tuple[int, int]]:
    """New-file line ranges [start, end) changed vs REV (git -U0 hunks)."""
    out = subprocess.run(
        ["git", "diff", "-U0", rev, "--", path],
        capture_output=True, text=True, check=True,
    ).stdout
    spans = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        spans.append((start, start + max(n, 1)))
    return spans


def _resolve_relative(file_path: str, module: str | None, level: int) -> str | None:
    """``from ..functions.text import x`` inside pkg/plans/queries.py →
    ``pkg/functions/text.py`` (or the package dir's __init__)."""
    if level == 0:
        if module and module.startswith(PKG):
            parts = module.split(".")
        else:
            return None
    else:
        base = os.path.dirname(file_path).split(os.sep)
        if level - 1 > 0:
            base = base[: -(level - 1)] if level - 1 <= len(base) else []
        parts = base + (module.split(".") if module else [])
    cand = os.sep.join(parts) + ".py"
    if os.path.exists(cand):
        return cand
    init = os.sep.join(parts) + os.sep + "__init__.py"
    return init if os.path.exists(init) else None


def _module_imports(file_path: str) -> set[str]:
    """Every engine-module file this file imports (anywhere in it)."""
    try:
        tree = ast.parse(open(file_path).read())
    except (OSError, SyntaxError):
        return set()
    deps: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            p = _resolve_relative(file_path, node.module, node.level)
            if p:
                deps.add(p)
            # `from ..functions import multimodal` — the NAMES are modules
            for alias in node.names:
                sub = _resolve_relative(
                    file_path,
                    (node.module + "." if node.module else "") + alias.name,
                    node.level,
                )
                if sub:
                    deps.add(sub)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                p = _resolve_relative(file_path, alias.name, 0)
                if p:
                    deps.add(p)
    return deps


def _impacted_modules(changed: set[str]) -> set[str]:
    """Changed engine files + every engine file that (transitively)
    imports one of them."""
    graph: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                graph[p] = _module_imports(p)
    impacted = set(c for c in changed if c in graph)
    grew = True
    while grew:
        grew = False
        for mod, deps in graph.items():
            if mod not in impacted and deps & impacted:
                impacted.add(mod)
                grew = True
    return impacted


# files whose change cannot be attributed to a bounded entry set
_FULL_RERUN = ("__spark_entry__.py", "conftest.py", f"{PKG}/session.py")


def _top_level_imports(file_path: str, tree: ast.Module) -> dict[str, str]:
    """Top-level imported names → their source engine-module file ('' when
    not an engine module). Relative AND absolute forms resolve the same
    way: a `from M import y` binding may be a symbol in M (tgt) or the
    submodule M.y (sub). r10 advice: the level==0 branch used to skip the
    sub resolution, silently under-selecting entries reached via
    `from kafka_connect_logminer2_spark.x import y`."""
    top_names: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            # `import pkg.x` — alias.name IS the module path
            for alias in node.names:
                top_names[alias.asname or alias.name] = (
                    _resolve_relative(file_path, alias.name, 0) or ""
                )
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                tgt = _resolve_relative(file_path, node.module, node.level)
                sub = _resolve_relative(
                    file_path,
                    (node.module + "." if node.module else "") + alias.name,
                    node.level,
                )
                top_names[alias.asname or alias.name] = sub or tgt or ""
    return top_names


def entries_for_diff(rev: str, registry: dict) -> list[str] | None:
    """Names of the registry entries a ``git diff REV`` touches; None
    means "run the full registry" (unbounded blast radius)."""
    changed = _git_changed(rev)
    if any(c in _FULL_RERUN or c.endswith("conftest.py") for c in changed):
        return None
    engine_changed = {c for c in changed if c.startswith(PKG) and c.endswith(".py")}
    qpath = f"{PKG}/plans/queries.py"
    impacted = _impacted_modules(engine_changed - {qpath})
    impacted_names = {os.path.basename(p)[:-3] for p in impacted}

    src = open(qpath).read()
    tree = ast.parse(src)
    top_names = _top_level_imports(qpath, tree)

    spans = _changed_spans(rev, qpath) if qpath in engine_changed else []

    def span_hit(node) -> bool:
        return any(
            not (node.end_lineno < s or node.lineno >= e) for s, e in spans
        )

    funcs = {
        node.name: node
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    consts = {
        t.id: node
        for node in tree.body
        if isinstance(node, ast.Assign)
        for t in node.targets
        if isinstance(t, ast.Name)
    }
    # helper functions (non-entries) whose span changed → entries using them
    entry_fn_names = {fn.__name__ for fn, _ in registry.values()}
    changed_helpers = {
        n for n, node in funcs.items()
        if n not in entry_fn_names and span_hit(node)
    }
    # *_SQL constants whose span changed → entries registered with that
    # exact string (identity survives aliasing: CDC29_SQL = CDC28_SQL)
    import importlib

    qmod = importlib.import_module(f"{PKG}.plans.queries")
    changed_sql_values = {
        id(getattr(qmod, n))
        for n, node in consts.items()
        if span_hit(node) and hasattr(qmod, n)
    }

    picked = []
    for name, (fn, sql) in registry.items():
        node = funcs.get(fn.__name__)
        if node is None:
            # defined outside queries.py (e.g. plans/tpch.py): selected
            # iff its defining module is in the impacted set
            mod_file = getattr(fn, "__module__", "").replace(".", os.sep) + ".py"
            if mod_file in impacted:
                picked.append(name)
            continue
        fsrc = ast.get_source_segment(src, node) or ""
        deps = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom):
                p = _resolve_relative(qpath, sub.module, sub.level)
                if p:
                    deps.add(os.path.basename(p)[:-3])
                for alias in sub.names:
                    p2 = _resolve_relative(
                        qpath,
                        (sub.module + "." if sub.module else "") + alias.name,
                        sub.level,
                    )
                    if p2:
                        deps.add(os.path.basename(p2)[:-3])
        for alias_name, mod_path in top_names.items():
            if mod_path in impacted and re.search(
                rf"\b{re.escape(alias_name)}\b", fsrc
            ):
                deps.add(os.path.basename(mod_path)[:-3])
        hit = (
            bool(deps & impacted_names)
            or span_hit(node)
            or (sql is not None and id(sql) in changed_sql_values)
            or any(re.search(rf"\b{h}\b", fsrc) for h in changed_helpers)
        )
        if hit:
            picked.append(name)
    return picked

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def select_names(
    names: list[str],
    only: set[str],
    families: list[str],
    sample: int | None,
    rotation: int = 0,
) -> list[str]:
    """Apply the scoping flags (intersection semantics), preserving
    registry order. Sampling sorts by md5(name) — deterministic without
    touching RNG state, stable run-to-run, uncorrelated with registration
    order — then restores registry order for readable output.

    ``rotation`` (r11, the round-robin proposal for a fixed-size hard
    signal): slides the sample window ``rotation * sample`` positions
    around the md5 order, wrapping — consecutive rotations partition the
    registry, so a 50-entry sample rotated per round touches EVERY entry
    within ceil(214/50) rounds instead of pinning the same 50 forever."""
    picked = [n for n in names if not only or n in only]

    def fam_match(n: str, f: str) -> bool:
        # digit-boundary prefix: "q15" selects q15_* but NOT q150–q159
        # (3-digit families exist since r5); "cdc" still selects cdc01…
        if not n.startswith(f):
            return False
        return not (
            f and f[-1].isdigit() and len(n) > len(f) and n[len(f)].isdigit()
        )

    if families:
        picked = [n for n in picked if any(fam_match(n, f) for f in families)]
    if sample is not None and sample < len(picked):
        order = sorted(picked, key=lambda n: hashlib.md5(n.encode()).hexdigest())
        lo = (rotation * sample) % len(order)
        window = (order + order)[lo:lo + sample]
        keep = set(window)
        picked = [n for n in picked if n in keep]
    return picked


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="explicit query names")
    ap.add_argument(
        "--family",
        action="append",
        default=[],
        help="comma-separable name-prefix filter (repeatable), e.g. q1,cdc",
    )
    ap.add_argument(
        "--sample", type=int, default=None, help="deterministic registry-wide sample of N entries"
    )
    ap.add_argument(
        "--rotation", type=int, default=0, metavar="R",
        help="slide the --sample window R*N positions around the md5 order "
             "(wrapping) — consecutive rotations partition the registry, so "
             "a fixed-size sample touches every entry within ceil(total/N) "
             "rounds (pass the round number)",
    )
    ap.add_argument(
        "--changed-since", default=None, metavar="REV",
        help="restrict to entries touched by `git diff REV` (see module doc)",
    )
    args = ap.parse_args()
    sf = args.sf_dir
    only = set(args.names)
    families = [f for grp in args.family for f in grp.split(",") if f]

    changed_names: list[str] | None = None
    if args.changed_since is not None:
        from kafka_connect_logminer2_spark.plans.queries import QUERY_REGISTRY

        changed_names = entries_for_diff(args.changed_since, QUERY_REGISTRY)
        if changed_names is None:
            print(f"-- diff vs {args.changed_since} touches an unbounded file: "
                  "FULL registry selected")
        else:
            print(f"-- diff vs {args.changed_since}: {len(changed_names)} "
                  "entries mapped")

    import __spark_entry__ as entrymod
    from kafka_connect_logminer2_spark.session import get_spark

    spark = get_spark(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    picked = select_names(list(qs), only, families, args.sample, args.rotation)
    if changed_names is not None:
        keep = set(changed_names)
        picked = [n for n in picked if n in keep]
    print(f"-- {len(picked)}/{len(qs)} entries selected")
    failures = 0
    for name in picked:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        s, d = normalize(sdf), normalize(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}")
            failures += 1
            continue
        if not s.equals(d):
            neq = (s != d).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(s)} differing rows; first:")
            print(pd.concat([s[neq].head(3), d[neq].head(3)]).to_string())
            failures += 1
            continue
        print(f"PASS  {name}: {len(s)} rows ({el:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
