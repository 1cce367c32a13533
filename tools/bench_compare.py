"""Automated bench-regression banding (r7 verdict #4): compare a bench
run against the machine-readable band table in BASELINE.md, print a
per-entry verdict, exit non-zero on violations — the diff the judge used
to do by hand every round.

Usage: python tools/bench_compare.py BENCH.json [BASELINE.md]
       python tools/bench_compare.py --rederive BENCH1.json [BENCH2.json ...]

``--rederive`` (r9 verdict #7 — band maintenance automation): emit a
fresh machine-readable band-table block from N recorded runs, applying
the [0.35x, 2.5x] rule to the observed cold spread — lo = 0.35 × the
fastest recorded cold, hi = 2.5 × the slowest — so band drift after a
plan change or a box-speed shift is one paste into BASELINE.md instead
of a hand-derivation per entry. All runs must share one sf; entries
missing from some runs band on the runs that have them.

Accepts any of these formats:
 * bench.py's own stdout — the full ``queries_cold`` line (the final
   driver-contract line carries warm values only; legacy ``qc`` cold
   short keys still expand via bench.SHORT_TO_FULL);
 * the driver's ``BENCH_r{N}.json`` wrapper (``parsed`` when present, else
   the compact line or a ``queries_cold`` dict salvaged from the ``tail``).

Bands compare COLD timings (the driver's cross-round unit, BASELINE's
band convention). Entries benched but unbanded are reported (a new entry
must land its band in the same commit — the r7 same-commit rule); banded
entries missing from the run are reported too (a silently dropped
headline). ``LOW`` (faster than the band floor) is a warning, not a
failure — it usually means an entry's work collapsed (empty input, lost
stage) and deserves a look, but a genuine optimization also lands there:
move the band in the same commit that makes it faster. Only HIGH /
missing entries fail the run. Comparison requires the run's sf to match
the table's declared sf."""

from __future__ import annotations

import json
import os
import re
import sys

MARK = "<!-- bench_bands"


def _expand_qc(qc: dict[str, float]) -> dict[str, float]:
    """Expand bench.py's compact-tail short keys ("q105") to full entry
    names via bench.SHORT_TO_FULL; unknown prefixes pass through verbatim
    so they surface as UNBANDED instead of vanishing."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import SHORT_TO_FULL

    return {SHORT_TO_FULL.get(k, k): v for k, v in qc.items()}


def _cold_from(d: dict) -> dict[str, float] | None:
    if "queries_cold" in d:
        return d["queries_cold"]
    if "qc" in d:
        return _expand_qc(d["qc"])
    return None


def _last_metric_obj(text: str, need_cold: bool = False) -> dict | None:
    """Last parseable {"metric"...} JSON object, scanning lines bottom-up.
    With ``need_cold`` only objects carrying a per-entry cold map count
    (bench.py's FINAL line is the driver-contract line with warm short
    keys; the cold series lives in line 1's ``queries_cold``)."""
    for line in reversed(text.splitlines()):
        idx = line.find('{"metric')
        if idx < 0:
            continue
        try:
            obj = json.loads(line[idx:])
        except json.JSONDecodeError:
            continue
        if need_cold and _cold_from(obj) is None:
            continue
        return obj
    return None


def load_bench(path: str) -> dict:
    """Return {'sf': float, 'cold': {entry: sec}} from any of: bench.py
    stdout (full line and/or compact last line), the driver's
    ``BENCH_r{N}.json`` wrapper (``parsed`` when present, else salvage
    from the truncated ``tail``)."""
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # bench.py stdout with log noise / multiple JSON lines: take the
        # LAST parseable {"metric"...} object that carries a cold series
        # (line 1; the final driver-contract line has warm values only),
        # else the last metric object of any shape
        d = _last_metric_obj(raw, need_cold=True) or _last_metric_obj(raw)
        if d is None:
            raise
    cold = _cold_from(d)
    if cold is not None:  # bench.py's own object (full or compact)
        return {"sf": d.get("sf"), "cold": cold}
    if d.get("parsed"):  # driver wrapper, intact
        p = d["parsed"]
        return {"sf": p.get("sf", d.get("sf")), "cold": _cold_from(p) or p["queries_cold"]}
    # driver wrapper with truncated tail: prefer the compact line (it fits
    # the tail window whole), fall back to a salvaged queries_cold dict
    tail = d.get("tail") or ""
    last = _last_metric_obj(tail)
    if last is not None and _cold_from(last) is not None:
        return {"sf": last.get("sf", d.get("sf")), "cold": _cold_from(last)}
    m = re.search(r'"queries_cold": ({[^}]*})', tail)
    if not m:
        raise ValueError(f"{path}: no queries_cold found in any format")
    return {"sf": d.get("sf"), "cold": json.loads(m.group(1))}


def load_bands(path: str) -> tuple[float | None, dict[str, tuple[float, float]]]:
    """Parse the newest machine-readable band table: a ``<!-- bench_bands
    sf=X -->`` marker followed by a ``| entry | lo | hi |`` table. Later
    tables override earlier ones entry-by-entry, so a round can re-band
    just what it changed."""
    sf = None
    bands: dict[str, tuple[float, float]] = {}
    in_table = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(MARK):
                m = re.search(r"sf=([0-9.]+)", line)
                if m:
                    sf = float(m.group(1))
                in_table = True
                continue
            if not in_table:
                continue
            cells = [c.strip() for c in line.strip("|").split("|")]
            if len(cells) == 3 and line.startswith("|"):
                if cells[0] in ("entry", "---", ":--"):
                    continue
                try:
                    bands[cells[0]] = (float(cells[1]), float(cells[2]))
                except ValueError:
                    continue
            elif line and not line.startswith("|"):
                in_table = False
    return sf, bands


def compare(
    bench: dict, band_sf: float | None, bands: dict[str, tuple[float, float]]
) -> tuple[list[str], int]:
    lines: list[str] = []
    failures = 0
    if band_sf is not None and bench["sf"] != band_sf:
        # an UNKNOWN run sf (None) must also skip — comparing a run of
        # unknown scale against sf-specific bands produces spurious
        # verdicts in both directions
        lines.append(
            f"SKIP  bands declared for sf={band_sf}, run is sf={bench['sf']} "
            "— no comparison made"
        )
        return lines, 0
    for name in sorted(set(bench["cold"]) | set(bands)):
        if name not in bands:
            lines.append(f"UNBANDED  {name}: {bench['cold'][name]}s — add a band "
                         "(same-commit rule)")
            failures += 1
            continue
        lo, hi = bands[name]
        if name not in bench["cold"]:
            lines.append(f"MISSING   {name}: banded [{lo}, {hi}] but not benched")
            failures += 1
            continue
        v = bench["cold"][name]
        if v > hi:
            lines.append(f"HIGH      {name}: {v}s > band [{lo}, {hi}]")
            failures += 1
        elif v < lo:
            lines.append(f"LOW       {name}: {v}s < band [{lo}, {hi}] (warn)")
        else:
            lines.append(f"OK        {name}: {v}s in [{lo}, {hi}]")
    return lines, failures


def rederive(paths: list[str]) -> tuple[str, int]:
    """The ``--rederive`` block (module docstring): (markdown text,
    exit code)."""
    runs = [load_bench(p) for p in paths]
    sfs = {r["sf"] for r in runs}
    if len(sfs) != 1:
        return f"runs disagree on sf: {sorted(map(str, sfs))} — band tables are per-sf", 2
    (sf,) = sfs
    entries: dict[str, list[float]] = {}
    for r in runs:
        for name, v in r["cold"].items():
            entries.setdefault(name, []).append(v)
    lines = [
        f"<!-- bench_bands sf={sf} rederived from {len(runs)} run"
        f"{'s' if len(runs) != 1 else ''} ({', '.join(paths)}) -->",
        "| entry | lo | hi |",
        "|---|---|---|",
    ]
    for name in sorted(entries):
        vs = entries[name]
        lines.append(
            f"| {name} | {round(0.35 * min(vs), 2)} | {round(2.5 * max(vs), 2)} |"
        )
    return "\n".join(lines), 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    if sys.argv[1] == "--rederive":
        if len(sys.argv) < 3:
            print("--rederive needs at least one BENCH json/stdout file")
            return 2
        text, rc = rederive(sys.argv[2:])
        print(text)
        return rc
    bench_path = sys.argv[1]
    baseline_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    bench = load_bench(bench_path)
    band_sf, bands = load_bands(baseline_path)
    if not bands:
        print(f"no band table found in {baseline_path} (marker: {MARK})")
        return 2
    lines, failures = compare(bench, band_sf, bands)
    for line in lines:
        print(line)
    n_ok = sum(1 for line in lines if line.startswith("OK"))
    print(f"-- {n_ok} in-band, {failures} violations "
          f"({len(bands)} banded, {len(bench['cold'])} benched)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
