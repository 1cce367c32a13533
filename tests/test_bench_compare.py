"""tools/bench_compare.py — the automated BENCH-vs-BASELINE band diff
(r7 verdict #4): format parsing (bench.py stdout, driver wrapper intact
and truncated), verdict classes, sf guard, and table-override layering."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "tools")

from bench_compare import compare, load_bands, load_bench  # noqa: E402

BASELINE = """# some prose

<!-- bench_bands sf=0.1 (cold seconds) -->
| entry | lo | hi |
|---|---|---|
| q1 | 0.5 | 2.0 |
| q2 | 1.0 | 4.0 |
| q3 | 0.2 | 1.0 |

later prose breaks the table.

<!-- bench_bands sf=0.1 re-band after a plan change -->
| entry | lo | hi |
|---|---|---|
| q2 | 2.0 | 8.0 |
"""


def _bands(tmp_path):
    p = tmp_path / "BASELINE.md"
    p.write_text(BASELINE)
    return load_bands(str(p))


def test_load_bands_layering(tmp_path):
    sf, bands = _bands(tmp_path)
    assert sf == 0.1
    assert bands["q1"] == (0.5, 2.0)
    assert bands["q2"] == (2.0, 8.0)  # later table overrides
    assert bands["q3"] == (0.2, 1.0)


def test_verdict_classes(tmp_path):
    sf, bands = _bands(tmp_path)
    bench = {"sf": 0.1, "cold": {"q1": 1.0, "q2": 9.0, "q4": 0.3}}
    lines, failures = compare(bench, sf, bands)
    by = {line.split()[1].rstrip(":"): line.split()[0] for line in lines}
    assert by["q1"] == "OK"
    assert by["q2"] == "HIGH"
    assert by["q3"] == "MISSING"  # banded but not benched
    assert by["q4"] == "UNBANDED"  # benched but no band (same-commit rule)
    assert failures == 3
    lines, failures = compare(
        {"sf": 0.1, "cold": {"q1": 0.1, "q2": 3.0, "q3": 0.5}}, sf, bands
    )
    by = {line.split()[1].rstrip(":"): line.split()[0] for line in lines}
    assert by["q1"] == "LOW" and failures == 0  # LOW warns, never fails


def test_sf_guard(tmp_path):
    sf, bands = _bands(tmp_path)
    lines, failures = compare({"sf": 0.01, "cold": {"q1": 0.1}}, sf, bands)
    assert failures == 0 and lines[0].startswith("SKIP")


def test_load_bench_formats(tmp_path):
    q = {"q1": 1.2}
    own = tmp_path / "own.json"
    own.write_text(json.dumps({"metric": "x", "sf": 0.1, "queries_cold": q}))
    assert load_bench(str(own)) == {"sf": 0.1, "cold": q}

    noisy = tmp_path / "noisy.json"  # bench stdout with log lines around it
    noisy.write_text(
        "WARN blah\n"
        + json.dumps({"metric": "x", "sf": 0.1, "queries_cold": q})
        + "\ntrailer"
    )
    assert load_bench(str(noisy)) == {"sf": 0.1, "cold": q}

    wrapped = tmp_path / "driver.json"  # driver wrapper, truncated tail
    tail = '..., "queries_cold": {"q1": 1.2}, "sf": 0.1}'
    wrapped.write_text(json.dumps({"n": 8, "sf": 0.1, "parsed": None, "tail": tail}))
    assert load_bench(str(wrapped)) == {"sf": 0.1, "cold": q}

    intact = tmp_path / "driver2.json"  # driver wrapper, parsed present
    intact.write_text(
        json.dumps({"n": 8, "parsed": {"sf": 0.1, "queries_cold": q}})
    )
    assert load_bench(str(intact)) == {"sf": 0.1, "cold": q}


def test_load_bench_compact_line(tmp_path):
    """r10: bench.py's compact final line (short ``qc`` keys) is preferred
    over the head-truncated full line — both in raw stdout and inside the
    driver wrapper's ~1.9 KB stdout tail."""
    from bench import SHORT_TO_FULL

    full_name = SHORT_TO_FULL["q105"]
    compact = json.dumps(
        {"metric": "headline_suite_total", "value": 1.0, "unit": "sec",
         "value_cold": 1.3, "sf": 0.1, "qc": {"q105": 1.3}},
        separators=(",", ":"),
    )

    # stdout: head-truncated full line, then the intact compact line
    out = tmp_path / "stdout.txt"
    out.write_text('_cold": {"' + full_name + '": 1.3}, "sf": 0.1}\n' + compact + "\n")
    assert load_bench(str(out)) == {"sf": 0.1, "cold": {full_name: 1.3}}

    # driver wrapper: parsed null, tail holds the same truncated-then-compact text
    wrapped = tmp_path / "driver.json"
    wrapped.write_text(json.dumps({
        "n": 10, "sf": 0.1, "parsed": None,
        "tail": '_cold": {"' + full_name + '": 1.3}, "sf": 0.1}\n' + compact + "\n",
    }))
    assert load_bench(str(wrapped)) == {"sf": 0.1, "cold": {full_name: 1.3}}

    # driver wrapper whose parsed dict IS the compact object
    parsed = tmp_path / "driver_compact.json"
    parsed.write_text(json.dumps({"n": 10, "parsed": json.loads(compact)}))
    assert load_bench(str(parsed)) == {"sf": 0.1, "cold": {full_name: 1.3}}


def test_rederive_block(tmp_path):
    """--rederive (r10): band block from N runs — lo = 0.35 x fastest
    cold, hi = 2.5 x slowest; mixed-sf runs refuse; the emitted block
    round-trips through load_bands."""
    from bench_compare import load_bands, rederive

    r1 = tmp_path / "r1.json"
    r1.write_text(json.dumps(
        {"metric": "x", "sf": 0.1, "queries_cold": {"q1": 1.0, "q2": 4.0}}))
    r2 = tmp_path / "r2.json"
    r2.write_text(json.dumps(
        {"metric": "x", "sf": 0.1, "queries_cold": {"q1": 2.0}}))
    text, rc = rederive([str(r1), str(r2)])
    assert rc == 0
    out = tmp_path / "bands.md"
    out.write_text(text + "\n")
    sf, bands = load_bands(str(out))
    assert sf == 0.1
    assert bands["q1"] == (0.35, 5.0)   # 0.35*min(1,2), 2.5*max(1,2)
    assert bands["q2"] == (1.4, 10.0)   # single-run entry still banded

    r3 = tmp_path / "r3.json"
    r3.write_text(json.dumps(
        {"metric": "x", "sf": 0.01, "queries_cold": {"q1": 1.0}}))
    _, rc2 = rederive([str(r1), str(r3)])
    assert rc2 == 2


def test_compact_line_fits_tail_window():
    """The compact final line must fit the driver's stdout-tail window
    (~1.9 KB observed in BENCH_r09.json) with headroom — that's the whole
    point of it. Guard against the suite growing it past the window."""
    from bench import HEADLINE

    # worst-case rendering: every timing at 4-digit seconds w/ 3 decimals
    qc = {n.split("_", 1)[0]: 9999.999 for n in HEADLINE}
    line = json.dumps(
        {"metric": "headline_suite_total", "value": 99999.999, "unit": "sec",
         "value_cold": 99999.999, "sf": 0.1, "qc": qc},
        separators=(",", ":"),
    )
    assert len(line) < 1700, f"compact bench line {len(line)}B nears the tail window"
