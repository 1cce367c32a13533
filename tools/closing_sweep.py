"""Round-closing validation guard (r12, r11 verdict #4).

r11's closing 215/215 sweep was recorded at `735ce6f`, but one more entry
(q174) landed after it — so the round's closing claim did not cover the
round's last code commit. This tool makes that impossible structurally:

1. refuses to start unless the working tree is CLEAN (everything you want
   validated must be committed first);
2. records the HEAD hash, runs the FULL registry sweep
   (tools/check_correctness.py, no filters) against it;
3. refuses to write the record if HEAD moved or the tree became dirty
   while the sweep ran;
4. writes ``CLOSING_r{N}.json`` with the swept HEAD + pass/fail counts.

The round's LAST commit is then exactly that record (plus any BASELINE.md
stanza quoting it) — a commit whose diff is validation bookkeeping only,
claiming results for the immediately preceding code HEAD it names. Any
code change after the sweep forces a re-run: there is no path to a
closing-validation record whose head field differs from the code it ran.

Usage: python tools/closing_sweep.py ROUND [SF_DIR]
  e.g. python tools/closing_sweep.py 12 /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, check=True
    ).stdout.strip()


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    dirty = _git("status", "--porcelain")
    if dirty:
        print("REFUSED: working tree is dirty — commit (or stash) first so "
              "the sweep validates a named commit:\n" + dirty)
        return 1
    head = _git("rev-parse", "HEAD")
    print(f"-- sweeping HEAD {head[:12]} at {sf}")

    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "tools/check_correctness.py", sf],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    counts = {"PASS": 0, "FAIL": 0, "rows": 0}
    assert proc.stdout is not None
    for line in proc.stdout:
        line = line.rstrip("\n")
        m = re.match(r"(PASS|FAIL|rows) ", line)
        if m:
            counts[m.group(1)] += 1
        print(line, flush=True)
    rc = proc.wait()
    dur = time.time() - t0

    if _git("rev-parse", "HEAD") != head or _git("status", "--porcelain"):
        print("REFUSED: HEAD moved or tree went dirty during the sweep — "
              "the results describe a commit that is no longer what you'd "
              "be recording them against. Re-run from the final commit.")
        return 1
    if rc != 0 or counts["FAIL"]:
        print(f"SWEEP NOT CLEAN (exit {rc}, {counts['FAIL']} FAIL) — "
              "no closing record written.")
        return 1

    out = f"CLOSING_r{rnd:02d}.json"
    record = {
        "round": rnd,
        "swept_head": head,
        "sf_dir": sf,
        "entries_pass": counts["PASS"],
        "entries_rows_only": counts["rows"],
        "entries_fail": 0,
        "duration_sec": round(dur, 1),
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(f"-- wrote {out}: {counts['PASS']} PASS / "
          f"{counts['rows']} rows-only in {dur:.0f}s against {head[:12]}")
    print("-- commit this file (plus any BASELINE.md stanza quoting it) as "
          "the round's final commit.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
