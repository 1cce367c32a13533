"""Local mini-driver: run every queries() entry on Spark and its oracle on
DuckDB, compare row count + schema-insensitive sorted value hash — a stand-in
for the round driver's CORRECTNESS gate so mismatches surface before commit.

Usage: python tools/check_correctness.py [sf_dir] [query ...] \
           [--family PREFIX[,PREFIX...]] [--sample N]

The full registry at sf0.1 takes ~25 min — too slow per-commit. Scope it:
  --family q1,cdc     only names starting with a listed prefix (touched
                      families after an operator change)
  --sample 20         a deterministic (seeded md5-of-name order, no RNG
                      state) size-N spread across the whole registry — a
                      cheap canary whose selection is stable run-to-run
                      but unbiased by registration order
Explicit positional names compose with both (intersection).
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

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


def select_names(names: list[str], only: set[str], families: list[str], sample: int | None) -> list[str]:
    """Apply the scoping flags (intersection semantics), preserving
    registry order. Sampling sorts by md5(name) — deterministic without
    touching RNG state, stable run-to-run, uncorrelated with registration
    order — then restores registry order for readable output."""
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
        keep = set(
            sorted(picked, key=lambda n: hashlib.md5(n.encode()).hexdigest())[:sample]
        )
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
    args = ap.parse_args()
    sf = args.sf_dir
    only = set(args.names)
    families = [f for grp in args.family for f in grp.split(",") if f]

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
    picked = select_names(list(qs), only, families, args.sample)
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
