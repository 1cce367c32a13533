"""Data-layout operators: Z-order (Morton) clustering keys and z-ordered
writes — the multi-dimensional file-skipping story. A 100 TB table sorted
by one column prunes scans on THAT column only; interleaving the bits of
two (or more) dimensions into one sort key gives every file a tight
min/max envelope in ALL of them, so a 2-D selective predicate skips most
files from parquet footer stats alone. (Same layout idea popularized by
Delta/Iceberg `OPTIMIZE ZORDER BY`; implemented here from the standard
Morton-code bit-spreading identity.)

The spread uses the classic magic-mask doubling (x | x<<8 … & periodic
masks) — 5 JVM-side bitwise expressions per dimension, no UDF, and the
identical arithmetic is emitted as a DuckDB SQL twin so the key itself is
oracle-checkable bit-for-bit (q139).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (shift, mask) doubling schedule spreading a 16-bit value over 32 bits
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(col: Column) -> Column:
    """Insert a zero bit between consecutive bits of a 16-bit value
    (Morton spreading, magic-mask form)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved Morton key over exactly TWO integer dimensions (each
    truncated to ``bits`` low bits; pre-quantize wider domains first —
    rank/bucket or `% 2^bits`). Dimension i contributes bit positions
    i, i+2, i+4… so equal key prefixes are 2-D boxes — the common
    (time, key) / (x, y) layout case. Higher arity needs a wider
    spreading schedule (2-bit gaps etc.); deliberately not faked by
    reusing the 1-bit schedule, whose shifted spreads would collide."""
    if bits > 16:
        raise ValueError("zorder_key supports up to 16 bits per dimension")
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 dimensions")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        z = z.bitwiseOR(
            F.shiftleft(_spread16(c.cast("long").bitwiseAND(F.lit(mask))), i)
        )
    return z


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — identical magic-mask
    arithmetic, so Spark and the oracle produce bit-identical keys."""
    mask = (1 << bits) - 1

    def spread(expr: str) -> str:
        e = f"({expr} & {mask})"
        for shift, m in _SPREAD:
            e = f"(({e} | ({e} << {shift})) & {m})"
        return e

    parts = [f"({spread(c)} << {i})" for i, c in enumerate(cols)]
    return "(" + " | ".join(parts) + ")"


def write_zordered(
    df: DataFrame, cols: list[str], path: str, n_files: int, bits: int = 16
) -> None:
    """Cluster ``df`` into ``n_files`` z-ordered parquet files:
    range-partition on the Morton key (sampled range boundaries → equal
    file sizes even under skew), sort within partitions, drop the key.
    One exchange total; footer min/max stats of every data column come
    out tight in all z-dimensions, which is the entire point."""
    z = df.withColumn("_z", zorder_key(cols, bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping_box(path: str, preds: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """Footer-stats file pruning simulator: (files that a reader must
    touch for the conjunctive box predicate, total files) — computed from
    parquet row-group min/max alone, exactly the information any engine's
    scan pruning uses. Test/probe helper, driver-side by design."""
    import os

    import pyarrow.parquet as pq

    total, hit = 0, 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        overlap = True
        for col, (lo, hi) in preds.items():
            cmin, cmax = None, None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                overlap = False
                break
        hit += overlap
    return hit, total
