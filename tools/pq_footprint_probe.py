"""PQ code-relation footprint probe (r11 verdict #2): is the claimed 16×
compression REAL as stored?

The r11 representation kept codes as ``array<int>`` — 32 four-byte
elements plus per-row array headers, ~2× compression, not the 16× the
docstring claimed. r12 bit-packs the m·ceil(log2 K) bits into two
fixed-width longs (m=32/K=16 → exactly 128 bits = 16 bytes of code per
vector, the FAISS default footprint). This probe materializes the SAME
codes at a given scale factor in all three layouts —

  raw      (vec_id long, embedding array<float>)   what PQ replaces
  arr_int  (vec_id long, code array<int>)          the r11 layout
  packed   (vec_id long, c0 long, c1 long)         the r12 layout

— writes each to uncompressed, dictionary-encoding-disabled, single-file
parquet (codecs and 16-distinct-value dictionaries would let the writer
paper over a fat logical layout, and per-file footers would swamp the
small fixture; the claim is about the representation) plus an id-only
baseline so the code columns' own bytes/row can be read off by
subtraction. BASELINE.md records the output.

Usage: python tools/pq_footprint_probe.py [SF_DIR]   # default sf0.1
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from kafka_connect_logminer2_spark.functions.similarity import (  # noqa: E402
    _pack_codes_np,
    _pq_bit_layout,
    _safe_norms,
    pq_codebooks,
)
from kafka_connect_logminer2_spark.session import get_spark  # noqa: E402

M, K = 32, 16


def main(sf_dir: str) -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    books = pq_codebooks(emb, m=M, n_codes=K)
    dsub = books.shape[2]
    b, per = _pq_bit_layout(M, K)

    @pandas_udf("struct<code: array<int>, c0: bigint, c1: bigint>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        v /= _safe_norms(v)[:, None]
        codes = np.empty((v.shape[0], M), dtype=np.int32)
        for j in range(M):
            sub = v[:, j * dsub:(j + 1) * dsub]
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ books[j].T)
                + (books[j] * books[j]).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
        c0, c1 = _pack_codes_np(codes, b, per)
        return pd.DataFrame({"code": list(codes), "c0": c0, "c1": c1})

    both = emb.select("vec_id", enc("embedding").alias("_e")).select(
        "vec_id",
        F.col("_e.code").alias("code"),
        F.col("_e.c0").alias("c0"),
        F.col("_e.c1").alias("c1"),
    )
    both.persist()
    n = both.count()

    tmp = tempfile.mkdtemp(prefix="pqfoot_")
    layouts = {
        "id_only": both.select("vec_id"),
        "raw": emb.select("vec_id", "embedding"),
        "arr_int": both.select("vec_id", "code"),
        "packed": both.select("vec_id", "c0", "c1"),
    }
    out = {"sf_dir": sf_dir, "rows": n, "m": M, "k": K,
           "logical_code_bytes": M * b / 8}
    try:
        for name, df in layouts.items():
            dst = f"{tmp}/{name}"
            (
                df.coalesce(1)
                .write.option("compression", "none")
                .option("parquet.enable.dictionary", "false")
                .parquet(dst)
            )
            size = sum(
                os.path.getsize(p) for p in glob.glob(f"{dst}/*.parquet")
            )
            out[f"{name}_bytes_per_row"] = round(size / n, 2)
    finally:
        both.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    base = out["id_only_bytes_per_row"]
    for name in ("raw", "arr_int", "packed"):
        out[f"{name}_code_bytes_per_row"] = round(
            out[f"{name}_bytes_per_row"] - base, 2
        )
    out["pack_vs_arr_int"] = round(
        out["arr_int_code_bytes_per_row"] / out["packed_code_bytes_per_row"], 2
    )
    out["raw_vs_packed"] = round(
        out["raw_code_bytes_per_row"] / out["packed_code_bytes_per_row"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
