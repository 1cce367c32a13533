"""Derive an sf1 fixture set (10× sf0.1) for scale measurement.

The driver's own generator (TESTDATA.md, seed=42) is not available and
/root/testdata is read-only, so sf1 is DERIVED deterministically from the
driver's sf0.1 tables: 10 key-shifted copies with referential integrity
preserved (every foreign key shifts by the same per-copy stride, strides =
max(key)+1 so copies can never collide).

Workload-shape discipline — the point is measuring the SAME per-row work at
10× rows, so replication must not change operator complexity classes:
  - documents: copy i>0 suffixes every token with ``_i`` — within-copy
    shingle/ngram structure is identical to sf0.1 while cross-copy Jaccard
    is 0, so dedup pair counts scale LINEARLY (naive duplication would give
    every doc 9 near-identical twins and blow the pair graph up
    quadratically, measuring a different workload, not a bigger one);
    n_chars is recomputed from the rewritten text.
  - embeddings: copy i>0 sign-flips a deterministic half of the dimensions
    (hash(i, j) parity), decorrelating copies (cosine ≈ 0) for the same
    reason; norms are preserved exactly.
  - events: timestamps unchanged — the same time range at 10× density, so
    windowed aggregates see 10× rows per window (the realistic scale-up).

Single parquet file per table (the drivers' layout — DuckDB oracles read
the bare path). Output: <repo>/testdata_sf1 (gitignored, ~200 MB).

Usage: python tools/datagen_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def generate(out_dir: str, copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({copies})) AS i")

    strides: dict[str, int] = {}
    for table, key in [
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[table] = (
            con.execute(f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]
        )
    u_stride = con.execute(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]

    def emit(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimension constants: unchanged
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit("customer", f"""
        SELECT c_custkey + i * {strides['customer']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', copies""")
    emit("supplier", f"""
        SELECT s_suppkey + i * {strides['supplier']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', copies""")
    emit("part", f"""
        SELECT p_partkey + i * {strides['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', copies""")
    emit("orders", f"""
        SELECT o_orderkey + i * {strides['orders']} AS o_orderkey,
               o_custkey + i * {strides['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', copies""")
    emit("lineitem", f"""
        SELECT l_orderkey + i * {strides['orders']} AS l_orderkey,
               l_partkey + i * {strides['part']} AS l_partkey,
               l_suppkey + i * {strides['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', copies""")
    emit("events", f"""
        SELECT event_id + i * {strides['events']} AS event_id,
               ts,
               user_id + i * {u_stride} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', copies""")
    emit("documents", f"""
        SELECT doc_id + i * {strides['documents']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE array_to_string(
                      list_transform(string_split(text, ' '), t -> t || '_' || i), ' ')
               END AS text,
               lang, source,
               CAST(CASE WHEN i = 0 THEN n_chars
                         ELSE length(array_to_string(
                           list_transform(string_split(text, ' '), t -> t || '_' || i), ' '))
               END AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet', copies""")
    emit("embeddings", f"""
        SELECT vec_id + i * {strides['embeddings']} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE CAST(list_transform(
                      list_zip(embedding, range(1, len(embedding) + 1)),
                      z -> z[1] * CASE WHEN hash(i * 1000 + z[2]) % 2 = 0
                                       THEN 1 ELSE -1 END)
                      AS FLOAT[])
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', copies""")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(out, n)
