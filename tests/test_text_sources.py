"""sources/text_files.py: JSONL/CSV corpus ingestion parity.

The contract under test: parquet → jsonl/csv → read-back reproduces the
documents table EXACTLY (rows, types, including newline/quote/comma text
and NULLs), and the same downstream query over any of the three formats
returns identical results. Corrupt records quarantine instead of killing
the read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.dedup import exact_dedup
from kafka_connect_logminer2_spark.sources.tables import load_table
from kafka_connect_logminer2_spark.sources.text_files import (
    DOCUMENTS_SCHEMA,
    corrupt_count,
    read_documents_csv,
    read_documents_jsonl,
    write_documents_csv,
    write_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.select(*DOCUMENTS_SCHEMA.names).collect())


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    p = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, p)
    back = read_documents_jsonl(spark, p)
    assert back.schema == DOCUMENTS_SCHEMA
    assert _rows(back) == _rows(docs)


def test_csv_roundtrip_exact(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    p = str(tmp_path / "docs_csv")
    write_documents_csv(docs, p)
    back = read_documents_csv(spark, p)
    assert _rows(back) == _rows(docs)


def test_csv_hostile_text_survives(spark, tmp_path):
    rows = [
        (1, 'line one\nline "two", with comma', "en", "src0", 30),
        (2, "", "en", "src1", 0),  # empty string, not NULL
        (3, None, None, "src2", None),  # real NULLs
        (4, "\\N literal backslash-N text", "en", "src0", 26),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    p = str(tmp_path / "hostile")
    write_documents_csv(docs, p)
    back = read_documents_csv(spark, p)
    assert _rows(back) == _rows(docs)


def test_same_query_all_three_formats(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    write_documents_jsonl(docs, jp)
    write_documents_csv(docs, cp)

    def q(df):
        dd = exact_dedup(df).agg(
            F.count(F.lit(1)), F.sum("doc_id"), F.sum("n_copies")
        ).collect()[0]
        per_src = sorted(
            tuple(r)
            for r in df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("ch"))
            .collect()
        )
        return (tuple(dd), per_src)

    truth = q(docs)
    assert q(read_documents_jsonl(spark, jp)) == truth
    assert q(read_documents_csv(spark, cp)) == truth


def test_corrupt_jsonl_quarantines(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_documents_jsonl(spark, str(p), corrupt_to="_corrupt").cache()
    assert corrupt_count(df) == 1
    good = df.filter(F.col("_corrupt").isNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    bad = df.filter(F.col("_corrupt").isNotNull()).collect()[0]
    assert "not json" in bad["_corrupt"]


def test_orc_roundtrip_parity(spark, tmp_path):
    # parquet -> ORC -> read back: row- and type-exact, and the same
    # query answers the same over either format
    from kafka_connect_logminer2_spark.sources.tables import load_table
    from kafka_connect_logminer2_spark.sources.text_files import (
        read_documents_orc,
        write_documents_orc,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    write_documents_orc(docs, path)
    back = read_documents_orc(spark, path, schema=docs.schema)
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    q = lambda df: sorted(
        map(
            tuple,
            df.groupBy("source").agg(F.count(F.lit(1)), F.sum("n_chars")).collect(),
        )
    )
    assert q(docs) == q(back)
