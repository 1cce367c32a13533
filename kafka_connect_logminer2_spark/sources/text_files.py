"""Text-format corpus sources: JSONL and CSV readers/writers with
EXPLICIT schemas — the ingestion formats a real corpus pipeline receives
(crawl dumps ship as compressed JSONL far more often than parquet).

Design rules for 100 TB ingestion, encoded here rather than left to
callers:
- NEVER ``inferSchema``/schema-sniff in production reads: inference is a
  full extra pass over the data before the real job starts, and worse, it
  is sample-dependent — two ingest runs over different file sets can
  infer different types and silently fork downstream semantics. Both
  readers take the documents schema as a fixed contract.
- Malformed records quarantine instead of failing the job or silently
  nulling: ``PERMISSIVE`` + ``columnNameOfCorruptRecord`` routes bad
  lines to a side column the caller can count/divert (the
  ``corrupt_to`` option), which is the only workable behavior when one
  bad line in TB #73 must not kill a day-long ingest.
- CSV gets multiline quoting + escape handling (document text contains
  newlines and quotes); JSONL is the default interchange because it
  needs neither.

Equivalence contract: reading back ``write_documents_jsonl``/``_csv``
output must reproduce the parquet ``documents`` table EXACTLY (same
rows, same types) — pinned by tests/test_text_sources.py running the
same dedup query over all three formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _with_corrupt(schema: StructType, corrupt_to: str | None) -> StructType:
    if corrupt_to is None:
        return schema
    return StructType(list(schema.fields) + [StructField(corrupt_to, StringType())])


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    corrupt_to: str | None = None,
) -> DataFrame:
    """JSON-lines documents read under the fixed schema contract.
    ``corrupt_to='_corrupt'`` adds a quarantine column holding the raw
    line for records that fail to parse (PERMISSIVE mode); without it,
    unparseable lines surface as all-NULL rows the caller should treat
    as corrupt. Compression (.gz/.zst) is handled transparently by the
    file source."""
    reader = (
        spark.read.schema(_with_corrupt(schema, corrupt_to))
        .option("mode", "PERMISSIVE")
    )
    if corrupt_to is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_to)
    return reader.json(path)


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    docs.write.mode("overwrite").json(path)


_CSV_OPTS = {
    # document text carries newlines, commas, and quotes — every option
    # here exists because omitting it corrupts real corpus text
    "header": "true",
    "multiLine": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",  # distinguish empty string from NULL
}


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    corrupt_to: str | None = None,
) -> DataFrame:
    reader = spark.read.schema(_with_corrupt(schema, corrupt_to)).options(
        **_CSV_OPTS, mode="PERMISSIVE"
    )
    if corrupt_to is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_to)
    return reader.csv(path)


def write_documents_csv(docs: DataFrame, path: str) -> None:
    docs.write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def corrupt_count(df: DataFrame, corrupt_to: str = "_corrupt") -> int:
    """Quarantined-record count for an ingest health gate (reject the
    batch above a threshold instead of training on silently-nulled
    text). Spark refuses corrupt-column-only queries straight off a raw
    file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    cache-then-query workaround lives here so callers don't trip it."""
    df = df.cache()
    try:
        return df.filter(F.col(corrupt_to).isNotNull()).count()
    finally:
        df.unpersist()


def read_documents_orc(spark, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC corpus reader — Spark-native columnar alternative when the
    upstream warehouse exports ORC (Hive-lineage lakes). Same
    explicit-schema discipline as the JSONL/CSV readers: pass the
    expected schema so a drifted export fails loudly instead of
    inferring its way into silently re-typed columns. ORC carries its
    own schema, so "corrupt records" here are type MISMATCHES — Spark
    raises on read rather than quarantining rows (binary formats fail
    whole-file, not per-line; the quarantine contract only applies to
    the textual formats)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_documents_orc(docs: DataFrame, path: str) -> None:
    docs.write.mode("overwrite").orc(path)
