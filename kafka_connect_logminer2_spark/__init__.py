"""kafka_connect_logminer2_spark — a PySpark-native CDC + analytics engine.

A from-scratch re-imagination of the capabilities of the reference
``klc213bk/kafka-connect-logminer2`` (an Oracle LogMiner Kafka Connect source
connector): a typed CDC event stream with transactional semantics, dynamic
schemas, offset bookkeeping, plus the relational operator surface embedded in
the SQL the reference generates — re-expressed Spark-first (DataFrame /
Catalyst / Structured Streaming), and extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis).

Layout:
    sources/    parquet fixture loaders + synthetic redo-event generation
    operators/  CDC dataflow operators (parse, filters, CSF, transactions, envelope)
    functions/  reusable column-level function library (relational + text + vector)
    plans/      the named query suite (Spark callable + DuckDB oracle SQL pairs)
    streaming/  Structured Streaming pipeline (applyInPandasWithState core)
"""

__version__ = "0.1.0"
