"""PySpark-native analytics engine with the query/data-processing
capabilities of ``gatopdimos/imdb-top-250-etl-pipeline``.

The reference (read-only at /root/reference/) is a single-script pandas →
Postgres ETL pipeline (webscraper-postgres.py:29-285).  This package
re-expresses everything it *computes* — extraction, cleaning, joining,
normalization, dedup, idempotent upsert — as lazy Spark DataFrame plans,
and extends the operator library with the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
that a 100 TB pipeline needs.

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
    schemas.py    explicit StructTypes for every table (no inference)
    sources/      readers (parquet catalog, html-fetch source, jdbc stub)
    functions/    scalar expression library (cleaning, casts, text)
    operators/    relational + ETL + dedup + similarity + text operators
    plans/        named query registry (queries() + oracle_sql() twins)
    streaming/    Structured Streaming surface (windows, watermark, merge)
"""

__version__ = "0.1.0"
