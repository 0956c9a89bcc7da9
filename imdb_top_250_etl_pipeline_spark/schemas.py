"""Explicit StructType schemas for every table the engine touches.

The reference infers pandas schemas from scraped dicts
(webscraper-postgres.py:74,98) and reconciles them manually against fixed
Postgres DDL (:110-144).  The engine is schema-explicit end-to-end: reads
never infer, and the ETL-output schemas below mirror the reference DDL
(movies/people/bridge tables, README.md:65-93).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver fixture tables (/root/testdata/sf*/ — see FIXTURES.md §A) ---

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- ETL-surface schemas (reference-shaped; FIXTURES.md §B) ---

# Raw listing-page extract, pre-cleaning (webscraper-postgres.py:59-70):
# every field is a messy string + NULLs instead of the reference's np.nan.
MOVIES_RAW = T.StructType(
    [
        T.StructField("raw_title", T.StringType()),  # "<rank>. <title>"
        T.StructField("description", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("duration", T.StringType()),
        T.StructField("rating", T.StringType()),
        T.StructField("metascore", T.StringType()),
        T.StructField("ratings_blob", T.StringType()),  # "<score>\xa0(<views>)"
        T.StructField("href", T.StringType()),
    ]
)

# Raw detail-page extract (webscraper-postgres.py:95).
DETAILS_RAW = T.StructType(
    [
        T.StructField("description", T.StringType()),
        T.StructField("director", T.StringType()),
        T.StructField("writers", T.ArrayType(T.StringType())),
        T.StructField("stars", T.ArrayType(T.StringType())),
    ]
)

# Normalized outputs mirroring the reference DDL (webscraper-postgres.py:110-144).
MOVIES = T.StructType(
    [
        T.StructField("movie_id", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("duration", T.StringType()),
        T.StructField("rating", T.StringType()),
        T.StructField("metascore", T.IntegerType()),
        T.StructField("imdb_score", T.DecimalType(3, 1)),
        T.StructField("views", T.StringType()),
        T.StructField("details_url", T.StringType()),
        T.StructField("last_updated", T.TimestampType()),
    ]
)

PEOPLE = T.StructType(
    [
        T.StructField("person_id", T.IntegerType()),
        T.StructField("name", T.StringType()),
    ]
)

MOVIE_PERSON_BRIDGE = T.StructType(
    [
        T.StructField("movie_id", T.IntegerType()),
        T.StructField("person_id", T.IntegerType()),
    ]
)
