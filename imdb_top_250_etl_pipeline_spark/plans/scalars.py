"""Scalar-function battery — SURVEY §2.8's "required by driver fixtures"
set: date, array, JSON, and string functions beyond the reference's
cleaning expressions (F1–F9, covered by the ETL surface).

All narrow per-row expressions: zero shuffles, full pushdown, and every
output is engine-deterministic (integer/date math, string ops, single
IEEE operations), so the whole battery is oracle-checked.  Engine
differences that bite are documented inline (dayofweek origin,
array_position null vs 0) — each either avoided or normalized on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import register


@register(
    "scalar_date_battery",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(quarter(l.l_shipdate) AS INT) AS ship_quarter,
           CAST(month(l.l_shipdate) AS INT) AS ship_month,
           CAST(day(l.l_shipdate) AS INT) AS ship_day,
           CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month_start,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS INT) AS days_to_ship
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey < 500
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
    doc="Date battery: year/quarter/month/day extraction, date_trunc to "
    "month (DuckDB returns DATE for month-granularity truncs → cast back "
    "to TIMESTAMP in the oracle), datediff order→ship. Spark datediff "
    "and DuckDB date_diff('day') both count date boundaries — equivalent "
    "after the explicit DATE cast. (dayofweek is deliberately absent: "
    "Spark is 1=Sunday, DuckDB 0=Sunday.)",
)
def scalar_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.quarter("l_shipdate").cast("int").alias("ship_quarter"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
            F.dayofmonth("l_shipdate").cast("int").alias("ship_day"),
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_month_start"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("int")
            .alias("days_to_ship"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_array_battery",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           CAST(COALESCE(NULLIF(list_position(string_split(text, ' '), 'spark'), NULL), 0) AS INT)
               AS spark_pos,
           string_split(text, ' ')[1:5] AS first5,
           list_sort(list_distinct(string_split(text, ' ')))[1:3] AS first3_sorted
    FROM documents
    ORDER BY doc_id
    """,
    doc="Array battery over tokenized text: size, array_contains, "
    "array_position (normalized: Spark returns 0 when absent, DuckDB "
    "NULL → COALESCE to 0), slice, array_sort+distinct. Arrays stay "
    "first-class columns end-to-end.",
)
def scalar_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import array_battery_columns

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *array_battery_columns("text")).orderBy("doc_id")


@register(
    "scalar_json_battery",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INT) AS k_typed,
           json_extract_string(props, '$.k') AS k_raw,
           (CAST(props->>'k' AS INT) >= 50) AS k_high,
           CASE WHEN CAST(props->>'k' AS INT) < 25 THEN 'low'
                WHEN CAST(props->>'k' AS INT) < 75 THEN 'mid'
                ELSE 'high' END AS k_band
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="JSON battery over events.props: from_json typed extraction, "
    "get_json_object raw extraction, derived predicates and banding — "
    "schema-on-read without touching the writer.",
)
def scalar_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return e.select(
        "event_id",
        k.alias("k_typed"),
        F.get_json_object(F.col("props"), "$.k").alias("k_raw"),
        (k >= 50).alias("k_high"),
        F.when(k < 25, "low").when(k < 75, "mid").otherwise("high").alias("k_band"),
    ).orderBy("event_id")


@register(
    "scalar_nan_normalize",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           COALESCE(isnan(v), false) AS is_nan,
           CASE WHEN isnan(v) THEN NULL ELSE v END AS v_clean,
           COALESCE(CASE WHEN isnan(v) THEN NULL ELSE v END, 0.0) AS v_filled
    FROM e
    ORDER BY event_id
    """,
    doc="F8: NaN-sentinel → SQL NULL normalization (the reference floods "
    "np.nan into every failed field, webscraper-postgres.py:39-57; "
    "nan-aware guards at :176,184). NaN injected deterministically, then "
    "isnan predicate + nanvl-style cleanup + fill. DuckDB's isnan(NULL) "
    "is NULL while Spark's is false → COALESCE on the oracle side.",
)
def scalar_nan_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import nan_to_null

    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    v = F.when(F.col("event_id") % 10 == 0, F.lit(float("nan"))).otherwise(
        F.col("value")
    )
    clean = nan_to_null(v)
    return e.select(
        "event_id",
        F.isnan(v).alias("is_nan"),
        clean.alias("v_clean"),
        F.coalesce(clean, F.lit(0.0)).alias("v_filled"),
    ).orderBy("event_id")


@register(
    "scalar_string_battery",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS INT) AS name_len,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           reverse(p_type) AS type_rev,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(levenshtein(lower(p_brand), lower(p_type)) AS INT) AS brand_type_dist,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    ORDER BY p_partkey
    """,
    doc="String battery: case mapping, length, global regexp_replace "
    "(Spark replaces all matches by default; DuckDB needs the 'g' flag), "
    "reverse, substring, levenshtein, concat_ws.",
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowels"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.levenshtein(F.lower("p_brand"), F.lower("p_type"))
        .cast("int")
        .alias("brand_type_dist"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    ).orderBy("p_partkey")
