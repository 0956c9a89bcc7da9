"""Reference-shaped raw fixtures, derived deterministically from ``part``.

The reference's inputs are scraped HTML (webscraper-postgres.py:59-70,:95);
the driver provides no raw-string tables, so the ETL-surface queries derive
``movies_raw``/``details_raw`` (FIXTURES.md §B) from ``part`` with pure
arithmetic — identically in Spark and in the DuckDB oracle CTEs below, so
the extraction/normalization operators stay hash-checkable end to end.

All derivations use integer arithmetic + string concat only: no float
formatting, no locale, no nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.etl import NBSP  # U+00A0, IMDb's ratings-blob separator
from ..sources import load


def _s(c) -> F.Column:
    return c.cast("string")


def movies_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy listing-page rows: "<rank>. <title>", castable-or-garbage
    numerics, "<score>\xa0(<views>)" blobs, NULL-able href."""
    k = F.col("p_partkey")
    return load(spark, sf_dir, "part").select(
        F.when(k % 97 == 0, F.lit(None)).otherwise(
            F.concat(_s(k), F.lit(". "), F.col("p_name"))
        ).alias("raw_title"),
        F.concat(F.lit("desc-"), _s(k)).alias("description"),
        F.when(k % 13 == 0, F.lit("not-a-year")).otherwise(_s(k % 70 + 1950)).alias("year"),
        F.concat(_s(k % 3 + 1), F.lit("h "), _s(k % 60), F.lit("m")).alias("duration"),
        F.element_at(
            F.array(F.lit("G"), F.lit("PG"), F.lit("PG-13"), F.lit("R")),
            (k % 4 + 1).cast("int"),
        ).alias("rating"),
        F.when(k % 11 == 0, F.lit(None)).otherwise(_s(k % 100)).alias("metascore"),
        F.when(k % 89 == 0, F.lit(None)).otherwise(
            F.concat(
                _s(k % 5 + 5), F.lit("."), _s(k % 10),
                F.lit(NBSP), F.lit("("), _s(k % 400), F.lit("K)"),
            )
        ).alias("ratings_blob"),
        F.when(k % 53 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("/title/tt"), _s(k))
        ).alias("href"),
    )


def details_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detail-page rows: scalar director + array writers/stars, NULL-able."""
    k = F.col("p_partkey")

    def person(mult: int):
        return F.concat(F.lit("Person "), _s(k * mult % 101))

    return load(spark, sf_dir, "part").select(
        F.concat(F.lit("desc-"), _s(k)).alias("description"),
        F.when(k % 19 == 0, F.lit(None)).otherwise(person(7)).alias("director"),
        F.when(k % 23 == 0, F.lit(None).cast("array<string>")).otherwise(
            F.array(person(3), person(5))
        ).alias("writers"),
        F.when(k % 29 == 0, F.lit(None).cast("array<string>")).otherwise(
            F.array(person(11), person(13), person(17))
        ).alias("stars"),
    )


MOVIES_RAW_SQL = """
  SELECT
    CASE WHEN p_partkey % 97 = 0 THEN NULL
         ELSE CAST(p_partkey AS VARCHAR) || '. ' || p_name END AS raw_title,
    'desc-' || CAST(p_partkey AS VARCHAR) AS description,
    CASE WHEN p_partkey % 13 = 0 THEN 'not-a-year'
         ELSE CAST(p_partkey % 70 + 1950 AS VARCHAR) END AS year,
    CAST(p_partkey % 3 + 1 AS VARCHAR) || 'h ' || CAST(p_partkey % 60 AS VARCHAR) || 'm' AS duration,
    (['G','PG','PG-13','R'])[CAST(p_partkey % 4 + 1 AS INT)] AS rating,
    CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE CAST(p_partkey % 100 AS VARCHAR) END AS metascore,
    CASE WHEN p_partkey % 89 = 0 THEN NULL
         ELSE CAST(p_partkey % 5 + 5 AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR)
              || chr(160) || '(' || CAST(p_partkey % 400 AS VARCHAR) || 'K)' END AS ratings_blob,
    CASE WHEN p_partkey % 53 = 0 THEN NULL
         ELSE '/title/tt' || CAST(p_partkey AS VARCHAR) END AS href
  FROM part
"""

DETAILS_RAW_SQL = """
  SELECT
    'desc-' || CAST(p_partkey AS VARCHAR) AS description,
    CASE WHEN p_partkey % 19 = 0 THEN NULL
         ELSE 'Person ' || CAST(p_partkey * 7 % 101 AS VARCHAR) END AS director,
    CASE WHEN p_partkey % 23 = 0 THEN NULL
         ELSE ['Person ' || CAST(p_partkey * 3 % 101 AS VARCHAR),
               'Person ' || CAST(p_partkey * 5 % 101 AS VARCHAR)] END AS writers,
    CASE WHEN p_partkey % 29 = 0 THEN NULL
         ELSE ['Person ' || CAST(p_partkey * 11 % 101 AS VARCHAR),
               'Person ' || CAST(p_partkey * 13 % 101 AS VARCHAR),
               'Person ' || CAST(p_partkey * 17 % 101 AS VARCHAR)] END AS stars
  FROM part
"""

# Cleaned-movies CTE (the DuckDB twin of operators.etl.extract_movies over
# movies_raw) — reused by several oracle queries.
MOVIES_CLEAN_SQL = """
  SELECT
    TRY_CAST(string_split(raw_title, '.')[1] AS INT) AS rank,
    string_split(raw_title, '.')[2] AS title,
    description,
    TRY_CAST(year AS INT) AS year,
    duration,
    rating,
    TRY_CAST(metascore AS INT) AS metascore,
    TRY_CAST(string_split(ratings_blob, chr(160))[1] AS DECIMAL(3,1)) AS imdb_score,
    CASE WHEN ratings_blob IS NULL THEN NULL
         ELSE regexp_extract(string_split(ratings_blob, chr(160))[2], '\\(([^)]*)\\)', 1) END AS views,
    'https://www.imdb.com' || href AS details_url
  FROM movies_raw
"""

PEOPLE_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY name) AS INT) AS person_id, name
  FROM (
    SELECT DISTINCT name FROM (
      SELECT unnest(writers) AS name FROM details_raw WHERE writers IS NOT NULL
      UNION ALL
      SELECT unnest(stars) AS name FROM details_raw WHERE stars IS NOT NULL
      UNION ALL
      SELECT director AS name FROM details_raw WHERE director IS NOT NULL
    ) u WHERE name IS NOT NULL
  ) d
"""

MOVIES_TABLE_SQL = """
  SELECT CAST(row_number() OVER (ORDER BY details_url) AS INT) AS movie_id, *
  FROM movies_clean WHERE details_url IS NOT NULL
"""


def with_etl_ctes(body: str) -> str:
    """Wrap an oracle query body with the shared ETL CTE chain."""
    return f"""
    WITH movies_raw AS ({MOVIES_RAW_SQL}),
         details_raw AS ({DETAILS_RAW_SQL}),
         movies_clean AS ({MOVIES_CLEAN_SQL}),
         people AS ({PEOPLE_SQL}),
         movies AS ({MOVIES_TABLE_SQL})
    {body}
    """
