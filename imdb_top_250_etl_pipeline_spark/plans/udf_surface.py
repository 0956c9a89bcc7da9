"""UDF-surface queries — SURVEY §2.11 (mapInPandas / applyInPandas).

A synthetic markup column (derived from ``part`` with pure expressions,
reproduced in the oracle CTE) feeds the parse/fetch operators, so the
Python paths are driven by deterministic fixture data and — where the
Python computes exact integer/string results — hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.udfs import fetch_details, grouped_zscore, parse_markup
from ..sources import load
from .registry import register

_BASE = "https://example.test"

# Synthetic listing markup: the reference's scraped <li> shape
# (webscraper-postgres.py:33,36-70), with every 41st row malformed so the
# NULL-on-parse-failure contract is exercised.
_MARKUP_SQL = f"""
  SELECT CASE WHEN p_partkey % 41 = 0 THEN '<li><h3>broken'
         ELSE '<li><h3>' || CAST(p_partkey AS VARCHAR) || '. ' || p_name
              || '</h3><span class="meta">' || p_brand || '</span>'
              || '<a href="/part/' || CAST(p_partkey AS VARCHAR) || '">x</a></li>'
         END AS markup
  FROM part
"""


def _markup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    good = F.concat(
        F.lit("<li><h3>"),
        k.cast("string"),
        F.lit(". "),
        F.col("p_name"),
        F.lit('</h3><span class="meta">'),
        F.col("p_brand"),
        F.lit('</span><a href="/part/'),
        k.cast("string"),
        F.lit('">x</a></li>'),
    )
    # widen before mapInPandas: Python workers parallelize per
    # partition, and the fixture arrives as a single file — the fan is
    # SIZED from the plan's byte estimate (round 14; the fixed
    # 2*parallelism spread paid ~60 worker launches for a KB-scale
    # parse at local[32])
    from ..operators.multimodal import widen_for_python

    return widen_for_python(p, "p_partkey").select(
        F.when(k % 41 == 0, F.lit("<li><h3>broken")).otherwise(good).alias("markup")
    )


@register(
    "udf_parse_markup",
    oracle=f"""
    WITH raw AS ({_MARKUP_SQL})
    SELECT CAST(NULLIF(regexp_extract(markup, '<li><h3>(\\d+)\\. ', 1), '') AS INT) AS rank,
           NULLIF(regexp_extract(markup, '\\. ([^<]*)</h3>', 1), '') AS title,
           NULLIF(regexp_extract(markup, 'class="meta">([^<]*)</span>', 1), '') AS meta,
           CASE WHEN regexp_extract(markup, 'href="([^"]*)"', 1) = '' THEN NULL
                ELSE '{_BASE}' || regexp_extract(markup, 'href="([^"]*)"', 1) END AS url
    FROM raw
    ORDER BY rank NULLS FIRST, title NULLS FIRST
    """,
    doc="F10 UDF extraction: Arrow-batched mapInPandas regex parse of the "
    "reference's listing markup (webscraper-postgres.py:36-70), NULL on "
    "parse failure (every 41st row is malformed). The oracle re-derives "
    "the same fields with SQL regexp_extract, so the Python path is "
    "hash-checked.",
)
def udf_parse_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_markup(_markup_df(spark, sf_dir), "markup", _BASE)
    return parsed.orderBy(
        F.col("rank").asc_nulls_first(), F.col("title").asc_nulls_first()
    )


@register(
    "udf_dependent_scan",
    oracle=f"""
    WITH raw AS ({_MARKUP_SQL}),
    urls AS (
      SELECT DISTINCT '{_BASE}' || regexp_extract(markup, 'href="([^"]*)"', 1) AS url
      FROM raw WHERE regexp_extract(markup, 'href="([^"]*)"', 1) <> ''
    )
    SELECT url,
           200 AS status,
           CAST(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) % 97 + 10 AS INT)
               AS body_len,
           CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS page_id
    FROM urls
    ORDER BY page_id
    """,
    doc="S2 dependent scan: the URL column of one table drives a "
    "partition-parallel mapInPandas fetch (the reference's 250 serial "
    "Selenium loads, webscraper-postgres.py:97). HTTP stubbed with a "
    "deterministic body (no network in-container) — the oracle recomputes "
    "the body arithmetic so the fan-out plumbing is hash-checked.",
)
def udf_dependent_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_markup(_markup_df(spark, sf_dir), "markup", _BASE)
    urls = parsed.where(F.col("url").isNotNull()).select("url").distinct()
    return fetch_details(urls).orderBy("page_id")


@register(
    "udf_grouped_zscore",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round(CASE WHEN stddev_pop(c_acctbal) OVER w = 0 THEN 0.0
                 ELSE (c_acctbal - avg(c_acctbal) OVER w)
                      / stddev_pop(c_acctbal) OVER w END, 6) AS zscore
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    ORDER BY c_mktsegment, c_custkey
    """,
    doc="applyInPandas grouped standardization: per-mktsegment z-scores of "
    "customer balances — the grouped-UDAF shape (whole group in one "
    "pandas frame). HASH-CHECKED since round 6: pandas mean/std(ddof=0) "
    "and DuckDB's windowed avg/stddev_pop agree to ~1e-14 relative on "
    "these magnitudes, so round(z, 6) lands on identical doubles "
    "(measured at sf0.01 and sf0.1). Also pinned against an exact "
    "two-pass Spark computation in unit tests.",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        grouped_zscore(c, "c_mktsegment", "c_acctbal", "c_custkey")
        .withColumn("zscore", F.round("zscore", 6))
        .orderBy("c_mktsegment", "c_custkey")
    )
