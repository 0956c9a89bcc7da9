"""S3 JDBC read/write, executed for real against embedded Derby.

Derby ships inside the pyspark distribution (it backs the Hive
metastore), so the JDBC code path — Spark's JdbcRelationProvider, type
mapping, predicate pushdown, partitioned parallel reads — runs
end-to-end with zero extra jars.  Production swaps the URL/driver for
Postgres (the reference's engine, webscraper-postgres.py:105); nothing
in the call shape changes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdb_top_250_etl_pipeline_spark.sources.catalog import (
    DERBY_EMBEDDED_DRIVER,
    read_jdbc,
)
from imdb_top_250_etl_pipeline_spark.sources.sink import write_jdbc

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    try:
        spark._jvm.java.lang.System.setProperty(
            "derby.stream.error.file", str(d / "derby.log")
        )
    except Exception:
        pass
    return f"jdbc:derby:{d}/db;create=true"


def _customers(spark):
    from imdb_top_250_etl_pipeline_spark.sources import load

    return load(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def test_jdbc_write_read_roundtrip_value_exact(spark, derby_url):
    c = _customers(spark)
    write_jdbc(
        c,
        derby_url,
        "cust_rt",
        mode="overwrite",
        driver=DERBY_EMBEDDED_DRIVER,
        createTableColumnTypes="c_name VARCHAR(40), c_mktsegment VARCHAR(16)",
    )
    back = read_jdbc(spark, derby_url, "cust_rt", driver=DERBY_EMBEDDED_DRIVER)
    assert back.schema.simpleString() == c.schema.simpleString()
    # BIGINT/VARCHAR/DOUBLE round-trip value-exactly: symmetric
    # difference must be empty
    assert back.exceptAll(c).count() == 0
    assert c.exceptAll(back).count() == 0


def test_jdbc_partitioned_read_plans_n_connections(spark, derby_url):
    c = _customers(spark)
    write_jdbc(
        c,
        derby_url,
        "cust_par",
        mode="overwrite",
        driver=DERBY_EMBEDDED_DRIVER,
        createTableColumnTypes="c_name VARCHAR(40), c_mktsegment VARCHAR(16)",
    )
    lo, hi = c.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    par = read_jdbc(
        spark,
        derby_url,
        "cust_par",
        driver=DERBY_EMBEDDED_DRIVER,
        partitionColumn="c_custkey",
        lowerBound=str(lo),
        upperBound=str(hi + 1),
        numPartitions="4",
    )
    # 4 JDBC partitions = 4 concurrent connections, each a WHERE stride;
    # strides must tile the key space (no loss, no dup)
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == c.count()
    assert par.select(F.count_distinct("c_custkey")).first()[0] == c.count()


def test_jdbc_filter_pushes_into_remote_where(spark, derby_url):
    c = _customers(spark)
    write_jdbc(
        c,
        derby_url,
        "cust_pd",
        mode="overwrite",
        driver=DERBY_EMBEDDED_DRIVER,
        createTableColumnTypes="c_name VARCHAR(40), c_mktsegment VARCHAR(16)",
    )
    pushed = read_jdbc(
        spark, derby_url, "cust_pd", driver=DERBY_EMBEDDED_DRIVER
    ).where(F.col("c_mktsegment") == "BUILDING")
    phys = pushed._jdf.queryExecution().executedPlan().toString()
    # the predicate must compile into Derby's WHERE clause (filter at
    # the source, not post-transfer) — VARCHAR mapping makes it legal
    assert "EqualTo(c_mktsegment,BUILDING)" in phys
    expect = c.where(F.col("c_mktsegment") == "BUILDING").count()
    assert pushed.count() == expect


def test_jdbc_append_mode_accumulates(spark, derby_url):
    c = _customers(spark).where(F.col("c_custkey") <= 5)
    write_jdbc(
        c,
        derby_url,
        "cust_app",
        mode="overwrite",
        driver=DERBY_EMBEDDED_DRIVER,
        createTableColumnTypes="c_name VARCHAR(40), c_mktsegment VARCHAR(16)",
    )
    write_jdbc(c, derby_url, "cust_app", mode="append", driver=DERBY_EMBEDDED_DRIVER)
    back = read_jdbc(spark, derby_url, "cust_app", driver=DERBY_EMBEDDED_DRIVER)
    assert back.count() == 2 * c.count()
