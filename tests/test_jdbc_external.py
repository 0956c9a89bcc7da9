"""S3 JDBC against a REAL external third-party engine (round-10 item).

The reference's production database is Postgres (webscraper-postgres
.py:105); its driver jar is not obtainable offline in this container,
but a genuine third-party JDBC driver IS present locally: the DuckDB
JDBC jar.  The call shape is IDENTICAL to the Derby tests and to
production Postgres — URL + driver class swap only — so running the
same roundtrip / stride / pushdown / append assertions against a
second, independently-implemented engine closes the "external DB" seam
as far as this sandbox allows.  Skips cleanly when no jar is found.

Isolation: the driver jar must ride ``spark.jars`` at session build
time, so the test runs in a SUBPROCESS with its own SparkSession
rather than polluting the shared test session's classpath.

Engine quirk (documented, not engine code): DuckDB's JDBC driver
raises its missing-table error without the SQLState Spark's default
dialect recognizes as object-not-found, so Spark's pre-write
tableExists check rethrows instead of returning false.  The harness
pre-creates the table via plain JDBC DDL (DriverRegistry + raw
connection — what a production job's migration step does) and writes
with mode=append; every read-side feature is exercised unmodified.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest


def _find_external_jdbc_jar() -> str | None:
    for pat in (
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"),
        os.path.expanduser("~/.m2/**/duckdb_jdbc*.jar"),
        os.path.expanduser("~/.cache/coursier/**/postgresql-*.jar"),
        os.path.expanduser("~/.m2/**/postgresql-*.jar"),
    ):
        hits = glob.glob(pat, recursive=True)
        if hits:
            return sorted(hits)[0]
    return None


JAR = _find_external_jdbc_jar()
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    JAR is None, reason="no external JDBC driver jar available offline"
)
def test_external_jdbc_roundtrip_stride_pushdown_append(tmp_path):
    db = tmp_path / "ext.db"
    script = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession, functions as F

        from imdb_top_250_etl_pipeline_spark.sources.catalog import read_jdbc
        from imdb_top_250_etl_pipeline_spark.sources.sink import write_jdbc

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("external-jdbc")
            .config("spark.jars", {JAR!r})
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        url = "jdbc:duckdb:{db}"
        drv = "org.duckdb.DuckDBDriver"

        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.jdbc.DriverRegistry.register(drv)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE cust (c_custkey BIGINT, c_name VARCHAR, "
            "c_acctbal DOUBLE, c_mktsegment VARCHAR)"
        )
        st.close(); conn.close()

        c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
        )
        write_jdbc(c, url, "cust", mode="append", driver=drv)

        # value-exact roundtrip through a second real engine
        back = read_jdbc(spark, url, "cust", driver=drv)
        assert back.count() == c.count()
        assert back.exceptAll(c).count() == 0 and c.exceptAll(back).count() == 0

        # partitioned read: 4 strides tile the key space (no loss, no dup)
        lo, hi = c.agg(F.min("c_custkey"), F.max("c_custkey")).first()
        par = read_jdbc(
            spark, url, "cust", driver=drv,
            partitionColumn="c_custkey", lowerBound=str(lo),
            upperBound=str(hi + 1), numPartitions="4",
        )
        assert par.rdd.getNumPartitions() == 4
        assert par.count() == c.count()
        assert par.select(F.count_distinct("c_custkey")).first()[0] == c.count()

        # predicate pushdown compiles into the remote WHERE clause
        pushed = back.where(F.col("c_mktsegment") == "BUILDING")
        phys = pushed._jdf.queryExecution().executedPlan().toString()
        assert "EqualTo(c_mktsegment,BUILDING)" in phys
        assert pushed.count() == c.where(F.col("c_mktsegment") == "BUILDING").count()

        # append accumulates
        write_jdbc(c.limit(5), url, "cust", mode="append", driver=drv)
        assert read_jdbc(spark, url, "cust", driver=drv).count() == c.count() + 5

        print("EXTERNAL-JDBC-OK")
        """
    )
    env = dict(os.environ, PYTHONPATH=_REPO)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO,
        env=env,
    )
    assert "EXTERNAL-JDBC-OK" in out.stdout, (
        out.stdout[-2000:] + "\n--- stderr ---\n" + out.stderr[-2000:]
    )
