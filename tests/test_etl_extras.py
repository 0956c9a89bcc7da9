"""Unit tests for the sink surface, F9 last_updated, and the
approx_count_distinct error bound (oracle parity covers the rest)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.plans import QUERIES
from imdb_top_250_etl_pipeline_spark.plans.etl import _movies_table
from imdb_top_250_etl_pipeline_spark.sources import load
from imdb_top_250_etl_pipeline_spark.sources.sink import roundtrip_materialized


def test_movies_last_updated_present_and_nonnull(spark):
    m = _movies_table(spark, SF_SMOKE)
    field = dict(zip(m.schema.names, m.schema.fields))["last_updated"]
    assert isinstance(field.dataType, T.TimestampType)
    assert m.where(F.col("last_updated").isNull()).count() == 0


def test_parquet_roundtrip_preserves_values(spark, tmp_path):
    src = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate", "l_returnflag"
    )
    back = roundtrip_materialized(
        src, str(tmp_path / "li"), partition_by=["l_returnflag"]
    ).select(*src.columns)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_approx_count_distinct_error_bound(spark):
    # docstring contract of agg_approx_distinct: relative error vs exact
    # stays within a few rsd (rsd=0.02)
    approx = {
        r.l_returnflag: r.approx_parts
        for r in QUERIES["agg_approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.l_returnflag: r.exact_parts
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        rel_err = abs(approx[flag] - ex) / ex
        assert rel_err <= 3 * 0.02, (flag, approx[flag], ex, rel_err)
