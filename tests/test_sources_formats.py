"""CSV/JSON source round-trips: explicit-schema reads (no inference),
FAILFAST on malformed rows, and value-exact parity with the parquet
fixture they were exported from."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.sources import load
from imdb_top_250_etl_pipeline_spark.sources.catalog import read_csv, read_json

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def test_csv_roundtrip_schema_exact(spark, tmp_path):
    src = load(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path, NATION)
    assert back.schema == NATION
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_json_roundtrip_schema_exact(spark, tmp_path):
    src = load(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_json")
    src.write.json(path)
    back = read_json(spark, path, NATION)
    assert back.schema == NATION
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("n_nationkey,n_name,n_regionkey\nnot_an_int,FOO,xyz\n")
    with pytest.raises(Exception):
        read_csv(spark, str(p), NATION).collect()


def test_json_tolerates_extra_fields(spark, tmp_path):
    p = tmp_path / "extra.json"
    p.write_text('{"n_nationkey": 1, "n_name": "A", "n_regionkey": 0, "new_field": 9}\n')
    got = read_json(spark, str(p), NATION).collect()
    assert got[0].n_name == "A" and len(got[0]) == 3


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources.sink import compact_parquet

    src = load(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "many_small")
    src.repartition(64).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 32
    n = compact_parquet(spark, path, target_bytes=1 << 30)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after == 1
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_write_sorted_parquet_roundtrip(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources.sink import write_sorted_parquet

    src = load(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "sorted")
    write_sorted_parquet(src, path, ["o_orderdate"])
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_orc_roundtrip(spark, tmp_path):
    src = load(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = spark.read.schema(NATION).orc(path)
    assert back.schema == NATION
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_versioned_sink_time_travel_and_torn_write_safety(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources.sink import (
        read_versioned,
        read_versioned_pointer,
        write_versioned,
    )

    path = str(tmp_path / "vt")
    nation = load(spark, SF_SMOKE, "nation")
    v0 = write_versioned(nation.where("n_regionkey = 0"), path)
    v1 = write_versioned(nation, path)
    assert (v0, v1) == (0, 1)
    assert read_versioned(spark, path).count() == nation.count()
    assert read_versioned(spark, path, version=0).count() == nation.where(
        "n_regionkey = 0"
    ).count()

    # a crashed writer = snapshot dir without a pointer flip: readers
    # must keep resolving the last committed version
    nation.limit(1).write.parquet(f"{path}/v=2")
    assert read_versioned_pointer(path) == 1
    assert read_versioned(spark, path).count() == nation.count()
