"""Unit tests for the Python-UDF surface (the oracle covers the two
mapInPandas queries; applyInPandas needs a local reference)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, lookup
from imdb_top_250_etl_pipeline_spark.sources import load


def test_grouped_zscore_matches_two_pass(spark):
    got = {
        r.c_custkey: r
        for r in QUERIES["udf_grouped_zscore"].fn(spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, members in by_seg.items():
        vals = [m.c_acctbal for m in members]
        mean = sum(vals) / len(vals)
        std = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
        for m in members:
            expected = (m.c_acctbal - mean) / std if std > 0 else 0.0
            assert abs(got[m.c_custkey].zscore - expected) < 1e-6, (seg, m)
    # z-scores are standardized: per-group mean ~0 (the query rounds each
    # z to 6dp, so the mean carries up to 5e-7 of rounding noise)
    for seg, members in by_seg.items():
        zs = [got[m.c_custkey].zscore for m in members]
        assert abs(sum(zs) / len(zs)) < 1e-6


def test_parse_markup_nulls_on_malformed(spark):
    df = lookup("udf_parse_markup").fn(spark, SF_SMOKE)
    broken = df.where(F.col("rank").isNull())
    expected = (
        load(spark, SF_SMOKE, "part").where(F.col("p_partkey") % 41 == 0).count()
    )
    # every 41st part row is malformed by construction -> all fields NULL
    assert broken.count() == expected > 0
    assert broken.select("title", "meta", "url").distinct().collect()[0] == (
        None,
        None,
        None,
    )


def test_fetch_details_pluggable_fetch_fn(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import fetch_details

    urls = spark.createDataFrame(
        [("https://example.test/part/7",), ("https://example.test/part/9",)],
        "url string",
    )
    def custom(url):  # the swap-in seam a live deployment uses
        return 418, "teapot-body"
    rows = {r.url: r for r in fetch_details(urls, fetch_fn=custom).collect()}
    assert all(r.status == 418 and r.body_len == len("teapot-body") for r in rows.values())
    assert rows["https://example.test/part/7"].page_id == 7


def test_resize_preserves_aspect_and_bounds(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        resize_images,
        synthesize_blobs,
    )

    d = spark.createDataFrame(
        [(0, "x"), (17, "y"), (63, "z")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in resize_images(synthesize_blobs(d, "text", "doc_id"), 32).collect()}
    for doc_id, r in rows.items():
        w, h = doc_id % 64 + 16, doc_id % 48 + 16
        assert max(r.new_width, r.new_height) == 32
        assert r.new_width == max(1, w * 32 // max(w, h))
        assert r.new_height == max(1, h * 32 // max(w, h))


def test_sample_frames_every_k(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        sample_frames,
        synthesize_videos,
    )

    d = spark.createDataFrame([(5, "a"), (200, "b")], "doc_id long, text string")
    rows = sample_frames(synthesize_videos(d, "doc_id"), every_k=7).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.ts_ms))
    # doc 5 -> 15 frames -> idx 0,7,14; doc 200 -> 10 frames -> idx 0,7
    assert sorted(by_doc[5]) == [(0, 0), (7, 700), (14, 1400)]
    assert sorted(by_doc[200]) == [(0, 0), (7, 700)]


def test_flatten_structs_depth_arrays_and_collisions(spark):
    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.functions.nested import (
        flatten_structs,
    )

    df = spark.range(3).select(
        F.col("id"),
        F.struct(
            F.col("id").alias("a"),
            F.struct((F.col("id") * 2).alias("deep")).alias("inner"),
            F.array(F.lit(1), F.lit(2)).alias("arr"),
        ).alias("s"),
    )
    flat = flatten_structs(df)
    assert flat.columns == ["id", "s_a", "s_inner_deep", "s_arr"]
    rows = {r.id: r for r in flat.collect()}
    assert rows[2].s_a == 2 and rows[2].s_inner_deep == 4
    assert rows[1].s_arr == [1, 2]  # arrays stay put — explode is explicit

    # collision must raise, not overwrite
    bad = spark.range(1).select(
        F.struct(F.lit(1).alias("x")).alias("a"),
        F.lit(9).alias("a_x"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        flatten_structs(bad)
