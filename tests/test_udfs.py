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


def _ahash_py(t: str):
    cps = [ord(c) for c in t]
    n = len(cps)
    cs, cc = [0] * 64, [0] * 64
    for i, c in enumerate(cps):
        k = (i * 64) // n
        cs[k] += c
        cc[k] += 1
    tot = sum(cps)
    bits = [
        1 if (cc[k] > 0 and cs[k] * n >= tot * cc[k]) else 0
        for k in range(64)
    ]
    return [sum(bits[b * 16 + j] << j for j in range(16)) for b in range(4)]


def test_ahash_matches_python_dual_and_band_join_is_lossless(spark):
    import pyspark.sql.functions as F

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        ahash_blobs,
        ahash_near_dup,
        synthesize_blobs,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "the quick brown fox jumps over the lazy dog " * 3),  # exact
        (3, "the quick brown fox JUMPS OVER the lazy dog " * 3),  # near
        (4, "zzzz completely different content here yes " * 4),
        (5, "short but ok text under sixty-four characters"),  # n < 64
        (6, ""),  # empty payload: all-zero signature, never dropped
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sigs = ahash_blobs(synthesize_blobs(df, "text", "doc_id"))
    got = {r.doc_id: [r.b0, r.b1, r.b2, r.b3] for r in sigs.collect()}
    assert got[6] == [0, 0, 0, 0]
    for doc_id, t in texts:
        if t:
            assert got[doc_id] == _ahash_py(t), doc_id
    # lossless pigeonhole: banded pairs == brute-force pairs at radius 3
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    brute = {
        (i, j)
        for i in got
        for j in got
        if i < j and ham(got[i], got[j]) <= 3
    }
    banded = {
        (r.id_a, r.id_b) for r in ahash_near_dup(sigs, radius=3).collect()
    }
    assert banded == brute
    assert (1, 2) in banded  # exact copy: hamming 0
    # hamming values verified against the python hashes
    for r in ahash_near_dup(sigs, radius=3).collect():
        assert r.hamming == ham(got[r.id_a], got[r.id_b])


def test_ahash_max_bucket_drops_degenerate_buckets(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        ahash_blobs,
        ahash_near_dup,
        synthesize_blobs,
    )

    # 6 identical docs: every band bucket has size 6
    df = spark.createDataFrame(
        [(i, "same text repeated for everyone here ok " * 2) for i in range(6)],
        ["doc_id", "text"],
    )
    sigs = ahash_blobs(synthesize_blobs(df, "text", "doc_id"))
    assert ahash_near_dup(sigs, radius=3).count() == 15  # C(6,2)
    assert ahash_near_dup(sigs, radius=3, max_bucket=5).count() == 0


def test_audio_decode_stats_and_resample_geometry(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
        resample_audio_geometry,
        synthesize_audio,
    )

    texts = [(0, "abc"), (1, "~~~~"), (2, "`" * 5), (3, "hello world!")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    meta = decode_audio(synthesize_audio(df, "text", "doc_id"))
    got = {r.doc_id: r for r in meta.collect()}
    for doc_id, t in texts:
        rate = (doc_id % 3 + 1) * 8000
        mags = [abs(ord(c) - 96) for c in t]
        r = got[doc_id]
        assert r.sample_rate == rate
        assert r.n_samples == len(t)
        assert r.duration_ms == len(t) * 1000 // rate
        assert r.peak == max(mags)
        assert r.n_clipped == sum(1 for m in mags if m > 24)
    # '~' is codepoint 126 -> |126-96| = 30 > 24: all clipped
    assert got[1].peak == 30 and got[1].n_clipped == 4
    # backtick is 96 -> silence
    assert got[2].peak == 0 and got[2].n_clipped == 0
    res = {
        r.doc_id: r.resampled_n
        for r in resample_audio_geometry(meta, 16000).collect()
    }
    for doc_id, t in texts:
        rate = (doc_id % 3 + 1) * 8000
        assert res[doc_id] == len(t) * 16000 // rate
