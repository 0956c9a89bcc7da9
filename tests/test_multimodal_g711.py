"""G.711 A-law / mu-law telephony audio (round 13b).

Legs: (1) formula exactness — the vectorized expansions vs CPython's
audioop C implementation, EXHAUSTIVE over all 256 codes (the
authoritative external anchor; audioop is deprecated-but-present on
this 3.11 image, so the differential is import-gated); (2) hand
vectors — the spec-known anchor points (mu 0xFF -> 0, 0x7F -> -0,
0x00 -> -32124; A 0xD5 -> +8, 0x2A -> -32256) pinned independently of
both implementations; (3) structural properties — odd symmetry,
segment monotonicity, value ranges; (4) WAV integration — format
tags 6/7, multi-channel channel-0 selection, word-aligned data
chunks, fixture round-trip of the raw code stream; (5) guard
contract — 16-bit G.711 headers and non-G.711 blobs into g711_stats
fail loud.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
    g711_alaw_decode,
    g711_ulaw_decode,
    wav_encode_g711,
    wav_pcm_samples,
)

ALL = np.arange(256, dtype=np.int64)


def test_ulaw_hand_vectors():
    # 0xFF is mu-law silence (+0); 0x7F is -0; 0x00 is the largest
    # negative (-32124); 0x80 the largest positive (+32124)
    assert g711_ulaw_decode(np.array([0xFF]))[0] == 0
    assert g711_ulaw_decode(np.array([0x7F]))[0] == 0
    assert g711_ulaw_decode(np.array([0x00]))[0] == -32124
    assert g711_ulaw_decode(np.array([0x80]))[0] == 32124
    # one mid value: code 0xEF -> ~ = 0x10 -> exp 1, mant 0 ->
    # ((0<<3)+0x84)<<1 - 0x84 = 132
    assert g711_ulaw_decode(np.array([0xEF]))[0] == 132


def test_alaw_hand_vectors():
    # 0xD5 is A-law "silence" (+8, no true zero); 0x55 is -8;
    # 0xAA -> +32256 max, 0x2A -> -32256 min
    assert g711_alaw_decode(np.array([0xD5]))[0] == 8
    assert g711_alaw_decode(np.array([0x55]))[0] == -8
    assert g711_alaw_decode(np.array([0xAA]))[0] == 32256
    assert g711_alaw_decode(np.array([0x2A]))[0] == -32256


def test_exhaustive_vs_audioop():
    audioop = pytest.importorskip("audioop")
    ref_u = np.frombuffer(
        audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2"
    ).astype(np.int64)
    ref_a = np.frombuffer(
        audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2"
    ).astype(np.int64)
    assert np.array_equal(g711_ulaw_decode(ALL), ref_u)
    assert np.array_equal(g711_alaw_decode(ALL), ref_a)


def test_odd_symmetry():
    # flipping the sign bit negates the magnitude (mu exactly; A
    # exactly — the toggle only XORs even bit positions)
    mu = g711_ulaw_decode(ALL)
    assert np.array_equal(mu[ALL & 0x7F], -mu[(ALL & 0x7F) | 0x80])
    al = g711_alaw_decode(ALL)
    assert np.array_equal(al[ALL & 0x7F], -al[(ALL & 0x7F) | 0x80])


def test_segment_monotonicity():
    # within the positive half, decoded magnitude is strictly
    # monotonic in the (exponent, mantissa) order the code words
    # enumerate
    mu_pos = g711_ulaw_decode((~np.arange(128, dtype=np.int64)) & 0xFF)
    # codes ~0..~127 give exp/mant ascending -> strictly increasing
    assert np.all(np.diff(mu_pos) > 0)
    a_pos = g711_alaw_decode(np.arange(128, dtype=np.int64) ^ 0x55 | 0x80)
    # recover order: a = code ^ 0x55 with sign set; enumerate seg/mant
    vals = np.sort(g711_alaw_decode(ALL[g711_alaw_decode(ALL) > 0]))
    assert np.all(np.diff(vals) > 0)  # all 128 positive values distinct


def test_wav_integration_roundtrip():
    codes = (7 * ALL + 13) % 256
    for alaw in (False, True):
        raw = wav_encode_g711(codes, 8000, alaw=alaw)
        rate, samples, bits = wav_pcm_samples(raw)
        assert rate == 8000 and bits == 16
        dec = g711_alaw_decode(codes) if alaw else g711_ulaw_decode(codes)
        assert np.array_equal(samples, dec)


def test_wav_odd_length_word_alignment():
    codes = np.arange(33, dtype=np.int64)  # odd byte count -> pad
    raw = wav_encode_g711(codes, 8000, alaw=True)
    assert len(raw) % 2 == 0
    rate, samples, _ = wav_pcm_samples(raw)
    assert len(samples) == 33
    assert np.array_equal(samples, g711_alaw_decode(codes))


def test_wav_stereo_channel0():
    # interleave two channels; channel 0 must be selected
    ch0 = np.arange(0, 40, dtype=np.int64)
    ch1 = np.arange(100, 140, dtype=np.int64)
    inter = np.empty(80, dtype=np.int64)
    inter[0::2], inter[1::2] = ch0, ch1
    raw = wav_encode_g711(inter, 16000, alaw=False, n_ch=2)
    rate, samples, _ = wav_pcm_samples(raw)
    assert rate == 16000
    assert np.array_equal(samples, g711_ulaw_decode(ch0))


def test_leading_junk_chunk_is_walked():
    """A JUNK chunk before fmt is legal RIFF (review fix: the stats
    operator read the tag at a hard-coded offset)."""
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wave_format_tag,
    )

    codes = ALL[:24]
    raw = wav_encode_g711(codes, 8000, alaw=True)
    junk = b"JUNK" + struct.pack("<I", 6) + b"\x00" * 6
    patched = bytearray(raw[:12] + junk + raw[12:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    assert wave_format_tag(bytes(patched)) == 6
    rate, samples, _ = wav_pcm_samples(bytes(patched))
    assert np.array_equal(
        samples,
        __import__(
            "imdb_top_250_etl_pipeline_spark.operators.multimodal",
            fromlist=["g711_alaw_decode"],
        ).g711_alaw_decode(codes),
    )


def test_g711_16bit_header_raises():
    raw = bytearray(wav_encode_g711(ALL[:20], 8000, alaw=True))
    struct.pack_into("<H", raw, 34, 16)  # bits_per_sample field
    with pytest.raises(ValueError, match="8-bit"):
        wav_pcm_samples(bytes(raw))


def test_spark_g711_stats_matches_numpy(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        g711_stats,
        synthesize_g711_blobs,
    )

    ids = spark.range(0, 120, 12).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in g711_stats(
            synthesize_g711_blobs(ids, "doc_id")
        ).collect()
    }
    assert set(rows) == set(range(0, 120, 12))
    for i in rows:
        n = i % 60 + 40
        codes = (i * 7 + 13 * np.arange(n, dtype=np.int64)) % 256
        dec = (g711_alaw_decode(codes) if i % 24 != 0
               else g711_ulaw_decode(codes))
        r = rows[i]
        assert r["law"] == ("alaw" if i % 24 != 0 else "ulaw")
        assert r["n_samples"] == n
        assert r["s_min"] == int(dec.min())
        assert r["s_max"] == int(dec.max())
        assert r["s_sum"] == int(dec.sum())


def test_decode_audio_accepts_g711(spark):
    """The generic decode_audio operator flows G.711 WAVs through the
    same wav_pcm_samples branch — no special-casing needed."""
    import pandas as pd

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
        g711_ulaw_decode,
    )

    codes = (11 * ALL + 3) % 256
    raw = wav_encode_g711(codes, 8000, alaw=False)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [5], "blob": [raw]}))
    row = decode_audio(df).collect()[0]
    dec = g711_ulaw_decode(codes)
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == len(codes)
    assert row["peak"] == int(np.abs(dec).max())


def test_g711_stats_rejects_non_g711(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        g711_stats,
        wav_encode_pcm16,
    )
    import pandas as pd

    pcm = wav_encode_pcm16(np.zeros(10), 8000)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [pcm]})
    )
    with pytest.raises(Exception, match="not G.711"):
        g711_stats(df).collect()
