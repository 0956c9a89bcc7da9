"""REAL compressed video (round 12): MJPEG-in-AVI demux + mux.

Legs: (1) container structure — header fields, idx1-seek vs
linear-walk equality, BOTH idx1 offset conventions, payloads are
standalone JFIF streams; (2) pixel round-trips — solid q100 exact,
gradient frames bit-identical to the bare JPEG codec path (the
container must add nothing); (3) corrupt-stream/lying-header guards
(ValueError contract) and the non-MJPG refusal seam; (4)
cross-modality aHash pin — a lossy q<100 frame hashes within hamming
3 of the same pixels through lossless BMP, and losslessly-solid
frames hash identically; (5) Spark-side seam integration
(avi_frame_stats id arithmetic, sample_frames, y4m_frame_ahash's AVI
branch).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imdb_top_250_etl_pipeline_spark.operators.avi import (
    _idx1,
    _movi_bounds,
    avi_encode,
    avi_frames,
    avi_header,
)
from imdb_top_250_etl_pipeline_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
)


def _grad(h, w, seed=0):
    return ((np.indices((h, w)).sum(0) * 3 + seed) % 256).astype(np.uint8)


def _solid(h, w, v):
    return np.full((h, w), v, dtype=np.uint8)


# --- leg 1: container structure ----------------------------------------------


def test_header_fields_round_trip():
    frames = [_solid(13, 21, 50 + f) for f in range(5)]
    raw = avi_encode(frames, rate=12, scale=1)
    assert avi_header(raw) == (21, 13, 12, 1, 5, 0)


def test_idx1_seek_equals_linear_walk():
    frames = [_grad(16, 24, seed=f) for f in range(9)]
    with_idx = avi_encode(frames, rate=10)
    without = avi_encode(frames, rate=10, write_idx1=False)
    assert _idx1(with_idx) is not None
    assert _idx1(without) is None
    for k in (1, 2, 4):
        a = list(avi_frames(with_idx, every_k=k))
        b = list(avi_frames(without, every_k=k))
        assert [i for i, _ in a] == [i for i, _ in b] == list(range(0, 9, k))
        assert all(pa == pb for (_, pa), (_, pb) in zip(a, b))


def test_idx1_absolute_offset_convention_accepted():
    # rewrite every idx1 offset from movi-relative to file-absolute; the
    # demuxer must resolve entries under either convention
    frames = [_solid(10, 10, 7 * f + 1) for f in range(4)]
    raw = bytearray(avi_encode(frames, rate=5))
    movi_pos, _ = _movi_bounds(bytes(raw))
    pos = bytes(raw).find(b"idx1")
    size = struct.unpack_from("<I", raw, pos + 4)[0]
    for i in range(pos + 8, pos + 8 + size, 16):
        rel = struct.unpack_from("<I", raw, i + 8)[0]
        struct.pack_into("<I", raw, i + 8, movi_pos + rel)
    a = list(avi_frames(bytes(raw)))
    b = list(avi_frames(avi_encode(frames, rate=5)))
    assert a == b


def test_frame_payloads_are_standalone_jfif():
    frames = [_grad(12, 12, seed=f) for f in range(3)]
    raw = avi_encode(frames, rate=10, quality=80)
    for idx, payload in avi_frames(raw):
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert jpeg_decode(payload).shape == (12, 12)


# --- leg 2: pixel round-trips -------------------------------------------------


def test_solid_frames_quality_100_exact():
    frames = [_solid(19, 23, (91 + 11 * f) % 256) for f in range(6)]
    raw = avi_encode(frames, rate=7, quality=100)
    n = 0
    for idx, payload in avi_frames(raw):
        assert np.array_equal(jpeg_decode(payload), frames[idx]), idx
        n += 1
    assert n == 6


def test_gradient_frames_match_bare_jpeg_codec():
    # the container must be a pure wrapper: payload f == jpeg_encode(f)
    frames = [_grad(17, 33, seed=f) for f in range(4)]
    for q in (100, 85):
        raw = avi_encode(frames, rate=10, quality=q)
        for idx, payload in avi_frames(raw):
            assert payload == jpeg_encode(frames[idx], quality=q), (q, idx)


def test_rgb_frames_supported():
    f0 = np.zeros((16, 16, 3), dtype=np.uint8)
    f0[:, :, 0] = 200
    raw = avi_encode([f0], rate=5, quality=100)
    (idx, payload), = list(avi_frames(raw))
    dec = jpeg_decode(payload)
    assert dec.ndim == 3 and dec.shape == (16, 16, 3)


# --- leg 3: guards -------------------------------------------------------------


def test_corrupt_streams_raise_value_error():
    frames = [_solid(10, 10, 42)]
    raw = avi_encode(frames, rate=5)
    with pytest.raises(ValueError, match="RIFF"):
        avi_header(b"JUNK" + raw[4:])
    with pytest.raises(ValueError):
        avi_header(raw[:20])
    bad_form = bytearray(raw)
    bad_form[8:12] = b"WAVE"
    with pytest.raises(ValueError, match="form"):
        avi_header(bytes(bad_form))


def test_idx1_length_mismatch_raises():
    raw = bytearray(avi_encode([_solid(10, 10, 1), _solid(10, 10, 2)], rate=5))
    pos = bytes(raw).find(b"idx1")
    # lie about the first entry's chunk length
    struct.pack_into("<I", raw, pos + 8 + 12, 999999)
    with pytest.raises(ValueError, match="idx1"):
        list(avi_frames(bytes(raw)))


def test_non_mjpg_codec_refuses_at_seam():
    raw = bytearray(avi_encode([_solid(8, 8, 9)], rate=5))
    i = bytes(raw).find(b"vidsMJPG")
    raw[i + 4 : i + 8] = b"H264"
    j = bytes(raw).find(b"MJPG", i + 8)
    raw[j : j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        avi_header(bytes(raw))


def test_zero_rate_and_bad_mux_inputs_raise():
    raw = bytearray(avi_encode([_solid(8, 8, 9)], rate=5))
    i = bytes(raw).find(b"vidsMJPG")
    struct.pack_into("<I", raw, i + 24, 0)  # dwRate = 0
    with pytest.raises(ValueError, match="rate"):
        avi_header(bytes(raw))
    with pytest.raises(ValueError, match="zero frames"):
        avi_encode([], rate=5)
    with pytest.raises(ValueError, match="geometry"):
        avi_encode([_solid(8, 8, 1), _solid(8, 9, 1)], rate=5)


def test_lying_avih_frame_count_raises():
    raw = bytearray(avi_encode([_solid(8, 8, 9)], rate=5))
    i = bytes(raw).find(b"avih")
    struct.pack_into("<I", raw, i + 8 + 16, 2_000_000)
    with pytest.raises(ValueError, match="frame count"):
        avi_header(bytes(raw))


# --- leg 4: cross-modality aHash ------------------------------------------------


def _ahash64(px: np.ndarray) -> int:
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        _ahash_bands,
        _spatial_cells,
    )

    bands = _ahash_bands(_spatial_cells(px.astype(np.int64)), px.ravel())
    h = 0
    for b in bands:
        h = (h << 16) | (int(b) & 0xFFFF)
    return h


def test_lossy_frame_ahash_within_radius_of_bmp():
    px = _grad(24, 32, seed=3)
    raw = avi_encode([px], rate=10, quality=85)
    (_, payload), = list(avi_frames(raw))
    lossy = jpeg_decode(payload)
    d = bin(_ahash64(lossy) ^ _ahash64(px)).count("1")
    # q85 perturbs pixels by a few levels; the 8x8 mean-threshold hash
    # must stay within the banded-join radius image near-dup uses
    assert d <= 3, d


def test_solid_frame_ahash_identical_to_bmp():
    px = _solid(24, 32, 77)
    raw = avi_encode([px], rate=10, quality=100)
    (_, payload), = list(avi_frames(raw))
    assert _ahash64(jpeg_decode(payload)) == _ahash64(px)


# --- leg 5: Spark-side seam -----------------------------------------------------


def test_spark_avi_stats_id_arithmetic(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        avi_frame_stats,
        synthesize_avi_blobs,
    )

    docs = spark.range(0, 100).selectExpr("id * 9 as doc_id")
    got = avi_frame_stats(
        synthesize_avi_blobs(docs, "doc_id"), every_k=3
    ).collect()
    assert got, "no frames sampled"
    for r in got:
        i = r.doc_id
        assert r.width == i % 24 + 16 and r.height == i % 20 + 12
        v = (i + 11 * r.frame_idx) % 256
        assert r.y_min == v == r.y_max
        assert r.y_sum == v * r.width * r.height
        assert r.ts_ms == r.frame_idx * 1000 // (i % 10 + 5)
        assert r.frame_idx % 3 == 0 and r.frame_idx < i % 12 + 4


def test_spark_sample_frames_avi_branch(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        sample_frames,
        synthesize_avi_blobs,
    )

    docs = spark.range(0, 30).selectExpr("id * 9 as doc_id")
    rows = sample_frames(
        synthesize_avi_blobs(docs, "doc_id"), every_k=2
    ).collect()
    assert rows
    for r in rows:
        assert r.frame_idx % 2 == 0
        assert r.ts_ms == r.frame_idx * 1000 // (r.doc_id % 10 + 5)


def test_spark_frame_ahash_avi_branch(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        synthesize_avi_blobs,
        y4m_frame_ahash,
    )

    docs = spark.range(1, 10).selectExpr("id * 9 as doc_id")
    rows = y4m_frame_ahash(
        synthesize_avi_blobs(docs, "doc_id"), every_k=3
    ).collect()
    assert rows
    # solid frames: every cell mean EQUALS the global mean, and the
    # exact-integer threshold is >=, so all 64 bits set
    for r in rows:
        assert (r.b0, r.b1, r.b2, r.b3) == (65535,) * 4, r


def test_interleaved_audio_stream_skipped_by_video_demux():
    """Real crawl-scale AVIs interleave '01wb' audio chunks between
    frames and index BOTH streams in idx1 — the video demux must pick
    exactly the '00dc' entries (idx1 path) and skip audio chunks in
    the linear walk, producing identical frames either way."""
    frames = [_solid(14, 18, 30 + 11 * f) for f in range(5)]
    pcm = bytes((i * 7 + 3) % 256 for i in range(997))  # odd chunk sizes
    av = avi_encode(frames, rate=10, quality=100, pcm=pcm)
    silent = avi_encode(frames, rate=10, quality=100)
    assert avi_header(av) == avi_header(silent) == (18, 14, 10, 1, 5, 0)
    a = list(avi_frames(av))
    b = list(avi_frames(silent))
    assert [i for i, _ in a] == list(range(5))
    assert all(pa == pb for (_, pa), (_, pb) in zip(a, b))
    # the audio entries really are in the index (the demux filtered
    # them, not the muxer)
    assert sum(1 for e in _idx1(av) if e[0] == b"01wb") > 0
    # no-index variant: the linear walk must skip the audio chunks too
    av_noidx = avi_encode(frames, rate=10, quality=100, pcm=pcm,
                          write_idx1=False)
    c = list(avi_frames(av_noidx))
    assert all(pa == pc for (_, pa), (_, pc) in zip(a, c))


def test_rec_grouped_movi_linear_walk():
    """Interleaving muxers wrap chunk runs in LIST('rec ') groups; the
    linear walk must descend into them and keep global frame order.
    Built by hand-rewrapping a normal mux's movi chunks two-per-rec."""
    frames = [_solid(11, 13, 20 + 9 * f) for f in range(5)]
    raw = avi_encode(frames, rate=8, quality=100, write_idx1=False)
    movi_pos, movi_end = _movi_bounds(raw)

    def chunk(fcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    # collect the original 00dc chunks
    chunks, pos = [], movi_pos + 4
    while pos + 8 <= movi_end:
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        chunks.append(raw[pos : pos + 8 + size + (size & 1)])
        pos += 8 + size + (size & 1)
    # regroup: two chunks per LIST('rec ') wrapper
    body = b"".join(
        chunk(b"LIST", b"rec " + b"".join(chunks[i : i + 2]))
        for i in range(0, len(chunks), 2)
    )
    rewrapped = (
        raw[: movi_pos - 8]
        + chunk(b"LIST", b"movi" + body)
        + raw[movi_end + (movi_end & 1) :]
    )
    # patch the RIFF size for the rewrapped movi
    rewrapped = bytearray(rewrapped)
    struct.pack_into("<I", rewrapped, 4, len(rewrapped) - 8)
    got = list(avi_frames(bytes(rewrapped)))
    want = list(avi_frames(raw))
    assert [i for i, _ in got] == [i for i, _ in want] == list(range(5))
    assert all(pg == pw for (_, pg), (_, pw) in zip(got, want))


def test_audio_first_stream_order_video_rides_01dc():
    """ADVICE r12: a muxer that writes the 'auds' strl BEFORE the
    'vids' strl stores video data as '01dc' — the demux must resolve
    the vids stream index from strl order, not assume stream 0, on
    BOTH the idx1 and linear-walk paths (a '00dc'-only match silently
    yields zero frames for a header that validates fine)."""
    frames = [_solid(12, 16, 25 + 13 * f) for f in range(4)]
    pcm = bytes((i * 5 + 1) % 256 for i in range(503))
    for write_idx1 in (True, False):
        raw = avi_encode(
            frames, rate=10, quality=100, pcm=pcm,
            audio_first=True, write_idx1=write_idx1,
        )
        assert avi_header(raw) == (16, 12, 10, 1, 4, 1)
        got = list(avi_frames(raw))
        assert [i for i, _ in got] == list(range(4))
        for f, (_, payload) in zip(frames, got):
            assert np.array_equal(jpeg_decode(payload), f)
    # the idx1 variant really indexes video under '01dc' / audio '00wb'
    raw = avi_encode(frames, rate=10, quality=100, pcm=pcm, audio_first=True)
    ckids = {e[0] for e in _idx1(raw)}
    assert b"01dc" in ckids and b"00wb" in ckids and b"00dc" not in ckids
    # sampling still walks the video stream only
    assert [i for i, _ in avi_frames(raw, every_k=2)] == [0, 2]
    # audio_first without audio is a muxer-contract error
    with pytest.raises(ValueError, match="audio_first"):
        avi_encode(frames, audio_first=True)


def test_child_chunk_escaping_its_list_raises():
    """ADVICE r12: a nested child whose declared size escapes its
    enclosing LIST but stays in-file must fail loud (codec-guard
    contract), not mis-parse sibling bytes."""
    frames = [_solid(10, 10, 40)]
    raw = bytearray(avi_encode(frames, rate=10, quality=100))
    # find the strh chunk inside hdrl/strl and inflate its size so it
    # overruns the strl list but stays within the file
    pos = raw.find(b"strh")
    assert pos > 0
    struct.pack_into("<I", raw, pos + 4, len(raw) - pos - 100)
    with pytest.raises(ValueError, match="overruns its container"):
        avi_header(bytes(raw))
