"""Real-codec integration at the multimodal seam, round 10: WAV + BMP.

Round-9 verdict listed "real media codecs beyond PNG" as the residual
north-star gap.  Two more formats need NO external library — RIFF/WAVE
PCM is struct framing over raw samples, BMP is a header over padded
pixel rows — so the audio seam and a second image format now decode
REAL bytes end-to-end:

* decode_audio reads true sample rate / frame count / peak / clipping
  from PCM produced by the stdlib ``wave`` ENCODER (a genuinely
  independent writer, not our own framing round-tripped).
* bmp_gray_pixels decodes 24-bit BGR and 8-bit-palette BMPs (bottom-up
  and top-down), through the SAME exact integer luma as PNG — so the
  same pixels produce the SAME aHash regardless of container format,
  which is exactly what cross-format image near-dup needs.

Compressed formats (MP3/JPEG/RLE-BMP/float-WAV) still raise at the
marked seam.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
    bmp_dims,
    bmp_gray_pixels,
    wav_pcm_samples,
)


def make_wav(samples: np.ndarray, rate: int, n_ch: int = 1, bits: int = 16) -> bytes:
    """Encode PCM through the stdlib wave module (the independent
    writer).  ``samples`` is (frames, channels) or (frames,)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    if bits == 16:
        w.writeframes(samples.astype("<i2").tobytes())
    else:
        w.writeframes((samples + 128).astype(np.uint8).tobytes())
    w.close()
    return buf.getvalue()


def make_bmp(px: np.ndarray, top_down: bool = False, palette8: bool = False) -> bytes:
    """Minimal spec-correct BMP: BITMAPINFOHEADER, BI_RGB, 4-byte
    padded rows, bottom-up unless top_down.  ``px`` is (h, w, 3) RGB
    uint8, or (h, w) gray when palette8 (identity gray palette)."""
    h, w = px.shape[:2]
    bpp = 8 if palette8 else 24
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256)) if palette8 else b""
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        if palette8:
            line = px[r].astype(np.uint8).tobytes()
        else:
            line = px[r, :, ::-1].astype(np.uint8).tobytes()  # BGR
        rows.append(line + b"\x00" * (row_bytes - len(line)))
    body = b"".join(rows)
    data_off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, len(body), 2835, 2835,
        256 if palette8 else 0, 0,
    )
    return hdr + dib + pal + body


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb.astype(np.int64)
    return ((299 * r[:, :, 0] + 587 * r[:, :, 1] + 114 * r[:, :, 2]) // 1000).astype(
        np.uint8
    )


# ----------------------------------------------------------------- WAV


def test_wav_pcm_16bit_mono_roundtrip():
    rng = np.random.RandomState(11)
    src = rng.randint(-32768, 32768, size=500, dtype=np.int64)
    rate, got, bits = wav_pcm_samples(make_wav(src, 16000))
    assert (rate, bits) == (16000, 16)
    assert np.array_equal(got, src)


def test_wav_pcm_stereo_takes_channel_zero():
    rng = np.random.RandomState(12)
    src = rng.randint(-1000, 1000, size=(300, 2), dtype=np.int64)
    rate, got, bits = wav_pcm_samples(make_wav(src, 44100, n_ch=2))
    assert rate == 44100
    assert np.array_equal(got, src[:, 0])


def test_wav_pcm_8bit_centered():
    src = np.array([-128, -1, 0, 1, 127, 127], dtype=np.int64)
    rate, got, bits = wav_pcm_samples(make_wav(src, 8000, bits=8))
    assert (rate, bits) == (8000, 8)
    assert np.array_equal(got, src)


def test_wav_float_format_raises_to_seam():
    # hand-frame an IEEE-float WAVE (format tag 3): must hit the seam
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    data = b"\x00" * 64
    raw = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(NotImplementedError):
        wav_pcm_samples(raw)


def test_decode_audio_real_wav_stats_and_clipping(spark):
    """decode_audio over REAL WAV blobs mixed with the synthetic
    format: exact duration/peak, full-scale clipping counted for WAV
    (inclusive), synthetic threshold semantics untouched."""
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    src = np.array([0, 100, -32767, 32767, -5, 32767], dtype=np.int64)
    blobs = spark.createDataFrame(
        [
            (1, bytearray(make_wav(src, 16000))),
            (2, bytearray(b"AUD:8000:" + "abcz".encode())),
        ],
        "doc_id long, blob binary",
    )
    got = {r.doc_id: r for r in decode_audio(blobs).collect()}
    assert got[1].sample_rate == 16000
    assert got[1].n_samples == 6
    assert got[1].duration_ms == 6 * 1000 // 16000
    assert got[1].peak == 32767
    assert got[1].n_clipped == 3  # -32767 and the two +32767 hit full scale
    # synthetic path unchanged: codepoint-96, strict > 24 threshold
    assert got[2].peak == ord("z") - 96
    assert got[2].n_clipped == 1


# ----------------------------------------------------------------- BMP


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_24bit_luma_roundtrip(top_down):
    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, size=(11, 5, 3), dtype=np.uint8)  # w=5: padded rows
    blob = make_bmp(rgb, top_down=top_down)
    assert bmp_dims(blob) == (5, 11)
    assert np.array_equal(bmp_gray_pixels(blob), _luma(rgb))


def test_bmp_8bit_palette_gray():
    rng = np.random.RandomState(14)
    g = rng.randint(0, 256, size=(9, 7), dtype=np.uint8)
    got = bmp_gray_pixels(make_bmp(g, palette8=True))
    assert np.array_equal(got, g)


def test_bmp_compressed_raises_to_seam():
    blob = bytearray(make_bmp(np.zeros((4, 4, 3), np.uint8)))
    blob[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        bmp_gray_pixels(bytes(blob))


def test_bmp_decode_matches_pil_when_available():
    pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(15)
    rgb = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
    blob = make_bmp(rgb)
    im = Image.open(io.BytesIO(blob)).convert("RGB")
    assert np.array_equal(np.asarray(im), rgb)


def test_cross_format_ahash_identical_for_same_pixels(spark):
    """The near-dup property that matters: the SAME image encoded as
    PNG and as BMP must produce the IDENTICAL aHash (shared exact luma
    + shared spatial cells), so cross-format duplicates band together."""
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        ahash_blobs,
    )

    from .test_multimodal_png import make_png

    rng = np.random.RandomState(16)
    g = rng.randint(0, 256, size=(24, 16), dtype=np.uint8)
    blobs = spark.createDataFrame(
        [
            (1, bytearray(make_png(g, color_type=0, filter_type=2))),
            (2, bytearray(make_bmp(g, palette8=True))),
        ],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in ahash_blobs(blobs).collect()}
    assert rows[1] == rows[2]


def test_decode_blobs_and_resize_real_bmp(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        decode_blobs,
        resize_images,
    )

    rgb = np.zeros((48, 96, 3), np.uint8)
    blobs = spark.createDataFrame(
        [(7, bytearray(make_bmp(rgb)))], "doc_id long, blob binary"
    )
    meta = decode_blobs(blobs).collect()[0]
    assert (meta.width, meta.height) == (96, 48)
    rs = resize_images(blobs, max_side=32).collect()[0]
    assert (rs.new_width, rs.new_height) == (32, 16)


# --- round-11: IMA ADPCM (format 17) — real compressed audio ---------------


def test_adpcm_hand_vector_step_table():
    """Hand-computed decode of two nibbles from (pred=1000, index=0):
    nibble 5 -> diff = (7>>3) + (7>>2) = 0+1, +step(7) for bit2 = 8,
    pred 1008, index 0+4=4; nibble 15 -> step(4)=11, diff =
    1+11+5+2 = 19 negated, pred 989, index 4+8=12.  Pins the public
    IMA step/index tables and the clamp order independently of the
    encoder."""
    import struct

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        _adpcm_decode_block,
    )

    block = struct.pack("<hBB", 1000, 0, 0) + bytes([0x05 | (0x0F << 4)])
    assert _adpcm_decode_block(block) == [1000, 1008, 989]


def test_adpcm_constant_signal_exact_roundtrip():
    """Constant signals reconstruct EXACTLY (nibble 0 dequantizes to
    step>>3 = 0 at the starting step 7) — the solid-fixture oracle
    anchor, across block boundaries and partial final blocks."""
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_encode_adpcm,
        wav_pcm_samples,
    )

    for amp in (0, 100, -24, 32767, -32768):
        for n in (1, 5, 505, 506, 1200):
            rate, s, bits = wav_pcm_samples(
                wav_encode_adpcm(np.full(n, amp), 8000)
            )
            assert (rate, bits, len(s)) == (8000, 16, n)
            assert (s == amp).all()


def test_adpcm_varying_signal_bounded_error():
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_encode_adpcm,
        wav_pcm_samples,
    )

    t = np.arange(4000)
    sig = (10000 * np.sin(t / 30) + 3000 * np.sin(t / 7)).astype(np.int64)
    _, dec, _ = wav_pcm_samples(wav_encode_adpcm(sig, 16000))
    err = np.abs(dec - sig)
    assert len(dec) == len(sig)
    # 4-bit ADPCM on a smooth signal: small mean error, step-bounded max
    assert err.mean() < 200 and err.max() < 4000


def test_adpcm_guards():
    import struct

    import numpy as np
    import pytest as _pytest

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_encode_adpcm,
        wav_pcm_samples,
    )

    raw = bytearray(wav_encode_adpcm(np.full(600, 7), 8000))
    # stereo ADPCM refuses at the seam
    fmt_off = raw.index(b"fmt ") + 8
    two_ch = bytearray(raw)
    two_ch[fmt_off + 2 : fmt_off + 4] = struct.pack("<H", 2)
    with _pytest.raises(NotImplementedError, match="ADPCM"):
        wav_pcm_samples(bytes(two_ch))
    # fact chunk claiming more samples than the data holds fails loud
    fact_off = raw.index(b"fact") + 8
    lying = bytearray(raw)
    lying[fact_off : fact_off + 4] = struct.pack("<I", 10**6)
    with _pytest.raises(ValueError, match="fact"):
        wav_pcm_samples(bytes(lying))
    # corrupt step index in a block header fails loud
    data_off = raw.index(b"data") + 8
    bad = bytearray(raw)
    bad[data_off + 2] = 200  # index > 88
    with _pytest.raises(ValueError, match="step index"):
        wav_pcm_samples(bytes(bad))


def _wav_raw(fmt_body: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data) + len(pad))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )


def test_wav_24bit_pcm_decodes_exactly():
    """24-bit PCM (round 13b): 3-byte little-endian signed assembly
    with sign extension, mono and with channel-0 selection."""
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_pcm_samples,
    )

    vals = np.array(
        [0, 1, -1, 8388607, -8388608, 0x123456, -0x123456, 70000],
        dtype=np.int64,
    )
    data = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    rate, samples, bits = wav_pcm_samples(_wav_raw(fmt, data))
    assert (rate, bits) == (48000, 24)
    assert np.array_equal(samples, vals)
    # stereo: interleave, take channel 0
    inter = np.empty(16, dtype=np.int64)
    inter[0::2], inter[1::2] = vals, vals[::-1]
    data2 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in inter)
    fmt2 = struct.pack("<HHIIHH", 1, 2, 48000, 48000 * 6, 6, 24)
    _, samples2, _ = wav_pcm_samples(_wav_raw(fmt2, data2))
    assert np.array_equal(samples2, vals)


def test_wav_extensible_wrapper_remaps_subformat():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE — how writers emit >16-bit or
    multichannel audio): the real tag is the SubFormat GUID's first
    two bytes.  PCM and mu-law both flow through the remap."""
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        g711_ulaw_decode,
        wav_pcm_samples,
    )

    def ext_fmt(subtag, n_ch, rate, bits):
        # KSDATAFORMAT_SUBTYPE GUID after the 2-byte tag:
        # XXXX0000-0000-0010-8000-00AA00389B71 -> 14 tail bytes
        guid_tail = bytes.fromhex("0000" + "0000" + "1000" + "8000"
                                  + "00aa00389b71")
        return (
            struct.pack(
                "<HHIIHH", 0xFFFE, n_ch, rate,
                rate * (bits // 8) * n_ch, (bits // 8) * n_ch, bits
            )
            + struct.pack("<HHI", 22, bits, 0x4)
            + struct.pack("<H", subtag) + guid_tail
        )

    vals = np.array([5, -6, 32000, -32000, 0], dtype=np.int64)
    data = np.asarray(vals, dtype="<i2").tobytes()
    rate, samples, bits = wav_pcm_samples(
        _wav_raw(ext_fmt(1, 1, 22050, 16), data)
    )
    assert (rate, bits) == (22050, 16)
    assert np.array_equal(samples, vals)
    codes = np.arange(40, dtype=np.int64) * 3 % 256
    rate, samples, bits = wav_pcm_samples(
        _wav_raw(ext_fmt(7, 1, 8000, 8), bytes(codes.astype(np.uint8)))
    )
    assert np.array_equal(samples, g711_ulaw_decode(codes))
    # truncated extensible fmt fails loud
    short = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8)
    with pytest.raises(ValueError, match="extensible"):
        wav_pcm_samples(_wav_raw(short, b"\x00" * 8))


def test_wav_24bit_clip_threshold():
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_pcm_samples,
    )

    vals = [8388607, -8388608, 8388606, 0]
    data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    raw = _wav_raw(fmt, data)
    _, samples, bits = wav_pcm_samples(raw)
    full = (1 << (bits - 1)) - 1
    assert int((np.abs(samples) >= full).sum()) == 2


def test_spark_wav_fixture_stats(spark):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
        synthesize_wav_blobs,
    )

    docs = spark.range(0, 60).selectExpr("id AS doc_id")
    rows = {
        r["doc_id"]: r
        for r in decode_audio(synthesize_wav_blobs(docs, "doc_id")).collect()
    }
    assert len(rows) == 60
    for i, r in rows.items():
        n = i % 400 + 50
        rate = (i % 3 + 1) * 8000
        peak = 32767 if i % 9 == 0 else abs((i % 61) - 30)
        assert r["sample_rate"] == rate and r["n_samples"] == n
        assert r["peak"] == peak, i
        assert r["n_clipped"] == (n if i % 9 == 0 else 0)
        assert r["duration_ms"] == n * 1000 // rate


# --- round-11: BI_RLE8 — the compressed BMP of legacy screenshots ----------


def _make_bmp_rle8(px: np.ndarray, use_absolute: bool = False,
                   delta_skip: tuple | None = None) -> bytes:
    """Independent in-test RLE8 encoder: per bottom-up row emit runs
    (or absolute literals when ``use_absolute``), EOL after each row,
    EOB at the end.  ``delta_skip=(x, y)`` injects a delta move past a
    zero region at the start (the skipped pixels are index 0)."""
    h, w = px.shape
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    out = bytearray()
    if delta_skip:
        dx, dy = delta_skip
        out += bytes([0, 2, dx, dy])
    for r in range(h - 1, -1, -1):
        row = px[r]
        if delta_skip and r == h - 1:
            # the delta consumed the start of the FIRST encoded row
            row = row[delta_skip[0]:]
        if use_absolute and len(row) >= 3:
            i = 0
            while i < len(row):
                n = min(len(row) - i, 127)
                if n >= 3:
                    out += bytes([0, n]) + row[i : i + n].tobytes()
                    if n & 1:
                        out += b"\x00"  # word alignment
                else:
                    for v in row[i : i + n]:
                        out += bytes([1, int(v)])
                i += n
        else:
            i = 0
            while i < len(row):
                v = int(row[i])
                n = 1
                while i + n < len(row) and row[i + n] == v and n < 255:
                    n += 1
                out += bytes([n, v])
                i += n
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    data_off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(out), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(out), 2835, 2835, 256, 0
    )
    return hdr + dib + pal + bytes(out)


def test_bmp_rle8_runs_match_uncompressed():
    rng = np.random.RandomState(21)
    # runs-friendly content: few distinct values
    px = (rng.randint(0, 4, size=(13, 9)) * 80).astype(np.uint8)
    want = bmp_gray_pixels(make_bmp(px, palette8=True))
    got = bmp_gray_pixels(_make_bmp_rle8(px))
    assert np.array_equal(got, want)


def test_bmp_rle8_absolute_mode_matches():
    rng = np.random.RandomState(22)
    px = rng.randint(0, 256, size=(7, 11), dtype=np.uint8)
    want = bmp_gray_pixels(make_bmp(px, palette8=True))
    got = bmp_gray_pixels(_make_bmp_rle8(px, use_absolute=True))
    assert np.array_equal(got, want)


def test_bmp_rle8_delta_skipped_pixels_are_zero():
    px = np.full((5, 8), 7, dtype=np.uint8)
    px[-1, :3] = 0  # the delta-skipped region of the BOTTOM row
    got = bmp_gray_pixels(_make_bmp_rle8(px, delta_skip=(3, 0)))
    want = bmp_gray_pixels(make_bmp(px, palette8=True))
    assert np.array_equal(got, want)


def test_bmp_rle8_guards():
    px = (np.arange(40).reshape(5, 8) % 4 * 60).astype(np.uint8)
    good = _make_bmp_rle8(px)
    # truncations fail loud
    for cut in range(60, len(good) - 1, 7):
        with pytest.raises((ValueError, NotImplementedError)):
            bmp_gray_pixels(good[:cut])
    # a run past the row end fails loud
    bad = bytearray(good)
    data_off = int.from_bytes(bad[10:14], "little")
    bad[data_off] = 255  # first run now longer than the 8-px row
    with pytest.raises(ValueError, match="RLE8"):
        bmp_gray_pixels(bytes(bad))
    # RLE8 on 24-bit or top-down images still refuses at the seam
    blob = bytearray(make_bmp(np.zeros((4, 4, 3), np.uint8)))
    blob[30:34] = struct.pack("<I", 1)
    with pytest.raises(NotImplementedError):
        bmp_gray_pixels(bytes(blob))
