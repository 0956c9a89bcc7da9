"""Cross-CODEC differential fuzz (round 11): four independently
implemented container formats must agree on the same pixels.

The per-codec suites verify each format against hand-built vectors and
round-trips; this suite closes the remaining gap the way the
cross-ENGINE fuzz does for SQL operators — hypothesis generates random
gray images and every LOSSLESS container (PNG written by a minimal
in-test writer, BMP by the in-test builder, GIF, TIFF in all three
compressions ± predictor ± byte order) must decode BYTE-IDENTICALLY
through its own independent decoder.  A shared bug inside one
encoder/decoder pair survives that pair's round-trip but cannot
survive agreement with three other containers of the same pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from imdb_top_250_etl_pipeline_spark.operators.gif import (
    gif_encode,
    gif_gray_pixels,
)
from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
    bmp_gray_pixels,
    png_gray_pixels,
)
from imdb_top_250_etl_pipeline_spark.operators.tiff import (
    tiff_encode,
    tiff_gray_pixels,
)

FUZZ = settings(
    deadline=None,
    derandomize=True,
    max_examples=25,
    suppress_health_check=[HealthCheck.too_slow],
)


def _png_gray(px: np.ndarray) -> bytes:
    """Minimal independent PNG writer: 8-bit gray, filter 0 rows."""
    h, w = px.shape
    body = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", crc)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def _bmp_gray(px: np.ndarray) -> bytes:
    """Independent 24-bit BMP builder (bottom-up rows, BGR=gray)."""
    h, w = px.shape
    pad = (w * 3 + 3) & ~3
    body = np.zeros((h, pad), dtype=np.uint8)
    rep = np.repeat(px[::-1][:, :, None], 3, axis=2).reshape(h, w * 3)
    body[:, : w * 3] = rep
    hdr = struct.pack("<2sIHHI", b"BM", 54 + body.size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    return hdr + dib + body.tobytes()


@st.composite
def _gray_images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    kind = draw(st.sampled_from(["random", "solid", "gradient", "stripes"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "random":
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    if kind == "solid":
        return np.full((h, w), seed % 256, dtype=np.uint8)
    if kind == "gradient":
        return ((np.indices((h, w)).sum(0) * (seed % 7 + 1)) % 256).astype(
            np.uint8
        )
    return (np.indices((h, w))[1] % 2 * (seed % 256)).astype(np.uint8)


@FUZZ
@given(px=_gray_images())
def test_all_lossless_containers_agree(px):
    decoded = {
        "png": png_gray_pixels(_png_gray(px)),
        "bmp": bmp_gray_pixels(_bmp_gray(px)),
        "gif": gif_gray_pixels(gif_encode(px)),
        "gif_interlaced": gif_gray_pixels(gif_encode(px, interlace=True)),
        "tiff_none": tiff_gray_pixels(tiff_encode(px, compression="none")),
        "tiff_packbits": tiff_gray_pixels(
            tiff_encode(px, compression="packbits")
        ),
        "tiff_lzw": tiff_gray_pixels(tiff_encode(px, compression="lzw")),
        "tiff_lzw_pred_be": tiff_gray_pixels(
            tiff_encode(
                px, compression="lzw", predictor=True, big_endian=True
            )
        ),
        "tiff_strips": tiff_gray_pixels(
            tiff_encode(px, compression="lzw", rows_per_strip=3)
        ),
    }
    for name, out in decoded.items():
        assert out.dtype == np.uint8 and out.shape == px.shape, name
        assert np.array_equal(out, px), name


@FUZZ
@given(
    amp=st.integers(0, 255),
    h=st.integers(8, 32),
    w=st.integers(8, 32),
)
def test_jpeg_q100_solid_agrees_with_lossless(amp, h, w):
    """JPEG is lossy in general, but q100 solid blocks are exact — so a
    solid image must agree with every lossless container too."""
    from imdb_top_250_etl_pipeline_spark.operators.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    px = np.full((h, w), amp, dtype=np.uint8)
    ref = tiff_gray_pixels(tiff_encode(px))
    assert np.array_equal(jpeg_decode(jpeg_encode(px, quality=100)), ref)
    assert np.array_equal(
        jpeg_decode(jpeg_encode_progressive(px, quality=100)), ref
    )
