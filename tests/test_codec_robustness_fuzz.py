"""Codec robustness fuzz (round 11): random garbage behind each
format's magic must fail LOUDLY — ValueError or NotImplementedError —
never IndexError / KeyError / struct.error / OverflowError, and never
hang.  This is the exception-contract guard (tests/test_codec_guards)
generalized from hand-picked corruptions to hypothesis-driven byte
soup, including mutations of VALID streams (bit flips, truncations,
splices) which reach much deeper than pure noise.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from imdb_top_250_etl_pipeline_spark.operators.gif import (
    gif_encode,
    gif_gray_pixels,
)
from imdb_top_250_etl_pipeline_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)
from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
    bmp_gray_pixels,
    png_gray_pixels,
    wav_pcm_samples,
)
from imdb_top_250_etl_pipeline_spark.operators.tiff import (
    tiff_encode,
    tiff_gray_pixels,
)

FUZZ = settings(
    deadline=None,
    derandomize=True,
    max_examples=120,
    suppress_health_check=[HealthCheck.too_slow],
)

ALLOWED = (ValueError, NotImplementedError)

_PX = ((np.indices((12, 14)).sum(0) * 5) % 256).astype(np.uint8)

DECODERS = {
    "png": (b"\x89PNG\r\n\x1a\n", png_gray_pixels, None),
    "bmp": (b"BM", bmp_gray_pixels, None),
    "gif": (b"GIF89a", gif_gray_pixels, lambda: gif_encode(_PX)),
    "jpeg": (
        b"\xff\xd8",
        jpeg_decode,
        lambda: jpeg_encode(_PX, quality=90),
    ),
    "jpeg_prog": (
        b"\xff\xd8",
        jpeg_decode,
        lambda: jpeg_encode_progressive(_PX, quality=90),
    ),
    "tiff": (
        b"II*\x00",
        tiff_gray_pixels,
        lambda: tiff_encode(_PX, compression="lzw"),
    ),
    "wav": (b"RIFF", wav_pcm_samples, None),
}


def _assert_loud(decode, raw: bytes, tag) -> None:
    try:
        decode(raw)
    except ALLOWED:
        return
    except Exception as e:  # noqa: BLE001 — the contract under test
        raise AssertionError(
            f"{tag}: {type(e).__name__} escaped the loud-error contract: "
            f"{e} (first 60 bytes: {raw[:60]!r})"
        ) from e


@FUZZ
@given(
    fmt=st.sampled_from(sorted(DECODERS)),
    noise=st.binary(min_size=0, max_size=300),
)
def test_magic_plus_noise_fails_loud(fmt, noise):
    magic, decode, _ = DECODERS[fmt]
    _assert_loud(decode, magic + noise, f"{fmt}+noise")


def _valid_rle8() -> bytes:
    from .test_multimodal_wav_bmp import _make_bmp_rle8

    return _make_bmp_rle8((_PX % 5 * 50).astype(np.uint8))


DECODERS["bmp_rle8"] = (b"BM", bmp_gray_pixels, _valid_rle8)


def _avi_decode_all(raw: bytes):
    """Full AVI consumption: header + idx1/linear demux + per-frame
    JPEG decode — the whole surface a corrupt stream can reach."""
    from imdb_top_250_etl_pipeline_spark.operators.avi import (
        avi_frames,
        avi_header,
    )

    avi_header(raw)
    return [jpeg_decode(p) for _, p in avi_frames(raw)]


def _valid_avi() -> bytes:
    from imdb_top_250_etl_pipeline_spark.operators.avi import avi_encode

    return avi_encode([_PX, (_PX[::-1]).copy(), _PX // 2], rate=9, quality=90)


DECODERS["avi"] = (b"RIFF", _avi_decode_all, _valid_avi)


@FUZZ
@given(
    fmt=st.sampled_from(["gif", "jpeg", "jpeg_prog", "tiff", "bmp_rle8", "avi"]),
    data=st.data(),
)
def test_mutated_valid_stream_fails_loud_or_decodes(fmt, data):
    """Bit-flip / truncate / splice a VALID stream: the decoder must
    either raise one of the loud types or return pixels — mutations
    that happen to leave a decodable stream are fine; crashes are not."""
    _, decode, make = DECODERS[fmt]
    raw = bytearray(make())
    op = data.draw(st.sampled_from(["flip", "truncate", "splice"]))
    if op == "flip":
        for _ in range(data.draw(st.integers(1, 6))):
            i = data.draw(st.integers(2, len(raw) - 1))
            raw[i] ^= 1 << data.draw(st.integers(0, 7))
    elif op == "truncate":
        raw = raw[: data.draw(st.integers(2, len(raw) - 1))]
    else:
        i = data.draw(st.integers(2, len(raw) - 1))
        raw = (
            raw[:i]
            + bytearray(data.draw(st.binary(min_size=1, max_size=40)))
            + raw[i:]
        )
    _assert_loud(decode, bytes(raw), f"{fmt}:{op}")
