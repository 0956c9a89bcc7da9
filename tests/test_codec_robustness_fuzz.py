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


def _thumb_chain(raw: bytes):
    """The WHOLE thumbnail chain as one callable: decode-any → exact
    nearest-neighbor resample → GIF re-encode → decode the thumbnail
    back.  A mutation that survives the input decoder but corrupts the
    resample geometry or the re-encode must still end in loud failure
    or a decodable thumbnail — never a crash mid-chain."""
    from imdb_top_250_etl_pipeline_spark.operators.gif import (
        gif_gray_pixels,
    )
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        thumbnail_one,
    )

    thumb, nw, nh = thumbnail_one(raw)
    back = gif_gray_pixels(thumb)
    assert back.shape == (nh, nw), "thumbnail did not round-trip"
    return back


DECODERS["thumb_chain_jpeg"] = (
    b"\xff\xd8",
    _thumb_chain,
    lambda: jpeg_encode(_PX, quality=90),
)
DECODERS["thumb_chain_tiff"] = (
    b"II*\x00",
    _thumb_chain,
    lambda: tiff_encode(_PX, compression="packbits"),
)
DECODERS["thumb_chain_gif"] = (
    b"GIF89a",
    _thumb_chain,
    lambda: gif_encode(_PX),
)


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


def _mp4_decode_all(raw: bytes):
    """Full MP4 consumption: box walk + sample tables + every keyframe
    through the H.264 decoder — the whole surface a corrupt stream can
    reach (round 13)."""
    from imdb_top_250_etl_pipeline_spark.operators.mp4 import (
        mp4_decode_keyframes,
    )

    return [f for _, _, f in mp4_decode_keyframes(raw)]


def _valid_mp4() -> bytes:
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.mp4 import mp4_encode_gray

    solid = [np.full((16, 32), v, dtype=np.uint8) for v in (20, 150, 255)]
    return mp4_encode_gray(solid, fps=9, key_every=2)


def _valid_mp4_pcm() -> bytes:
    from imdb_top_250_etl_pipeline_spark.operators.mp4 import mp4_encode_gray

    import numpy as np

    # gradient via I_PCM (16-aligned dims): exercises the PCM byte
    # path under mutation
    px = ((np.indices((16, 16)).sum(0) * 5) % 256).astype(np.uint8)
    return mp4_encode_gray([px, px[::-1].copy()], fps=7, mode="pcm")




def _flac_decode_all(raw: bytes):
    from imdb_top_250_etl_pipeline_spark.operators.flac import flac_decode

    return flac_decode(raw)


def _valid_flac() -> bytes:
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.flac import flac_encode

    x = (np.cumsum(np.arange(700) % 13 - 6) % 2000 - 1000).astype(np.int64)
    return flac_encode(x, 16000, block_size=256)


DECODERS["flac"] = (b"fLaC", _flac_decode_all, _valid_flac)

def _mp4_decode_seq(raw: bytes):
    """Sequential (every-sample) decode — the P-frame path with
    reference tracking, not just the stss keyframe seek."""
    from imdb_top_250_etl_pipeline_spark.operators.mp4 import mp4_decode_all

    return [f for *_, f in mp4_decode_all(raw)]


def _valid_mp4_pgop() -> bytes:
    from imdb_top_250_etl_pipeline_spark.operators.mp4 import mp4_encode_pgop

    return mp4_encode_pgop(
        [("idr", 90), ("skip",), ("pdelta", 4), ("pmv", (5, 6)),
         ("idr", 30), ("pmv", (-9, 2)), ("skip",)],
        48, 32, fps=8,
    )


DECODERS["mp4"] = (b"\x00\x00\x00\x18ftyp", _mp4_decode_all, _valid_mp4)
DECODERS["mp4_pcm"] = (
    b"\x00\x00\x00\x18ftyp", _mp4_decode_all, _valid_mp4_pcm
)
DECODERS["mp4_pgop"] = (
    b"\x00\x00\x00\x18ftyp", _mp4_decode_seq, _valid_mp4_pgop
)


def _wav_g711_decode(raw: bytes):
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_pcm_samples,
    )

    return wav_pcm_samples(raw)


def _valid_wav_g711() -> bytes:
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        wav_encode_g711,
    )

    return wav_encode_g711(
        (np.arange(300, dtype=np.int64) * 7 + 5) % 256, 8000, alaw=True
    )


DECODERS["wav_g711"] = (b"RIFF", _wav_g711_decode, _valid_wav_g711)


def _valid_tiff_tiled() -> bytes:
    return tiff_encode(
        _PX, compression="lzw", predictor=True, tile=(16, 16)
    )


DECODERS["tiff_tiled"] = (b"II*\x00", tiff_gray_pixels, _valid_tiff_tiled)


@FUZZ
@given(
    fmt=st.sampled_from(
        [
            "gif", "jpeg", "jpeg_prog", "tiff", "tiff_tiled", "bmp_rle8",
            "avi", "mp4", "mp4_pcm", "mp4_pgop", "flac", "wav_g711",
            "thumb_chain_jpeg", "thumb_chain_tiff", "thumb_chain_gif",
        ]
    ),
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


def test_thumbnail_chain_extreme_geometries():
    """Degenerate aspect ratios through the whole chain: 1-pixel-wide,
    1-pixel-tall, smaller-than-max_side, and 1x1 inputs must produce
    valid decodable thumbnails with the exact integer geometry."""
    from imdb_top_250_etl_pipeline_spark.operators.gif import (
        gif_gray_pixels,
    )
    from imdb_top_250_etl_pipeline_spark.operators.multimodal import (
        thumbnail_one,
    )

    for h, w in [(1, 200), (200, 1), (5, 7), (1, 1), (64, 3)]:
        px = ((np.indices((h, w)).sum(0) * 11) % 256).astype(np.uint8)
        raw = jpeg_encode(px, quality=100)
        thumb, nw, nh = thumbnail_one(raw, max_side=32)
        longer = max(w, h)
        assert nw == max(1, w * 32 // longer)
        assert nh == max(1, h * 32 // longer)
        assert gif_gray_pixels(thumb).shape == (nh, nw)


def test_thumbnail_chain_mutation_hammer():
    """Seeded non-hypothesis hammer over the chain (the AVI-family
    discipline): 3 seeds x 1500 mutations x 3 input formats, loud
    errors or decodable thumbnails only."""
    import random

    families = {
        "jpeg": jpeg_encode(_PX, quality=90),
        "tiff": tiff_encode(_PX, compression="lzw"),
        "gif": gif_encode(_PX),
    }
    rng = random.Random()
    for seed in range(3):
        rng.seed(seed)
        for fam, valid in families.items():
            for _ in range(500):
                raw = bytearray(valid)
                op = rng.choice(["flip", "trunc", "splice"])
                if op == "flip":
                    for _f in range(rng.randint(1, 6)):
                        i = rng.randrange(len(raw))
                        raw[i] ^= 1 << rng.randrange(8)
                elif op == "trunc":
                    raw = raw[: rng.randrange(2, len(raw))]
                else:
                    i = rng.randrange(2, len(raw))
                    ins = bytes(rng.randrange(256) for _ in range(rng.randint(1, 30)))
                    raw = raw[:i] + ins + raw[i:]
                _assert_loud(_thumb_chain, bytes(raw), f"chain:{fam}:{op}")


def test_mp4_h264_mutation_hammer():
    """Seeded non-hypothesis hammer over the new MP4/H.264 path
    (round 13, the AVI-family discipline): 4 seeds x 1500 mutations x
    2 fixture families (flat-DC CAVLC + I_PCM), loud errors or decoded
    frames only — a crash class (IndexError/struct.error/Overflow/
    infinite loop) escaping the ValueError/NotImplementedError
    contract fails here."""
    import random

    families = {
        "dc16": (_valid_mp4(), _mp4_decode_all),
        "pcm": (_valid_mp4_pcm(), _mp4_decode_all),
        # round 13b: P slices through the SEQUENTIAL decode path —
        # mutated MVs/skip runs/partitions must stay inside the
        # ValueError/NotImplementedError contract too
        "pgop": (_valid_mp4_pgop(), _mp4_decode_seq),
    }
    rng = random.Random()
    for seed in range(4):
        rng.seed(1000 + seed)
        for fam, (valid, decode) in families.items():
            for _ in range(750):
                raw = bytearray(valid)
                op = rng.choice(["flip", "trunc", "splice"])
                if op == "flip":
                    for _f in range(rng.randint(1, 6)):
                        i = rng.randrange(len(raw))
                        raw[i] ^= 1 << rng.randrange(8)
                elif op == "trunc":
                    raw = raw[: rng.randrange(2, len(raw))]
                else:
                    i = rng.randrange(2, len(raw))
                    ins = bytes(
                        rng.randrange(256) for _ in range(rng.randint(1, 30))
                    )
                    raw = raw[:i] + ins + raw[i:]
                _assert_loud(decode, bytes(raw), f"mp4:{fam}:{op}")


def test_flac_mutation_hammer():
    """Seeded hammer over the FLAC path (round 13): 4 seeds x 1500
    mutations, loud errors or decoded samples only — CRC-8/16 + MD5
    make silent corruption structurally hard, and crash classes
    escaping the ValueError contract fail here."""
    import random

    valid = _valid_flac()
    rng = random.Random()
    for seed in range(4):
        rng.seed(2000 + seed)
        for _ in range(1500):
            raw = bytearray(valid)
            op = rng.choice(["flip", "trunc", "splice"])
            if op == "flip":
                for _f in range(rng.randint(1, 6)):
                    i = rng.randrange(len(raw))
                    raw[i] ^= 1 << rng.randrange(8)
            elif op == "trunc":
                raw = raw[: rng.randrange(2, len(raw))]
            else:
                i = rng.randrange(2, len(raw))
                ins = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 30))
                )
                raw = raw[:i] + ins + raw[i:]
            _assert_loud(_flac_decode_all, bytes(raw), f"flac:{op}")
