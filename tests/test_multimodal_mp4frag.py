"""Fragmented MP4 (round 13b): the DASH/CMAF container layout.

Legs: (1) probe equivalence — moof/traf/trun walk expands to the same
per-sample tables a progressive moov carries, so sequential decode and
keyframe iteration run unchanged; (2) sidx seek — the every-k-th
fragment path touches only sampled subsegments and matches the linear
walk; (3) conventions — explicit base-data-offset vs
default-base-is-moof, per-sample vs default durations,
first-sample-flags, audio-traf skipping; (4) guard contract —
missing mvex/trex, lying trun counts/sizes, hierarchical sidx,
overruns all fail loud; (5) mutation hammer rides the shared
test_codec_robustness_fuzz families (mp4_pgop covers the progressive
P path; a fragmented family is added here).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imdb_top_250_etl_pipeline_spark.operators import h264, mp4

FRAGS = [
    [("idr", 60), ("skip",), ("pdelta", 3)],
    [("idr", 120), ("pmv", (6, 2)), ("skip",)],
    [("idr", 200), ("pdelta", -8)],
]


def _fixture() -> bytes:
    return mp4.mp4_encode_fragmented(FRAGS, 48, 32, fps=10, qp=12)


def test_probe_fragmented_tables():
    raw = _fixture()
    info = mp4.mp4_probe(raw)
    assert info["fragmented"] is True
    assert info["n_samples"] == 8
    assert info["sync"] == [0, 3, 6]
    assert info["deltas"] == [100] * 8
    assert info["width"] == 48 and info["height"] == 32
    # offsets point at real length-prefixed samples
    for off, size in zip(info["offsets"], info["sizes"]):
        assert struct.unpack_from(">I", raw, off)[0] == size - 4


def test_sequential_decode_across_fragments():
    raw = _fixture()
    seq = [(si, ts, k, int(f[0, 0, 0])) for si, ts, k, f in
           mp4.mp4_decode_all(raw)]
    assert seq == [
        (0, 0, True, 60), (1, 100, False, 60), (2, 200, False, 63),
        (3, 300, True, 120), (4, 400, False, 120), (5, 500, False, 120),
        (6, 600, True, 200), (7, 700, False, 192),
    ]


def test_keyframe_iteration_uses_trun_sync_flags():
    raw = _fixture()
    info = mp4.mp4_probe(raw)
    keys = [
        (si, int(h264.h264_decode_sample(
            info["sps"], info["pps"], smp, info["length_size"])[0, 0, 0]))
        for si, ts, smp in mp4.mp4_keyframes(raw, 1, info)
    ]
    assert keys == [(0, 60), (3, 120), (6, 200)]


def test_sidx_index_covers_file():
    raw = _fixture()
    sidx = mp4.mp4_sidx_index(raw)
    assert sidx["timescale"] == 1000
    refs = sidx["refs"]
    assert len(refs) == 3
    assert all(r["sap"] for r in refs)
    assert refs[0]["offset"] + refs[0]["size"] == refs[1]["offset"]
    assert refs[2]["offset"] + refs[2]["size"] == len(raw)
    assert [r["duration"] for r in refs] == [300, 300, 200]


def test_fragment_seek_matches_linear_and_every_k():
    raw = _fixture()
    info = mp4.mp4_probe(raw)

    def vals(every_k):
        out = []
        for ri, ts, smp in mp4.mp4_fragment_keyframes(raw, every_k, info):
            f = h264.h264_decode_sample(
                info["sps"], info["pps"], smp, info["length_size"])
            out.append((ri, ts, int(f[0, 0, 0])))
        return out

    assert vals(1) == [(0, 0, 60), (1, 300, 120), (2, 600, 200)]
    assert vals(2) == [(0, 0, 60), (2, 600, 200)]
    assert vals(3) == [(0, 0, 60)]


def test_fragment_seek_refuses_progressive():
    raw = mp4.mp4_encode_pgop([("idr", 5), ("skip",)], 32, 32)
    with pytest.raises(ValueError, match="not a fragmented"):
        list(mp4.mp4_fragment_keyframes(raw))


def test_missing_mvex_raises():
    raw = bytearray(_fixture())
    i = raw.find(b"mvex")
    raw[i : i + 4] = b"mveX"
    with pytest.raises(ValueError, match="mvex"):
        mp4.mp4_probe(bytes(raw))


def test_wrong_trex_track_raises():
    raw = bytearray(_fixture())
    i = raw.find(b"trex")
    # trex payload: fullbox(4) + track_id at +4
    struct.pack_into(">I", raw, i + 8, 9)
    with pytest.raises(ValueError, match="trex"):
        mp4.mp4_probe(bytes(raw))


def test_lying_trun_count_raises():
    raw = bytearray(_fixture())
    i = raw.find(b"trun")
    # trun payload: fullbox(4) + sample_count at +4
    struct.pack_into(">I", raw, i + 8, 2_000_000)
    with pytest.raises(ValueError, match="trun"):
        mp4.mp4_probe(bytes(raw))


def test_sample_overrunning_file_raises():
    raw = bytearray(_fixture())
    i = raw.find(b"trun")
    # first per-sample size field: fullbox 4 + count 4 + data_offset 4
    struct.pack_into(">I", raw, i + 16, 1 << 24)
    with pytest.raises(ValueError, match="overruns file"):
        mp4.mp4_probe(bytes(raw))


def test_hierarchical_sidx_refuses():
    raw = bytearray(_fixture())
    i = raw.find(b"sidx")
    # first reference word: payload fullbox(4)+ID(4)+ts(4)+ept(4)+
    # first_offset(4)+reserved+count(4) = +24; set reference_type bit
    w1 = struct.unpack_from(">I", raw, i + 28)[0]
    struct.pack_into(">I", raw, i + 28, w1 | (1 << 31))
    with pytest.raises(NotImplementedError, match="hierarchical"):
        mp4.mp4_sidx_index(bytes(raw))


def test_audio_traf_skipped_by_track_id():
    """Insert a second traf with an unknown track id into the first
    moof: the video walk must ignore it entirely."""
    raw = _fixture()
    moof_at = raw.find(b"moof") - 4
    moof_size = struct.unpack_from(">I", raw, moof_at)[0]
    moof = bytearray(raw[moof_at : moof_at + moof_size])
    # craft a minimal audio traf: tfhd track 2 (no optional fields)
    tfhd = struct.pack(">I", 16) + b"tfhd" + struct.pack(">II", 0, 2)
    traf = struct.pack(">I", 8 + len(tfhd)) + b"traf" + tfhd
    body = moof[8:] + traf
    newmoof = struct.pack(">I", 8 + len(body)) + b"moof" + bytes(body)
    # data offsets are moof-relative (default-base-is-moof) and the
    # traf is appended AFTER the video trun, so moving mdat by the
    # traf's size requires patching the trun data_offset
    grown = len(newmoof) - moof_size
    ti = newmoof.find(b"trun")
    newmoof = bytearray(newmoof)
    old_off = struct.unpack_from(">i", newmoof, ti + 12)[0]
    struct.pack_into(">i", newmoof, ti + 12, old_off + grown)
    patched = raw[:moof_at] + bytes(newmoof) + raw[moof_at + moof_size :]
    # sidx sizes shifted: first reference's size grows
    si = patched.find(b"sidx")
    pb = bytearray(patched)
    w1 = struct.unpack_from(">I", pb, si + 28)[0]
    struct.pack_into(">I", pb, si + 28, w1 + grown)
    patched = bytes(pb)
    info = mp4.mp4_probe(patched)
    assert info["n_samples"] == 8
    vals = [int(f[0, 0, 0]) for *_, f in mp4.mp4_decode_all(patched)]
    assert vals == [60, 60, 63, 120, 120, 120, 200, 192]
    # and the sidx seek still lands on every IDR
    got = [int(h264.h264_decode_sample(
        info["sps"], info["pps"], smp, 4)[0, 0, 0])
        for _, _, smp in mp4.mp4_fragment_keyframes(patched, 1, info)]
    assert got == [60, 120, 200]


def test_explicit_base_data_offset_convention():
    """Rewrite the first tfhd to carry an explicit absolute
    base-data-offset instead of default-base-is-moof: the walk must
    produce identical samples."""
    raw = _fixture()
    info0 = mp4.mp4_probe(raw)
    moof_at = raw.find(b"moof") - 4
    ti = raw.find(b"tfhd")
    flags = struct.unpack_from(">I", raw, ti + 4)[0] & 0xFFFFFF
    assert flags & 0x20000  # default-base-is-moof in the fixture
    # new tfhd: version/flags with base-data-offset present (0x1) and
    # default-duration (0x8); fields: track(4) + base(8) + duration(4)
    old_size = struct.unpack_from(">I", raw, ti - 4)[0]
    delta_dur = struct.unpack_from(">I", raw, ti + 12)[0]
    new_tfhd = (
        struct.pack(">I", 8 + 4 + 16) + b"tfhd"
        + struct.pack(">I", 0x1 | 0x8)
        + struct.pack(">I", 1)
        + struct.pack(">Q", moof_at)
        + struct.pack(">I", delta_dur)
    )
    grown = len(new_tfhd) - old_size
    out = bytearray(raw[: ti - 4] + new_tfhd + raw[ti - 4 + old_size :])
    # grow the enclosing moof and traf sizes, patch trun data_offset
    for btype in (b"moof", b"traf"):
        bi = out.find(btype, moof_at)
        struct.pack_into(
            ">I", out, bi - 4,
            struct.unpack_from(">I", out, bi - 4)[0] + grown,
        )
    tri = out.find(b"trun")
    old_off = struct.unpack_from(">i", out, tri + 12)[0]
    struct.pack_into(">i", out, tri + 12, old_off + grown)
    si = out.find(b"sidx")
    w1 = struct.unpack_from(">I", out, si + 28)[0]
    struct.pack_into(">I", out, si + 28, w1 + grown)
    info = mp4.mp4_probe(bytes(out))
    assert info["sizes"] == info0["sizes"]
    assert info["sync"] == info0["sync"]
    vals = [int(f[0, 0, 0]) for *_, f in mp4.mp4_decode_all(bytes(out))]
    assert vals == [60, 60, 63, 120, 120, 120, 200, 192]


def test_sidx_own_timescale_drives_ts():
    """The sidx may carry a DIFFERENT timescale than mdhd: rewrite the
    fixture's sidx to 90 kHz with scaled durations — ts_ms must not
    change (review fix: ts was computed with the media timescale)."""
    raw = bytearray(_fixture())
    i = raw.find(b"sidx")
    # payload: fullbox(4) + reference_ID(4) + timescale(4)
    assert struct.unpack_from(">I", raw, i + 12)[0] == 1000
    struct.pack_into(">I", raw, i + 12, 90000)
    # reference durations sit at +28+4 per 12-byte entry
    for k in range(3):
        off = i + 28 + 12 * k + 4
        dur = struct.unpack_from(">I", raw, off)[0]
        struct.pack_into(">I", raw, off, dur * 90)
    info = mp4.mp4_probe(bytes(raw))
    got = [(ri, ts) for ri, ts, _ in
           mp4.mp4_fragment_keyframes(bytes(raw), 1, info)]
    assert got == [(0, 0), (1, 300), (2, 600)]


def test_second_trun_without_data_offset_continues():
    """Split the first moof's trun into two runs, the second WITHOUT a
    data offset: per 14496-12 it continues after the first run's data
    (review fix: it restarted at the base offset)."""
    raw = _fixture()
    moof_at = raw.find(b"moof") - 4
    moof_size = struct.unpack_from(">I", raw, moof_at)[0]
    ti = raw.find(b"trun")
    tsize = struct.unpack_from(">I", raw, ti - 4)[0]
    flags = struct.unpack_from(">I", raw, ti + 4)[0] & 0xFFFFFF
    cnt = struct.unpack_from(">I", raw, ti + 8)[0]
    assert cnt == 3
    data_off = struct.unpack_from(">i", raw, ti + 12)[0]
    entries = [raw[ti + 16 + 8 * k : ti + 24 + 8 * k] for k in range(3)]
    # trun1: first sample, with data offset (grows by +8 for the new
    # trun2 header overhead below changing moof size -> patch later)
    t1 = (struct.pack(">I", 8 + 4 + 4 + 4 + 8) + b"trun"
          + struct.pack(">I", flags) + struct.pack(">I", 1)
          + struct.pack(">i", 0)  # patched below
          + entries[0])
    # trun2: remaining two samples, NO data-offset flag
    f2 = flags & ~0x1
    t2 = (struct.pack(">I", 8 + 4 + 4 + 16) + b"trun"
          + struct.pack(">I", f2) + struct.pack(">I", 2)
          + entries[1] + entries[2])
    new = bytearray(raw[: ti - 4] + t1 + t2 + raw[ti - 4 + tsize :])
    grown = len(t1) + len(t2) - tsize
    for btype in (b"moof", b"traf"):
        bi = new.find(btype, moof_at)
        struct.pack_into(
            ">I", new, bi - 4,
            struct.unpack_from(">I", new, bi - 4)[0] + grown,
        )
    # patch trun1's data offset to the grown moof header size
    t1i = new.find(b"trun", moof_at)
    struct.pack_into(">i", new, t1i + 12, data_off + grown)
    si = new.find(b"sidx")
    w1 = struct.unpack_from(">I", new, si + 28)[0]
    struct.pack_into(">I", new, si + 28, w1 + grown)
    vals = [int(f[0, 0, 0]) for *_, f in mp4.mp4_decode_all(bytes(new))]
    assert vals == [60, 60, 63, 120, 120, 120, 200, 192]


def test_negative_trun_offset_raises():
    raw = bytearray(_fixture())
    ti = raw.find(b"trun")
    struct.pack_into(">i", raw, ti + 12, -(1 << 20))
    with pytest.raises(ValueError, match="negative trun"):
        mp4.mp4_probe(bytes(raw))


def test_fragmented_mutation_hammer():
    """Seeded hammer over the fragmented path (3 seeds x 900): loud
    errors or decoded frames only."""
    import random

    valid = _fixture()

    def decode(b):
        return [f for *_, f in mp4.mp4_decode_all(b)]

    allowed = (ValueError, NotImplementedError)
    rng = random.Random()
    for seed in range(3):
        rng.seed(7700 + seed)
        for _ in range(900):
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
            try:
                decode(bytes(raw))
            except allowed:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"fmp4:{op}: {type(e).__name__} escaped the "
                    f"loud-error contract: {e}"
                ) from e
