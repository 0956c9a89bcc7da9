"""ISO-BMFF (MP4) demux + mux for H.264 keyframe sampling, pure stdlib.

The container half of the round-13 compressed-video deliverable: a
crawl-scale video corpus is overwhelmingly H.264-in-MP4, and training
pipelines sample KEYFRAMES — here the stss sync-sample table is the
true seek path (the AVI idx1 analog): sampling every k-th keyframe
resolves per-sample byte ranges through stts/stsc/stsz/stco and touches
ONLY the sampled samples' mdat bytes.

Demux scope (single 'vide' track, avc1/avcC sample entry):
  * box walk with strict bounds — every child's declared size is
    validated against its ENCLOSING box end (the round-12 AVI advice
    lesson), so malformed nesting fails loud, never mis-parses.
  * moov/trak/mdia/minf/stbl: stsd (avc1 + avcC), stts (timestamps),
    stsc (sample-to-chunk), stsz, stco/co64, stss (sync samples; an
    absent stss means every sample is sync per the spec).
  * avcC carries SPS/PPS and the NAL length-prefix size; samples decode
    through operators/h264.py (baseline intra + P slices).
  * FRAGMENTED MP4 (round 13b): moov/mvex/trex defaults + moof/traf
    walk (tfhd base-data-offset and default-base-is-moof conventions,
    tfdt, trun per-sample sizes/durations/flags, first-sample-flags,
    audio trafs skipped by track id) expand to the same per-sample
    tables, so keyframe seek and sequential P decode run unchanged;
    the top-level sidx is the DASH-granularity seek table —
    mp4_fragment_keyframes touches ONLY sampled subsegments' bytes.
  * Non-avc1 codecs (hev1/vp09/av01/mp4v...), multiple video tracks,
    hierarchical sidx raise NotImplementedError at marked seams;
    structurally corrupt boxes raise ValueError (codec-guard contract).

Mux: single video track from the h264.py fixture encoder's samples —
deterministic, the fixture writer that makes demux exercise genuinely
entropy-coded H.264 payloads.  Flat (solid-value) frames decode
EXACTLY (see h264.encode_flat_i16_slice), so a SQL oracle recomputes
per-frame stats from id arithmetic — the MJPEG-in-AVI discipline
applied to the web's dominant video container.

100 TB note: demux+decode runs inside Arrow-batched mapInPandas at the
codec seam, per-video work independent — scales with partition
parallelism like every other blob decode.
"""

from __future__ import annotations

import struct

import numpy as np

_MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"dash", b"M4V ")


def _u32(raw: bytes, pos: int, what: str) -> int:
    if pos + 4 > len(raw):
        raise ValueError(f"MP4: truncated {what} at {pos}")
    return struct.unpack_from(">I", raw, pos)[0]


def _walk_boxes(raw: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) for boxes in [pos, end).

    Every declared size is bounded by the ENCLOSING box end; size==0
    (extends to end) and size==1 (64-bit largesize) are handled.
    """
    while pos + 8 <= end:
        size = _u32(raw, pos, "box size")
        btype = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"MP4: truncated largesize at {pos}")
            size = struct.unpack_from(">Q", raw, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"MP4: box {btype!r} at {pos} overruns its container "
                f"({size} bytes declared, {end - pos} available)"
            )
        yield btype, body, pos + size
        pos += size
    if pos != end:
        raise ValueError(f"MP4: {end - pos} trailing bytes inside container")


def _find_box(raw: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(raw, pos, end):
        if t == btype:
            return b, e
    return None


def mp4_probe(raw: bytes) -> dict:
    """Parse the moov for the single H.264 video track.

    Returns {width, height, timescale, n_samples, length_size,
    sps, pps (parsed dicts), sample_sizes, sample_offsets,
    sample_deltas, sync (sorted 0-based sync-sample indices)}.
    """
    from .h264 import parse_pps, parse_sps

    n = len(raw)
    if n < 16:
        raise ValueError("MP4: too short")
    # ftyp probe: first box should be ftyp with a known brand
    size0 = _u32(raw, 0, "first box size")
    if raw[4:8] != b"ftyp" or size0 < 16 or size0 > n:
        raise ValueError("MP4: missing ftyp box")
    if raw[8:12] not in _MP4_BRANDS:
        raise NotImplementedError(
            f"MP4: unknown major brand {raw[8:12]!r}: plug ffmpeg in here"
        )
    fragmented = _find_box(raw, 0, n, b"moof") is not None
    moov = _find_box(raw, 0, n, b"moov")
    if moov is None:
        raise ValueError("MP4: missing moov box")
    video = None
    for t, b, e in _walk_boxes(raw, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find_box(raw, b, e, b"mdia")
        if mdia is None:
            raise ValueError("MP4: trak without mdia")
        hdlr = _find_box(raw, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise ValueError("MP4: mdia without hdlr")
        handler = raw[hdlr[0] + 8 : hdlr[0] + 12]
        if handler != b"vide":
            continue
        if video is not None:
            raise NotImplementedError(
                "MP4: multiple video tracks: plug ffmpeg in here"
            )
        video = (b, e, mdia)
    if video is None:
        raise NotImplementedError(
            "MP4: no video track: plug ffmpeg in here"
        )
    tb, te, mdia = video
    tkhd = _find_box(raw, tb, te, b"tkhd")
    if tkhd is None:
        raise ValueError("MP4: trak without tkhd")
    # version-1 tkhd carries 64-bit times: track_id sits at +20, so the
    # box must be at least 24 bytes (16 suffices only for version 0)
    if tkhd[1] - tkhd[0] < (24 if raw[tkhd[0]] == 1 else 16):
        raise ValueError("MP4: tkhd too short")
    track_id = _u32(
        raw, tkhd[0] + (20 if raw[tkhd[0]] == 1 else 12), "track_id"
    )
    mdhd = _find_box(raw, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise ValueError("MP4: mdia without mdhd")
    if mdhd[1] - mdhd[0] < 24:
        raise ValueError("MP4: mdhd too short")
    ver = raw[mdhd[0]]
    timescale = _u32(raw, mdhd[0] + (20 if ver == 1 else 12), "timescale")
    if timescale == 0:
        raise ValueError("MP4: zero media timescale")
    minf = _find_box(raw, mdia[0], mdia[1], b"minf")
    if minf is None:
        raise ValueError("MP4: mdia without minf")
    stbl = _find_box(raw, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise ValueError("MP4: minf without stbl")
    sb, se = stbl

    # --- stsd: require avc1 + avcC --------------------------------------
    stsd = _find_box(raw, sb, se, b"stsd")
    if stsd is None:
        raise ValueError("MP4: stbl without stsd")
    entry_count = _u32(raw, stsd[0] + 4, "stsd count")
    if entry_count != 1:
        raise NotImplementedError(
            "MP4: multiple sample descriptions: plug ffmpeg in here"
        )
    boxes = list(_walk_boxes(raw, stsd[0] + 8, stsd[1]))
    if not boxes:
        raise ValueError("MP4: stsd declares an entry but contains none")
    etype, eb, ee = boxes[0]
    if etype != b"avc1":
        raise NotImplementedError(
            f"MP4: video codec {etype!r} (only avc1/H.264): plug "
            "ffmpeg in here"
        )
    if ee - eb < 78:
        raise ValueError("MP4: avc1 sample entry too short")
    # VisualSampleEntry: 6 reserved + 2 data_ref_index + 16 predefined
    # + width/height u16 + ... (70 fixed bytes before child boxes)
    width = struct.unpack_from(">H", raw, eb + 24)[0]
    height = struct.unpack_from(">H", raw, eb + 26)[0]
    avcc = _find_box(raw, eb + 78, ee, b"avcC")
    if avcc is None:
        raise ValueError("MP4: avc1 without avcC")
    ab, ae = avcc
    if ae - ab < 7:
        raise ValueError("MP4: avcC too short")
    if raw[ab] != 1:
        raise ValueError(f"MP4: avcC configurationVersion {raw[ab]}")
    length_size = (raw[ab + 4] & 3) + 1
    n_sps = raw[ab + 5] & 0x1F
    p = ab + 6

    def _take(n: int, what: str) -> int:
        # every avcC read bounded by the box end: a lying count or
        # length fails loud (ValueError), never IndexError/struct.error
        nonlocal p
        if p + n > ae:
            raise ValueError(f"MP4: avcC {what} overruns box")
        v = p
        p += n
        return v

    sps_list = []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", raw, _take(2, "SPS length"))[0]
        sps_list.append(raw[_take(ln, "SPS") : p])
    n_pps = raw[_take(1, "PPS count")]
    pps_list = []
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", raw, _take(2, "PPS length"))[0]
        pps_list.append(raw[_take(ln, "PPS") : p])
    if not sps_list or not pps_list:
        raise ValueError("MP4: avcC without SPS/PPS")
    sps = parse_sps(sps_list[0])
    pps = parse_pps(pps_list[0])

    base = {
        "width": width,
        "height": height,
        "timescale": timescale,
        "length_size": length_size,
        "sps": sps,
        "pps": pps,
        "track_id": track_id,
    }
    if fragmented:
        mvex = _find_box(raw, moov[0], moov[1], b"mvex")
        if mvex is None:
            raise ValueError("MP4: fragmented stream without mvex")
        trex = None
        for t, b, e in _walk_boxes(raw, mvex[0], mvex[1]):
            if t == b"trex" and _u32(raw, b + 4, "trex track") == track_id:
                if e - b < 24:
                    raise ValueError("MP4: trex too short")
                trex = {
                    "duration": _u32(raw, b + 12, "trex duration"),
                    "size": _u32(raw, b + 16, "trex size"),
                    "flags": _u32(raw, b + 20, "trex flags"),
                }
        if trex is None:
            raise ValueError("MP4: no trex for the video track")
        sizes, offsets, deltas, sync = _walk_fragments(
            raw, track_id, trex
        )
        if not sizes:
            raise ValueError("MP4: fragmented stream with no video samples")
        base.update(
            n_samples=len(sizes), sizes=sizes, offsets=offsets,
            deltas=deltas, sync=sync, fragmented=True, trex=trex,
        )
        return base

    # --- sample tables ----------------------------------------------------
    stsz = _find_box(raw, sb, se, b"stsz")
    if stsz is None:
        raise ValueError("MP4: stbl without stsz")
    uniform = _u32(raw, stsz[0] + 4, "stsz sample_size")
    n_samples = _u32(raw, stsz[0] + 8, "stsz count")
    if n_samples == 0 or n_samples > 1_000_000:
        raise ValueError(f"MP4: lying sample count {n_samples}")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if stsz[0] + 12 + 4 * n_samples > stsz[1]:
            raise ValueError("MP4: stsz table overruns box")
        sizes = list(
            struct.unpack_from(f">{n_samples}I", raw, stsz[0] + 12)
        )

    stco = _find_box(raw, sb, se, b"stco")
    if stco is not None:
        cnt = _u32(raw, stco[0] + 4, "stco count")
        if stco[0] + 8 + 4 * cnt > stco[1]:
            raise ValueError("MP4: stco table overruns box")
        chunk_offsets = list(struct.unpack_from(f">{cnt}I", raw, stco[0] + 8))
    else:
        co64 = _find_box(raw, sb, se, b"co64")
        if co64 is None:
            raise ValueError("MP4: stbl without stco/co64")
        cnt = _u32(raw, co64[0] + 4, "co64 count")
        if co64[0] + 8 + 8 * cnt > co64[1]:
            raise ValueError("MP4: co64 table overruns box")
        chunk_offsets = list(struct.unpack_from(f">{cnt}Q", raw, co64[0] + 8))

    stsc = _find_box(raw, sb, se, b"stsc")
    if stsc is None:
        raise ValueError("MP4: stbl without stsc")
    sc_cnt = _u32(raw, stsc[0] + 4, "stsc count")
    if stsc[0] + 8 + 12 * sc_cnt > stsc[1]:
        raise ValueError("MP4: stsc table overruns box")
    stsc_rows = [
        struct.unpack_from(">III", raw, stsc[0] + 8 + 12 * i)
        for i in range(sc_cnt)
    ]

    # expand sample-to-chunk into per-sample file offsets
    offsets: list[int] = []
    si = 0
    for row_i, (first_chunk, per_chunk, _desc) in enumerate(stsc_rows):
        last_chunk = (
            stsc_rows[row_i + 1][0] - 1
            if row_i + 1 < len(stsc_rows)
            else len(chunk_offsets)
        )
        if first_chunk < 1 or first_chunk > last_chunk:
            raise ValueError("MP4: non-monotonic stsc chunk runs")
        for ch in range(first_chunk - 1, last_chunk):
            if ch >= len(chunk_offsets):
                raise ValueError("MP4: stsc references missing chunk")
            pos = chunk_offsets[ch]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                if pos + sizes[si] > n:
                    raise ValueError(
                        f"MP4: sample {si} overruns file "
                        f"({pos}+{sizes[si]} > {n})"
                    )
                offsets.append(pos)
                pos += sizes[si]
                si += 1
        if si >= n_samples:
            break
    if si < n_samples:
        raise ValueError(
            f"MP4: sample tables cover {si} of {n_samples} samples"
        )

    stts = _find_box(raw, sb, se, b"stts")
    if stts is None:
        raise ValueError("MP4: stbl without stts")
    tt_cnt = _u32(raw, stts[0] + 4, "stts count")
    if stts[0] + 8 + 8 * tt_cnt > stts[1]:
        raise ValueError("MP4: stts table overruns box")
    deltas: list[int] = []
    for i in range(tt_cnt):
        cnt, delta = struct.unpack_from(">II", raw, stts[0] + 8 + 8 * i)
        if len(deltas) + cnt > n_samples:
            raise ValueError("MP4: stts covers more samples than stsz")
        deltas.extend([delta] * cnt)
    if len(deltas) != n_samples:
        raise ValueError(
            f"MP4: stts covers {len(deltas)} of {n_samples} samples"
        )

    stss = _find_box(raw, sb, se, b"stss")
    if stss is None:
        sync = list(range(n_samples))  # spec: absent stss => all sync
    else:
        ss_cnt = _u32(raw, stss[0] + 4, "stss count")
        if stss[0] + 8 + 4 * ss_cnt > stss[1]:
            raise ValueError("MP4: stss table overruns box")
        sync = [
            struct.unpack_from(">I", raw, stss[0] + 8 + 4 * i)[0] - 1
            for i in range(ss_cnt)
        ]
        if any(s < 0 or s >= n_samples for s in sync):
            raise ValueError("MP4: stss references missing sample")

    base.update(
        n_samples=n_samples, sizes=sizes, offsets=offsets,
        deltas=deltas, sync=sync, fragmented=False,
    )
    return base


_SAMPLE_NON_SYNC = 0x10000  # sample_is_non_sync_sample flag bit

# tfhd flags
_TFHD_BASE_OFFSET = 0x1
_TFHD_DESC_IDX = 0x2
_TFHD_DEF_DURATION = 0x8
_TFHD_DEF_SIZE = 0x10
_TFHD_DEF_FLAGS = 0x20
_TFHD_BASE_IS_MOOF = 0x20000

# trun flags
_TRUN_DATA_OFFSET = 0x1
_TRUN_FIRST_FLAGS = 0x4
_TRUN_DURATION = 0x100
_TRUN_SIZE = 0x200
_TRUN_FLAGS = 0x400
_TRUN_CTS = 0x800


def _parse_moof_samples(raw: bytes, moof_start: int, body: int, end: int,
                        track_id: int, trex: dict):
    """Samples of one moof for the given track: (size, offset, delta,
    is_sync) tuples.  Base offset: explicit base-data-offset, or the
    moof start (default-base-is-moof, and ALSO the fallback when
    neither flag is set — the dominant convention in DASH/CMAF
    muxers).  Audio/other trafs are skipped by track id."""
    n = len(raw)
    out = []
    for t, b, e in _walk_boxes(raw, body, end):
        if t != b"traf":
            continue
        tfhd = _find_box(raw, b, e, b"tfhd")
        if tfhd is None:
            raise ValueError("MP4: traf without tfhd")
        flags = _u32(raw, tfhd[0], "tfhd flags") & 0xFFFFFF
        if _u32(raw, tfhd[0] + 4, "tfhd track") != track_id:
            continue
        p = tfhd[0] + 8
        base_off = moof_start
        if flags & _TFHD_BASE_OFFSET:
            if p + 8 > tfhd[1]:
                raise ValueError("MP4: tfhd base offset overruns box")
            base_off = struct.unpack_from(">Q", raw, p)[0]
            p += 8
        if flags & _TFHD_DESC_IDX:
            p += 4
        def_dur = trex["duration"]
        if flags & _TFHD_DEF_DURATION:
            def_dur = _u32(raw, p, "tfhd duration")
            p += 4
        def_size = trex["size"]
        if flags & _TFHD_DEF_SIZE:
            def_size = _u32(raw, p, "tfhd size")
            p += 4
        def_flags = trex["flags"]
        if flags & _TFHD_DEF_FLAGS:
            def_flags = _u32(raw, p, "tfhd flags")
            p += 4
        if p > tfhd[1]:
            raise ValueError("MP4: tfhd fields overrun box")
        next_pos = None  # end of the previous trun's data in this traf
        for tt, tb, te in _walk_boxes(raw, b, e):
            if tt != b"trun":
                continue
            tflags = _u32(raw, tb, "trun flags") & 0xFFFFFF
            cnt = _u32(raw, tb + 4, "trun count")
            if cnt > 1_000_000:
                raise ValueError(f"MP4: lying trun count {cnt}")
            p2 = tb + 8
            # 14496-12 8.8.8.1: without a data offset, a run starts
            # immediately after the previous run's data (base offset
            # only for the traf's first run)
            pos = base_off if next_pos is None else next_pos
            if tflags & _TRUN_DATA_OFFSET:
                if p2 + 4 > te:
                    raise ValueError("MP4: trun data offset overruns box")
                pos = base_off + struct.unpack_from(">i", raw, p2)[0]
                p2 += 4
            if pos < 0:
                raise ValueError(f"MP4: negative trun data offset {pos}")
            first_flags = None
            if tflags & _TRUN_FIRST_FLAGS:
                first_flags = _u32(raw, p2, "trun first flags")
                p2 += 4
            per = (
                (4 if tflags & _TRUN_DURATION else 0)
                + (4 if tflags & _TRUN_SIZE else 0)
                + (4 if tflags & _TRUN_FLAGS else 0)
                + (4 if tflags & _TRUN_CTS else 0)
            )
            if p2 + per * cnt > te:
                raise ValueError("MP4: trun table overruns box")
            for i in range(cnt):
                dur, size, sfl = def_dur, def_size, def_flags
                if tflags & _TRUN_DURATION:
                    dur = _u32(raw, p2, "trun duration")
                    p2 += 4
                if tflags & _TRUN_SIZE:
                    size = _u32(raw, p2, "trun size")
                    p2 += 4
                if tflags & _TRUN_FLAGS:
                    sfl = _u32(raw, p2, "trun flags")
                    p2 += 4
                if tflags & _TRUN_CTS:
                    p2 += 4  # composition offset: decode order only here
                if i == 0 and first_flags is not None:
                    sfl = first_flags
                if size == 0:
                    raise ValueError("MP4: zero-size fragmented sample")
                if pos + size > n:
                    raise ValueError(
                        f"MP4: fragmented sample overruns file "
                        f"({pos}+{size} > {n})"
                    )
                out.append(
                    (size, pos, dur, not sfl & _SAMPLE_NON_SYNC)
                )
                pos += size
            next_pos = pos
    return out


def _walk_fragments(raw: bytes, track_id: int, trex: dict):
    """Linear moof walk: per-sample (sizes, offsets, deltas, sync
    indices) across all fragments in file order."""
    sizes, offsets, deltas, sync = [], [], [], []
    for t, b, e in _walk_boxes(raw, 0, len(raw)):
        if t != b"moof":
            continue
        # header is 8 bytes, or 16 when size==1 (largesize) was used
        start = b - 8 if raw[b - 4 : b] == b"moof" else b - 16
        for size, pos, dur, is_sync in _parse_moof_samples(
                raw, start, b, e, track_id, trex):
            if is_sync:
                sync.append(len(sizes))
            sizes.append(size)
            offsets.append(pos)
            deltas.append(dur)
    return sizes, offsets, deltas, sync


def mp4_keyframes(raw: bytes, every_k: int = 1, info: dict | None = None):
    """Yield (sample_idx, ts_ms, sample_bytes) for every k-th SYNC
    sample — resolves byte ranges through the sample tables so only
    the sampled samples' mdat bytes are touched (the stss seek path).
    """
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if info is None:
        info = mp4_probe(raw)
    ts = info["timescale"]
    # decode timestamps via cumulative stts deltas (integer-exact)
    cum = 0
    start = []
    for d in info["deltas"]:
        start.append(cum)
        cum += d
    for pos in range(0, len(info["sync"]), every_k):
        si = info["sync"][pos]
        off, size = info["offsets"][si], info["sizes"][si]
        yield si, start[si] * 1000 // ts, raw[off : off + size]


def mp4_decode_keyframes(raw: bytes, every_k: int = 1):
    """Yield (sample_idx, ts_ms, rgb_frame) for every k-th keyframe."""
    from .h264 import h264_decode_sample

    info = mp4_probe(raw)
    for si, ts_ms, sample in mp4_keyframes(raw, every_k, info):
        yield si, ts_ms, h264_decode_sample(
            info["sps"], info["pps"], sample, info["length_size"]
        )


def mp4_decode_all(raw: bytes, info: dict | None = None):
    """Yield (sample_idx, ts_ms, is_sync, rgb_frame) for EVERY sample
    in decode order — the sequential path P (inter-predicted) frames
    need: each frame may reference the previous reference picture, so
    unlike the stss keyframe seek this walks all samples."""
    from .h264 import H264SampleDecoder

    if info is None:
        info = mp4_probe(raw)
    dec = H264SampleDecoder(info["sps"], info["pps"], info["length_size"])
    ts = info["timescale"]
    sync = set(info["sync"])
    cum = 0
    for si in range(info["n_samples"]):
        off, size = info["offsets"][si], info["sizes"][si]
        yield si, cum * 1000 // ts, si in sync, dec.decode(
            raw[off : off + size]
        )
        cum += info["deltas"][si]


def mp4_sidx_index(raw: bytes) -> dict:
    """Parse the top-level sidx (segment index) box: returns
    {timescale, refs} where refs is a list of {offset, size, duration,
    sap} — one entry per media subsegment (moof+mdat pair), offsets
    absolute in the file, durations in the SIDX'S OWN timescale (the
    spec allows it to differ from the media/mdhd timescale).  This is
    the fragmented seek table (the stss/idx1 analog for DASH/CMAF): a
    sampler jumps straight to a subsegment's bytes."""
    n = len(raw)
    for t, b, e in _walk_boxes(raw, 0, n):
        if t != b"sidx":
            continue
        ver = raw[b]
        head = 20 if ver == 0 else 28
        if b + head + 4 > e:
            raise ValueError("MP4: sidx too short")
        timescale = _u32(raw, b + 8, "sidx timescale")
        if timescale == 0:
            raise ValueError("MP4: zero sidx timescale")
        if ver == 0:
            first_off = _u32(raw, b + 16, "sidx first_offset")
            p = b + 20
        else:
            first_off = struct.unpack_from(">Q", raw, b + 20)[0]
            p = b + 28
        p += 2  # reserved
        count = struct.unpack_from(">H", raw, p)[0]
        p += 2
        if p + 12 * count > e:
            raise ValueError("MP4: sidx reference table overruns box")
        anchor = e + first_off  # first byte after the sidx box
        refs = []
        for _ in range(count):
            w1 = _u32(raw, p, "sidx ref")
            dur = _u32(raw, p + 4, "sidx duration")
            w3 = _u32(raw, p + 8, "sidx sap")
            p += 12
            if w1 >> 31:
                raise NotImplementedError(
                    "MP4: hierarchical sidx (index references): plug "
                    "ffmpeg in here"
                )
            size = w1 & 0x7FFFFFFF
            if anchor + size > n:
                raise ValueError(
                    f"MP4: sidx subsegment overruns file "
                    f"({anchor}+{size} > {n})"
                )
            refs.append(
                {"offset": anchor, "size": size, "duration": dur,
                 "sap": bool(w3 >> 31)}
            )
            anchor += size
        return {"timescale": timescale, "refs": refs}
    raise ValueError("MP4: no sidx box")


def mp4_fragment_keyframes(raw: bytes, every_k: int = 1,
                           info: dict | None = None):
    """Fragmented keyframe SEEK path: walk the sidx, and for every
    k-th SAP-starting subsegment parse ONLY that moof and yield its
    first sync sample as (global_subsegment_idx, ts_ms, bytes) —
    mdat bytes of unsampled fragments are never touched (the idx1 /
    stss discipline at DASH granularity)."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if info is None:
        info = mp4_probe(raw)
    if not info.get("fragmented"):
        raise ValueError("MP4: not a fragmented stream")
    mvex_trex = info["trex"]  # validated and stored by mp4_probe
    sidx = mp4_sidx_index(raw)
    # sidx durations are in the sidx's OWN timescale (may differ from
    # the media timescale)
    ts, refs = sidx["timescale"], sidx["refs"]
    cum, t_acc = {}, 0
    for i, r in enumerate(refs):
        cum[i] = t_acc
        t_acc += r["duration"]
    saps = [i for i, r in enumerate(refs) if r["sap"]]
    for pos in range(0, len(saps), every_k):
        ri = saps[pos]
        r = refs[ri]
        # parse only this subsegment's moof (absolute positions keep
        # explicit base-data-offset streams correct too)
        moof = _find_box(raw, r["offset"], r["offset"] + r["size"], b"moof")
        if moof is None:
            raise ValueError("MP4: sidx subsegment without moof")
        start = (moof[0] - 8
                 if raw[moof[0] - 4 : moof[0]] == b"moof" else moof[0] - 16)
        samples = _parse_moof_samples(
            raw, start, moof[0], moof[1], info["track_id"], mvex_trex
        )
        for size, off, dur, is_sync in samples:
            if is_sync:
                yield ri, cum[ri] * 1000 // ts, raw[off : off + size]
                break


# ---------------------------------------------------------------------------
# muxer (fixture writer)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full_box(btype: bytes, body: bytes, ver: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", (ver << 24) | flags) + body)


def mp4_encode_gray(
    frames: list,
    fps: int = 10,
    qp: int = 12,
    mode: str = "dc16",
    key_every: int = 1,
) -> bytes:
    """Mux gray frames into H.264-in-MP4 (one avc1 track).

    ``key_every`` > 1 writes every k-th frame as an IDR sync sample
    (listed in stss) and the rest as non-IDR I slices — a genuine stss
    SUBSET so the keyframe seek path is actually exercised.  mode /
    qp pass through to h264.h264_encode_gray_frames.
    """
    from .h264 import h264_encode_gray_frames

    if fps <= 0:
        raise ValueError(f"MP4: bad fps {fps}")
    sps, pps, samples, sync = h264_encode_gray_frames(
        frames, qp=qp, mode=mode, key_every=key_every
    )
    h, w = frames[0].shape[:2]
    return _mux_avc(sps, pps, samples, sync, w, h, fps)


def mp4_encode_pgop(
    specs: list, width: int, height: int, fps: int = 10, qp: int = 12
) -> bytes:
    """Mux a solid-frame GOP with REAL P slices (P_Skip / flat-delta /
    constant-MV pan — see h264.h264_encode_pgop_frames) into MP4.
    Only the IDR frames land in stss, so the keyframe seek path and
    the sequential P decode path are both exercised on one file."""
    from .h264 import h264_encode_pgop_frames

    if fps <= 0:
        raise ValueError(f"MP4: bad fps {fps}")
    sps, pps, samples, sync = h264_encode_pgop_frames(
        specs, width, height, qp=qp
    )
    return _mux_avc(sps, pps, samples, sync, width, height, fps)


def mp4_encode_fragmented(
    fragments: list, width: int, height: int, fps: int = 10, qp: int = 12
) -> bytes:
    """Mux GOPs into FRAGMENTED MP4 (DASH/CMAF layout): ftyp + moov
    (empty sample tables + mvex/trex) + sidx + per-GOP [moof mdat].

    ``fragments`` is a list of GOP spec lists (each per
    h264.h264_encode_pgop_frames, starting with an IDR).  Each GOP
    becomes one subsegment: moof carries tfhd (default-base-is-moof +
    default duration), tfdt (decode time) and one trun with per-sample
    sizes and flags (IDR = sync, P = non-sync); the sidx references
    every subsegment with starts_with_SAP — the seek table
    mp4_fragment_keyframes jumps through."""
    from .h264 import h264_encode_pgop_frames

    if fps <= 0:
        raise ValueError(f"MP4: bad fps {fps}")
    if not fragments:
        raise ValueError("MP4: no fragments")
    timescale = 1000
    delta = timescale // fps
    sps = pps = None
    frag_samples = []
    for specs in fragments:
        s, p, samples, sync = h264_encode_pgop_frames(
            specs, width, height, qp=qp
        )
        sps, pps = s, p
        frag_samples.append((samples, sync))

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2avc1dash"
    )
    total_dur = delta * sum(len(s) for s, _ in frag_samples)
    moov = _mux_moov_shell(
        sps, pps, width, height, timescale, total_dur, delta
    )

    moofs = []
    t_acc = 0
    for seq, (samples, sync) in enumerate(frag_samples):
        mfhd = _full_box(b"mfhd", struct.pack(">I", seq + 1))
        # default duration rides tfhd (flag 0x8) after the track id;
        # offsets are moof-relative (default-base-is-moof, 0x20000)
        tfhd = _full_box(
            b"tfhd", struct.pack(">II", 1, delta),
            flags=_TFHD_BASE_IS_MOOF | _TFHD_DEF_DURATION,
        )
        tfdt = _full_box(b"tfdt", struct.pack(">I", t_acc))
        t_acc += delta * len(samples)

        def _trun(data_off: int) -> bytes:
            body = struct.pack(">I", len(samples))
            body += struct.pack(">i", data_off)
            for smp, is_sync in zip(samples, sync):
                body += struct.pack(
                    ">II", len(smp),
                    0x02000000 if is_sync else 0x01010000 | _SAMPLE_NON_SYNC,
                )
            return _full_box(
                b"trun", body,
                flags=_TRUN_DATA_OFFSET | _TRUN_SIZE | _TRUN_FLAGS,
            )

        probe_moof = _box(
            b"moof", mfhd + _box(b"traf", tfhd + tfdt + _trun(0))
        )
        moof = _box(
            b"moof",
            mfhd + _box(b"traf", tfhd + tfdt + _trun(len(probe_moof) + 8)),
        )
        if len(moof) != len(probe_moof):
            raise AssertionError("MP4 muxer: moof size changed on patch")
        mdat = _box(b"mdat", b"".join(samples))
        moofs.append(moof + mdat)

    sidx_body = struct.pack(">II", 1, timescale)  # reference_ID, timescale
    sidx_body += struct.pack(">II", 0, 0)  # earliest_pts, first_offset
    sidx_body += struct.pack(">HH", 0, len(moofs))
    for seg, (samples, _) in zip(moofs, frag_samples):
        sidx_body += struct.pack(
            ">III", len(seg), delta * len(samples),
            (1 << 31) | (1 << 28),  # starts_with_SAP, SAP type 1
        )
    sidx = _full_box(b"sidx", sidx_body)
    return ftyp + moov + sidx + b"".join(moofs)


def _mux_moov_shell(
    sps: bytes, pps: bytes, w: int, h: int, timescale: int,
    duration: int, default_delta: int,
) -> bytes:
    """moov for a fragmented stream: real stsd (avc1+avcC), ZERO-entry
    stts/stsc/stsz/stco, and mvex/trex carrying the track defaults."""
    avcc = _box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    avc1 = _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + avcc,
    )
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + avc1)
    stts = _full_box(b"stts", struct.pack(">I", 0))
    stsc = _full_box(b"stsc", struct.pack(">I", 0))
    stsz = _full_box(b"stsz", struct.pack(">II", 0, 0))
    stco = _full_box(b"stco", struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full_box(
        b"dref", struct.pack(">I", 1) + _full_box(b"url ", b"", flags=1)
    )
    dinf = _box(b"dinf", dref)
    vmhd = _full_box(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    mdhd = _full_box(
        b"mdhd",
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
        flags=3,
    )
    trak = _box(b"trak", tkhd + mdia)
    trex = _full_box(
        b"trex",
        struct.pack(
            ">IIIII", 1, 1, default_delta, 0,
            0x01010000 | _SAMPLE_NON_SYNC,
        ),
    )
    mvex = _box(b"mvex", trex)
    mvhd = _full_box(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x10000, 0x100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    return _box(b"moov", mvhd + trak + mvex)


def _mux_avc(
    sps: bytes, pps: bytes, samples: list, sync: list, w: int, h: int,
    fps: int,
) -> bytes:
    timescale = 1000
    delta = timescale // fps
    n = len(samples)
    duration = delta * n

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2avc1mp41")
    mdat_body = b"".join(samples)

    avcc = _box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    avc1 = _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        + avcc,
    )
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + avc1)
    stts = _full_box(b"stts", struct.pack(">III", 1, n, delta))
    stsz = _full_box(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    # one chunk holding all samples
    stsc = _full_box(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    sync_idx = [i for i, s in enumerate(sync) if s]
    boxes_sync = b""
    if len(sync_idx) < n:  # true subset: write stss
        boxes_sync = _full_box(
            b"stss",
            struct.pack(">I", len(sync_idx))
            + b"".join(struct.pack(">I", i + 1) for i in sync_idx),
        )
    stbl_children = stsd + stts + boxes_sync + stsc + stsz
    # stco needs the mdat payload offset: ftyp + mdat header
    mdat_off = len(ftyp) + 8
    stco = _full_box(b"stco", struct.pack(">II", 1, mdat_off))
    stbl = _box(b"stbl", stbl_children + stco)
    dref = _full_box(
        b"dref", struct.pack(">I", 1) + _full_box(b"url ", b"", flags=1)
    )
    dinf = _box(b"dinf", dref)
    vmhd = _full_box(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    mdhd = _full_box(
        b"mdhd",
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
        flags=3,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full_box(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x10000, 0x100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def mp4_solid_fixture(doc_id: int, n_frames: int = 4, key_every: int = 1) -> bytes:
    """Deterministic MP4 fixture: frame f is solid luma
    (doc_id*17 + f*29) % 256 at (16*(doc_id%3+1)) x 16*(doc_id%2+2) —
    id arithmetic a SQL oracle reproduces (flat frames decode exactly).
    """
    h = 16 * (doc_id % 3 + 1)
    w = 16 * (doc_id % 2 + 2)
    frames = [
        np.full((h, w), (doc_id * 17 + f * 29) % 256, dtype=np.uint8)
        for f in range(n_frames)
    ]
    return mp4_encode_gray(frames, fps=10, key_every=key_every)
