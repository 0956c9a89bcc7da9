"""RIFF/AVI MJPEG container, pure stdlib — compressed video for real.

Eighth real format at the multimodal codec seam (PNG/BMP/WAV+ADPCM/
Y4M/JPEG+progressive/GIF/TIFF came first), and the first COMPRESSED
video path: Y4M covers uncompressed interchange; a crawl-scale
multimodal corpus is mostly compressed video, and Motion-JPEG-in-AVI
is the compressed container whose frame payloads an existing baseline
JPEG codec can decode with ZERO new entropy-decode code — every frame
is its own standalone JFIF stream (operators/jpeg.py::jpeg_decode).

Demuxer scope (the 'vids'/'MJPG' single-video-stream baseline):
  * RIFF('AVI ') → LIST('hdrl'){avih, LIST('strl'){strh,strf}} →
    LIST('movi'){'00dc' frame chunks} → idx1.
  * The idx1 index is the REAL seek path: frame k resolves through its
    index entry (offsets validated against the movi chunk headers), so
    every-k-th sampling touches only the sampled frames' bytes — the
    access pattern frame sampling needs at scale.  Streams without
    idx1 (legacy writers) fall back to the linear movi chunk walk; the
    two paths are pinned equal in tests/test_multimodal_avi.py.
  * Both idx1 offset conventions are accepted (relative to the 'movi'
    fourcc — the common one — or absolute from file start), resolved
    by validating the chunk header at the candidate position.
  * Non-MJPG video streams (DIB/H264/...) and audio-only files raise
    NotImplementedError at the marked seam (plug ffmpeg in here);
    structurally corrupt streams raise ValueError (the codec-guard
    contract); per-frame pixel bounds enforce multimodal.MAX_PIXELS
    inside jpeg_decode before allocation.

Muxer: single 'vids'/'MJPG' stream from (h, w[, 3]) uint8 frames,
each encoded by operators/jpeg.py::jpeg_encode — deterministic, the
fixture writer that makes demux exercise genuinely compressed frame
payloads.  quality=100 solid frames decode EXACTLY (all quant
divisors 1, DC-only blocks), so a SQL oracle recomputes per-frame
stats from id arithmetic — the Y4M/WAV anchor applied to compressed
video.

100 TB note: demux+decode runs inside Arrow-batched mapInPandas at
the codec seam, per-video work independent — scales with partition
parallelism like every other blob decode.
"""

from __future__ import annotations

import struct

AVI_RIFF_MAGIC = b"RIFF"
AVI_FORM = b"AVI "

# sanity bound on declared stream counts / frame counts per blob: a
# lying header cannot force a huge allocation or iteration (chunk walks
# are additionally bounded by actual byte positions)
_MAX_FRAMES = 1_000_000


def _u32(raw: bytes, pos: int, what: str) -> int:
    if pos + 4 > len(raw):
        raise ValueError(f"AVI: truncated {what} at {pos}")
    return struct.unpack_from("<I", raw, pos)[0]


def _chunk_header(
    raw: bytes, pos: int, end: int | None = None
) -> tuple[bytes, int, int]:
    """(fourcc, payload size, payload start) of the chunk at pos.

    ``end`` is the enclosing container's data end (the RIFF end for
    top-level chunks, the parent LIST's end for nested walks): a child
    whose declared size escapes its OWN list fails loud here even when
    it would still fit in the file — otherwise a malformed hdrl/strl/
    rec child silently mis-parses sibling bytes.
    """
    if end is None:
        end = len(raw)
    if pos + 8 > end:
        raise ValueError(f"AVI: truncated chunk header at {pos}")
    fcc = raw[pos : pos + 4]
    size = struct.unpack_from("<I", raw, pos + 4)[0]
    if pos + 8 + size > end:
        raise ValueError(
            f"AVI: chunk {fcc!r} at {pos} overruns its container "
            f"({size} bytes declared, {end - pos - 8} available)"
        )
    return fcc, size, pos + 8


def avi_header(raw: bytes) -> tuple[int, int, int, int, int, int]:
    """Parse the hdrl list: (width, height, rate, scale, n_frames,
    vids_idx).

    Validates the single-video-stream MJPG baseline: fccType 'vids'
    with handler or biCompression 'MJPG'.  rate/scale is the frame
    clock (fps = rate/scale); timestamps are idx*1000*scale DIV rate —
    floor-exact integer math, the Y4M fps-ratio discipline.
    ``vids_idx`` is the video stream's strl position (its movi chunk id
    prefix — round-13 review fix: callers pass the whole tuple to
    avi_frames, which then does NOT re-walk the container).
    """
    if not raw.startswith(AVI_RIFF_MAGIC):
        raise ValueError("AVI: missing RIFF magic")
    riff_size = _u32(raw, 4, "RIFF size")
    if 8 + riff_size > len(raw):
        raise ValueError("AVI: RIFF size overruns file")
    if raw[8:12] != AVI_FORM:
        raise ValueError(f"AVI: RIFF form {raw[8:12]!r} is not 'AVI '")

    width = height = rate = scale = n_frames = None
    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        fcc, size, data = _chunk_header(raw, pos, end)
        if fcc == b"LIST" and raw[data : data + 4] == b"hdrl":
            hpos, hend = data + 4, data + size
            while hpos + 8 <= hend:
                hfcc, hsize, hdata = _chunk_header(raw, hpos, hend)
                if hfcc == b"avih":
                    if hsize < 40:
                        raise ValueError("AVI: avih too short")
                    n_frames = _u32(raw, hdata + 16, "avih frames")
                    width = _u32(raw, hdata + 32, "avih width")
                    height = _u32(raw, hdata + 36, "avih height")
                elif hfcc == b"LIST" and raw[hdata : hdata + 4] == b"strl":
                    spos, send = hdata + 4, hdata + hsize
                    handler = compression = None
                    is_video = False
                    while spos + 8 <= send:
                        sfcc, ssize, sdata = _chunk_header(raw, spos, send)
                        if sfcc == b"strh":
                            if ssize < 32:
                                raise ValueError("AVI: strh too short")
                            if raw[sdata : sdata + 4] == b"vids":
                                is_video = True
                                handler = raw[sdata + 4 : sdata + 8]
                                scale = _u32(raw, sdata + 20, "strh scale")
                                rate = _u32(raw, sdata + 24, "strh rate")
                        elif sfcc == b"strf" and is_video:
                            if ssize < 20:
                                raise ValueError("AVI: strf too short")
                            compression = raw[sdata + 16 : sdata + 20]
                        spos = sdata + ssize + (ssize & 1)
                    if is_video:
                        tags = (handler, compression)
                        if b"MJPG" not in tags:
                            raise NotImplementedError(
                                f"AVI video codec {handler!r}/"
                                f"{compression!r}: plug ffmpeg in here"
                            )
                hpos = hdata + hsize + (hsize & 1)
        pos = data + size + (size & 1)

    if width is None or n_frames is None:
        raise ValueError("AVI: missing avih header")
    if rate is None or scale is None:
        raise NotImplementedError(
            "AVI without a 'vids' stream: plug ffmpeg in here"
        )
    if rate == 0 or scale == 0:
        raise ValueError("AVI: zero rate/scale frame clock")
    if n_frames > _MAX_FRAMES:
        raise ValueError(f"AVI: lying frame count {n_frames}")
    return width, height, rate, scale, n_frames, _vids_stream_index(raw)


def _vids_stream_index(raw: bytes) -> int:
    """Zero-based strl position of the 'vids' stream.

    The strl order in hdrl assigns movi chunk ids: stream k's video
    data rides '{k:02d}dc'/'{k:02d}db'.  Writers that put the 'auds'
    strl FIRST store video as '01dc' — matching only '00dc' would
    silently yield zero frames for a header that validated fine.
    """
    riff_size = _u32(raw, 4, "RIFF size")
    pos, end = 12, 8 + riff_size
    while pos + 8 <= end:
        fcc, size, data = _chunk_header(raw, pos, end)
        if fcc == b"LIST" and raw[data : data + 4] == b"hdrl":
            hpos, hend = data + 4, data + size
            sidx = 0
            while hpos + 8 <= hend:
                hfcc, hsize, hdata = _chunk_header(raw, hpos, hend)
                if hfcc == b"LIST" and raw[hdata : hdata + 4] == b"strl":
                    spos, send = hdata + 4, hdata + hsize
                    while spos + 8 <= send:
                        sfcc, ssize, sdata = _chunk_header(raw, spos, send)
                        if sfcc == b"strh":
                            if raw[sdata : sdata + 4] == b"vids":
                                if sidx > 99:
                                    raise ValueError(
                                        f"AVI: vids stream index {sidx} "
                                        "exceeds the 2-digit ckid space"
                                    )
                                return sidx
                            break
                        spos = sdata + ssize + (ssize & 1)
                    sidx += 1
                hpos = hdata + hsize + (hsize & 1)
        pos = data + size + (size & 1)
    raise NotImplementedError(
        "AVI without a 'vids' stream: plug ffmpeg in here"
    )


def _movi_bounds(raw: bytes) -> tuple[int, int]:
    """(position of the 'movi' fourcc, end of the movi list data)."""
    riff_size = _u32(raw, 4, "RIFF size")
    pos, end = 12, 8 + riff_size
    while pos + 8 <= end:
        fcc, size, data = _chunk_header(raw, pos, end)
        if fcc == b"LIST" and raw[data : data + 4] == b"movi":
            return data, data + size
        pos = data + size + (size & 1)
    raise ValueError("AVI: missing movi list")


def _idx1(raw: bytes) -> list[tuple[bytes, int, int]] | None:
    """idx1 entries as (ckid, offset, length), or None when absent."""
    riff_size = _u32(raw, 4, "RIFF size")
    pos, end = 12, 8 + riff_size
    while pos + 8 <= end:
        fcc, size, data = _chunk_header(raw, pos, end)
        if fcc == b"idx1":
            if size % 16:
                raise ValueError(f"AVI: idx1 size {size} not 16-aligned")
            return [
                (
                    raw[data + i : data + i + 4],
                    struct.unpack_from("<I", raw, data + i + 8)[0],
                    struct.unpack_from("<I", raw, data + i + 12)[0],
                )
                for i in range(0, size, 16)
            ]
        pos = data + size + (size & 1)
    return None


def _is_frame_chunk(fcc: bytes, vids_idx: int) -> bool:
    # the vids stream's compressed/uncompressed data ('NNdc'/'NNdb',
    # NN = the stream's strl position — NOT always 00)
    prefix = b"%02d" % vids_idx
    return fcc in (prefix + b"dc", prefix + b"db")


def _resolve_index_entry(
    raw: bytes, ckid: bytes, off: int, length: int, movi_pos: int
) -> bytes:
    """Validate one idx1 entry against the actual chunk bytes.

    Tries the 'relative to the movi fourcc' convention first (the
    common writer behavior), then absolute-from-file-start; the entry
    is trusted only where a matching chunk header actually sits.  A
    candidate whose size disagrees falls through to the next base —
    the ckid bytes can occur by chance inside a frame payload at the
    wrong-convention position — and the entry only fails once NEITHER
    convention resolves.
    """
    for base in (movi_pos, 0):
        p = base + off
        if p + 8 > len(raw) or raw[p : p + 4] != ckid:
            continue
        size = struct.unpack_from("<I", raw, p + 4)[0]
        if size != length or p + 8 + size > len(raw):
            continue
        return raw[p + 8 : p + 8 + size]
    raise ValueError(f"AVI: idx1 entry {ckid!r}@{off} resolves to no chunk")


def avi_frames(raw: bytes, every_k: int = 1, header: tuple | None = None):
    """Yield (frame_idx, jpeg_bytes) for every k-th video frame.

    Seeks through idx1 when present — only the sampled frames' bytes
    are touched — else walks the movi chunks linearly.  Frame payloads
    are returned as-is (each a standalone JFIF stream for MJPG).
    Callers that already ran avi_header pass its tuple as ``header``
    to skip the second container walk (the stats/sampling operators
    parse the header for rate/scale anyway).
    """
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if header is None:
        # validates container + MJPG before any payload work
        header = avi_header(raw)
    vids_idx = header[5]
    movi_pos, movi_end = _movi_bounds(raw)
    index = _idx1(raw)
    if index is not None:
        frames = [e for e in index if _is_frame_chunk(e[0], vids_idx)]
        if len(frames) > _MAX_FRAMES:
            raise ValueError(f"AVI: lying idx1 frame count {len(frames)}")
        for idx in range(0, len(frames), every_k):
            ckid, off, length = frames[idx]
            yield idx, _resolve_index_entry(raw, ckid, off, length, movi_pos)
        return
    pos, idx = movi_pos + 4, 0
    # interleaving muxers may group chunks into LIST('rec ') wrappers;
    # the walk descends into them (their children are ordinary chunks)
    frames = [(movi_end, movi_end)]  # (end of current list, parent resume)
    while frames:
        end, resume = frames[-1]
        if pos + 8 > end:
            frames.pop()
            pos = resume  # rec list exhausted: resume in the parent
            continue
        fcc, size, data = _chunk_header(raw, pos, end)
        if fcc == b"LIST" and raw[data : data + 4] == b"rec ":
            frames.append((data + size, data + size + (size & 1)))
            pos = data + 4
            continue
        if _is_frame_chunk(fcc, vids_idx):
            if idx % every_k == 0:
                yield idx, raw[data : data + size]
            idx += 1
            if idx > _MAX_FRAMES:
                raise ValueError("AVI: runaway movi frame walk")
        pos = data + size + (size & 1)


def avi_encode(
    frames: list,
    rate: int = 10,
    scale: int = 1,
    quality: int = 100,
    subsample: bool = False,
    write_idx1: bool = True,
    pcm: bytes | None = None,
    audio_rate: int = 8000,
    audio_first: bool = False,
) -> bytes:
    """Mux (h, w) gray or (h, w, 3) RGB uint8 frames into MJPG-in-AVI.

    Every frame is its own baseline JFIF stream via jpeg_encode;
    quality=100 keeps solid frames byte-exact through decode.  All
    frames must share the first frame's geometry (the single-strf
    contract).  ``write_idx1=False`` produces a legacy no-index file
    for exercising the linear-walk fallback.  ``pcm`` (8-bit unsigned
    mono samples) adds a second 'auds' stream interleaved as '01wb'
    chunks between frames — the shape real crawl-scale A/V files have,
    which the VIDEO demux must skip both in the linear walk and
    through idx1 (frame entries filtered by ckid).  ``audio_first``
    writes the 'auds' strl BEFORE the 'vids' strl, so video data rides
    '01dc' (and audio '00wb') — the stream-order variant some muxers
    emit, which the demux must resolve via _vids_stream_index.
    """
    from .jpeg import jpeg_encode

    if not frames:
        raise ValueError("AVI: cannot mux zero frames")
    if rate <= 0 or scale <= 0:
        raise ValueError(f"AVI: bad frame clock {rate}/{scale}")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError(
                f"AVI: frame geometry {f.shape[:2]} != first frame {(h, w)}"
            )
        payloads.append(jpeg_encode(f, quality=quality, subsample=subsample))
    # split the PCM track into one interleaved chunk per video frame
    audio_chunks: list[bytes] = []
    if pcm is not None:
        n = len(payloads)
        step = max(1, (len(pcm) + n - 1) // n)
        audio_chunks = [pcm[i : i + step] for i in range(0, len(pcm), step)]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    max_bytes = max(len(p) for p in payloads)
    usec_per_frame = 1_000_000 * scale // rate
    n_streams = 2 if audio_chunks else 1
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * rate // scale, 0, 0x10,  # HASINDEX
        len(payloads), 0, n_streams, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
            len(payloads), max_bytes, 0xFFFFFFFF, 0,
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    if audio_first and not audio_chunks:
        raise ValueError("AVI: audio_first requires a pcm track")
    vid_ck = b"01dc" if audio_first else b"00dc"
    aud_ck = b"00wb" if audio_first else b"01wb"
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    if audio_chunks:
        astrh = (
            b"auds\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0,
                sum(len(c) for c in audio_chunks), max(
                    len(c) for c in audio_chunks
                ), 0xFFFFFFFF, 1,
            )
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        # WAVEFORMATEX: PCM (1), mono, 8-bit unsigned
        astrf = struct.pack(
            "<HHIIHH", 1, 1, audio_rate, audio_rate, 1, 8
        )
        astrl = lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
        strl = astrl + strl if audio_first else strl + astrl
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = bytearray()
    index_entries = []  # (ckid, offset rel. to the movi fourcc, length)
    for i, p in enumerate(payloads):
        index_entries.append((vid_ck, 4 + len(movi_body), len(p)))
        movi_body += chunk(vid_ck, p)
        if i < len(audio_chunks):
            a = audio_chunks[i]
            index_entries.append((aud_ck, 4 + len(movi_body), len(a)))
            movi_body += chunk(aud_ck, a)
    # ceil-split guarantees len(audio_chunks) <= len(payloads): every
    # audio chunk interleaves, none can trail the last frame
    movi = lst(b"movi", bytes(movi_body))
    idx = b""
    if write_idx1:
        entries = bytearray()
        for ckid, off, length in index_entries:
            # AVIIF_KEYFRAME: every MJPG frame is independently decodable
            entries += ckid + struct.pack("<III", 0x10, off, length)
        idx = chunk(b"idx1", bytes(entries))
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body
