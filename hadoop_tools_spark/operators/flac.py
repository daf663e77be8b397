"""Pure-Python FLAC decoder (free-lossless audio codec, RFC 9639 /
xiph.org format spec) for the multimodal decode seam.

FLAC is the lossless audio container a real crawl's audio corpus
actually carries (alongside WAV/MP3) — and losslessness is what makes
it ORACLE-GRADE here: decode is BIT-EXACT integer math, so a decoded
stream can be hash-compared against its raw-PCM (WAV) twin sample for
sample, the same strongest-oracle pattern as the lossless-JPEG↔PPM
keys. No float ever touches the sample path.

Coverage: 8/12/16/20/24/32-bit samples, all subframe types (CONSTANT,
VERBATIM, FIXED orders 0–4, LPC orders 1–32), both residual methods
(4-bit RICE, 5-bit RICE2) with partition orders and escape-coded
partitions, wasted-bits shifting, and all four channel assignments
(independent, left/side, right/side, mid/side). Integrity is verified
fail-closed at three layers: per-frame-header CRC-8, per-frame CRC-16,
and the STREAMINFO MD5 over the decoded interleaved PCM — any
mismatch or truncation raises ValueError (normalized by the
`decode_image`/`decode_audio` seam into `decode_ok=false` rows, never
task failures).

Like the sibling JPEG/GIF/WebP codecs this is an original
implementation of the public bitstream spec; the sandbox has no
reference FLAC binary, so conformance rests on the spec-derived
branch tests plus the encoder-independent MD5/CRC checks.
"""

from __future__ import annotations

import hashlib

import numpy as np

_BLOCKSIZE_TBL = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TBL = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader over bytes; every read bounds-checks so a
    truncated stream surfaces as ValueError, never a hang or IndexError."""

    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos  # absolute bit position

    def read(self, n: int) -> int:
        pos, b = self.pos, self.b
        if pos + n > len(b) * 8:
            raise ValueError("flac: truncated stream")
        v = 0
        while n:
            byte = b[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and (v >> (n - 1)) else v

    def unary(self) -> int:
        c = 0
        while self.read(1) == 0:
            c += 1
        return c

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = _CRC8_TBL[crc ^ byte]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TBL[(crc >> 8) ^ byte]
    return crc


def _mk_crc_tables():
    """Table-driven CRC-8 (poly 0x07) and CRC-16 (poly 0x8005).

    Deliberately a DIFFERENT construction from the fixture encoder's
    bitwise loops (tools/gen_media_fixtures.py): the polynomials are
    fixed by the spec, but an implementation bug here cannot be
    mirrored on the encoder side, so the twins' CRC agreement is
    evidence, not tautology."""
    t8, t16 = [], []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1)
        t8.append(c)
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1)
        t16.append(c & 0xFFFF)
    return t8, t16


_CRC8_TBL, _CRC16_TBL = _mk_crc_tables()


def _coded_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded frame/sample number."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("flac: bad coded number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("flac: partition count does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.sread(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("flac: subframe padding bit set")
    sftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")

    if sftype == 0:  # CONSTANT
        out = [bits.sread(bps)] * blocksize
    elif sftype == 1:  # VERBATIM
        out = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED, order 0-4
        order = sftype - 8
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        out = [bits.sread(bps) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif sftype >= 32:  # LPC, order 1-32
        order = (sftype & 31) + 1
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        out = [bits.sread(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [bits.sread(precision) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + (pred >> shift))
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """FLAC bytes → (sample_rate, n_channels, bits_per_sample,
    int32 samples shaped (n_samples, n_channels)). Raises ValueError
    on any truncation, CRC mismatch, reserved field, or a decoded
    stream whose PCM MD5 disagrees with STREAMINFO."""
    if blob[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    first_block = True
    while True:
        if pos + 4 > len(blob):
            raise ValueError("flac: truncated metadata")
        hdr = blob[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        body = blob[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("flac: truncated metadata block")
        if first_block and btype != 0:
            raise ValueError("flac: first metadata block must be STREAMINFO")
        first_block = False
        if btype == 0:
            if info is not None:
                raise ValueError("flac: duplicate STREAMINFO")
            if blen != 34:
                raise ValueError("flac: bad STREAMINFO length")
            # 144-bit layout: bs_min:16 bs_max:16 fs_min:24 fs_max:24
            # rate:20 channels-1:3 bps-1:5 total:36  (then 128-bit md5)
            v = int.from_bytes(body[:18], "big")
            info = {
                "max_blocksize": (v >> 112) & 0xFFFF,
                "sample_rate": (v >> 44) & 0xFFFFF,
                "channels": ((v >> 41) & 0x7) + 1,
                "bps": ((v >> 36) & 0x1F) + 1,
                "total": v & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("flac: zero sample rate")

    channels = [[] for _ in range(info["channels"])]
    n_done = 0
    n_frames = 0
    # total == 0 is legal "unknown" (streaming captures): decode
    # every frame present rather than stopping at a zero bound
    while pos < len(blob) and (
        info["total"] == 0 or n_done < info["total"]
    ):
        frame_start = pos
        bits = _Bits(blob, pos * 8)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if bits.read(1):
            raise ValueError("flac: reserved sync bit set")
        variable_bs = bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("flac: reserved header bit set")
        # contiguity: the coded number is the only sequence guard
        # when the MD5 is unknown — a reordered or duplicated frame
        # must not decode silently
        coded = _coded_number(bits)
        expect = n_done if variable_bs else n_frames
        if coded != expect:
            raise ValueError("flac: frame out of sequence")
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TBL[bs_code]
        # frame-header fields that duplicate STREAMINFO must AGREE
        # with it — STREAMINFO itself carries no CRC, so this
        # cross-check is what catches a flipped bit in either place
        if sr_code == 0:
            frame_rate = info["sample_rate"]
        elif sr_code in _RATE_TBL:
            frame_rate = _RATE_TBL[sr_code]
        elif sr_code == 12:
            frame_rate = bits.read(8) * 1000
        elif sr_code == 13:
            frame_rate = bits.read(16)
        elif sr_code == 14:
            frame_rate = bits.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        if frame_rate != info["sample_rate"]:
            raise ValueError("flac: frame rate disagrees with STREAMINFO")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code in _BPS_TBL:
            bps = _BPS_TBL[ss_code]
        else:
            raise ValueError("flac: reserved sample-size code")
        if bps != info["bps"]:
            raise ValueError("flac: frame bps disagrees with STREAMINFO")
        if info["max_blocksize"] and blocksize > info["max_blocksize"]:
            raise ValueError("flac: blocksize exceeds STREAMINFO maximum")
        bits.align()
        hdr_end = bits.pos // 8
        if _crc8(blob[frame_start:hdr_end]) != bits.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_subframe(bits, blocksize, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            # the SIDE channel carries one extra bit of precision
            b0 = bps + (1 if ch_code == 9 else 0)
            b1 = bps + (1 if ch_code in (8, 10) else 0)
            c0 = _subframe(bits, blocksize, b0)
            c1 = _subframe(bits, blocksize, b1)
            if ch_code == 8:  # left/side: right = left - side
                subs = [c0, [left - s for left, s in zip(c0, c1)]]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [[r + s for r, s in zip(c1, c0)], c1]
            else:  # mid/side
                left, right = [], []
                for mid, side in zip(c0, c1):
                    m = (mid << 1) | (side & 1)
                    left.append((m + side) >> 1)
                    right.append((m - side) >> 1)
                subs = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        if n_ch != info["channels"]:
            raise ValueError("flac: channel count mismatch")

        bits.align()
        crc_pos = bits.pos // 8
        if _crc16(blob[frame_start:crc_pos]) != bits.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = bits.pos // 8

        for ch, sub in zip(channels, subs):
            ch.extend(sub)
        n_done += blocksize
        n_frames += 1

    if info["total"] and n_done != info["total"]:
        raise ValueError("flac: sample count mismatch")
    if pos != len(blob):
        # fail-closed contract: trailing bytes after the last frame
        # (appended junk, a second stream, torn-container padding)
        # must not pass as a fully-verified file
        raise ValueError("flac: trailing bytes after final frame")
    out = (
        np.array(channels, dtype=np.int64).T.copy()
        if n_done
        else np.zeros((0, info["channels"]), dtype=np.int64)
    )
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if out.size and (out.min() < lo or out.max() > hi):
        raise ValueError("flac: sample out of range")
    if info["md5"] != b"\x00" * 16:
        width = (info["bps"] + 7) // 8
        dt = {1: "<i1", 2: "<i2", 3: None, 4: "<i4"}[width]
        if dt is None:  # 24-bit: pack by hand
            flat = out.reshape(-1)
            raw = b"".join(
                int(v).to_bytes(3, "little", signed=True) for v in flat
            )
        else:
            raw = out.astype(dt).tobytes()
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("flac: PCM MD5 mismatch")
    return info["sample_rate"], info["channels"], info["bps"], out
