"""Minimal JPEG codec family (pure Python + numpy).

Decoder for Huffman-coded JPEG — baseline sequential (SOF0),
extended sequential (SOF1, 8- or 12-bit samples, 8- or 16-bit DQT),
progressive (SOF2, spectral selection + successive approximation),
AND lossless (SOF3, T.81 Annex H predictive coding, bit-exact) —
1-component greyscale or 3-component YCbCr with 4:4:4, 4:2:2, or
4:2:0 chroma sampling, and restart-interval support (DRI / RSTn).
Matching encoders (baseline with optional subsampling + restart
markers, a progressive encoder with per-scan optimal Huffman tables,
a 12-bit extended sequential encoder, and a lossless encoder covering
all seven predictors) generate the deterministic fixtures in
tools/gen_media_fixtures.py. Production corpora use a C codec
(PIL/libjpeg-turbo) behind the same :func:`decode_image` seam in
operators/multimodal.py; this implementation exists so the engine's
JPEG path is REAL and testable in a no-network sandbox.

Scope intentionally excluded: arithmetic coding (SOF9/SOF10/SOF11),
hierarchical (SOF5-7/SOF13-15) — all raise NotImplementedError so the
fault-tolerant decode path (multimodal.extract_features_tolerant)
flags the row instead of dying.

Standard tables from ITU-T T.81 Annex K: quantization (scaled by the
usual libjpeg quality formula) and the example Huffman tables every
baseline encoder ships. Progressive scan logic follows T.81 G.1.2 /
G.2 (the successive-approximation control flow is the same one every
public decoder implements).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: fdct(B) = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= np.sqrt(2.0 / 8)
_C[0] *= 1 / np.sqrt(2)

_SAMPLING = {"444": [(1, 1), (1, 1), (1, 1)],
             "422": [(2, 1), (1, 1), (1, 1)],
             "420": [(2, 2), (1, 1), (1, 1)]}


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) → {symbol: (code, length)} in canonical order."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# shared encoder plumbing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycc(px: np.ndarray):
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    return (
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    )


def _quant_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """8-aligned plane → (bh, bw, 8, 8) int32 quantized DCT blocks."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
    return np.round(coef / q.reshape(8, 8)).astype(np.int32)


def _component_coefs(px: np.ndarray, quality: int, subsample: str):
    """RGB array → per-component quantized coefficient grids sized to
    cover the full interleaved-MCU grid (partial blocks edge-padded),
    plus the sampling/table metadata the headers need."""
    h, w = px.shape[:2]
    hv = _SAMPLING[subsample]
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for plane, (hi, vi) in zip(_rgb_to_ycc(px), hv):
        if (hi, vi) != (hmax, vmax):
            fx, fy = hmax // hi, vmax // vi
            ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(plane)
    coefs = []
    for plane, (hi, vi), q in zip(planes, hv, [qy, qc, qc]):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        coefs.append(_quant_blocks(p, q))
    return coefs, hv, (qy, qc), (mcux, mcuy)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt(tid: int, table: np.ndarray) -> bytes:
    return _seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[ZIGZAG]))


def _dht(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return _seg(0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))


def _headers(marker: int, h: int, w: int, hv, qy, qc) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, qy) + _dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3]
        + [
            b
            for ci, (hi, vi) in enumerate(hv)
            for b in (ci + 1, hi << 4 | vi, 0 if ci == 0 else 1)
        ]
    )
    out += _seg(marker, sof)
    return bytes(out)


# --------------------------------------------------------------------------
# baseline encoder
# --------------------------------------------------------------------------


def _encode_block(bw, block, dc_codes, ac_codes, pred):
    zz = block.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    cat, bits = _magnitude(diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes.

    ``subsample``: "444" (no subsampling), "422", or "420" (chroma
    box-averaged 2×1 / 2×2 — the dominant production layout).
    ``restart_interval``: if > 0, emit DRI + an RSTn marker every N
    MCUs with DC-predictor resets (what camera firmware emits so a
    corrupted byte only loses one restart segment, not the image).
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    coefs, hv, (qy, qc), (mcux, mcuy) = _component_coefs(px, quality, subsample)

    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    bw_ = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw_.flush()
                bw_.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci in range(3):
                hi, vi = hv[ci]
                for by in range(vi):
                    for bx in range(hi):
                        preds[ci] = _encode_block(
                            bw_,
                            coefs[ci][my * vi + by, mx * hi + bx],
                            dc_y if ci == 0 else dc_c,
                            ac_y if ci == 0 else ac_c,
                            preds[ci],
                        )
            nmcu += 1
    bw_.flush()

    out = bytearray(_headers(0xFFC0, h, w, hv, qy, qc))
    out += _dht(0, 0, _DC_LUMA) + _dht(1, 0, _AC_LUMA)
    out += _dht(0, 1, _DC_CHROMA) + _dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# extended sequential 12-bit encoder (SOF1)
# --------------------------------------------------------------------------


def _dqt16(tid: int, table: np.ndarray) -> bytes:
    """DQT segment with Pq=1 (16-bit entries) — required once table
    values exceed 255, which 12-bit quantizers routinely do."""
    payload = bytes([0x10 | tid]) + b"".join(
        struct.pack(">H", int(x)) for x in table[ZIGZAG]
    )
    return _seg(0xFFDB, payload)


class _SeqOps:
    """Tagged op recorder for one interleaved sequential scan: pass 1
    collects per-table symbol frequencies (DC and AC symbols
    interleave inside each block, so unlike the progressive
    :class:`_ScanOps` the stream carries its table id), pass 2 replays
    the identical stream through the optimal canonical codes."""

    def __init__(self):
        self.ops: list[tuple] = []  # (tid, sym, 0) | (None, bits, n)
        self.freq: dict[str, list[int]] = {}

    def sym(self, tid: str, s: int) -> None:
        self.ops.append((tid, s, 0))
        self.freq.setdefault(tid, [0] * 256)[s] += 1

    def raw(self, bits: int, n: int) -> None:
        if n:
            self.ops.append((None, bits, n))

    def tables(self) -> dict[str, tuple[list[int], list[int]]]:
        return {tid: _optimal_table(f) for tid, f in self.freq.items()}

    def emit(self, bw: _BitWriter, codes) -> None:
        for tid, a, b in self.ops:
            if tid is None:
                bw.write(a, b)
            else:
                code, ln = codes[tid][a]
                bw.write(code, ln)


def _block_syms(ops: _SeqOps, dt: str, at: str, block, pred: int) -> int:
    """Sequential DC+AC coding of one quantized block into the
    recorder — the same run/magnitude structure as
    :func:`_encode_block`, precision-agnostic (categories above 11
    appear only in 12-bit streams; the recorder's optimal tables cover
    whatever actually occurs)."""
    zz = block.reshape(64)[ZIGZAG]
    cat, bits = _magnitude(int(zz[0]) - pred)
    ops.sym(dt, cat)
    ops.raw(bits, cat)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ops.sym(at, 0xF0)  # ZRL
            run -= 16
        cat, bits = _magnitude(v)
        ops.sym(at, (run << 4) | cat)
        ops.raw(bits, cat)
        run = 0
    if last < 63:
        ops.sym(at, 0x00)  # EOB
    return int(zz[0])


def encode_jpeg_ext12(px: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint16 RGB with 12-bit samples (0..4095) → extended
    sequential JFIF bytes (SOF1, precision 12, 4:4:4).

    The medical-imaging / high-bit-depth scan profile: 16-bit DQT
    entries (the 8-bit quantizers scaled ×16 to match the wider sample
    range, exactly libjpeg's convention), level shift 2^11, and
    per-image OPTIMAL Huffman tables — the Annex K example tables only
    cover magnitude categories through 11, while 12-bit DC differences
    reach category 15, so fixed tables cannot express the stream.
    """
    if px.dtype != np.uint16 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint16 RGB")
    if int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    h, w = px.shape[:2]
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    planes = (
        0.299 * r + 0.587 * g + 0.114 * b - 2048.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    )
    qy = np.clip(_quality_scale(_Q_LUMA, quality) * 16, 1, 65535)
    qc = np.clip(_quality_scale(_Q_CHROMA, quality) * 16, 1, 65535)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    coefs = []
    for plane, q in zip(planes, (qy, qc, qc)):
        p = np.pad(
            plane,
            ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
            mode="edge",
        )
        coefs.append(_quant_blocks(p, q))

    ops = _SeqOps()
    preds = [0, 0, 0]
    tids = [("dc0", "ac0"), ("dc1", "ac1"), ("dc1", "ac1")]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                preds[ci] = _block_syms(
                    ops, tids[ci][0], tids[ci][1],
                    coefs[ci][my, mx], preds[ci],
                )
    specs = ops.tables()
    codes = {tid: _canonical_codes(*spec) for tid, spec in specs.items()}
    bw = _BitWriter()
    ops.emit(bw, codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt16(0, qy) + _dqt16(1, qc)
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += _seg(0xFFC1, sof)
    out += _dht(0, 0, specs["dc0"]) + _dht(1, 0, specs["ac0"])
    out += _dht(0, 1, specs["dc1"]) + _dht(1, 1, specs["ac1"])
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# lossless codec (SOF3, T.81 Annex H)
# --------------------------------------------------------------------------


def _predict(psel: int, ra: int, rb: int, rc: int) -> int:
    """T.81 H.1.2.1 predictor formulas 1-7 (``>>`` is the arithmetic
    shift the spec's integer divisions compile to)."""
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise ValueError("bad lossless predictor %d" % psel)


def _lossless_pred(pl, y: int, x: int, psel: int, default: int) -> int:
    """H.1.2.2 initial conditions + predictor selection, shared by the
    encoder and decoder so the bit-exactness invariant has one home:
    scan start uses the precision midpoint, the rest of line 0 uses
    Ra, each later line starts from Rb, elsewhere the selected
    predictor applies."""
    if y == 0:
        return default if x == 0 else int(pl[0, x - 1])
    if x == 0:
        return int(pl[y - 1, 0])
    return _predict(
        psel, int(pl[y, x - 1]), int(pl[y - 1, x]), int(pl[y - 1, x - 1])
    )


def _decode_lossless_planes(precision, h, w, comps, scans):
    """Parsed SOF3 frame → (precision, point transform, [planes]) at
    FULL sample precision."""
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    pt_out = 0
    for scan in scans:
        if scan.dri:
            raise NotImplementedError("restart intervals in lossless scan")
        br = _BitReader(scan.data)
        psel, pt = scan.ss, scan.al
        pt_out = pt
        default = 1 << (precision - pt - 1)
        members = [(idx, scan.trees[(0, dc_t)]) for idx, dc_t, _ in scan.comps]
        for y in range(h):
            for x in range(w):
                for idx, tree in members:
                    cat = _read_symbol(br, tree)
                    if cat == 16:  # SSSS=16: diff 32768, no extra bits
                        diff = 32768
                    elif cat:
                        diff = _extend(br.read_bits(cat), cat)
                    else:
                        diff = 0
                    pl = planes[idx]
                    pred = _lossless_pred(pl, y, x, psel, default)
                    pl[y, x] = (pred + diff) & 0xFFFF  # mod-2^16 (H.1)
    return precision, pt_out, planes


def decode_lossless_planes(blob: bytes):
    """SOF3 bytes → (precision, point transform, [component planes])
    at FULL sample precision — the bit-exact surface the round-trip
    tests assert on (:func:`decode_jpeg` additionally normalizes to
    8-bit RGB)."""
    process, precision, h, w, comps, _, scans = _parse(blob)
    if process != "lossless":
        raise ValueError("not a lossless JPEG")
    return _decode_lossless_planes(precision, h, w, comps, scans)


def _decode_lossless(precision, pt, planes):
    """Normalize decoded lossless planes to the (w, h, uint8 RGB)
    contract: undo the point transform, then map precision P to 8 bits
    (``>> (P-8)`` for deep samples — same convention as the 12-bit DCT
    path)."""
    if len(planes) not in (1, 3):
        # 2- or 4-component lossless has no RGB interpretation; raise
        # so the tolerant seam FLAGS the row instead of emitting
        # plausible-but-wrong features from a malformed stack
        raise NotImplementedError(
            "%d-component lossless frame" % len(planes)
        )
    h, w = planes[0].shape
    out = []
    for pl in planes:
        v = pl << pt
        if precision > 8:
            v = v >> (precision - 8)
        elif precision < 8:
            v = v << (8 - precision)
        out.append(np.clip(v, 0, 255).astype(np.uint8))
    if len(out) == 1:
        return w, h, np.repeat(out[0][:, :, None], 3, axis=2)
    return w, h, np.stack(out, axis=2)


def encode_jpeg_lossless(px: np.ndarray, predictor: int = 1) -> bytes:
    """Image array → lossless JPEG (SOF3) bytes, BIT-EXACT on decode.

    ``px``: (h, w) greyscale or (h, w, 3) RGB; uint8 → precision 8,
    uint16 → precision 16 (differences run mod 2^16, exercising the
    SSSS=16 escape). Components are coded directly (no color
    transform — that is what keeps the codec lossless), one optimal
    Huffman table per component, a single interleaved scan with the
    chosen predictor (1-7) in Ss."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 components")
    if px.dtype == np.uint16:
        precision = 16
    elif px.dtype == np.uint8:
        precision = 8
    else:
        # an int64 array of 12-bit values would silently get an 8-bit
        # SOF3 precision byte and clip on decode — reject instead
        raise ValueError("expected uint8 or uint16 samples")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    default = 1 << (precision - 1)
    ops = _SeqOps()
    tids = ["c%d" % ci for ci in range(nc)]
    vals = px.astype(np.int64)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                pl = vals[:, :, ci]
                pred = _lossless_pred(pl, y, x, predictor, default)
                diff = (int(pl[y, x]) - pred) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                if diff == -32768:  # maps to the SSSS=16 escape
                    ops.sym(tids[ci], 16)
                else:
                    cat, bits = _magnitude(diff)
                    ops.sym(tids[ci], cat)
                    ops.raw(bits, cat)
    specs = ops.tables()
    codes = {tid: _canonical_codes(*spec) for tid, spec in specs.items()}
    bw = _BitWriter()
    ops.emit(bw, codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes(
        [nc] + [b for ci in range(nc) for b in (ci + 1, 0x11, 0)]
    )
    out += _seg(0xFFC3, sof)
    for ci in range(nc):
        out += _dht(0, ci, specs[tids[ci]])
    sos = bytes(
        [nc]
        + [b for ci in range(nc) for b in (ci + 1, ci << 4)]
        + [predictor, 0, 0]  # Ss=predictor, Se=0, Ah<<4|Al=0
    )
    out += _seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder
# --------------------------------------------------------------------------


def _optimal_table(freq: list[int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (BITS, HUFFVAL) per T.81 Annex K.2 (the
    same merge-least-frequent procedure libjpeg's optimizer uses).
    A pseudo-symbol 256 with frequency 1 reserves the all-ones code."""
    freq = freq + [1]
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = min(
            (i for i in range(257) if freq[i] > 0),
            key=lambda i: (freq[i], i),
            default=-1,
        )
        c2 = min(
            (i for i in range(257) if freq[i] > 0 and i != c1),
            key=lambda i: (freq[i], i),
            default=-1,
        )
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # limit code lengths to 16 (Annex K.3 adjust procedure)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # remove the reserved pseudo-symbol's code
    huffval = sorted(
        (i for i in range(256) if codesize[i]),
        key=lambda s: (codesize[s], s),
    )
    return bits[1:17], huffval


class _ScanOps:
    """Symbol/bit op recorder: pass 1 collects symbol frequencies so an
    optimal Huffman table can be built, pass 2 serializes the exact
    same op stream through it."""

    def __init__(self):
        self.ops: list[tuple[int, int, int]] = []  # (kind, a, b)

    def sym(self, s: int) -> None:
        self.ops.append((0, s, 0))

    def raw(self, bits: int, n: int) -> None:
        if n:
            self.ops.append((1, bits, n))

    def table(self) -> tuple[list[int], list[int]]:
        freq = [0] * 256
        for kind, a, _ in self.ops:
            if kind == 0:
                freq[a] += 1
        return _optimal_table(freq)

    def emit(self, bw: _BitWriter, codes) -> None:
        for kind, a, b in self.ops:
            if kind == 0:
                code, ln = codes[a]
                bw.write(code, ln)
            else:
                bw.write(a, b)


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncate toward zero)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_dc_first(ops: _ScanOps, zz, order, al: int) -> None:
    preds = [0, 0, 0]
    for ci, by, bx in order:
        v = int(zz[ci][by, bx, 0]) >> al  # DC uses arithmetic shift
        cat, bits = _magnitude(v - preds[ci])
        preds[ci] = v
        ops.sym(cat)
        ops.raw(bits, cat)


def _enc_dc_refine(ops: _ScanOps, zz, order, al: int) -> None:
    for ci, by, bx in order:
        ops.raw((int(zz[ci][by, bx, 0]) >> al) & 1, 1)


def _enc_ac_first(ops: _ScanOps, band_rows, ss, se, al) -> None:
    """band_rows: iterable of zigzag int arrays (one per block)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.sym(n << 4)
            ops.raw(eobrun - (1 << n), n)
            eobrun = 0

    for row in band_rows:
        vals = [_pt(int(row[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                flush()
            continue
        flush()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.sym(0xF0)
                run -= 16
            cat, bits = _magnitude(v)
            ops.sym((run << 4) | cat)
            ops.raw(bits, cat)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 32767:
                flush()
    flush()


def _enc_ac_refine(ops: _ScanOps, band_rows, ss, se, al) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): newly
    significant coefficients are run-length coded at ±1<<al; already
    significant ones ride along as buffered correction bits emitted
    after the next EOB-run flush."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next flush

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.sym(n << 4)
            ops.raw(eobrun - (1 << n), n)
            eobrun = 0
        for b in pending:
            ops.raw(b, 1)
        pending.clear()

    for row in band_rows:
        vals = [int(row[k]) for k in range(ss, se + 1)]
        absv = [_pt(abs(v), 0) >> al for v in vals]
        eob = 0
        for i, a in enumerate(absv):
            if a == 1:
                eob = i + 1  # 1 past the last newly-significant coef
        run = 0
        br: list[int] = []  # correction bits buffered in this block
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i < eob:
                flush()
                ops.sym(0xF0)
                run -= 16
                for b in br:
                    ops.raw(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush()
            ops.sym((run << 4) | 1)
            ops.raw(1 if vals[i] >= 0 else 0, 1)
            run = 0
            for b in br:
                ops.raw(b, 1)
            br = []
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 32767:
                flush()
    flush()


def encode_jpeg_progressive(px: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB → progressive JFIF (SOF2), 4:4:4.

    Scan script (libjpeg-style, exercising every progressive decode
    path): interleaved DC at Al=1, per-component AC in two spectral
    bands (1-5, 6-63) at Al=1, then the DC refinement scan and the
    matching AC refinement scans at Al=0. Every scan carries its own
    optimal Huffman table (Annex K tables lack the EOBn symbols
    progressive streams need)."""
    h, w = px.shape[:2]
    coefs, hv, (qy, qc), (mcux, mcuy) = _component_coefs(px, quality, "444")
    # zigzag-ordered coefficient vectors per block: (bh, bw, 64)
    zz = [c.reshape(c.shape[0], c.shape[1], 64)[:, :, ZIGZAG] for c in coefs]
    mcu_order = [
        (ci, my, mx)
        for my in range(mcuy)
        for mx in range(mcux)
        for ci in range(3)
    ]

    def blocks(ci):
        bh, bw = zz[ci].shape[:2]
        return (zz[ci][by, bx] for by in range(bh) for bx in range(bw))

    scans = []  # (comp list, ss, se, ah, al, ops)
    ops = _ScanOps()
    _enc_dc_first(ops, zz, mcu_order, 1)
    scans.append(([0, 1, 2], 0, 0, 0, 1, ops))
    for ci in range(3):
        for ss, se in ((1, 5), (6, 63)):
            ops = _ScanOps()
            _enc_ac_first(ops, blocks(ci), ss, se, 1)
            scans.append(([ci], ss, se, 0, 1, ops))
    ops = _ScanOps()
    _enc_dc_refine(ops, zz, mcu_order, 0)
    scans.append(([0, 1, 2], 0, 0, 1, 0, ops))
    for ci in range(3):
        for ss, se in ((1, 5), (6, 63)):
            ops = _ScanOps()
            _enc_ac_refine(ops, blocks(ci), ss, se, 0)
            scans.append(([ci], ss, se, 1, 0, ops))

    out = bytearray(_headers(0xFFC2, h, w, hv, qy, qc))
    for comp_ids, ss, se, ah, al, ops in scans:
        is_dc = ss == 0
        refinement = ah > 0
        if not refinement or not is_dc:
            # DC refinement scans are raw bits — no Huffman table
            if any(kind == 0 for kind, _, _ in ops.ops):
                spec = ops.table()
                out += _dht(0 if is_dc else 1, 0, spec)
                codes = _canonical_codes(*spec)
            else:
                codes = {}
        else:
            codes = {}
        head = bytes([len(comp_ids)])
        for ci in comp_ids:
            head += bytes([ci + 1, 0x00 if is_dc else 0x10])
        head += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, head)
        bw = _BitWriter()
        ops.emit(bw, codes)
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:  # unstuff
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2


def _decode_tree(bits, values):
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _read_symbol(br, tree):
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


class _Scan:
    def __init__(self, comps, ss, se, ah, al, data, dri, trees):
        self.comps = comps  # [(comp idx, dc tid, ac tid)]
        self.ss, self.se, self.ah, self.al = ss, se, ah, al
        self.data = data
        self.dri = dri
        self.trees = trees  # snapshot of (cls, tid) → decode tree


def _parse(blob: bytes):
    """Marker walk → (process, precision, h, w, comps, qtables, scans)
    where ``process`` is ``"baseline"`` (SOF0/SOF1), ``"progressive"``
    (SOF2), or ``"lossless"`` (SOF3)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    h = w = None
    process = "baseline"
    precision = 8
    dri = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, qid)
    scans: list[_Scan] = []
    while pos < len(blob) - 1:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the
            # stream before a marker code — skip one and re-anchor
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", blob, pos)
        payload = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                tbl = np.zeros(64, dtype=np.int32)
                if prec_id >> 4:  # Pq=1: 16-bit table entries
                    tbl[ZIGZAG] = (
                        np.frombuffer(payload, ">u2", 64, p + 1)
                        .astype(np.int32)
                    )
                    p += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(
                        payload, np.uint8, 64, p + 1
                    ).astype(np.int32)
                    p += 65
                qtables[prec_id & 0xF] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls_id = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                htrees[(cls_id >> 4, cls_id & 0xF)] = _decode_tree(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2/3
            precision = payload[0]
            # T.81: baseline (SOF0) is 8-bit only; extended sequential
            # (SOF1) and progressive (SOF2) allow 8 or 12; lossless
            # (SOF3) allows 2..16
            if marker == 0xC3:
                if not 2 <= precision <= 16:
                    raise ValueError("bad lossless precision")
            elif precision != 8 and (marker == 0xC0 or precision != 12):
                raise NotImplementedError(
                    "unsupported sample precision %d" % precision
                )
            process = {0xC0: "baseline", 0xC1: "baseline",
                       0xC2: "progressive", 0xC3: "lossless"}[marker]
            h, w = struct.unpack_from(">HH", payload, 1)
            n_comp = payload[5]
            for ci in range(n_comp):
                cid, samp, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(f"sampling factor {hi}x{vi}")
                if marker == 0xC3 and (hi, vi) != (1, 1):
                    raise NotImplementedError("subsampled lossless scan")
                comps.append((cid, hi, vi, qid))
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG process (SOF%d)" % (marker & 0xF)
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            n_sc = payload[0]
            scomps = []
            for ci in range(n_sc):
                cid, tids = payload[1 + 2 * ci], payload[2 + 2 * ci]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scomps.append((idx, tids >> 4, tids & 0xF))
            ss, se, ahl = payload[1 + 2 * n_sc : 4 + 2 * n_sc]
            # entropy span: up to the next marker that is not a stuffed
            # 0x00 or an RSTn
            p = pos + seglen
            while p < len(blob) - 1:
                if blob[p] == 0xFF and blob[p + 1] not in (0x00,) and not (
                    0xD0 <= blob[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scans.append(
                _Scan(
                    scomps, ss, se, ahl >> 4, ahl & 0xF,
                    blob[pos + seglen : p], dri, dict(htrees),
                )
            )
            pos = p
            continue
        pos += seglen
    if h is None or not scans:
        raise ValueError("missing SOF/SOS")
    return process, precision, h, w, comps, qtables, scans


def _mask_dc(v):
    # Clamp an accumulated DC prediction into the signed-16-bit coefficient
    # domain (T.81 DC categories reach at most SSSS=15 → |value| ≤ 32767, so
    # this is the identity on every valid stream).  Corrupt streams can walk
    # the Python-int accumulator arbitrarily far; without the mask the later
    # assignment into the int32 coefficient array would raise numpy's
    # out-of-bounds OverflowError instead of the codec's own ValueError paths.
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _decode_block_baseline(br, zz, dc_tree, ac_tree, preds, idx):
    cat = _read_symbol(br, dc_tree)
    diff = _extend(br.read_bits(cat), cat) if cat else 0
    preds[idx] = _mask_dc(preds[idx] + diff)
    zz[0] = preds[idx]
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tree)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        cat = sym & 0xF
        if k > 63:
            raise ValueError("AC index out of range")
        zz[k] = _extend(br.read_bits(cat), cat)
        k += 1


def _decode_ac_first(br, zz, tree, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(br, tree)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index out of range in progressive scan")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(br, zz, tree, ss, se, al, eobrun):
    """T.81 G.2 successive-approximation refinement (the jdphuff
    control flow: history coefficients absorb correction bits while
    runs count only zero-history positions)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, tree)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad refinement symbol")
                val = p1 if br.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray]:
    """JFIF bytes → (width, height, (h, w, 3) uint8 RGB).

    Handles baseline/extended sequential (SOF0/SOF1, 8- or 12-bit
    samples) and progressive (SOF2) processes, 4:4:4 / 4:2:2 / 4:2:0
    sampling, and restart intervals. Chroma is upsampled by sample
    replication (the standard fast path). 12-bit decodes are reduced
    to 8-bit output by dropping the 4 low bits (``v >> 4``) AFTER
    color conversion — the documented normalization the round-trip
    tests compare against (``source >> 4``). Lossless (SOF3) frames
    decode bit-exactly via the predictive path."""
    process, precision, h, w, comps, qtables, scans = _parse(blob)
    if process == "lossless":
        precision, pt, planes = _decode_lossless_planes(
            precision, h, w, comps, scans
        )
        return _decode_lossless(precision, pt, planes)
    if len(comps) not in (1, 3):
        # 2-component frames have no color interpretation; 4-component
        # (Adobe CMYK/YCCK) would decode "successfully" to garbage RGB
        # if the 4th plane were silently ignored — raise so the
        # tolerant seam FLAGS the row (same rule as the lossless path)
        raise NotImplementedError(
            "%d-component DCT frame" % len(comps)
        )
    progressive = process == "progressive"
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # zigzag-order coefficient store covering the full MCU grid
    coefs = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        for (_, hi, vi, _) in comps
    ]
    # per-component true block dims (non-interleaved scans use these):
    # ceil(ceil(dim * sampling / max_sampling) / 8)
    def _ceil8(dim, s, smax):
        return -(-(-(-dim * s // smax)) // 8)

    nb = [
        (_ceil8(h, vi, vmax), _ceil8(w, hi, hmax))
        for (_, hi, vi, _) in comps
    ]

    for scan in scans:
        br = _BitReader(scan.data)
        interleaved = len(scan.comps) > 1
        preds = [0] * len(comps)
        eobrun = 0
        if interleaved:
            units = [
                (my, mx) for my in range(mcuy) for mx in range(mcux)
            ]
        else:
            idx0 = scan.comps[0][0]
            bh, bw = nb[idx0]
            units = [(by, bx) for by in range(bh) for bx in range(bw)]
        nunit = 0
        for uy, ux in units:
            if scan.dri and nunit and nunit % scan.dri == 0:
                br.restart()
                preds = [0] * len(comps)
                eobrun = 0
            if interleaved:
                for (idx, dc_t, ac_t) in scan.comps:
                    _, hi, vi, _ = comps[idx]
                    for by in range(vi):
                        for bx in range(hi):
                            zz = coefs[idx][uy * vi + by, ux * hi + bx]
                            if not progressive:
                                _decode_block_baseline(
                                    br, zz,
                                    scan.trees[(0, dc_t)],
                                    scan.trees[(1, ac_t)],
                                    preds, idx,
                                )
                            elif scan.ss == 0 and scan.ah == 0:
                                cat = _read_symbol(br, scan.trees[(0, dc_t)])
                                diff = (
                                    _extend(br.read_bits(cat), cat)
                                    if cat
                                    else 0
                                )
                                preds[idx] = _mask_dc(preds[idx] + diff)
                                zz[0] = preds[idx] << scan.al
                            elif scan.ss == 0:
                                if br.read_bit():
                                    zz[0] |= 1 << scan.al
                            else:
                                raise ValueError(
                                    "interleaved AC scan in progressive"
                                )
            else:
                idx, dc_t, ac_t = scan.comps[0]
                zz = coefs[idx][uy, ux]
                if not progressive:
                    _decode_block_baseline(
                        br, zz,
                        scan.trees[(0, dc_t)], scan.trees[(1, ac_t)],
                        preds, idx,
                    )
                elif scan.ss == 0 and scan.ah == 0:
                    cat = _read_symbol(br, scan.trees[(0, dc_t)])
                    diff = _extend(br.read_bits(cat), cat) if cat else 0
                    preds[idx] = _mask_dc(preds[idx] + diff)
                    zz[0] = preds[idx] << scan.al
                elif scan.ss == 0:
                    if br.read_bit():
                        zz[0] |= 1 << scan.al
                elif scan.ah == 0:
                    eobrun = _decode_ac_first(
                        br, zz, scan.trees[(1, ac_t)],
                        scan.ss, scan.se, scan.al, eobrun,
                    )
                else:
                    eobrun = _decode_ac_refine(
                        br, zz, scan.trees[(1, ac_t)],
                        scan.ss, scan.se, scan.al, eobrun,
                    )
            nunit += 1
        if progressive and scan.ss == 0 and scan.se != 0:
            raise ValueError("invalid progressive scan script (Ss=0, Se>0)")

    # reconstruct: dequantize + IDCT per component (vectorized), then
    # upsample subsampled chroma by replication and color-convert
    planes = []
    for ci, (_, hi, vi, qid) in enumerate(comps):
        zz = coefs[ci]
        bh, bw = zz.shape[:2]
        qt = qtables[qid]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        # widen before the multiply: int32 coefficients × 16-bit DQT
        # entries (12-bit streams) can exceed 2^31 on hostile input and
        # would wrap silently instead of raising/clipping
        nat[:, :, ZIGZAG] = zz.astype(np.int64) * qt[ZIGZAG]
        blocks = nat.reshape(bh, bw, 8, 8)
        sp = np.einsum("ij,abik,kl->abjl", _C, blocks, _C)
        plane = sp.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if (hi, vi) != (hmax, vmax):
            ys = (np.arange(h) * vi) // vmax
            xs = (np.arange(w) * hi) // hmax
            plane = plane[ys][:, xs]
        else:
            plane = plane[:h, :w]
        planes.append(plane)

    level = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    shift = precision - 8
    if len(comps) == 1:
        y = np.clip(planes[0] + level, 0, maxv)
        # round half-up like the color path below (+0.5 before the
        # int cast) — truncating made grayscale up to 1 LSB darker
        # than the module's own 3-component convention
        y = ((y + 0.5).astype(np.int32) >> shift).astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2)
    y = planes[0] + level
    cb = planes[1]
    cr = planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, maxv)
    rgb = (rgb + 0.5).astype(np.int32) >> shift
    return w, h, rgb.astype(np.uint8)
