"""Minimal baseline JPEG codec (pure Python + numpy).

Decoder for baseline sequential DCT JPEG (SOF0), 8-bit, Huffman-coded,
1-component greyscale or 3-component YCbCr without chroma subsampling
(4:4:4) — plus the matching encoder used to generate deterministic
fixtures (tools/gen_media_fixtures.py). Production corpora use a C
codec (PIL/libjpeg-turbo) behind the same :func:`decode_image` seam in
operators/multimodal.py; this implementation exists so the engine's
JPEG path is REAL and testable in a no-network sandbox.

Scope intentionally excluded: progressive scans, restart markers,
chroma subsampling, arithmetic coding, 12-bit precision — all raise.

Standard tables from ITU-T T.81 Annex K: quantization (scaled by the
usual libjpeg quality formula) and the example Huffman tables every
baseline encoder ships.
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
# encoder
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


def encode_jpeg(px: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, two quant +
    four Huffman tables, no subsampling)."""
    h, w = px.shape[:2]
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    ]

    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    bh, bwid = (h + 7) // 8, (w + 7) // 8
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bwid):
            for ci, comp in enumerate(comps):
                blk = np.zeros((8, 8))
                ys, xs = by * 8, bx * 8
                sub = comp[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge replication for partial blocks
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, :] = blk[sub.shape[0] - 1, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1][:, None]
                coef = _C @ blk @ _C.T
                q = qy if ci == 0 else qc
                quant = np.round(coef / q.reshape(8, 8)).astype(np.int32)
                preds[ci] = _encode_block(
                    bw_,
                    quant,
                    dc_y if ci == 0 else dc_c,
                    ac_y if ci == 0 else ac_c,
                    preds[ci],
                )
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table[ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy) + dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
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


def decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JFIF bytes → (width, height, (h, w, 3) uint8 RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, qtable id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, dc tid, ac tid)
    scan_data = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
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
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    payload, np.uint8, 64, p + 1
                ).astype(np.int32)
                qtables[prec_id & 0xF] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls_id = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                htrees[(cls_id >> 4, cls_id & 0xF)] = _decode_tree(bits, vals)
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            if payload[0] != 8:
                raise NotImplementedError("non-8-bit precision")
            h, w = struct.unpack_from(">HH", payload, 1)
            n_comp = payload[5]
            for ci in range(n_comp):
                cid, samp, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling")
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("non-baseline JPEG (SOF%d)" % (marker & 0xF))
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            n_sc = payload[0]
            for ci in range(n_sc):
                cid, tids = payload[1 + 2 * ci], payload[2 + 2 * ci]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tids >> 4, tids & 0xF))
            scan_data = blob[pos + seglen :]
            break
        pos += seglen
    if h is None or scan_data is None:
        raise ValueError("missing SOF0/SOS")

    br = _BitReader(scan_data)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bwid * 8)) for _ in comps]
    preds = [0] * len(comps)
    for by in range(bh):
        for bx in range(bwid):
            for (idx, dc_t, ac_t) in scan_comps:
                zz = np.zeros(64, dtype=np.int32)
                cat = _read_symbol(br, htrees[(0, dc_t)])
                diff = _extend(br.read_bits(cat), cat) if cat else 0
                preds[idx] += diff
                zz[0] = preds[idx]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, htrees[(1, ac_t)])
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
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz * qtables[comps[idx][2]][ZIGZAG]
                sp = _C.T @ blk.reshape(8, 8) @ _C
                planes[idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = sp

    if len(comps) == 1:
        y = np.clip(planes[0][:h, :w] + 128.0, 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2)
    y = planes[0][:h, :w] + 128.0
    cb = planes[1][:h, :w]
    cr = planes[2][:h, :w]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return w, h, (rgb + 0.5).astype(np.uint8)
