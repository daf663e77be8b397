"""REAL WebP-lossless (VP8L) codec — pure Python + numpy, no codec libs.

Decoder: RIFF container walk (VP8X-aware), full VP8L bitstream per the
public "WebP Lossless Bitstream Specification" (Google, 2012/2023 —
public document; implementation original): LSB-first bit reading,
simple and code-length-coded canonical prefix codes (incl. 16/17/18
repeats and the max_symbol shortcut), optional color cache, meta prefix
(entropy image) groups, LZ77 backward references with the 120-entry 2D
distance neighborhood map, and all four inverse transforms — predictor
(14 modes incl. Select and the two ClampAddSubtract variants), color
(signed cross-channel multipliers), subtract-green, and color-indexing
(with sub-byte pixel packing for palettes <= 16 colors).

Encoder (fixture generation + round-trip tests): emits valid VP8L
streams with package-merge length-limited canonical prefix codes
(simple two-symbol codes where the alphabet collapses), optional
subtract-green transform, optional color cache, optional palette
(color-indexing, incl. pixel packing), and optional distance-1 run
LZ77 — enough feature coverage that every decoder path above is
exercised by encoder→decoder round-trips rather than trusted on faith.

Lossy VP8 ('VP8 ' chunk) needs a full intra-frame predictor/DCT stack
and raises NotImplementedError — the graded tolerant-decode key
surfaces such files as flagged rows, never task failures.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# bit I/O — the VP8L stream is a little-endian bit sequence: value fields
# read LSB-first; prefix-code bits are written/read MSB-of-code-first as
# successive stream bits (the DEFLATE convention).
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.write_bit((value >> i) & 1)

    def write_bit(self, b: int) -> None:
        if self.bitpos & 7 == 0:
            self.bytes.append(0)
        if b:
            self.bytes[-1] |= 1 << (self.bitpos & 7)
        self.bitpos += 1

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write_bit((code >> i) & 1)

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side canonical prefix code; bit-by-bit tree walk."""

    def __init__(self, lengths: list[int]):
        nonzero = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nonzero:
            raise ValueError("empty prefix code")
        if len(nonzero) == 1:
            self.single = nonzero[0][0]
            self.table = None
            return
        self.single = None
        kraft = sum(2.0 ** -ln for _, ln in nonzero)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"incomplete/over-subscribed prefix code ({kraft})")
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        self.max_len = max(ln for _, ln in nonzero)

    def read_symbol(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        sym0 = br.read(8 if first_8 else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read_symbol(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if symbol >= alphabet_size:
                    raise ValueError("code-length repeat past alphabet")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("code-length repeat past alphabet")
    return _PrefixCode(lengths)


# --------------------------------------------------------------------------
# LZ77 helpers
# --------------------------------------------------------------------------

#: 120-entry 2D distance neighborhood (public spec table), packed as
#: (dy << 4) | (8 - dx): dist_code c (1-based) -> dy = t >> 4,
#: dx = 8 - (t & 0xf), dist = dy * xsize + dx (clamped >= 1).
_DIST_MAP = bytes(
    [
        0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
        0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
        0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
        0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
        0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
        0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
        0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
        0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
        0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
        0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
        0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
        0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
    ]
)


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    t = _DIST_MAP[dist_code - 1]
    dy, dx = t >> 4, 8 - (t & 0xF)
    return max(dy * xsize + dx, 1)


def _read_prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec 4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count); inverse of
    :func:`_read_prefix_value`."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

_PRED, _COLOR, _SUB_GREEN, _PALETTE = 0, 1, 2, 3


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: _BitReader, xsize: int, ysize: int) -> np.ndarray:
    """Entropy-coded sub-image (transform data / entropy image /
    palette): color cache allowed, no transforms, no meta prefix."""
    return _decode_image_data(br, xsize, ysize, is_level0=False)


def _decode_image_data(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
) -> np.ndarray:
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_img = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mx, my = _subsample(xsize, meta_bits), _subsample(ysize, meta_bits)
        meta_img = _decode_entropy_image(br, mx, my)
        # meta index lives in (red << 8) | green
        meta_idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta_idx.max()) + 1
        meta_img = meta_idx

    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    alphabet_sizes = (green_size, 256, 256, 256, 40)
    groups = [
        [_read_prefix_code(br, a) for a in alphabet_sizes]
        for _ in range(num_groups)
    ]

    n = xsize * ysize
    pixels = np.zeros(n, dtype=np.uint32)
    meta_xsize = _subsample(xsize, meta_bits) if meta_img is not None else 0
    pos = 0
    while pos < n:
        if meta_img is not None:
            x, y = pos % xsize, pos // xsize
            g = groups[
                meta_img[(y >> meta_bits) * meta_xsize + (x >> meta_bits)]
            ]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read_symbol(br)
        if s < 256:
            r = red_c.read_symbol(br)
            b = blue_c.read_symbol(br)
            a = alpha_c.read_symbol(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = argb
            pos += 1
            if cache is not None:
                cache[_cache_index(argb, cache_bits)] = argb
        elif s < 256 + 24:
            length = _read_prefix_value(br, s - 256)
            dist_code = _read_prefix_value(br, dist_c.read_symbol(br))
            dist = _map_distance(dist_code, xsize)
            if dist > pos or pos + length > n:
                raise ValueError("bad LZ77 backward reference")
            for _ in range(length):
                argb = int(pixels[pos - dist])
                pixels[pos] = argb
                pos += 1
                if cache is not None:
                    cache[_cache_index(argb, cache_bits)] = argb
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            pixels[pos] = cache[s - (256 + 24)]
            pos += 1
    return pixels


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _pred_bytes(argb: int) -> tuple[int, int, int, int]:
    return (argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    l4, t4, tl4, tr4 = (
        _pred_bytes(left), _pred_bytes(top), _pred_bytes(tl), _pred_bytes(tr)
    )
    if mode == 5:
        comps = [_avg2(_avg2(l4[i], tr4[i]), t4[i]) for i in range(4)]
    elif mode == 6:
        comps = [_avg2(l4[i], tl4[i]) for i in range(4)]
    elif mode == 7:
        comps = [_avg2(l4[i], t4[i]) for i in range(4)]
    elif mode == 8:
        comps = [_avg2(tl4[i], t4[i]) for i in range(4)]
    elif mode == 9:
        comps = [_avg2(t4[i], tr4[i]) for i in range(4)]
    elif mode == 10:
        comps = [
            _avg2(_avg2(l4[i], tl4[i]), _avg2(t4[i], tr4[i])) for i in range(4)
        ]
    elif mode == 11:  # Select
        p = [l4[i] + t4[i] - tl4[i] for i in range(4)]
        p_l = sum(abs(p[i] - l4[i]) for i in range(4))
        p_t = sum(abs(p[i] - t4[i]) for i in range(4))
        return left if p_l < p_t else top
    elif mode == 12:  # ClampAddSubtractFull
        comps = [_clamp(l4[i] + t4[i] - tl4[i]) for i in range(4)]
    elif mode == 13:  # ClampAddSubtractHalf (C trunc-toward-zero divide)
        comps = []
        for i in range(4):
            a = _avg2(l4[i], t4[i])
            d = a - tl4[i]
            half = d // 2 if d >= 0 else -((-d) // 2)
            comps.append(_clamp(a + half))
    else:
        raise ValueError(f"bad predictor mode {mode}")
    return (comps[0] << 24) | (comps[1] << 16) | (comps[2] << 8) | comps[3]


def _apply_inverse_predictor(
    pixels: np.ndarray, xsize: int, ysize: int, bits: int, sub: np.ndarray
) -> np.ndarray:
    bxs = _subsample(xsize, bits)
    out = pixels.astype(np.uint32).copy()
    for y in range(ysize):
        for x in range(xsize):
            pos = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[pos - 1])  # forced left
            elif x == 0:
                pred = int(out[pos - xsize])  # forced top
            else:
                mode = (int(sub[(y >> bits) * bxs + (x >> bits)]) >> 8) & 0xFF
                left = int(out[pos - 1])
                top = int(out[pos - xsize])
                tl = int(out[pos - xsize - 1])
                # spec addressing quirk: TR of the rightmost pixel is the
                # CURRENT row's leftmost pixel (pos - xsize + 1 in raster
                # order, already reconstructed) — no edge branch
                tr = int(out[pos - xsize + 1])
                pred = _predict(mode, left, top, tl, tr)
            # per-channel add mod 256
            res = int(out[pos])
            px = 0
            for shift in (24, 16, 8, 0):
                px |= (((res >> shift) + (pred >> shift)) & 0xFF) << shift
            out[pos] = px
    return out


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5, arithmetic shift (spec ColorTransformDelta)."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _apply_inverse_color(
    pixels: np.ndarray, xsize: int, ysize: int, bits: int, sub: np.ndarray
) -> np.ndarray:
    bxs = _subsample(xsize, bits)
    out = pixels.astype(np.uint32).copy()
    for y in range(ysize):
        for x in range(xsize):
            cp = int(sub[(y >> bits) * bxs + (x >> bits)])
            g2r = cp & 0xFF  # blue byte
            g2b = (cp >> 8) & 0xFF  # green byte
            r2b = (cp >> 16) & 0xFF  # red byte
            argb = int(out[y * xsize + x])
            a = (argb >> 24) & 0xFF
            r = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y * xsize + x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _apply_inverse_subtract_green(pixels: np.ndarray) -> np.ndarray:
    g = (pixels >> 8) & 0xFF
    r = (((pixels >> 16) & 0xFF) + g) & 0xFF
    b = ((pixels & 0xFF) + g) & 0xFF
    return (pixels & 0xFF00FF00) | (r << 16) | b


def _apply_inverse_palette(
    pixels: np.ndarray, w: int, h: int, palette: np.ndarray, width_bits: int
) -> np.ndarray:
    if width_bits:
        bpp = 8 >> width_bits  # bits per packed pixel
        packed_x = _subsample(w, width_bits)
        idx = np.zeros(w * h, dtype=np.int64)
        green = ((pixels >> 8) & 0xFF).astype(np.int64)
        for y in range(h):
            for x in range(w):
                packed = green[y * packed_x + (x >> width_bits)]
                shift = (x & ((1 << width_bits) - 1)) * bpp
                idx[y * w + x] = (packed >> shift) & ((1 << bpp) - 1)
    else:
        idx = ((pixels >> 8) & 0xFF).astype(np.int64)
    out = np.zeros(w * h, dtype=np.uint32)
    valid = idx < len(palette)  # out-of-range palette index -> 0x00000000
    out[valid] = palette[idx[valid]]
    return out


def decode_vp8l(payload: bytes) -> tuple[int, int, np.ndarray]:
    """VP8L chunk payload → (width, height, RGB array (h, w, 3))."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    transforms = []  # (type, data...), stream read order
    seen = set()
    cur_xsize = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate transform")
        seen.add(ttype)
        if ttype in (_PRED, _COLOR):
            bits = br.read(3) + 2
            sub = _decode_entropy_image(
                br, _subsample(cur_xsize, bits), _subsample(h, bits)
            )
            transforms.append((ttype, cur_xsize, bits, sub))
        elif ttype == _SUB_GREEN:
            transforms.append((ttype,))
        else:  # color indexing
            num_colors = br.read(8) + 1
            pal_deltas = _decode_entropy_image(br, num_colors, 1)
            # palette entries are component-wise deltas vs predecessor
            palette = np.zeros(num_colors, dtype=np.uint32)
            prev = 0
            for i in range(num_colors):
                d = int(pal_deltas[i])
                px = 0
                for shift in (24, 16, 8, 0):
                    px |= (((d >> shift) + (prev >> shift)) & 0xFF) << shift
                palette[i] = px
                prev = px
            if num_colors <= 2:
                width_bits = 3
            elif num_colors <= 4:
                width_bits = 2
            elif num_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, cur_xsize, palette, width_bits))
            cur_xsize = _subsample(cur_xsize, width_bits)

    pixels = _decode_image_data(br, cur_xsize, h, is_level0=True)

    for t in reversed(transforms):
        if t[0] == _PRED:
            _, txsize, bits, sub = t
            pixels = _apply_inverse_predictor(pixels, txsize, h, bits, sub)
        elif t[0] == _COLOR:
            _, txsize, bits, sub = t
            pixels = _apply_inverse_color(pixels, txsize, h, bits, sub)
        elif t[0] == _SUB_GREEN:
            pixels = _apply_inverse_subtract_green(pixels)
        else:
            _, txsize, palette, width_bits = t
            pixels = _apply_inverse_palette(pixels, txsize, h, palette, width_bits)

    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    grid = pixels.reshape(h, w)
    rgb[:, :, 0] = (grid >> 16) & 0xFF
    rgb[:, :, 1] = (grid >> 8) & 0xFF
    rgb[:, :, 2] = grid & 0xFF
    return w, h, rgb


def decode_webp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF container walk → VP8L decode (lossy VP8 raises).

    Declared sizes are VALIDATED against the actual byte count (r11
    fuzzer find: ignoring them silently accepted flipped RIFF/chunk
    size fields — a torn shard whose header lies must fail closed,
    same contract as the ZIP/tar walks)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size + 8 != len(blob):
        raise ValueError(
            f"RIFF size {riff_size} != file size {len(blob)} - 8"
        )
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if pos + 8 + size > len(blob):
            raise ValueError(f"chunk {tag!r} overruns the file")
        if tag == b"VP8L":
            return decode_vp8l(blob[pos + 8 : pos + 8 + size])
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 requires an intra-frame DCT decoder"
            )
        pos += 8 + size + (size & 1)  # chunks pad to even
    raise ValueError("no VP8L chunk in WebP container")


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _package_merge(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited canonical prefix code lengths (package-merge)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    items = sorted((freqs[s], s) for s in syms)
    packages = [(f, (s,)) for f, s in items]
    merged = list(packages)
    for _ in range(max_len - 1):
        paired = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(packages + paired)
    lengths = {s: 0 for s in syms}
    for _, group in merged[: 2 * (len(syms) - 1)]:
        for s in group:
            lengths[s] += 1
    return lengths


def _build_code(freqs: dict[int, int], max_len: int = 15) -> list[int]:
    """Histogram → canonical code-length list (0 = unused), with the
    all-equal-length degenerate case rebalanced so the code-length code
    always has >= 2 distinct non-zero symbols (a single-symbol CL code
    is not a complete prefix code)."""
    if not freqs:
        raise ValueError("empty histogram")
    lengths_map = _package_merge(freqs, max_len)
    n = max(lengths_map) + 1
    lengths = [0] * n
    for s, ln in lengths_map.items():
        lengths[s] = ln
    used = sorted({ln for ln in lengths if ln})
    if len(used) == 1 and len(lengths_map) > 2:
        # flat code (e.g. 256 x len-8): split one symbol down, two up —
        # Kraft stays exactly 1
        ln = used[0]
        nz = [s for s, v in enumerate(lengths) if v]
        lengths[nz[0]] = ln - 1
        lengths[nz[-1]] = ln + 1
        lengths[nz[-2]] = ln + 1
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
    if len(nz) <= 2 and all(s <= 255 for s, _ in nz):
        bw.write_bit(1)  # simple
        bw.write(len(nz) - 1, 1)
        sym0 = nz[0][0]
        if sym0 <= 1 and len(nz) == 1:
            bw.write(0, 1)
            bw.write(sym0, 1)
        else:
            bw.write(1, 1)
            bw.write(sym0, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write_bit(0)
    max_symbol = nz[-1][0] + 1
    cl_freqs: dict[int, int] = {}
    for ln in lengths[:max_symbol]:
        cl_freqs[ln] = cl_freqs.get(ln, 0) + 1
    cl_lengths_map = (
        {next(iter(cl_freqs)): 1}
        if len(cl_freqs) == 1
        else _package_merge(cl_freqs, 7)
    )
    if len(cl_freqs) == 1:
        # a single-symbol CL code is incomplete; force a second symbol
        only = next(iter(cl_freqs))
        other = 0 if only != 0 else 1
        cl_lengths_map = {only: 1, other: 1}
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    num_code_lengths = max(
        (i + 1 for i, s in enumerate(_CL_ORDER) if cl_lengths[s]), default=4
    )
    num_code_lengths = max(num_code_lengths, 4)
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    # max_symbol shortcut: emit exactly max_symbol CL symbols
    bw.write_bit(1)
    nbits_sel = 0
    while (1 << (2 + 2 * nbits_sel)) <= max_symbol - 2:
        nbits_sel += 1
    bw.write(nbits_sel, 3)
    bw.write(max_symbol - 2, 2 + 2 * nbits_sel)
    for ln in lengths[:max_symbol]:
        code, cln = cl_codes[ln]
        bw.write_code(code, cln)


def _forward_predictor(
    argb: np.ndarray, xsize: int, ysize: int, bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """Residual image + mode sub-image; modes cycle 0..13 per block so
    every predictor branch is inside the round-trip."""
    bxs, bys = _subsample(xsize, bits), _subsample(ysize, bits)
    sub = np.zeros(bxs * bys, dtype=np.uint32)
    for i in range(bxs * bys):
        sub[i] = 0xFF000000 | ((i % 14) << 8)
    res = np.zeros_like(argb)
    for y in range(ysize):
        for x in range(xsize):
            pos = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[pos - 1])
            elif x == 0:
                pred = int(argb[pos - xsize])
            else:
                mode = (int(sub[(y >> bits) * bxs + (x >> bits)]) >> 8) & 0xFF
                pred = _predict(
                    mode,
                    int(argb[pos - 1]),
                    int(argb[pos - xsize]),
                    int(argb[pos - xsize - 1]),
                    int(argb[pos - xsize + 1]),
                )
            orig = int(argb[pos])
            px = 0
            for shift in (24, 16, 8, 0):
                px |= (((orig >> shift) - (pred >> shift)) & 0xFF) << shift
            res[pos] = px
    return res, sub


def _forward_color(
    argb: np.ndarray, xsize: int, ysize: int, bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """Color-transform residuals with deterministic per-block signed
    multipliers (varied so positive and negative deltas both occur)."""
    bxs, bys = _subsample(xsize, bits), _subsample(ysize, bits)
    sub = np.zeros(bxs * bys, dtype=np.uint32)
    for i in range(bxs * bys):
        g2r = (i * 37 + 5) & 0xFF
        g2b = (i * 89 + 130) & 0xFF
        r2b = (i * 53 + 200) & 0xFF
        sub[i] = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    res = np.zeros_like(argb)
    for y in range(ysize):
        for x in range(xsize):
            cp = int(sub[(y >> bits) * bxs + (x >> bits)])
            g2r, g2b, r2b = cp & 0xFF, (cp >> 8) & 0xFF, (cp >> 16) & 0xFF
            v = int(argb[y * xsize + x])
            a, r, g, b = (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF
            # decoder reconstructs red first, then uses FINAL red for blue
            r_res = (r - _ct_delta(g2r, g)) & 0xFF
            b_res = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            res[y * xsize + x] = (a << 24) | (r_res << 16) | (g << 8) | b_res
    return res, sub


def encode_webp_lossless(
    rgb: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    palette: bool = False,
    lz77_runs: bool = False,
    predictor_bits: int | None = None,
    color_bits: int | None = None,
    meta_bits: int | None = None,
) -> bytes:
    """RGB array (h, w, 3) → lossless .webp bytes.

    Optional paths exist to exercise every decoder branch in
    round-trip tests: subtract-green / predictor (all 14 modes) /
    color transforms, color cache, palette (color-indexing with pixel
    packing for small palettes), meta-prefix groups, and distance-1
    run-length LZ77 (emitted as plain distance codes). Palette is
    mutually exclusive with the pixel-domain transforms.
    """
    h, w, _ = rgb.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        # VP8L stores dim-1 in 14-bit fields; _BitWriter would silently
        # truncate larger values into a corrupt-but-parseable stream
        raise ValueError("VP8L dimensions must be in 1..16384")
    argb = (
        (np.uint32(0xFF) << 24)
        | (rgb[:, :, 0].astype(np.uint32) << 16)
        | (rgb[:, :, 1].astype(np.uint32) << 8)
        | rgb[:, :, 2].astype(np.uint32)
    ).ravel()

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    pal_arr = None
    width_bits = 0
    if palette:
        pal_arr = np.unique(argb)
        if len(pal_arr) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        if len(pal_arr) <= 2:
            width_bits = 3
        elif len(pal_arr) <= 4:
            width_bits = 2
        elif len(pal_arr) <= 16:
            width_bits = 1
        lut = {int(c): i for i, c in enumerate(pal_arr)}
        idx = np.array([lut[int(c)] for c in argb], dtype=np.uint32)
        bw.write_bit(1)
        bw.write(_PALETTE, 2)
        bw.write(len(pal_arr) - 1, 8)
        deltas = []
        prev = 0
        for c in pal_arr:
            c = int(c)
            d = 0
            for shift in (24, 16, 8, 0):
                d |= (((c >> shift) - (prev >> shift)) & 0xFF) << shift
            deltas.append(d)
            prev = c
        _encode_image_data(
            bw,
            np.array(deltas, dtype=np.uint32),
            len(pal_arr),
            0,
            False,
            is_level0=False,
        )
        if width_bits:
            bpp = 8 >> width_bits
            packed_x = _subsample(w, width_bits)
            packed = np.zeros(packed_x * h, dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    shift = (x & ((1 << width_bits) - 1)) * bpp
                    packed[y * packed_x + (x >> width_bits)] |= (
                        int(idx[y * w + x]) << shift
                    )
            coded = (np.uint32(0xFF) << 24) | (packed << 8)
            cur_xsize = packed_x
        else:
            coded = (np.uint32(0xFF) << 24) | (idx << 8)
            cur_xsize = w
        argb = coded.ravel()
    else:
        cur_xsize = w
        if subtract_green:
            bw.write_bit(1)
            bw.write(_SUB_GREEN, 2)
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        if color_bits is not None:
            bw.write_bit(1)
            bw.write(_COLOR, 2)
            bw.write(color_bits - 2, 3)
            argb, sub = _forward_color(argb, w, h, color_bits)
            _encode_image_data(
                bw, sub, _subsample(w, color_bits), 0, False, is_level0=False
            )
        if predictor_bits is not None:
            # written LAST so its inverse runs FIRST at decode time —
            # prediction happens in the (possibly transformed) domain
            bw.write_bit(1)
            bw.write(_PRED, 2)
            bw.write(predictor_bits - 2, 3)
            argb, sub = _forward_predictor(argb, w, h, predictor_bits)
            _encode_image_data(
                bw, sub, _subsample(w, predictor_bits), 0, False, is_level0=False
            )

    bw.write_bit(0)  # end of transforms
    if meta_bits is not None:
        _encode_image_data_meta(bw, argb, cur_xsize, h, cache_bits, meta_bits)
    else:
        _encode_image_data(bw, argb, cur_xsize, cache_bits, lz77_runs)

    payload = bw.getvalue()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_image_data_meta(
    bw: _BitWriter,
    argb: np.ndarray,
    xsize: int,
    ysize: int,
    cache_bits: int,
    meta_bits: int,
) -> None:
    """Level-0 image with TWO prefix-code groups in a checkerboard of
    (1 << meta_bits)-sized blocks — exercises the decoder's meta-prefix
    (entropy image) group lookup. Literals only."""
    if cache_bits:
        raise ValueError("meta demo encoder is literal-only (no cache)")
    bw.write_bit(0)  # no color cache
    bw.write_bit(1)  # meta prefix present
    bw.write(meta_bits - 2, 3)
    mx, my = _subsample(xsize, meta_bits), _subsample(ysize, meta_bits)
    # the DECODER derives the group count as max(meta index) + 1, so an
    # image that fits in one meta block has exactly ONE group — writing
    # two would desync the stream (caught by review: 4x4 @ meta_bits=2)
    num_groups = 2 if mx * my >= 2 else 1
    meta_img = np.zeros(mx * my, dtype=np.uint32)
    for by in range(my):
        for bx in range(mx):
            gidx = ((bx + by) & 1) if num_groups == 2 else 0
            meta_img[by * mx + bx] = 0xFF000000 | (gidx << 8)
    _encode_image_data(bw, meta_img, mx, 0, False, is_level0=False)

    group_of = np.zeros(len(argb), dtype=np.int64)
    for y in range(ysize):
        for x in range(xsize):
            gidx = (
                ((x >> meta_bits) + (y >> meta_bits)) & 1
                if num_groups == 2
                else 0
            )
            group_of[y * xsize + x] = gidx
    per_group = []
    for gidx in range(num_groups):
        hist = {"g": {}, "r": {}, "b": {}, "a": {}}
        for pos in np.nonzero(group_of == gidx)[0]:
            v = int(argb[pos])
            for k, val in (
                ("g", (v >> 8) & 0xFF), ("r", (v >> 16) & 0xFF),
                ("b", v & 0xFF), ("a", (v >> 24) & 0xFF),
            ):
                hist[k][val] = hist[k].get(val, 0) + 1
        if not hist["g"]:  # group empty (image smaller than 2 blocks)
            hist = {k: {0: 1} for k in hist}
        lengths = {k: _build_code(h) for k, h in hist.items()}
        lengths["d"] = _build_code({0: 1})
        for k in ("g", "r", "b", "a", "d"):
            _write_prefix_code(bw, lengths[k])
        per_group.append({k: _canonical_codes(v) for k, v in lengths.items()})

    def emit(codes, sym):
        if len(codes) == 1:
            return
        code, ln = codes[sym]
        bw.write_code(code, ln)

    for pos in range(len(argb)):
        codes = per_group[group_of[pos]]
        v = int(argb[pos])
        emit(codes["g"], (v >> 8) & 0xFF)
        emit(codes["r"], (v >> 16) & 0xFF)
        emit(codes["b"], v & 0xFF)
        emit(codes["a"], (v >> 24) & 0xFF)


def _encode_image_data(
    bw: _BitWriter,
    argb: np.ndarray,
    xsize: int,
    cache_bits: int,
    lz77_runs: bool,
    is_level0: bool = True,
) -> None:
    n = len(argb)
    # tokenize: ('lit', argb) | ('cache', idx) | ('copy', length)
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n_copies = 0
    while i < n:
        px = int(argb[i])
        if lz77_runs and i > 0 and px == int(argb[i - 1]):
            run = 1
            while i + run < n and int(argb[i + run]) == px and run < 4095:
                run += 1  # 24 length codes cover values < 4096
            if run >= 3:
                # alternate the two encodings of distance 1 so decode
                # round-trips exercise BOTH the 2D neighborhood map
                # (code 2 = (dx 1, dy 0)) and the plain >120 form
                dist_code = 2 if n_copies % 2 == 0 else 121
                n_copies += 1
                tokens.append(("copy", (run, dist_code)))
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                i += run
                continue
        if cache is not None:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append(("cache", ci))
                i += 1
                continue
            cache[ci] = px
        tokens.append(("lit", px))
        i += 1

    green_f: dict[int, int] = {}
    red_f: dict[int, int] = {}
    blue_f: dict[int, int] = {}
    alpha_f: dict[int, int] = {}
    dist_f: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "lit":
            green_f[(v >> 8) & 0xFF] = green_f.get((v >> 8) & 0xFF, 0) + 1
            red_f[(v >> 16) & 0xFF] = red_f.get((v >> 16) & 0xFF, 0) + 1
            blue_f[v & 0xFF] = blue_f.get(v & 0xFF, 0) + 1
            alpha_f[(v >> 24) & 0xFF] = alpha_f.get((v >> 24) & 0xFF, 0) + 1
        elif kind == "cache":
            s = 256 + 24 + v
            green_f[s] = green_f.get(s, 0) + 1
        else:
            code, _, _ = _prefix_encode(v[0])
            green_f[256 + code] = green_f.get(256 + code, 0) + 1
            dcode, _, _ = _prefix_encode(v[1])
            dist_f[dcode] = dist_f.get(dcode, 0) + 1

    if not red_f:  # all tokens cache/copy: codes still must exist
        red_f, blue_f, alpha_f = {0: 1}, {0: 1}, {0: 1}
    if not dist_f:
        dist_f = {0: 1}

    if cache_bits:
        bw.write_bit(1)
        bw.write(cache_bits, 4)
    else:
        bw.write_bit(0)
    if is_level0:
        bw.write_bit(0)  # no meta prefix; sub-images never have this bit

    lengths = {
        "green": _build_code(green_f),
        "red": _build_code(red_f),
        "blue": _build_code(blue_f),
        "alpha": _build_code(alpha_f),
        "dist": _build_code(dist_f),
    }
    for k in ("green", "red", "blue", "alpha", "dist"):
        _write_prefix_code(bw, lengths[k])
    codes = {k: _canonical_codes(v) for k, v in lengths.items()}

    def emit(table: str, sym: int) -> None:
        code_map = codes[table]
        if len(code_map) == 1:
            return  # single-symbol code: 0 bits
        code, ln = code_map[sym]
        bw.write_code(code, ln)

    for kind, v in tokens:
        if kind == "lit":
            emit("green", (v >> 8) & 0xFF)
            emit("red", (v >> 16) & 0xFF)
            emit("blue", v & 0xFF)
            emit("alpha", (v >> 24) & 0xFF)
        elif kind == "cache":
            emit("green", 256 + 24 + v)
        else:
            code, extra_v, extra_n = _prefix_encode(v[0])
            emit("green", 256 + code)
            bw.write(extra_v, extra_n)
            dcode, dextra_v, dextra_n = _prefix_encode(v[1])
            emit("dist", dcode)
            bw.write(dextra_v, dextra_n)
