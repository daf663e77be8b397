"""Baseline TIFF 6.0 codec — original implementation of the public
bitstream spec (Adobe TIFF 6.0, 1992; no reference code consulted —
the upstream reference repo is an HDFS client and contains no codecs).

Scope (the "baseline RGB" profile real dataset scans produce):
- both byte orders (``II`` little-endian, ``MM`` big-endian);
- chunky RGB, 8 bits/sample, SamplesPerPixel 3;
- multi-strip images (RowsPerStrip < height) — strip re-assembly is
  where naive readers break;
- Compression 1 (none), 32773 (PackBits RLE, TIFF §9), and 5 (LZW,
  TIFF §13: MSB-first bit packing, 9-bit start, ClearCode 256,
  EOI 257, EARLY-CHANGE code widening — the variant real scans use),
  with Predictor 2 (horizontal differencing, tag 317);
- the inline-vs-offset IFD value rule (a tag's value lives IN the
  12-byte entry when it fits in 4 bytes, behind an offset otherwise)
  — the classic TIFF-reader gotcha, exercised by both fixture sizes.

Like every codec in this repo, the encoder exists so the decoder is
ROUND-TRIP-PROVEN (and the committed fixtures are pixel-identical
twins of ``img_{i}.ppm``, so the query key's oracle matches full pixel
statistics — the strongest oracle class, same as lossless JPEG).

Supported photometrics: RGB (2), bilevel/grayscale (0/1, replicated
to RGB), and palette-color (3, 256-entry ColorMap lookup with the
16-bit→8-bit ``>> 8`` scale). Unsupported constructs (tiled TIFFs,
other compressions, planar config 2, other bit depths) raise
``NotImplementedError`` / ``ValueError`` for the tolerant-decode
seam, never a silent wrong image.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _RPS, _STRIP_CNT, _PLANAR = 273, 277, 278, 279, 284
_TILE_W, _TILE_L, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_PREDICTOR, _COLORMAP = 317, 320

_TYPE_SIZE = {3: 2, 4: 4}  # SHORT, LONG — all this profile needs


def _packbits_encode(data: bytes) -> bytes:
    """TIFF §9 PackBits: runs ≥2 become (257-n, byte); literals chunk
    at 128. Deterministic and worst-case-bounded (+1/128 overhead)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expect:
        if i >= n:
            raise ValueError("PackBits stream truncated")
        ctl = data[i]
        i += 1
        if ctl < 128:  # ctl+1 literal bytes
            if i + ctl + 1 > n:
                raise ValueError("PackBits literal overruns strip")
            out.extend(data[i : i + ctl + 1])
            i += ctl + 1
        elif ctl > 128:  # repeat next byte 257-ctl times
            if i >= n:
                raise ValueError("PackBits run overruns strip")
            out.extend(data[i : i + 1] * (257 - ctl))
            i += 1
        # ctl == 128: no-op, per spec
    if len(out) != expect:
        raise ValueError("PackBits output overshoots strip size")
    return bytes(out)




_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_encode(data: bytes) -> bytes:
    """TIFF §13 LZW writer (MSB-first, early-change): exists so the
    decoder is round-trip-proven, like every encoder in this repo."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    put(_LZW_CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EARLY CHANGE: widen when next_code == 2^width - 1 (one
        # entry before the table is actually full)
        if next_code == (1 << width) - 1:
            if width == 12:
                put(_LZW_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code, width = 258, 9
            else:
                width += 1
        w = bytes([ch])
    if w:
        put(table[w], width)
    put(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF §13 LZW reader (MSB-first, early-change)."""
    out = bytearray()
    acc = nbits = pos = 0
    width = 9

    def get() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expect:
        code = get()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        # early change, mirroring the writer — the decoder's table
        # lags the encoder by ONE entry (it can only build an entry
        # after seeing the next code), so it widens at 2^width - 2
        # where the writer widens at 2^width - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError("LZW output size mismatch")
    return bytes(out)


def _predict2_encode(raw: bytes, w: int) -> bytes:
    """Predictor 2 (horizontal differencing): each sample becomes the
    delta from the same sample one pixel left, mod 256, per row."""
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, w, 3).astype(np.int16)
    d = a.copy()
    d[:, 1:, :] = (a[:, 1:, :] - a[:, :-1, :]) % 256
    return d.astype(np.uint8).tobytes()


def _predict2_decode_gray(raw: bytes, w: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, w)
    return np.cumsum(a, axis=1, dtype=np.int64).astype(np.uint8).tobytes()


def _predict2_decode(raw: bytes, w: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, w, 3)
    return np.cumsum(a, axis=1, dtype=np.int64).astype(np.uint8).tobytes()


def encode_tiff(
    px: np.ndarray,
    byteorder: str = "<",
    rows_per_strip: int | None = None,
    packbits: bool = False,
    compression: str | None = None,
    predictor: int = 1,
    tiles: tuple[int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 → baseline TIFF. ``byteorder`` '<' writes II,
    '>' writes MM; ``rows_per_strip`` defaults to whole-image;
    ``compression`` in {"none", "packbits", "lzw"} (``packbits=True``
    is the legacy spelling); ``predictor=2`` applies horizontal
    differencing before compression (only meaningful with lzw).
    ``tiles=(tw, tl)`` writes a TILED file (TIFF 6.0 §15: tags
    322/323/324/325 instead of the strip tags; edge tiles padded to
    the full tile size; tile dims multiples of 16 per spec)."""
    if tiles is not None:
        return _encode_tiff_tiled(
            px, byteorder, compression or "none", predictor, tiles
        )
    comp = compression or ("packbits" if packbits else "none")
    h, w, _ = px.shape
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps
    strips = []
    for s in range(n_strips):
        raw = px[s * rps : (s + 1) * rps].tobytes()
        if predictor == 2:
            raw = _predict2_encode(raw, w)
        if comp == "packbits":
            raw = _packbits_encode(raw)
        elif comp == "lzw":
            raw = _lzw_encode(raw)
        strips.append(raw)

    bo = byteorder
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    u16, u32 = bo + "H", bo + "I"

    # layout: header(8) | BPS array(6) | strip offsets | strip counts |
    #         strip data | IFD
    pos = 8
    bps_off = pos
    pos += 6
    so_off, sc_off = None, None
    if n_strips > 2:  # LONG arrays >4 bytes go behind offsets
        so_off = pos
        pos += 4 * n_strips
        sc_off = pos
        pos += 4 * n_strips
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos + (pos & 1)  # keep the IFD word-aligned

    def entry(tag, typ, cnt, val, inline_short=False):
        e = struct.pack(u16, tag) + struct.pack(u16, typ) + struct.pack(
            u32, cnt
        )
        if inline_short:  # one SHORT, left-justified in the 4 bytes
            # inline values are left-justified in the 4 bytes
            # regardless of byte order (TIFF 6.0 §2)
            return e + struct.pack(u16, val) + b"\x00\x00"
        return e + struct.pack(u32, val)

    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[comp]
    n_ifd = 10 + (1 if predictor == 2 else 0)
    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        entry(_BPS, 3, 3, bps_off),
        entry(_COMP, 3, 1, comp_tag, inline_short=True),
        entry(_PHOTO, 3, 1, 2, inline_short=True),
    ]
    if n_strips == 1:
        entries.append(entry(_STRIP_OFF, 4, 1, strip_offsets[0]))
    elif n_strips == 2:  # two LONGs (8 B) exceed the 4-B inline slot
        so_off = ifd_off + 2 + 12 * n_ifd + 4
        entries.append(entry(_STRIP_OFF, 4, 2, so_off))
    else:
        entries.append(entry(_STRIP_OFF, 4, n_strips, so_off))
    entries.append(entry(_SPP, 3, 1, 3, inline_short=True))
    entries.append(entry(_RPS, 4, 1, rps))
    if n_strips == 1:
        entries.append(entry(_STRIP_CNT, 4, 1, len(strips[0])))
    elif n_strips == 2:
        sc_off = ifd_off + 2 + 12 * n_ifd + 4 + 8
        entries.append(entry(_STRIP_CNT, 4, 2, sc_off))
    else:
        entries.append(entry(_STRIP_CNT, 4, n_strips, sc_off))
    entries.append(entry(_PLANAR, 3, 1, 1, inline_short=True))
    if predictor == 2:
        entries.append(entry(_PREDICTOR, 3, 1, 2, inline_short=True))
    assert len(entries) == n_ifd
    entries.sort(key=lambda e: struct.unpack(u16, e[:2])[0])

    out = bytearray()
    out += magic + struct.pack(u32, ifd_off)
    out += struct.pack(bo + "HHH", 8, 8, 8)
    if n_strips > 2:
        for o in strip_offsets:
            out += struct.pack(u32, o)
        for s in strips:
            out += struct.pack(u32, len(s))
    for s in strips:
        out += s
    if len(out) & 1:
        out += b"\x00"
    assert len(out) == ifd_off
    out += struct.pack(u16, len(entries))
    for e in entries:
        out += e
    out += struct.pack(u32, 0)  # next-IFD terminator
    if n_strips == 2:  # trailing LONG arrays after the IFD
        for o in strip_offsets:
            out += struct.pack(u32, o)
        for s in strips:
            out += struct.pack(u32, len(s))
    return bytes(out)


def _encode_tiff_tiled(px, byteorder, comp, predictor, tiles):
    """Tiled-TIFF writer (§15): every tile — edge tiles included — is
    compressed at the FULL TileWidth×TileLength size (right/bottom
    padding), which is exactly what a reader must discard."""
    if comp not in ("none", "packbits", "lzw"):
        raise ValueError(f"unsupported compression {comp!r}")
    tw, tl = tiles
    if tw % 16 or tl % 16 or tw < 16 or tl < 16:
        raise ValueError("tile dims must be positive multiples of 16")
    h, w, _ = px.shape
    ta = (w + tw - 1) // tw
    td = (h + tl - 1) // tl
    tdata = []
    for ty in range(td):
        for tx in range(ta):
            pad = np.zeros((tl, tw, 3), dtype=np.uint8)
            region = px[ty * tl : ty * tl + tl, tx * tw : tx * tw + tw]
            pad[: region.shape[0], : region.shape[1]] = region
            raw = pad.tobytes()
            if predictor == 2:
                raw = _predict2_encode(raw, tw)
            if comp == "packbits":
                raw = _packbits_encode(raw)
            elif comp == "lzw":
                raw = _lzw_encode(raw)
            tdata.append(raw)

    bo = byteorder
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    u16, u32 = bo + "H", bo + "I"
    n = len(tdata)
    # layout: header(8) | BPS(6) | [offsets(4n) counts(4n) if n>1] |
    #         tile data | IFD
    pos = 8
    bps_off = pos
    pos += 6
    to_off = tc_off = None
    if n > 1:
        to_off = pos
        pos += 4 * n
        tc_off = pos
        pos += 4 * n
    tile_offsets = []
    for t in tdata:
        tile_offsets.append(pos)
        pos += len(t)
    ifd_off = pos + (pos & 1)

    def entry(tag, typ, cnt, val, inline_short=False):
        e = struct.pack(u16, tag) + struct.pack(u16, typ) + struct.pack(
            u32, cnt
        )
        if inline_short:
            return e + struct.pack(u16, val) + b"\x00\x00"
        return e + struct.pack(u32, val)

    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[comp]
    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        entry(_BPS, 3, 3, bps_off),
        entry(_COMP, 3, 1, comp_tag, inline_short=True),
        entry(_PHOTO, 3, 1, 2, inline_short=True),
        entry(_SPP, 3, 1, 3, inline_short=True),
        entry(_TILE_W, 4, 1, tw),
        entry(_TILE_L, 4, 1, tl),
        entry(
            _TILE_OFF, 4, n,
            tile_offsets[0] if n == 1 else to_off,
        ),
        entry(
            _TILE_CNT, 4, n,
            len(tdata[0]) if n == 1 else tc_off,
        ),
        entry(_PLANAR, 3, 1, 1, inline_short=True),
    ]
    if predictor == 2:
        entries.append(entry(_PREDICTOR, 3, 1, 2, inline_short=True))
    entries.sort(key=lambda e: struct.unpack(u16, e[:2])[0])

    out = bytearray()
    out += magic + struct.pack(u32, ifd_off)
    out += struct.pack(bo + "HHH", 8, 8, 8)
    if n > 1:
        for o in tile_offsets:
            out += struct.pack(u32, o)
        for t in tdata:
            out += struct.pack(u32, len(t))
    for t in tdata:
        out += t
    if len(out) & 1:
        out += b"\x00"
    assert len(out) == ifd_off
    out += struct.pack(u16, len(entries))
    for e in entries:
        out += e
    out += struct.pack(u32, 0)
    return bytes(out)


def _read_tag_values(blob, bo, typ, cnt, raw4):
    """IFD value rule: values totalling ≤4 bytes live in the entry."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unsupported IFD type {typ}")
    fmt = (bo + "H") if typ == 3 else (bo + "I")
    total = size * cnt
    if total <= 4:
        return [
            struct.unpack_from(fmt, raw4, i * size)[0] for i in range(cnt)
        ]
    (off,) = struct.unpack(bo + "I", raw4)
    if off + total > len(blob):
        raise ValueError("IFD value array overruns file")
    return [
        struct.unpack_from(fmt, blob, off + i * size)[0]
        for i in range(cnt)
    ]


def decode_tiff(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline TIFF → (w, h, (h,w,3) uint8), strips re-assembled,
    PackBits expanded; fails loudly on anything outside the profile."""
    if len(blob) < 8:
        raise ValueError("truncated TIFF header")
    if blob[:4] == b"II*\x00":
        bo = "<"
    elif blob[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic)")
    (ifd_off,) = struct.unpack_from(bo + "I", blob, 4)
    if ifd_off + 2 > len(blob):
        raise ValueError("IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", blob, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(blob):
        raise ValueError("IFD overruns file")
    tags: dict[int, list[int]] = {}
    needed = {_W, _H, _BPS, _COMP, _PHOTO, _STRIP_OFF, _SPP, _RPS,
              _STRIP_CNT, _PLANAR, _PREDICTOR, _COLORMAP,
              _TILE_W, _TILE_L, _TILE_OFF, _TILE_CNT}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack_from(bo + "HH", blob, base)
        (cnt,) = struct.unpack_from(bo + "I", blob, base + 4)
        if tag not in needed:
            # TIFF 6.0 requires readers to SKIP unrecognized fields —
            # real scans carry RATIONAL XResolution / ASCII DateTime
            # etc.; rejecting them would exclude most baseline files
            continue
        tags[tag] = _read_tag_values(
            blob, bo, typ, cnt, blob[base + 8 : base + 12]
        )

    def one(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"required TIFF tag {tag} missing")
            return default
        return tags[tag][0]

    w, h = one(_W), one(_H)
    comp = one(_COMP, 1)
    photo, spp = one(_PHOTO), one(_SPP, 1)
    if photo == 2 and spp == 3:
        gray = False
        if tags.get(_BPS, [8, 8, 8]) != [8, 8, 8]:
            raise NotImplementedError("only 8 bits/sample supported")
    elif photo in (0, 1) and spp == 1:
        # bilevel/grayscale: WhiteIsZero (0) inverts, BlackIsZero (1)
        # is direct; replicated to RGB like every decoder here
        gray = True
        if tags.get(_BPS, [8]) != [8]:
            raise NotImplementedError("only 8 bits/sample supported")
    elif photo == 3 and spp == 1:
        # palette-color (TIFF 6.0 section 5): 8-bit indices into the
        # ColorMap tag — 3 * 2^bps SHORT values, all reds then all
        # greens then all blues, each 16-bit (0..65535); scaled to
        # 8-bit by >> 8 (writers emit v * 257 so this is exact)
        gray = True  # one sample/pixel through strip re-assembly
        if tags.get(_BPS, [8]) != [8]:
            raise NotImplementedError("only 8-bit palette indices")
        cmap = tags.get(_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF without a full 256-entry"
                             " ColorMap")
    else:
        raise NotImplementedError(
            "only chunky 8-bit RGB or 8-bit grayscale TIFF supported"
        )
    if one(_PLANAR, 1) != 1:
        raise NotImplementedError("planar configuration 2 unsupported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    predictor = one(_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    bpp = 1 if gray else 3
    if _TILE_OFF in tags or _TILE_W in tags:
        # tiled organization (TIFF 6.0 §15) — mutually exclusive with
        # strips; every tile is stored at the FULL TileWidth×TileLength
        # size, edge tiles padded, and the reader discards the padding
        if _STRIP_OFF in tags:
            raise ValueError("file carries both strip and tile tags")
        tw, tl = one(_TILE_W), one(_TILE_L)
        if tw < 1 or tl < 1:
            raise ValueError("tile dimensions must be >= 1")
        offs, cnts = tags.get(_TILE_OFF), tags.get(_TILE_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            raise ValueError("tile offset/count tags inconsistent")
        ta, td = (w + tw - 1) // tw, (h + tl - 1) // tl
        if len(offs) != ta * td:
            raise ValueError("tile count does not cover the image")
        img = np.zeros((h, w, bpp) if bpp == 3 else (h, w), dtype=np.uint8)
        expect = tl * tw * bpp
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            if o + c > len(blob):
                raise ValueError("tile overruns file")
            chunk = blob[o : o + c]
            if comp == 32773:
                tile = _packbits_decode(chunk, expect)
            elif comp == 5:
                tile = _lzw_decode(chunk, expect)
            else:
                if len(chunk) != expect:
                    raise ValueError("uncompressed tile size mismatch")
                tile = chunk
            if predictor == 2:
                tile = (
                    _predict2_decode_gray(tile, tw) if gray
                    else _predict2_decode(tile, tw)
                )
            arr = np.frombuffer(bytes(tile), dtype=np.uint8)
            arr = arr.reshape((tl, tw, 3) if bpp == 3 else (tl, tw))
            ty, tx = divmod(idx, ta)
            y0, x0 = ty * tl, tx * tw
            vy, vx = min(tl, h - y0), min(tw, w - x0)
            img[y0 : y0 + vy, x0 : x0 + vx] = arr[:vy, :vx]
        if gray:
            y = img
            if photo == 3:
                lut = (np.asarray(cmap, dtype=np.uint32)
                       .reshape(3, 256) >> 8).astype(np.uint8)
                px = np.stack([lut[0][y], lut[1][y], lut[2][y]], axis=2)
            else:
                if photo == 0:  # WhiteIsZero
                    y = 255 - y
                px = np.repeat(y[:, :, None], 3, axis=2)
        else:
            px = img
        return w, h, px
    rps = one(_RPS, h)
    if rps < 1:
        raise ValueError("RowsPerStrip must be >= 1")
    offs, cnts = tags.get(_STRIP_OFF), tags.get(_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("strip offset/count tags inconsistent")
    if len(offs) != (h + rps - 1) // rps:
        raise ValueError("strip count does not cover image height")
    raw = bytearray()
    for s, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(blob):
            raise ValueError("strip overruns file")
        rows = min(rps, h - s * rps)
        expect = rows * w * bpp
        chunk = blob[o : o + c]
        if comp == 32773:
            strip = _packbits_decode(chunk, expect)
        elif comp == 5:
            strip = _lzw_decode(chunk, expect)
        else:
            if len(chunk) != expect:
                raise ValueError("uncompressed strip size mismatch")
            strip = chunk
        if predictor == 2:
            strip = (
                _predict2_decode_gray(strip, w) if gray
                else _predict2_decode(strip, w)
            )
        raw += strip
    if len(raw) != w * h * bpp:
        raise ValueError("assembled pixel data has wrong size")
    if gray:
        y = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w)
        if photo == 3:
            lut = (np.asarray(cmap, dtype=np.uint32)
                   .reshape(3, 256) >> 8).astype(np.uint8)
            px = np.stack([lut[0][y], lut[1][y], lut[2][y]], axis=2)
        else:
            if photo == 0:  # WhiteIsZero
                y = 255 - y
            px = np.repeat(y[:, :, None], 3, axis=2)
    else:
        px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, 3)
    return w, h, px
