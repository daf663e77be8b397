"""Baseline TIFF 6.0 codec — original implementation of the public
bitstream spec (Adobe TIFF 6.0, 1992; no reference code consulted —
the upstream reference repo is an HDFS client and contains no codecs).

Scope (the "baseline RGB" profile real dataset scans produce):
- both byte orders (``II`` little-endian, ``MM`` big-endian);
- chunky RGB, 8 bits/sample, SamplesPerPixel 3;
- multi-strip images (RowsPerStrip < height) — strip re-assembly is
  where naive readers break;
- Compression 1 (none) and 32773 (PackBits RLE, TIFF §9);
- the inline-vs-offset IFD value rule (a tag's value lives IN the
  12-byte entry when it fits in 4 bytes, behind an offset otherwise)
  — the classic TIFF-reader gotcha, exercised by both fixture sizes.

Like every codec in this repo, the encoder exists so the decoder is
ROUND-TRIP-PROVEN (and the committed fixtures are pixel-identical
twins of ``img_{i}.ppm``, so the query key's oracle matches full pixel
statistics — the strongest oracle class, same as lossless JPEG).

Unsupported constructs (tiled TIFFs, other compressions, planar
config 2, palette/gray photometrics) raise ``NotImplementedError`` /
``ValueError`` for the tolerant-decode seam, never a silent wrong
image.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _RPS, _STRIP_CNT, _PLANAR = 273, 277, 278, 279, 284

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


def encode_tiff(
    px: np.ndarray,
    byteorder: str = "<",
    rows_per_strip: int | None = None,
    packbits: bool = False,
) -> bytes:
    """(h, w, 3) uint8 → baseline TIFF. ``byteorder`` '<' writes II,
    '>' writes MM; ``rows_per_strip`` defaults to whole-image."""
    h, w, _ = px.shape
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps
    strips = []
    for s in range(n_strips):
        raw = px[s * rps : (s + 1) * rps].tobytes()
        strips.append(_packbits_encode(raw) if packbits else raw)

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

    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        entry(_BPS, 3, 3, bps_off),
        entry(_COMP, 3, 1, 32773 if packbits else 1, inline_short=True),
        entry(_PHOTO, 3, 1, 2, inline_short=True),
    ]
    if n_strips == 1:
        entries.append(entry(_STRIP_OFF, 4, 1, strip_offsets[0]))
    elif n_strips == 2:  # two LONGs exactly fill... no: 8 > 4 — offset
        so_off = ifd_off + 2 + 12 * 10 + 4
        entries.append(entry(_STRIP_OFF, 4, 2, so_off))
    else:
        entries.append(entry(_STRIP_OFF, 4, n_strips, so_off))
    entries.append(entry(_SPP, 3, 1, 3, inline_short=True))
    entries.append(entry(_RPS, 4, 1, rps))
    if n_strips == 1:
        entries.append(entry(_STRIP_CNT, 4, 1, len(strips[0])))
    elif n_strips == 2:
        sc_off = ifd_off + 2 + 12 * 10 + 4 + 8
        entries.append(entry(_STRIP_CNT, 4, 2, sc_off))
    else:
        entries.append(entry(_STRIP_CNT, 4, n_strips, sc_off))
    entries.append(entry(_PLANAR, 3, 1, 1, inline_short=True))
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
              _STRIP_CNT, _PLANAR}
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
    if one(_PHOTO) != 2 or one(_SPP, 1) != 3:
        raise NotImplementedError("only chunky 8-bit RGB TIFF supported")
    if tags.get(_BPS, [8, 8, 8]) != [8, 8, 8]:
        raise NotImplementedError("only 8 bits/sample supported")
    if one(_PLANAR, 1) != 1:
        raise NotImplementedError("planar configuration 2 unsupported")
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
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
        expect = rows * w * 3
        chunk = blob[o : o + c]
        raw += (
            _packbits_decode(chunk, expect) if comp == 32773 else chunk
        )
        if comp == 1 and len(chunk) != expect:
            raise ValueError("uncompressed strip size mismatch")
    if len(raw) != w * h * 3:
        raise ValueError("assembled pixel data has wrong size")
    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, 3)
    return w, h, px
