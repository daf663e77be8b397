"""Generate deterministic codec-free media fixtures (PPM/BMP/WAV).

Written to assets/media/ and committed: the multimodal operators
decode these for real (pure-Python header+pixel parsing — no codec
libraries needed), and the DuckDB oracles re-derive dimensions and
pixel statistics from the same bytes via hex-string arithmetic, so
the keys are hash-matchable end-to-end.

Formats are the canonical minimal encodings:
- PPM P6: ``P6\\n{w} {h}\\n255\\n`` + w*h*3 RGB bytes.
- BMP: 54-byte header (BITMAPFILEHEADER + BITMAPINFOHEADER), 24 bpp,
  uncompressed, bottom-up rows padded to 4 bytes.
- WAV: 44-byte RIFF/PCM header, mono, 16-bit signed LE, 8 kHz.

Pixel/sample values are closed-form functions of coordinates so both
engines (and tests) can recompute them independently.
"""

from __future__ import annotations

import gzip
import os
import struct

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "media")


def ppm_bytes(w: int, h: int, seed: int) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(3):
                px.append((x * 7 + y * 13 + c * 29 + seed * 31) % 256)
    return header + bytes(px)


def bmp_bytes(w: int, h: int, seed: int) -> bytes:
    stride = (w * 3 + 3) // 4 * 4
    imgsize = stride * h
    filesize = 54 + imgsize
    fileheader = struct.pack("<2sIHHI", b"BM", filesize, 0, 0, 54)
    infoheader = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, imgsize, 2835, 2835, 0, 0
    )
    px = bytearray()
    for row in range(h):  # bottom-up: row 0 is the bottom scanline
        y = h - 1 - row
        for x in range(w):
            for c in range(3):  # BGR order on disk
                px.append((x * 11 + y * 17 + c * 23 + seed * 41) % 256)
        px.extend(b"\x00" * (stride - w * 3))
    return fileheader + infoheader + bytes(px)


def png_bytes(w: int, h: int, seed: int) -> bytes:
    """8-bit RGB non-interlaced PNG with the SAME pixel function as
    ``ppm_bytes`` — the paired fixtures let the DuckDB oracle verify
    the PNG decoder against the PPM bytes (cross-format check). The
    row filter type cycles 0..4 so every unfilter path (None, Sub, Up,
    Average, Paeth) is exercised.
    """
    import zlib

    def px(x, y, c):
        return (x * 7 + y * 13 + c * 29 + seed * 31) % 256

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    stride = w * 3
    prev = [0] * stride
    stream = bytearray()
    for y in range(h):
        raw = [px(x, y, c) for x in range(w) for c in range(3)]
        ftype = y % 5
        stream.append(ftype)
        for i in range(stride):
            left = raw[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                v = raw[i]
            elif ftype == 1:
                v = raw[i] - left
            elif ftype == 2:
                v = raw[i] - up
            elif ftype == 3:
                v = raw[i] - ((left + up) >> 1)
            else:
                v = raw[i] - paeth(left, up, ul)
            stream.append(v & 0xFF)
        prev = raw

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def wav_bytes(n_samples: int, seed: int, rate: int = 8000) -> bytes:
    data = bytearray()
    for i in range(n_samples):
        v = ((i * 31 + seed * 97) % 2048) - 1024  # deterministic int16
        data += struct.pack("<h", v)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + bytes(data)


class _FlacBitW:
    """MSB-first bit writer for the FLAC encoder below."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


def _flac_crc8(data) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1)
    return crc


def _flac_crc16(data) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _flac_rice_partition(w: _FlacBitW, res, pbits: int) -> None:
    """One rice partition: pick the cheapest 4/5-bit parameter
    deterministically, then unary-quotient + low-bits encode."""
    us = [v << 1 if v >= 0 else ((-v) << 1) - 1 for v in res]
    best, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = sum((u >> p) + 1 + p for u in us)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    w.w(best, pbits)
    for u in us:
        w.w(1, (u >> best) + 1)  # q zeros then a 1
        w.w(u & ((1 << best) - 1), best)


def _flac_residual(w: _FlacBitW, res, blocksize: int, order: int,
                   po: int) -> None:
    w.w(0, 2)  # 4-bit rice method
    w.w(po, 4)
    nparts = 1 << po
    assert blocksize % nparts == 0
    start = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        _flac_rice_partition(w, res[start : start + n], 4)
        start += n


_FLAC_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1]}


def _clamp_po(po: int, bs: int, order: int) -> int:
    """Largest legal partition order for this frame: 2^po must divide
    the blocksize and the first partition must fit the warmup."""
    while po and (bs % (1 << po) or (bs >> po) < order):
        po -= 1
    return po


def flac_bytes(samples, style: str = "fixed2", po: int = 0,
               rate: int = 8000, blocksize: int = 240) -> bytes:
    """Deterministic mono 16-bit FLAC twin of a PCM sample list.

    ``style`` selects the subframe family per frame so the four
    graded twins jointly cover the decoder's branches: ``fixed2`` /
    ``fixed1`` / ``fixed0`` (fixed predictors), ``lpc2`` (an LPC
    subframe whose quantized coeffs [2,-1]@shift0 equal the order-2
    fixed predictor — exact reconstruction), ``mixed`` (cycles
    verbatim / fixed0 / fixed2 across frames). ``po`` is the rice
    partition order (blocksize and every tail chunk here divide by
    2^po). Frames use the 8-bit uncommon-blocksize header path; the
    STREAMINFO MD5 is the real PCM digest so decoders can verify
    end to end."""
    import hashlib as _hl

    data = bytearray()
    for v in samples:
        data += struct.pack("<h", v)
    chunks = [
        samples[i : i + blocksize] for i in range(0, len(samples), blocksize)
    ]
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, type 0 (STREAMINFO)
    out += (34).to_bytes(3, "big")
    # RFC 9639: min/max blocksize EXCLUDE the (possibly short) last
    # block — a fixed-blocksize stream reports min == max
    sizes = [len(c) for c in chunks]
    full = sizes[:-1] or sizes or [0]
    v = 0
    v = (v << 16) | min(full)
    v = (v << 16) | max(full)
    v = (v << 24) | 0  # min framesize unknown
    v = (v << 24) | 0  # max framesize unknown
    v = (v << 20) | rate
    v = (v << 3) | 0  # channels - 1
    v = (v << 5) | 15  # bps - 1
    v = (v << 36) | len(samples)
    out += v.to_bytes(18, "big") + _hl.md5(bytes(data)).digest()

    for fno, chunk in enumerate(chunks):
        bs = len(chunk)
        w = _FlacBitW()
        w.w(0x3FFE, 14)  # sync
        w.w(0, 1)  # reserved
        w.w(0, 1)  # fixed-blocksize strategy
        w.w(6, 4)  # blocksize: 8-bit value at header end
        w.w(4, 4)  # sample rate: 8 kHz table entry
        w.w(0, 4)  # channel assignment: mono
        w.w(4, 3)  # sample size: 16-bit
        w.w(0, 1)  # reserved
        assert fno < 0x80  # coded frame number: single-byte range
        w.w(fno, 8)
        w.w(bs - 1, 8)
        w.buf.append(_flac_crc8(w.buf))

        frame_style = (
            ("verbatim", "fixed0", "fixed2", "fixed2")[fno % 4]
            if style == "mixed"
            else style
        )
        # a predictor order can never exceed the frame length (tiny
        # tail frames): clamp fixed orders, demote LPC below 2 samples
        if frame_style.startswith("fixed"):
            frame_style = f"fixed{min(int(frame_style[5]), bs)}"
        elif frame_style == "lpc2" and bs < 2:
            frame_style = f"fixed{bs}"
        if bs and len(set(chunk)) == 1:
            frame_style = "constant"
        w.w(0, 1)  # subframe padding bit
        if frame_style == "constant":
            w.w(0, 6)
            w.w(0, 1)  # no wasted bits
            w.w(chunk[0], 16)
        elif frame_style == "verbatim":
            w.w(1, 6)
            w.w(0, 1)  # no wasted bits
            for s in chunk:
                w.w(s, 16)
        elif frame_style.startswith("fixed"):
            order = int(frame_style[5])
            w.w(8 + order, 6)
            w.w(0, 1)
            for s in chunk[:order]:
                w.w(s, 16)
            coefs = _FLAC_FIXED_COEFS[order]
            res = [
                chunk[i]
                - sum(c * chunk[i - j - 1] for j, c in enumerate(coefs))
                for i in range(order, bs)
            ]
            _flac_residual(w, res, bs, order, _clamp_po(po, bs, order))
        else:  # lpc2
            w.w(32 + 1, 6)  # LPC, order 2
            w.w(0, 1)
            for s in chunk[:2]:
                w.w(s, 16)
            w.w(3, 4)  # precision - 1 = 3 -> 4-bit coeffs
            w.w(0, 5)  # shift 0
            w.w(2, 4)  # qlp coeffs [2, -1]
            w.w(-1, 4)
            res = [
                chunk[i] - (2 * chunk[i - 1] - chunk[i - 2])
                for i in range(2, bs)
            ]
            _flac_residual(w, res, bs, 2, _clamp_po(po, bs, 2))
        w.align()
        crc = _flac_crc16(w.buf)
        w.w(crc, 16)
        out += w.buf
    return bytes(out)


def tar_bytes(members) -> bytes:
    """[(name, payload)] → deterministic USTAR archive bytes (mtime 0,
    uid/gid 0, mode 0644, correct checksum, two zero trailer blocks) —
    the WebDataset shard container, written by hand so the fixture is
    bit-reproducible with no library quirks."""
    out = bytearray()
    for name, data in members:
        hdr = bytearray(512)
        nb = name.encode()
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = ("%011o" % len(data)).encode() + b"\x00"
        hdr[136:148] = b"00000000000\x00"
        hdr[156] = 0x30  # typeflag '0': regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[148:156] = b" " * 8  # checksum field counts as spaces
        hdr[148:156] = ("%06o" % sum(hdr)).encode() + b"\x00 "
        out += hdr + data + b"\x00" * ((512 - len(data) % 512) % 512)
    out += b"\x00" * 1024
    return bytes(out)


def warc_bytes(records, start: int = 0) -> bytes:
    """[(warc_type, target_uri, payload[, extra_header_lines])] →
    WARC/1.0 bytes (ISO 28500): CRLF headers, Content-Length framing,
    two CRLFs between records. Record IDs and dates are deterministic
    functions of the index so the fixture is bit-reproducible."""
    out = bytearray()
    for k, rec in enumerate(records, start):
        wtype, uri, payload = rec[:3]
        extra = rec[3] if len(rec) > 3 else []
        hdr = [
            "WARC/1.0",
            f"WARC-Type: {wtype}",
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{k:012d}>",
            "WARC-Date: 2024-01-01T00:00:00Z",
        ]
        if uri:
            hdr.append(f"WARC-Target-URI: {uri}")
        hdr.extend(extra)
        hdr.append(f"Content-Length: {len(payload)}")
        out += ("\r\n".join(hdr) + "\r\n\r\n").encode()
        out += payload
        out += b"\r\n\r\n"
    return bytes(out)


def wiki_page_xml(dump_i: int, page_j: int) -> bytes:
    """One deterministic MediaWiki-export ``<page>`` element (the
    shape of enwiki ``pages-articles`` dumps), ASCII-only so string
    digests agree across engines."""
    pid = dump_i * 1000 + page_j
    body = (
        f"{{{{Infobox thing|id={pid}|kind=fixture}}}}\n"
        f"== Section {page_j} ==\n"
        f"Article body {dump_i}-{page_j} about "
        f"[[Topic {page_j}|the topic]] with '''bold''' "
        f"and ''italic'' text. "
        + f"Sentence {page_j} with [[Link {page_j}]] and text. "
        * (2 + page_j % 3)
        + f"{{{{cite|ref={page_j}}}}} End."
    )
    return (
        f"  <page>\n"
        f"    <title>Page {dump_i}-{page_j}</title>\n"
        f"    <ns>{0 if page_j % 4 else 14}</ns>\n"
        f"    <id>{pid}</id>\n"
        f"    <revision>\n"
        f"      <id>{pid * 7}</id>\n"
        f'      <text bytes="{len(body)}">{body}</text>\n'
        f"    </revision>\n"
        f"  </page>\n"
    ).encode()


def wiki_dump_bytes(dump_i: int, n_pages: int, per_stream: int = 2):
    """(plain_xml, multistream_bz2) twins of a MediaWiki dump.

    The bz2 twin is MULTISTREAM exactly as enwiki ships it: pages are
    grouped into independent bz2 streams (enwiki uses 100 pages per
    stream; here ``per_stream``) and the streams are concatenated —
    which is WHY the 20+ GB dump is splittable: a reader can start at
    any stream boundary without decompressing the prefix. The plain
    twin concatenates the identical bytes, so a digest-level hash
    match between the two proves stream splitting + decompression
    reproduce the dump byte for byte."""
    import bz2

    header = f"<mediawiki>\n<dumpid>{dump_i}</dumpid>\n".encode()
    footer = b"</mediawiki>\n"
    pages = [wiki_page_xml(dump_i, j) for j in range(n_pages)]
    blocks = [header] + [
        b"".join(pages[k : k + per_stream])
        for k in range(0, n_pages, per_stream)
    ] + [footer]
    plain = b"".join(blocks)
    multi = b"".join(bz2.compress(b, compresslevel=1) for b in blocks)
    return plain, multi


def warc_gz_bytes(records) -> bytes:
    """The same records as :func:`warc_bytes`, but laid out as
    CommonCrawl actually ships them: ONE gzip member per record,
    members concatenated. Per-record members are what make a
    ``.warc.gz`` splittable — a reader can start at any member
    boundary without decompressing the prefix. ``mtime=0`` pins the
    gzip header so the fixture is bit-reproducible."""
    out = bytearray()
    for k, rec in enumerate(records):
        out += gzip.compress(warc_bytes([rec], start=k), mtime=0)
    return bytes(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for i in range(8):
        w, h = 16 + i * 3, 12 + i * 2
        with open(os.path.join(OUT, f"img_{i}.ppm"), "wb") as f:
            f.write(ppm_bytes(w, h, i))
    for i in range(4):
        w, h = 10 + i * 5, 8 + i * 3  # widths hit all 4 padding cases
        with open(os.path.join(OUT, f"img_{i}.bmp"), "wb") as f:
            f.write(bmp_bytes(w, h, i))
    for i in range(8):  # pixel-identical twins of img_{i}.ppm
        w, h = 16 + i * 3, 12 + i * 2
        with open(os.path.join(OUT, f"png_{i}.png"), "wb") as f:
            f.write(png_bytes(w, h, i))
    # GIF twins of img_{i}.ppm: the PPM pixel function has at most 256
    # distinct colors (all three channels are offsets of one base
    # byte), so a global color table represents it exactly — pixel-
    # identical cross-format fixtures. Odd seeds write interlaced
    # images so the 4-pass deinterlace path is exercised.
    import sys as _sys

    _sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import numpy as _np

    from hadoop_tools_spark.operators.gif import encode_gif

    for i in range(8):
        w, h = 16 + i * 3, 12 + i * 2
        xx, yy = _np.meshgrid(_np.arange(w), _np.arange(h))
        base = (xx * 7 + yy * 13 + i * 31) % 256  # == ppm c=0 channel
        pal = _np.stack(
            [
                _np.arange(256),
                (_np.arange(256) + 29) % 256,
                (_np.arange(256) + 58) % 256,
            ],
            axis=1,
        ).astype(_np.uint8)
        with open(os.path.join(OUT, f"gif_{i}.gif"), "wb") as f:
            f.write(
                encode_gif(
                    w, h, pal, base.astype(_np.uint8), interlaced=bool(i % 2)
                )
            )
    # baseline JPEGs: smooth gradients (JPEG-friendly), deterministic
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from hadoop_tools_spark.operators.jpeg import encode_jpeg

    for i in range(6):
        w, h = 16 + i * 4, 12 + i * 3
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [
                (xx * (3 + i) + yy * 2) % 256,
                (xx * 5 + yy * (2 + i) + 30) % 256,
                (yy * 4 + i * 17 + 60) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        with open(os.path.join(OUT, f"jpg_{i}.jpg"), "wb") as f:
            f.write(encode_jpeg(px, quality=90))
    # MJPEG AVI clips: deterministic per-frame gradients
    from hadoop_tools_spark.operators.avi import encode_avi

    for i in range(3):
        with open(os.path.join(OUT, f"vid_{i}.avi"), "wb") as f:
            f.write(encode_avi(vid_frames(i), fps=5, quality=90))
    for i in range(4):  # 12-22 frames each at frame_len=160
        with open(os.path.join(OUT, f"snd_{i}.wav"), "wb") as f:
            f.write(wav_bytes(2048 + 512 * i, i))
        # FLAC twin of the same PCM — lossless, so decode must be
        # BIT-EXACT against the WAV twin's samples (the strongest
        # oracle class, same pattern as the lossless-JPEG↔PPM pairs).
        # Styles vary per file so the four twins jointly cover the
        # decoder's subframe/partition branches.
        flac_style, flac_po = (
            ("fixed2", 0), ("fixed1", 2), ("mixed", 1), ("lpc2", 0)
        )[i]
        pcm = [((k * 31 + i * 97) % 2048) - 1024
               for k in range(2048 + 512 * i)]
        with open(os.path.join(OUT, f"flac_{i}.flac"), "wb") as f:
            f.write(flac_bytes(pcm, style=flac_style, po=flac_po))
    # REAL progressive JPEGs (SOF2: spectral selection + successive
    # approximation, per-scan optimal Huffman tables). Same pixel
    # recipe family as jpg_* but distinct constants; .jpeg extension
    # keeps them out of the 'jpg_*.jpg' oracles' globs.
    from hadoop_tools_spark.operators.jpeg import encode_jpeg_progressive

    for i in range(4):
        w, h = 17 + i * 5, 13 + i * 4
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [
                (xx * (2 + i) + yy * 3 + 10) % 256,
                (xx * 4 + yy * (3 + i) + 50) % 256,
                (xx + yy * 5 + i * 23 + 90) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        with open(os.path.join(OUT, f"prog_{i}.jpeg"), "wb") as f:
            f.write(encode_jpeg_progressive(px, quality=85))
    # chroma-subsampled baseline JPEGs with restart intervals: even i
    # = 4:2:0, odd i = 4:2:2, all with DRI=2 (RSTn markers + DC resets
    # every 2 MCUs) — odd dims exercise partial-MCU edge padding
    for i in range(4):
        w, h = 20 + i * 7, 14 + i * 5
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [
                (xx * 3 + yy * (2 + i)) % 256,
                (xx * (4 + i) + yy * 2 + 40) % 256,
                (xx * 2 + yy * 6 + i * 19 + 70) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        with open(os.path.join(OUT, f"sub_{i}.jpg"), "wb") as f:
            f.write(
                encode_jpeg(
                    px,
                    quality=88,
                    subsample="420" if i % 2 == 0 else "422",
                    restart_interval=2,
                )
            )
    # 12-bit extended sequential JPEGs (SOF1, precision 12, 16-bit
    # DQT, per-image optimal Huffman tables): smooth 12-bit gradients.
    # Prefix 'jpg12_' does not match the baseline oracles' 'jpg_*'
    # glob (the literal underscore after 'jpg' excludes it).
    from hadoop_tools_spark.operators.jpeg import encode_jpeg_ext12

    for i in range(3):
        w, h = 18 + i * 5, 14 + i * 4
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [
                (xx * (40 + 7 * i) + yy * 23) % 4096,
                (xx * 31 + yy * (52 + 9 * i) + 600) % 4096,
                (xx * 17 + yy * 11 + i * 301 + 1200) % 4096,
            ],
            axis=2,
        ).astype(np.uint16)
        with open(os.path.join(OUT, f"jpg12_{i}.jpg"), "wb") as f:
            f.write(encode_jpeg_ext12(px, quality=92))
    # WebDataset-style tar shards: each sample is a stem shared by a
    # .txt caption and a .ppm image member (the standard multimodal
    # training-data container). Sizes stay deterministic; captions
    # are closed-form so the oracle can re-derive everything from the
    # raw tar bytes.
    for i in range(3):
        members = []
        for j in range(2 + i):
            stem = f"sample{i}{j}"
            caption = (f"caption {i}-{j} " * (j + 1) + "end").encode()
            members.append((f"{stem}.txt", caption))
            members.append((f"{stem}.ppm", ppm_bytes(6 + j, 4 + j, i * 10 + j)))
        with open(os.path.join(OUT, f"shard_{i}.tar"), "wb") as f:
            f.write(tar_bytes(members))
    # WARC web-archive fixtures (the CommonCrawl container): each file
    # opens with a warcinfo record and carries response records with
    # deterministic HTML payloads (closed-form so the oracle can
    # re-derive digests from raw bytes).
    for i in range(3):
        recs = [("warcinfo", "", f"software: fixture-gen/{i}\r\n".encode())]
        for j in range(2 + i):
            body = (
                f"<html><head><title>page {i}-{j}</title>"
                f"<style>body {{ color: #{i}{j}f; }}</style>"
                f"<script>var x = {j} < 2 && {i} > 0;</script></head>"
                f'<body><h1 class="t">Page {i}-{j}</h1>'
                + f"<p>paragraph {i}-{j} &amp; more&nbsp;text</p>" * (3 + j)
                + "".join(
                    f'<a href="http://example.com/{i}/page{k}">next {k}</a>'
                    for k in range(j + 2)
                )
                + f'<a href="https://other.org/{i}">out</a>'
                + "</body></html>"
            ).encode()
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            recs.append(
                ("response", f"http://example.com/{i}/page{j}", payload)
            )
        if i == 2:
            # hostile-but-legal records pinning the framing rules the
            # happy path never exercises — each must hash-match across
            # BOTH engines' independent walks:
            # (a) a ~2 KB header (long Target-URI): both walks scan an
            #     8192-byte terminator window; a narrower oracle
            #     window would mis-frame exactly this record class;
            long_uri = "http://example.com/2/deep/" + "/".join(
                f"seg{k:03d}" for k in range(260)
            )
            deep_body = (
                "<html><body><h1>deep page</h1>"
                '<a href="http://example.com/2/page0">up</a></body></html>'
            ).encode()
            recs.append((
                "response",
                long_uri,
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + deep_body,
            ))
            # (b) a bodyless response (payload with NO CRLFCRLF):
            #     counted by the records keys, SKIPPED by the
            #     html/links keys on both engines;
            recs.append((
                "response",
                "http://example.com/2/no-body",
                b"\x00\x01binary payload without an http header split",
            ))
            # (c) an ISO 28500 folded header line (continuation
            #     starting with SP) — legal, must not trip the
            #     fail-closed header-line validator.
            recs.append((
                "metadata",
                "http://example.com/2/meta",
                b"note: fixture metadata\r\n",
                ["X-Fixture-Folded: first part", "  second part (folded)"],
            ))
        with open(os.path.join(OUT, f"crawl_{i}.warc"), "wb") as f:
            f.write(warc_bytes(recs))
        # gzip twin: identical records, one gzip member each — the
        # exact bytes-on-disk layout of a CommonCrawl .warc.gz. The
        # graded key decompresses these and must hash-match the plain
        # twin's oracle walk record for record.
        with open(os.path.join(OUT, f"crawlgz_{i}.warc.gz"), "wb") as f:
            f.write(warc_gz_bytes(recs))
    # MediaWiki dump twins (plain XML + multistream bz2, enwiki's
    # actual distribution layout): stream-per-page-block so the
    # compressed dump splits without decompressing a prefix.
    for i in range(3):
        plain, multi = wiki_dump_bytes(i, n_pages=5 + 2 * i)
        with open(os.path.join(OUT, f"wiki_{i}.xml"), "wb") as f:
            f.write(plain)
        with open(os.path.join(OUT, f"wiki_{i}.xml.bz2"), "wb") as f:
            f.write(multi)
    # lossless JPEG (SOF3) twins of img_{i}.ppm — components coded
    # directly (no color transform), so decode is BIT-EXACT and the
    # graded key's oracle derives stats from the PPM bytes. The
    # predictor rotates through all seven T.81 H.1 formulas.
    from hadoop_tools_spark.operators.jpeg import encode_jpeg_lossless

    for i in range(8):
        w, h = 16 + i * 3, 12 + i * 2
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [(xx * 7 + yy * 13 + c * 29 + i * 31) % 256 for c in range(3)],
            axis=2,
        ).astype(np.uint8)
        with open(os.path.join(OUT, f"jls_{i}.jpg"), "wb") as f:
            f.write(encode_jpeg_lossless(px, predictor=(i % 7) + 1))
    # unsupported-subformat fixtures for the tolerant-decode key:
    # arithmetic-coded JPEGs faked by rewriting jpg_{i}'s SOF0 marker
    # (FF C0) to SOF9 (FF C9) — the decoder must flag, not die.
    for i in range(2):
        with open(os.path.join(OUT, f"jpg_{i}.jpg"), "rb") as f:
            blob = bytearray(f.read())
        # first byte-aligned FF C0 is the SOF0 marker in these fixtures
        for p in range(0, len(blob) - 1):
            if blob[p] == 0xFF and blob[p + 1] == 0xC0:
                blob[p + 1] = 0xC9
                break
        with open(os.path.join(OUT, f"arith_{i}.jpeg"), "wb") as f:
            f.write(bytes(blob))
    # lossless WebP (VP8L) twins of img_{i}.ppm — pixel-identical, so
    # the graded key's oracle derives stats from the PPM bytes while
    # Spark decodes the VP8L bitstream. Encoder options rotate so the
    # committed fixtures cover distinct decoder paths: plain literals,
    # subtract-green + predictor transform (all 14 modes), palette
    # (the PPM recipe has <= 256 colors), color cache + meta groups.
    from hadoop_tools_spark.operators.webp import encode_webp_lossless

    webp_opts = [
        {},
        {"subtract_green": True, "predictor_bits": 2},
        {"palette": True},
        {"cache_bits": 5},
        {"meta_bits": 2},
        {"subtract_green": True, "color_bits": 2, "predictor_bits": 3},
        {"subtract_green": True},
        # the gradient's predictor residuals are block-constant, so
        # runs exist and REAL LZ77 copies (alternating 2D-mapped and
        # plain distance codes) land inside the graded fixture
        {"predictor_bits": 3, "lz77_runs": True},
    ]
    for i in range(8):
        w, h = 16 + i * 3, 12 + i * 2
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        px = np.stack(
            [(xx * 7 + yy * 13 + c * 29 + i * 31) % 256 for c in range(3)],
            axis=2,
        ).astype(np.uint8)
        with open(os.path.join(OUT, f"webp_{i}.webp"), "wb") as f:
            f.write(encode_webp_lossless(px, **webp_opts[i]))
    # lossy-VP8 fixture for the tolerant-decode key: a valid RIFF/WEBP
    # container whose 'VP8 ' (lossy) chunk is out of codec scope — the
    # decoder must flag the row, not fail the task
    payload = bytes(range(20))
    vp8 = b"VP8 " + struct.pack("<I", len(payload)) + payload
    with open(os.path.join(OUT, "lossy_0.webp"), "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8)

    write_arrow_fixtures()
    write_zip_fixtures()
    write_tiff_fixtures()
    write_mp4_fixtures()
    write_mp3_fixtures()
    write_ogg_fixtures()
    print(f"wrote fixtures to {OUT}")


def arrow_shard_rows(i: int):
    """Deterministic rows for Arrow-IPC shard i — the cross-format-twin
    content shared by tbl_{i}.arrow and tblpq_{i}.parquet. NULL names
    every 17th row and negative values every 29th keep the scan's
    null/sign paths honest."""
    rows = []
    for j in range(150 + 40 * i):
        rid = i * 1000 + j
        rows.append(
            (
                rid,
                None if rid % 17 == 0 else f"row_{rid:05d}_{(rid * 7) % 13}",
                ((rid * 31) % 997) / 100.0 * (-1 if rid % 29 == 0 else 1),
            )
        )
    return rows


def write_arrow_fixtures() -> None:
    """Arrow IPC shards + value-identical parquet twins: the .arrow
    files are the scan_arrow_ipc key's input; the parquet twins are its
    DuckDB oracle's input (cross-format-twin pattern — same doubles
    written from the same Python floats, so values are bit-identical)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("id", pa.int64(), nullable=False),
            pa.field("name", pa.string()),
            pa.field("value", pa.float64(), nullable=False),
        ]
    )
    for i in range(3):
        rows = arrow_shard_rows(i)
        table = pa.table(
            {
                "id": [r[0] for r in rows],
                "name": [r[1] for r in rows],
                "value": [r[2] for r in rows],
            },
            schema=schema,
        )
        with pa.ipc.new_file(
            os.path.join(OUT, f"tbl_{i}.arrow"), schema
        ) as w:
            # two batches per shard so the reader's batch loop is real
            half = len(rows) // 2
            for piece in (table.slice(0, half), table.slice(half)):
                for b in piece.combine_chunks().to_batches():
                    w.write_batch(b)
        pq.write_table(table, os.path.join(OUT, f"tblpq_{i}.parquet"))




def vid_frames(i: int) -> list:
    """Deterministic per-frame gradient clips — shared by the AVI and
    MP4 fixture writers so vid_{i}.avi and mp4_{i}.mp4 carry
    byte-identical JPEG payloads (the cross-format-twin contract)."""
    import numpy as np

    w, h, n = 24 + i * 8, 16 + i * 4, 7 + i * 4
    clips = []
    for t in range(n):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        clips.append(
            np.stack(
                [
                    (xx * 3 + t * 10 + i * 5) % 256,
                    (yy * 5 + t * 7) % 256,
                    (xx + yy + t * 13) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
        )
    return clips


def write_mp4_fixtures() -> None:
    """ISO-BMFF shards for the llm_mp4_* keys, written by the repo's
    own from-scratch encoder (operators/mp4.py). mp4_{0,1,2} are
    cross-format twins of vid_{0,1,2}.avi (same encode_jpeg frames),
    rotating through the structural branches: multi-run stsc chunking,
    a trailing size==0 free box, co64 + the size==1 largesize escape.
    mp4_3 has its own frames (no AVI twin) with 1-sample chunks."""
    import numpy as np

    from hadoop_tools_spark.operators.jpeg import encode_jpeg
    from hadoop_tools_spark.operators.mp4 import encode_mp4

    variants = [
        dict(samples_per_chunk=3),
        dict(samples_per_chunk=4, trailing_free=9),
        dict(samples_per_chunk=2, co64=True, large_mdat=True),
    ]
    for i in range(3):
        frames = vid_frames(i)
        jpegs = [encode_jpeg(f, quality=90) for f in frames]
        h, w = frames[0].shape[:2]
        with open(os.path.join(OUT, f"mp4_{i}.mp4"), "wb") as f:
            f.write(encode_mp4(jpegs, w, h, fps=5, **variants[i]))
    w, h = 40, 28
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    jpegs = [
        encode_jpeg(
            np.stack(
                [(xx * 2 + t * 19) % 256, (yy * 3 + t * 5) % 256,
                 (xx + 2 * yy + t * 11) % 256],
                axis=2,
            ).astype(np.uint8),
            quality=90,
        )
        for t in range(5)
    ]
    with open(os.path.join(OUT, "mp4_3.mp4"), "wb") as f:
        f.write(encode_mp4(jpegs, w, h, fps=5, samples_per_chunk=1,
                           co64=True))


def zip_member_plan(i: int):
    """Deterministic member plan for zipds_{i}.zip: (name, data,
    method) with stored+deflated members, an empty file, a directory
    entry, and nested member paths — the shapes a real dataset zip has."""
    import zipfile

    return [
        (f"meta/manifest_{i}.txt", f"shard {i} manifest\n".encode() * (3 + i),
         zipfile.ZIP_STORED),
        (f"docs/doc_{i}_a.txt",
         b"".join(bytes([(j * 7 + i * 31) % 256]) for j in range(400 + 60 * i)),
         zipfile.ZIP_DEFLATED),
        (f"docs/doc_{i}_b.txt",
         (f"token{i} " * (50 + 10 * i)).encode(), zipfile.ZIP_DEFLATED),
        (f"empty_{i}.bin", b"", zipfile.ZIP_STORED),
        (f"dir_{i}/", b"", zipfile.ZIP_STORED),
        (f"blob_{i}.raw", bytes(range(256)) * (2 + i), zipfile.ZIP_STORED),
    ]


def to_zip64(blob: bytes, z64_members: tuple[int, ...] = ()) -> bytes:
    """Convert a classic zip into its zip64 form: the listed CD entry
    indexes get their sizes/local-header-offset replaced by 0xFFFFFFFF
    sentinels with the real values in a zip64 (id 0x0001) extra field
    (placed AFTER a dummy extra field so parsers must actually walk
    the TLVs), and the EOCD's counts/offset become 0xFFFF/0xFFFFFFFF
    sentinels resolved through a spliced zip64 EOCD record + locator —
    the layout every >4 GiB dataset shard actually uses, exercised
    here without 4 GiB fixtures."""
    import struct

    n = len(blob)
    assert blob[n - 22 : n - 18] == b"PK\x05\x06" and struct.unpack(
        "<H", blob[n - 2 :]
    ) == (0,)
    n_entries, cd_size, cd_off = struct.unpack("<HII", blob[n - 12 : n - 2])
    body = blob[:cd_off]
    # rebuild the central directory entry by entry
    entries = []
    off = cd_off
    for _ in range(n_entries):
        nl, xl, cl = struct.unpack("<HHH", blob[off + 28 : off + 34])
        end = off + 46 + nl + xl + cl
        entries.append(bytearray(blob[off:end]))
        off = end
    for idx in z64_members:
        e = entries[idx]
        comp, uncomp = struct.unpack("<II", e[20:28])
        (lho,) = struct.unpack("<I", e[42:46])
        nl, xl, cl = struct.unpack("<HHH", e[28:34])
        assert cl == 0, "comment-bearing entries not handled"
        # sentinel the three fields; real values go to the zip64 extra
        struct.pack_into("<II", e, 20, 0xFFFFFFFF, 0xFFFFFFFF)
        struct.pack_into("<I", e, 42, 0xFFFFFFFF)
        dummy = struct.pack("<HH", 0x6675, 4) + b"test"  # opaque TLV first
        z64 = struct.pack("<HHQQQ", 0x0001, 24, uncomp, comp, lho)
        e += dummy + z64
        struct.pack_into("<H", e, 30, xl + len(dummy) + len(z64))
    cd = b"".join(bytes(e) for e in entries)
    z64_off = len(body) + len(cd)
    z64_rec = struct.pack(
        "<4sQHHIIQQQQ",
        b"PK\x06\x06", 44, 45, 45, 0, 0,
        n_entries, n_entries, len(cd), cd_off,
    )
    locator = struct.pack("<4sIQI", b"PK\x06\x07", 0, z64_off, 1)
    # plain comment, NO decoy signature: zipds_3 already pins decoy
    # rejection, and a decoy here would defeat stdlib zipfile's
    # rfind-based EOCD scan — keeping shard 4 stdlib-readable preserves
    # the independent third-implementation check on the zip64 layout
    comment = b"zip64 dataset shard with a plain archive comment"
    eocd = struct.pack(
        "<4sHHHHIIH",
        b"PK\x05\x06", 0, 0, 0xFFFF, 0xFFFF,
        0xFFFFFFFF, 0xFFFFFFFF, len(comment),
    ) + comment
    return body + cd + z64_rec + locator + eocd


def write_zip_fixtures() -> None:
    """ZIP dataset shards for llm_zip_members: written by the STDLIB
    zipfile module (a third, independent implementation — neither the
    Spark walk nor the SQL oracle), with pinned timestamps/attrs so
    regeneration is byte-stable. No zip64 — classic central
    directories. Shard 3 carries an ARCHIVE COMMENT (the EOCD is not
    at EOF-22) so the backward EOCD scan has a committed witness;
    the comment itself contains a decoy PK\\x05\\x06 whose
    comment-length field is wrong, pinning the validation step."""
    import io
    import zipfile

    for i in range(5):
        path = os.path.join(OUT, f"zipds_{i}.zip")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, data, method in zip_member_plan(i):
                zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                zi.compress_type = method
                zi.create_system = 3
                zi.external_attr = (0o40755 if name.endswith("/")
                                    else 0o644) << 16
                zf.writestr(zi, data)
            if i == 3:
                zf.comment = (
                    b"dataset shard 3; decoy EOCD follows: PK\x05\x06"
                    + bytes(18)
                    + b" end of comment"
                )
        blob = buf.getvalue()
        if i == 4:
            # shard 4 is the zip64 witness: entries 1 (deflated) and 5
            # (stored) carry zip64 extras behind a dummy TLV, and the
            # EOCD resolves through the spliced record + locator
            blob = to_zip64(blob, z64_members=(1, 5))
        with open(path, "wb") as f:
            f.write(blob)




def write_tiff_fixtures() -> None:
    """Baseline-TIFF twins of img_{i}.ppm — pixel-identical (like the
    PNG/GIF/lossless-JPEG twins), rotating through both byte orders,
    strip heights, and PackBits so every decoder branch is covered by
    a committed fixture."""
    import numpy as _np

    from hadoop_tools_spark.operators.tiff import encode_tiff

    for i in range(8):
        w, h = 16 + i * 3, 12 + i * 2
        xx, yy = _np.meshgrid(_np.arange(w), _np.arange(h))
        base = (xx * 7 + yy * 13 + i * 31) % 256
        px = _np.stack(
            [base, (base + 29) % 256, (base + 58) % 256], axis=-1
        ).astype(_np.uint8)
        if i in (2, 6):
            # two TILED twins (TIFF 6.0 §15, r9): same pixels, same
            # oracle — tif_2 uncompressed 16×16 tiles (edge padding in
            # both dims at 22×16), tif_6 LZW+predictor-2 16×16 tiles
            blob = encode_tiff(
                px,
                byteorder="<" if i % 2 == 0 else ">",
                compression="none" if i == 2 else "lzw",
                predictor=1 if i == 2 else 2,
                tiles=(16, 16),
            )
        else:
            blob = encode_tiff(
                px,
                byteorder="<" if i % 2 == 0 else ">",
                rows_per_strip=[None, 1, 3, 5][i % 4],
                compression=["packbits", "lzw", "none"][i % 3],
                predictor=2 if i % 3 == 1 else 1,
            )
        with open(os.path.join(OUT, f"tif_{i}.tif"), "wb") as f:
            f.write(blob)


def write_mp3_fixtures() -> None:
    """MP3 frame-chain shards for llm_mp3_frames, written by the
    engine's own header-arithmetic encoder (operators/mp3.py) —
    deterministic synthetic payloads, valid spec-exact frame lengths.
    The five shards rotate through the structural branches: plain CBR,
    ID3v2-prefixed VBR with padding bits, MPEG-2 with an ID3v1 trailer
    the walk must stop at, Layer I/II tables, and a torn final frame."""
    from hadoop_tools_spark.operators.mp3 import encode_mp3

    # mp3_0: MPEG-1 Layer III CBR 128 kbps @ 44100, bare chain
    blobs = [encode_mp3([(1, 3, 9, 0, 0)] * 20)]
    # mp3_1: ID3v2 tag + VBR (rotating bitrate indices, alternating
    # padding) @ 48000
    blobs.append(
        encode_mp3(
            [(1, 3, 5 + (j % 10), 1, j % 2) for j in range(16)],
            id3_size=137,
        )
    )
    # mp3_2: MPEG-2 Layer III @ 22050 with an ID3v1 trailer (the walk
    # terminates at the lost sync, keeping all frames)
    blobs.append(
        encode_mp3(
            [(2, 3, 8, 0, j % 2) for j in range(24)],
            trailing=b"TAG" + bytes((0x41 + i) % 256 for i in range(125)),
        )
    )
    # mp3_3: Layer I then Layer II frames (both slot arithmetics)
    blobs.append(
        encode_mp3(
            [(1, 1, 4 + (j % 3), 2, j % 2) for j in range(10)]
            + [(1, 2, 7, 0, 0)] * 8
        )
    )
    # mp3_4: torn final frame — truncated mid-payload, dropped by both
    # engines
    blobs.append(encode_mp3([(1, 3, 12, 2, 0)] * 12)[:-7])
    for i, blob in enumerate(blobs):
        with open(os.path.join(OUT, f"mp3_{i}.mp3"), "wb") as f:
            f.write(blob)




def write_ogg_fixtures() -> None:
    """Ogg page-chain shards for llm_ogg_pages, written by the
    engine's own RFC 3533 encoder (operators/ogg.py) — valid CRCs,
    deterministic synthetic packet payloads. The five shards rotate
    through the structural branches: plain BOS→EOS stream, physical
    multiplexing (two interleaved serials), packet continuation across
    pages (255-lacing + continued flag, incl. the zero-lacing
    exact-multiple terminator and a -1 granule on the no-packet-ends
    page), trailing junk after the chain, and a torn final page."""
    from hadoop_tools_spark.operators.ogg import encode_ogg

    # ogg_0: single stream, 5 pages, BOS first, EOS last
    blobs = [encode_ogg(
        [{"serial": 7001, "seq": 0, "flags": 2, "granule": 0,
          "packets": [30]}]
        + [{"serial": 7001, "seq": q, "granule": 1024 * q,
            "packets": [40 + 13 * q, 17 + q]} for q in (1, 2, 3)]
        + [{"serial": 7001, "seq": 4, "flags": 4, "granule": 5120,
            "packets": [9]}]
    )]
    # ogg_1: two multiplexed logical streams, pages interleaved
    pages = [
        {"serial": 111, "seq": 0, "flags": 2, "granule": 0,
         "packets": [22]},
        {"serial": 222, "seq": 0, "flags": 2, "granule": 0,
         "packets": [35]},
    ]
    for q in (1, 2):
        pages.append({"serial": 111, "seq": q, "granule": 800 * q,
                      "packets": [50 + q, 20]})
        pages.append({"serial": 222, "seq": q, "granule": 441 * q,
                      "packets": [64]})
    pages.append({"serial": 111, "seq": 3, "flags": 4, "granule": 2400,
                  "packets": [5]})
    pages.append({"serial": 222, "seq": 3, "flags": 4, "granule": 1323,
                  "packets": [12]})
    blobs.append(encode_ogg(pages))
    # ogg_2: a 600-byte packet spanning three pages (255+255+90), the
    # middle page completing no packet (granule -1 per spec), plus an
    # exact-multiple packet ending in the zero-lacing terminator
    blobs.append(encode_ogg([
        {"serial": 9, "seq": 0, "flags": 2, "granule": 0,
         "packets": [18]},
        {"serial": 9, "seq": 1, "granule": -1, "lacing": [255]},
        {"serial": 9, "seq": 2, "flags": 1, "granule": -1,
         "lacing": [255]},
        {"serial": 9, "seq": 3, "flags": 1, "granule": 3000,
         "lacing": [90, 255, 0]},
        {"serial": 9, "seq": 4, "flags": 4, "granule": 4000,
         "packets": [7]},
    ]))
    # ogg_3: valid chain, then trailing junk the walk stops at
    blobs.append(encode_ogg(
        [{"serial": 42, "seq": 0, "flags": 2, "granule": 0,
          "packets": [25]},
         {"serial": 42, "seq": 1, "flags": 4, "granule": 999,
          "packets": [31, 8]}],
        trailing=b"JUNK" + bytes((0x11 * i) % 256 for i in range(60)),
    ))
    # ogg_4: torn final page — truncated mid-payload, dropped by both
    # engines
    blobs.append(encode_ogg(
        [{"serial": 5, "seq": 0, "flags": 2, "granule": 0,
          "packets": [20]},
         {"serial": 5, "seq": 1, "granule": 500, "packets": [200]}]
    )[:-13])
    # ogg_5: Opus stream — REAL OpusHead ID packet on the BOS page
    # (RFC 7845: ID header alone on its page), OpusTags-ish second
    # packet, data pages, EOS
    from hadoop_tools_spark.operators.ogg import opus_head, vorbis_head

    blobs.append(encode_ogg([
        {"serial": 6001, "seq": 0, "flags": 2, "granule": 0,
         "packets_bytes": [opus_head(2, 312, 48000)]},
        {"serial": 6001, "seq": 1, "granule": 0,
         "packets_bytes": [b"OpusTags" + bytes(12)]},
        {"serial": 6001, "seq": 2, "granule": 960, "packets": [45, 33]},
        {"serial": 6001, "seq": 3, "flags": 4, "granule": 1920,
         "packets": [28]},
    ]))
    # ogg_6: Vorbis stream muxed with an unknown-codec stream
    pages = [
        {"serial": 71, "seq": 0, "flags": 2, "granule": 0,
         "packets_bytes": [vorbis_head(1, 44100)]},
        {"serial": 72, "seq": 0, "flags": 2, "granule": 0,
         "packets": [16]},
        {"serial": 71, "seq": 1, "granule": 1024, "packets": [52]},
        {"serial": 72, "seq": 1, "flags": 4, "granule": 77,
         "packets": [9]},
        {"serial": 71, "seq": 2, "flags": 4, "granule": 2048,
         "packets": [31]},
    ]
    blobs.append(encode_ogg(pages))
    for i, blob in enumerate(blobs):
        with open(os.path.join(OUT, f"ogg_{i}.ogg"), "wb") as f:
            f.write(blob)

if __name__ == "__main__":
    main()
