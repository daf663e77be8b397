"""ISO-BMFF (MP4) container codec — from-scratch encoder + box walker.

The container real multimodal corpora actually ship video in (ISO/IEC
14496-12). Like the ZIP central directory, the `moov` sample tables are
a SEEKABLE INDEX over the payload: `stsz` (per-sample sizes), `stsc`
(sample→chunk runs), `stco`/`co64` (32/64-bit chunk offsets) let a
loader jump straight to any sample without scanning `mdat` — exactly
how production video loaders random-access a shard.

Encoder writes fixture files with MJPEG payloads (the same
`encode_jpeg` frames as the AVI fixtures, so `mp4_{i}` is a
cross-format twin of `vid_{i}.avi`), rotating through the structural
branches the spec allows: 32-bit `stco` vs 64-bit `co64`, classic
32-bit box sizes vs the `size==1` largesize escape on `mdat`, multi-run
`stsc` chunking, and a trailing `size==0` (to-EOF) `free` box.

Walker semantics are fail-closed like the tar/ZIP walks: a torn or
lying box header (size smaller than its own header, or overrunning the
parent) stops the walk, keeping boxes already emitted; a torn sample
table yields no sample rows for that file.
"""

from __future__ import annotations

import struct

#: container boxes the walker descends into (dref is a FullBox with
#: its own entry framing — deliberately treated as a leaf)
CONTAINERS = frozenset(
    {"moov", "trak", "mdia", "minf", "stbl", "dinf", "edts", "udta"}
)

_TIMESCALE = 1000


def _be32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _be64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


# ---------------------------------------------------------------------------
# encoder (fixture writer — the independent implementation the Spark
# walk and the SQL oracle are both checked against)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes, *, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big"))
                + payload)


def _matrix() -> bytes:
    # identity display matrix (16.16 / 2.30 fixed point)
    return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _chunk_plan(n_samples: int, samples_per_chunk: int) -> list[int]:
    """Chunk sizes for n samples at spc per chunk (last chunk ragged)."""
    out = []
    left = n_samples
    while left > 0:
        take = min(samples_per_chunk, left)
        out.append(take)
        left -= take
    return out


def encode_mp4(
    jpegs: list[bytes],
    width: int,
    height: int,
    fps: int = 5,
    *,
    samples_per_chunk: int = 3,
    co64: bool = False,
    large_mdat: bool = False,
    trailing_free: int = 0,
) -> bytes:
    """JPEG sample payloads → ISO-BMFF bytes (ftyp + mdat + moov, the
    classic non-faststart layout, so every stco offset is known before
    moov is built)."""
    n = len(jpegs)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_payload = b"".join(jpegs)
    mdat = _box(b"mdat", mdat_payload, large=large_mdat)
    mdat_hdr = 16 if large_mdat else 8
    data_start = len(ftyp) + mdat_hdr

    chunks = _chunk_plan(n, samples_per_chunk)
    # absolute chunk offsets into the file
    chunk_offs, pos, si = [], data_start, 0
    for c in chunks:
        chunk_offs.append(pos)
        pos += sum(len(j) for j in jpegs[si : si + c])
        si += c
    # stsc runs: compress consecutive equal samples-per-chunk counts
    runs = []
    for j, c in enumerate(chunks):
        if not runs or runs[-1][1] != c:
            runs.append((j + 1, c))

    duration = n * _TIMESCALE // fps
    delta = _TIMESCALE // fps

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">iHH8x", 0x10000, 0x0100, 0)
        + _matrix() + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + bytes(8) + struct.pack(">hhhH", 0, 0, 0, 0)
        + _matrix()
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, _TIMESCALE, duration, 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I4s12x", 0, b"vide") + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0,
                 struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry('jpeg') — the QT/ISO codingname for MJPEG
    entry = _box(
        b"jpeg",
        bytes(6) + struct.pack(">H", 1)          # reserved + dri
        + struct.pack(">HH", 0, 0) + bytes(12)   # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                   # frame_count
        + bytes(32)                              # compressorname
        + struct.pack(">Hh", 24, -1),            # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, c, 1) for fc, c in runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    if co64:
        stco = _full(b"co64", 0, 0,
                     struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    else:
        stco = _full(b"stco", 0, 0,
                     struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    out = ftyp + mdat + moov
    if trailing_free:
        # size==0 escape: the box extends to end-of-file
        out += struct.pack(">I4s", 0, b"free") + bytes(trailing_free)
    return out


# ---------------------------------------------------------------------------
# walker (the Spark side)
# ---------------------------------------------------------------------------


def parse_boxes(b: bytes) -> list[tuple[str, str, int, int]]:
    """Recursive box walk → [(box_path, box_type, offset, size)] in
    document order, where box_path is the full /-joined path including
    the box itself. Fail-closed: a torn header or a size overrunning
    the parent stops the WHOLE walk, keeping boxes already emitted."""
    out: list[tuple[str, str, int, int]] = []
    stop = False

    def walk(start: int, lim: int, parent: str) -> None:
        nonlocal stop
        off = start
        while not stop and off < lim:
            if off + 8 > lim:
                stop = True  # trailing bytes too short for a header
                return
            s = _be32(b, off)
            btype = b[off + 4 : off + 8].decode("ascii", "replace")
            if s == 1:
                if off + 16 > lim:
                    stop = True
                    return
                size, hdr = _be64(b, off + 8), 16
            elif s == 0:
                size, hdr = lim - off, 8
            else:
                size, hdr = s, 8
            if size < hdr or off + size > lim:
                stop = True  # lying size: torn or corrupt box
                return
            path = f"{parent}/{btype}" if parent else btype
            out.append((path, btype, off, size))
            if btype in CONTAINERS:
                walk(off + hdr, off + size, path)
            off += size

    walk(0, len(b), "")
    return out


def _table(boxes: list[tuple[str, str, int, int]], btype: str) -> int | None:
    for _, t, off, _ in boxes:
        if t == btype:
            return off
    return None


def mp4_samples(b: bytes) -> list[tuple[int, int, int, int, int]]:
    """stbl-driven sample table → [(sample_id, offset, size, width,
    height)] with offsets ABSOLUTE into the file — the seekable-index
    read path (no mdat scan). Fail-closed: a missing/torn table, a
    sample overrunning the file, or a chunk map not covering every
    sample yields []."""
    boxes = parse_boxes(b)
    stsz_o, stsc_o = _table(boxes, "stsz"), _table(boxes, "stsc")
    stsd_o = _table(boxes, "stsd")
    stco_o, co64_o = _table(boxes, "stco"), _table(boxes, "co64")
    if None in (stsz_o, stsc_o, stsd_o) or (stco_o is None and co64_o is None):
        return []
    try:
        width = struct.unpack_from(">H", b, stsd_o + 16 + 32)[0]
        height = struct.unpack_from(">H", b, stsd_o + 16 + 34)[0]
        fixed, n = struct.unpack_from(">II", b, stsz_o + 12)
        sizes = (
            [fixed] * n
            if fixed
            else list(struct.unpack_from(f">{n}I", b, stsz_o + 20))
        )
        n_runs = _be32(b, stsc_o + 12)
        runs = [
            struct.unpack_from(">III", b, stsc_o + 16 + 12 * k)[:2]
            for k in range(n_runs)
        ]
        if co64_o is not None:
            n_chunks = _be32(b, co64_o + 12)
            offs = [_be64(b, co64_o + 16 + 8 * j) for j in range(n_chunks)]
        else:
            n_chunks = _be32(b, stco_o + 12)
            offs = [_be32(b, stco_o + 16 + 4 * j) for j in range(n_chunks)]
    except struct.error:
        return []
    # expand stsc runs to per-chunk sample counts
    spc = []
    for k, (first, count) in enumerate(runs):
        last = runs[k + 1][0] - 1 if k + 1 < len(runs) else n_chunks
        spc.extend([count] * (last - first + 1))
    if len(spc) != n_chunks or sum(spc) != n:
        return []  # chunk map doesn't cover the sample table
    out, i = [], 0
    for j in range(n_chunks):
        pos = offs[j]
        for _ in range(spc[j]):
            if pos + sizes[i] > len(b):
                return []  # sample overruns the file: torn payload
            out.append((i, pos, sizes[i], width, height))
            pos += sizes[i]
            i += 1
    return out
