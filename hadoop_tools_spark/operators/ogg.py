"""Ogg container page walk — pure header arithmetic (RFC 3533).

An Ogg physical stream is a chain of self-delimiting pages: a 27-byte
header (capture pattern ``OggS``, version 0, flag byte, granule
position, bitstream serial, page sequence, CRC), a segment table of
``nsegs`` lacing values, then the payload whose length is the sum of
the lacing values. Page length therefore follows from the header alone
— no codec decode — which makes an Ogg corpus CDX-shaped exactly like
the MP3/MP4/WARC walks: one pass yields a seekable (offset, length)
table plus the logical-stream demux key (the serial number, since Ogg
physically multiplexes streams by interleaving their pages). Audio
DECODE (Vorbis/Opus packets) stays the engine's declared lossy-codec
seam; this module never looks inside a packet.

The CRC is the non-reflected CRC-32 with generator 0x04C11DB7, zero
init and zero final XOR, computed over the whole page with the CRC
field zeroed (RFC 3533 §6). The walker VERIFIES it and fails closed on
mismatch; the DuckDB oracle intentionally re-walks strides and digests
without re-deriving the CRC (a 256-entry table fold per byte in SQL) —
the committed fixtures carry writer-computed CRCs, and the corrupt-CRC
seam is pinned by pytest on non-fixture bytes instead (the same
declared-cap pattern as the zip oracle's 3-TLV zip64 probe).

``encode_ogg`` builds deterministic fixture streams (valid headers,
correct CRCs, synthetic packet payloads — not playable audio), so the
walker and its oracle are tested against bytes neither produced.
"""

from __future__ import annotations

import hashlib
import struct


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = (
                ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            ) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _crc_table()


def ogg_crc(data: bytes) -> int:
    """RFC 3533 §6 page CRC: poly 0x04C11DB7, no reflection, init 0,
    no final XOR."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def lacing_for(packet_lens: list[int]) -> list[int]:
    """Segment-table lacing values for whole packets ending on this
    page: each packet contributes ``len // 255`` values of 255 then
    ``len % 255`` (a final 0 when the length is an exact multiple —
    the spec's explicit zero-lacing terminator)."""
    out: list[int] = []
    for n in packet_lens:
        if n < 0:
            raise ValueError("negative packet length")
        out.extend([255] * (n // 255))
        out.append(n % 255)
    return out


def ogg_pages(blob: bytes) -> list[tuple]:
    """Walk the page chain; one tuple per page:
    ``(page_id, offset, page_len, continued, bos, eos, granule,
    serial, page_seq, nsegs, body_len, npackets, page_md5)`` where
    ``npackets`` counts packets COMPLETED on the page (lacing values
    below 255 — a trailing 255 defers the packet to the next page) and
    ``page_md5`` is the container family's digest convention (md5 over
    UPPERCASE hex of the whole page, header included).

    Fail-closed like every container walk here: a lost capture
    pattern, non-zero version, reserved flag bits, a torn segment
    table or payload, or a CRC mismatch stops the walk, keeping pages
    already emitted. Trailing junk therefore just terminates the
    chain.
    """
    out = []
    off = 0
    while off + 27 <= len(blob):
        if blob[off : off + 4] != b"OggS" or blob[off + 4] != 0:
            break  # lost capture / unknown version
        flags = blob[off + 5]
        if flags & 0xF8:
            break  # reserved flag bits set: not a valid page
        nsegs = blob[off + 26]
        if off + 27 + nsegs > len(blob):
            break  # torn segment table
        lacing = blob[off + 27 : off + 27 + nsegs]
        body_len = sum(lacing)
        page_len = 27 + nsegs + body_len
        if off + page_len > len(blob):
            break  # torn payload: dropped
        page = blob[off : off + page_len]
        (stored_crc,) = struct.unpack_from("<I", page, 22)
        if ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) != stored_crc:
            break  # corrupt page: fail closed
        granule = struct.unpack_from("<q", page, 6)[0]
        serial, seq = struct.unpack_from("<II", page, 14)
        out.append((
            len(out), off, page_len, flags & 1, (flags >> 1) & 1,
            (flags >> 2) & 1, granule, serial, seq, nsegs, body_len,
            sum(1 for v in lacing if v < 255),
            hashlib.md5(page.hex().upper().encode()).hexdigest(),
        ))
        off += page_len
    return out


def encode_ogg(pages: list[dict], trailing: bytes = b"") -> bytes:
    """Deterministic fixture stream. Each page spec is a dict with
    ``serial``, ``seq``, ``flags`` (bit 0 continued / 1 BOS / 2 EOS),
    ``granule``, and either ``packets`` (list of packet lengths,
    converted via :func:`lacing_for`) or raw ``lacing`` (for
    continued-packet pages that end mid-packet with a 255 value).
    Payload bytes are synthesized deterministically from (serial, seq,
    position); the CRC is computed per RFC 3533. ``trailing`` appends
    post-chain junk the walker must stop at, not crash on."""
    out = bytearray()
    for spec in pages:
        explicit_body: bytes | None = None
        if "packets_bytes" in spec:
            pkts = [bytes(p) for p in spec["packets_bytes"]]
            lacing = lacing_for([len(p) for p in pkts])
            explicit_body = b"".join(pkts)
        elif "lacing" in spec:
            lacing = list(spec["lacing"])
        else:
            lacing = lacing_for(spec["packets"])
        if len(lacing) > 255 or any(not 0 <= v <= 255 for v in lacing):
            raise ValueError("invalid segment table")
        body_len = sum(lacing)
        serial, seq = spec["serial"], spec["seq"]
        header = bytearray(b"OggS\x00")
        header.append(spec.get("flags", 0))
        header += struct.pack("<q", spec.get("granule", 0))
        header += struct.pack("<II", serial, seq)
        header += b"\x00\x00\x00\x00"  # CRC placeholder
        header.append(len(lacing))
        header += bytes(lacing)
        body = (
            explicit_body
            if explicit_body is not None
            else bytes(
                (0x30 + serial * 11 + seq * 7 + i * 3) % 256
                for i in range(body_len)
            )
        )
        page = bytearray(header + body)
        struct.pack_into("<I", page, 22, ogg_crc(bytes(page)))
        out += page
    out += trailing
    return bytes(out)


def opus_head(channels: int, preskip: int, rate: int,
              gain: int = 0) -> bytes:
    """Minimal valid OpusHead ID packet (RFC 7845 §5.1): magic,
    version 1, channel count, pre-skip LE16, input sample rate LE32,
    output gain LE16, mapping family 0."""
    return (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<HIh", preskip, rate, gain) + b"\x00"
    )


def vorbis_head(channels: int, rate: int) -> bytes:
    """Minimal Vorbis identification header (Vorbis I §4.2.2): packet
    type 1 + 'vorbis', version 0 LE32, channels, sample rate LE32,
    bitrate triple, blocksize byte, framing bit."""
    return (
        b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
        + struct.pack("<iii", 0, 96000, 0)[:12]
        + bytes([0xB8, 0x01])
    )


def ogg_streams(blob: bytes) -> list[tuple]:
    """Per-logical-stream demux summary over the page walk; one tuple
    per serial: ``(serial, codec, n_pages, n_packets, first_granule,
    last_granule, eos_seen, channels, sample_rate, pre_skip)``.

    Codec identification parses the BOS page's first packet — the
    spec requires the ID header alone on the BOS page (RFC 7845 §4 /
    Vorbis I §4.2.1), so no cross-page reassembly is needed for it:
    OpusHead (RFC 7845 §5.1: channels, pre-skip, input sample rate),
    Vorbis ID (Vorbis I §4.2.2: channels, sample rate), Theora
    (0x80 'theora'), else ``unknown`` with NULL codec fields —
    unknown payloads stay opaque, decode is the declared lossy seam.
    Streams whose BOS page is missing from the walked prefix (torn
    file) report codec ``unknown`` too: fail-closed, never a guess.
    """
    pages = ogg_pages(blob)
    streams: dict[int, dict] = {}
    for (
        _pid, off, _plen, _cont, bos, eos, granule, serial, _seq,
        nsegs, _blen, npackets, _md5,
    ) in pages:
        st = streams.setdefault(
            serial,
            {
                "codec": "unknown", "n_pages": 0, "n_packets": 0,
                "first_granule": granule, "last_granule": granule,
                "eos_seen": 0, "channels": None, "sample_rate": None,
                "pre_skip": None,
            },
        )
        st["n_pages"] += 1
        st["n_packets"] += npackets
        st["last_granule"] = granule
        if eos:
            st["eos_seen"] = 1
        if bos:
            # LAST BOS page wins, unconditionally: fields reset before
            # the parse so an unknown second BOS cannot inherit an
            # earlier page's codec (keeps the walker row-for-row equal
            # to the oracle's arg_max(page_id) BOS selection even on
            # spec-malformed duplicate-BOS streams)
            st["codec"] = "unknown"
            st["channels"] = st["sample_rate"] = st["pre_skip"] = None
            body_off = off + 27 + nsegs
            first_len = blob[off + 27] if nsegs else 0
            pkt = blob[body_off : body_off + first_len]
            if pkt[:8] == b"OpusHead" and len(pkt) >= 19:
                st["codec"] = "opus"
                st["channels"] = pkt[9]
                st["pre_skip"] = struct.unpack_from("<H", pkt, 10)[0]
                st["sample_rate"] = struct.unpack_from("<I", pkt, 12)[0]
            elif pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
                st["codec"] = "vorbis"
                st["channels"] = pkt[11]
                st["sample_rate"] = struct.unpack_from("<I", pkt, 12)[0]
            elif pkt[:7] == b"\x80theora":
                st["codec"] = "theora"
    return [
        (
            serial, st["codec"], st["n_pages"], st["n_packets"],
            st["first_granule"], st["last_granule"], st["eos_seen"],
            st["channels"], st["sample_rate"], st["pre_skip"],
        )
        for serial, st in sorted(streams.items())
    ]
