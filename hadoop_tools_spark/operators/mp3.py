"""MP3 (MPEG-1/2 audio) frame walk — pure header arithmetic.

The frame *index* of an MP3 stream is losslessly parseable from public
spec tables (ISO/IEC 11172-3 §2.4.1.3 / ISO 13818-3): each 4-byte
header carries version, layer, bitrate index, samplerate index, and a
padding bit, from which the frame length follows by integer
arithmetic — no entropy decoding. That makes an MP3 corpus CDX-shaped:
one pass yields a seekable (offset, length) table per file, exactly
like the WARC/ZIP/MP4 walks. Audio DECODE stays the engine's declared
lossy-codec seam (`llm_multimodal_tolerant`); this module never
touches subband samples.

``encode_mp3`` builds deterministic fixture streams (valid headers +
synthetic payload bytes — not playable audio, but byte-exact walkable
frames), so the walker and its DuckDB oracle are tested against bytes
neither produced.
"""

from __future__ import annotations

import hashlib

# bitrate tables in kbps, indexed 1..14 (0 = free format, 15 = bad —
# both stop the walk, fail closed)
_BITRATES = {
    # (mpeg_version, layer): [idx 1..14]
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLERATES = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000]}


def _frame_len(version: int, layer: int, bitrate_kbps: int,
               samplerate: int, padding: int) -> int:
    """ISO 11172-3 frame-length arithmetic (integer division):
    Layer I counts 4-byte slots; Layer II is always 144 coefficient;
    Layer III halves to 72 for MPEG-2 (halved frame rate)."""
    br = bitrate_kbps * 1000
    if layer == 1:
        return (12 * br // samplerate + padding) * 4
    if layer == 2 or version == 1:
        return 144 * br // samplerate + padding
    return 72 * br // samplerate + padding


def _id3v2_size(blob: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size),
    0 when absent. A torn tag header (under 10 bytes) skips nothing —
    the frame-sync check right after fails closed."""
    if len(blob) < 10 or blob[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in blob[6:10]):
        return 0  # non-syncsafe size byte: not a valid v2 header
    size = (
        (blob[6] & 0x7F) << 21 | (blob[7] & 0x7F) << 14
        | (blob[8] & 0x7F) << 7 | (blob[9] & 0x7F)
    )
    return 10 + size


def mp3_frames(blob: bytes) -> list[tuple]:
    """Walk the frame chain; one tuple per frame:
    ``(frame_id, offset, frame_len, version, layer, bitrate_kbps,
    samplerate, padding, frame_md5)`` where ``frame_md5`` is the
    container family's digest convention (md5 over UPPERCASE hex of
    the frame bytes, header included).

    Fail-closed like every container walk here: the first torn frame
    (overruns EOF) or lost sync (invalid header fields — including
    free-format bitrate 0, reserved bitrate 15, reserved samplerate,
    reserved version 01 and MPEG-2.5) stops the walk, keeping frames
    already emitted. Trailing junk (ID3v1 tags etc.) therefore just
    terminates the chain.
    """
    out = []
    off = _id3v2_size(blob)
    while off + 4 <= len(blob):
        b0, b1, b2 = blob[off], blob[off + 1], blob[off + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # lost sync
        ver_bits = (b1 >> 3) & 3
        lay_bits = (b1 >> 1) & 3
        if ver_bits not in (2, 3) or lay_bits == 0:
            break  # reserved version / MPEG-2.5 / reserved layer
        version = 1 if ver_bits == 3 else 2
        layer = 4 - lay_bits
        bidx = b2 >> 4
        sidx = (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        if not 1 <= bidx <= 14 or sidx == 3:
            break  # free-format / bad bitrate, reserved samplerate
        bitrate = _BITRATES[(version, layer)][bidx - 1]
        samplerate = _SAMPLERATES[version][sidx]
        flen = _frame_len(version, layer, bitrate, samplerate, padding)
        if off + flen > len(blob):
            break  # torn final frame: dropped
        frame = blob[off : off + flen]
        out.append((
            len(out), off, flen, version, layer, bitrate, samplerate,
            padding, hashlib.md5(frame.hex().upper().encode()).hexdigest(),
        ))
        off += flen
    return out


def encode_mp3(
    frames: list[tuple],
    id3_size: int = 0,
    trailing: bytes = b"",
) -> bytes:
    """Deterministic fixture stream: ``frames`` is a list of
    ``(version, layer, bitrate_idx, samplerate_idx, padding)`` specs;
    each becomes a valid header + a synthetic payload filling the
    spec-exact frame length. ``id3_size`` > 0 prepends an ID3v2.3 tag
    with that many payload bytes; ``trailing`` appends post-chain junk
    (e.g. an ID3v1 tag) the walker must stop at, not crash on."""
    out = bytearray()
    if id3_size > 0:
        if id3_size >= 1 << 28:
            raise ValueError("ID3v2 size exceeds syncsafe range")
        out += b"ID3\x03\x00\x00"
        out += bytes(
            (id3_size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += bytes((0x54 + 13 * i) % 256 for i in range(id3_size))
    for fid, (version, layer, bidx, sidx, padding) in enumerate(frames):
        if version not in (1, 2) or layer not in (1, 2, 3):
            raise ValueError("unsupported version/layer")
        if not 1 <= bidx <= 14 or not 0 <= sidx <= 2:
            raise ValueError("bitrate/samplerate index out of range")
        ver_bits = 3 if version == 1 else 2
        lay_bits = 4 - layer
        b1 = 0xE0 | (ver_bits << 3) | (lay_bits << 1) | 1  # no CRC
        b2 = (bidx << 4) | (sidx << 2) | (padding << 1)
        b3 = 0xC0  # mono, no extensions
        bitrate = _BITRATES[(version, layer)][bidx - 1]
        samplerate = _SAMPLERATES[version][sidx]
        flen = _frame_len(version, layer, bitrate, samplerate, padding)
        out += bytes((0xFF, b1, b2, b3))
        out += bytes((0x20 + fid * 7 + i * 3) % 256 for i in range(flen - 4))
    out += trailing
    return bytes(out)
