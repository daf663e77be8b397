"""Minimal MJPEG-AVI container codec (pure Python).

Writer + parser for the simplest real video container: RIFF 'AVI '
with an 'hdrl' header list (avih + one 'vids'/'MJPG' stream) and a
'movi' list of '00dc' chunks, each chunk one baseline JPEG frame
(operators/jpeg.py). This makes the engine's video path REAL end to
end — container demux + per-frame codec decode — while staying
deterministic and dependency-free. Production corpora swap ffmpeg
into the same seam (H.264 et al. raise NotImplementedError).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(frames: list[np.ndarray], fps: int = 10, quality: int = 90) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → MJPEG AVI bytes."""
    from .jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<10I4x4x4x4x",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x100,             # dwFlags AVIF_ISINTERLEAVED (0x10 would be
                           # AVIF_HASINDEX — a lie with no idx1 chunk)
        len(jpegs),        # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_sz,            # dwSuggestedBufferSize
        w,                 # dwWidth
        h,                 # dwHeight
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # dwScale / dwRate
        0, len(jpegs), max_sz, 0xFFFFFFFF, 0,
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes → (width, height, total_frames, [frame payloads]).

    Walks the RIFF tree; only '00dc'/'01dc' compressed-frame chunks
    are collected. Non-MJPG streams surface when the frame payload
    reaches the JPEG decoder (which raises on a non-JPEG magic).
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = total = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, total
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            payload_start = pos + 8
            if fourcc == b"LIST":
                walk(payload_start + 4, payload_start + size)
            elif fourcc == b"avih":
                (
                    _us, _bps, _pad, _flags, total_, _init, _nstr, _buf,
                    w_, h_,
                ) = struct.unpack_from("<10I", blob, payload_start)
                w, h, total = w_, h_, total_
            elif fourcc == b"00dc":
                # stream 0 only: a '??dc' wildcard would interleave a
                # second video track's frames into this list, breaking
                # frame_id indexing and the n_frames contract
                frames.append(blob[payload_start : payload_start + size])
            pos = payload_start + size + (size % 2)

    walk(12, len(blob))
    if w is None:
        raise ValueError("missing avih header")
    return w, h, total if total is not None else len(frames), frames


def decode_video_frames(
    blob: bytes, every_n: int = 2
) -> list[tuple[int, int, int, np.ndarray]]:
    """AVI bytes → [(frame_id, width, height, RGB array)] for every
    ``every_n``-th frame — container demux + real JPEG decode; the
    skipped frames' payloads are never decoded (the point of sampled
    decode at 100 TB: demux is cheap, codecs are not)."""
    from .jpeg import decode_jpeg

    _w, _h, _total, frames = parse_avi(blob)
    out = []
    for fid in range(0, len(frames), every_n):
        fw, fh, px = decode_jpeg(frames[fid])
        out.append((fid, fw, fh, px))
    return out
