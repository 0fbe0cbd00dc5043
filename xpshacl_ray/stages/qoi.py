"""QOI ("Quite OK Image") codec — the public qoiformat.org spec,
pure Python/numpy.

A modern byte-aligned lossless format seen in game/tooling corpora:
14-byte header, then a chunk stream of RGB/RGBA literals, 64-entry
hash-indexed color cache (``(3r+5g+7b+11a) % 64``), 2-bit channel
diffs, luma diffs, and run-lengths, closed by the 8-byte end marker.
Both directions implemented so roundtrips are fixture-free and
bit-exact (the repo-wide codec contract)."""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX, _OP_DIFF, _OP_LUMA, _OP_RUN = 0x00, 0x40, 0x80, 0xC0
_OP_RGB, _OP_RGBA = 0xFE, 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI bytes → (h, w, 3) uint8 (alpha decoded, then dropped)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a QOI payload")
    w, h = struct.unpack_from(">II", payload, 4)
    channels, _colorspace = payload[12], payload[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    cache = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    while i < n:
        if pos >= len(data) - 7:
            raise ValueError("truncated QOI stream")
        byte = data[pos]
        pos += 1
        if byte == _OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], \
                data[pos + 3]
            pos += 4
        else:
            tag = byte & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = cache[byte & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == _OP_LUMA:
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:  # run
                run = (byte & 0x3F) + 1
                out[i:i + run] = (r, g, b, a)
                i += run
                cache[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        cache[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if i != n:
        raise ValueError("QOI pixel count overrun")
    if data[pos:pos + 8] != _END:
        raise ValueError("QOI missing end marker")
    return out[:, :3].reshape(h, w, 3).copy()


def encode_qoi(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → QOI bytes (all five op kinds exercised on
    natural content: runs, cache hits, diffs, luma diffs, literals)."""
    h, w, _ = img.shape
    px = img.reshape(-1, 3)
    out = bytearray(_MAGIC + struct.pack(">II", w, h) + bytes([3, 0]))
    cache = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(len(px)):
        r, g, b = int(px[i, 0]), int(px[i, 1]), int(px[i, 2])
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        idx = _hash(r, g, b, 255)
        if cache[idx] == (r, g, b, 255):
            out.append(_OP_INDEX | idx)
        else:
            cache[idx] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([_OP_RGB, r, g, b])
        pr, pg, pb = r, g, b
    if run:
        out.append(_OP_RUN | (run - 1))
    return bytes(out + _END)
