"""Baseline TIFF decode/encode in pure numpy+stdlib.

Implements the public TIFF 6.0 baseline subset: both byte orders
(``II``/``MM``), the IFD tag walk, strip-organized chunky (planar=1)
image data, photometric gray (0/1, incl. 1-bit bilevel), RGB and
palette-color (16-bit ColorMap), with Compression 1 (none),
32773 (PackBits RLE) and 5 (TIFF-variant LZW: MSB-first variable-width
codes with the early-change rule) plus Predictor 2 (horizontal
differencing).  Multi-strip files reassemble; 16-bit samples scale to
the high byte.

Encoders for every supported combination make each decode path
roundtrip-testable without fixtures from external tools (the repo-wide
codec contract; the reference treats media as opaque bytes).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


# ---------------------------------------------------------------------------
# PackBits (RLE)
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal run until the next repeat of length ≥3 (or 128 cap)
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early change)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > len(bits):
            return _EOI
        v = 0
        for b in bits[pos:pos + width]:
            v = (v << 1) | int(b)
        pos += width
        return v

    out = bytearray()
    table: List[bytes] = []
    width = 9
    prev: Optional[bytes] = None
    while len(out) < expected:
        code = read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # early change: the decoder's table lags the writer's by one
        # entry, so it widens at 2^w - 2 where the writer widens at
        # 2^w - 1 (TIFF 6.0 §13)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


def tiff_lzw_encode(data: bytes) -> bytes:
    out_bits: List[int] = []

    def write(code: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            out_bits.append((code >> i) & 1)

    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    write(_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        write(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change: widen when the next written code might need it
        if next_code == (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                write(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = c
    if w:
        write(table[w], width)
    write(_EOI, width)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr).tobytes()


# ---------------------------------------------------------------------------
# container decode
# ---------------------------------------------------------------------------


def _read_ifd(payload: bytes, endian: str) -> Dict[int, tuple]:
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    (n_tags,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags: Dict[int, tuple] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(endian + "HHI", payload, off)
        if typ not in _TYPE_FMT:
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", payload, off + 8)
        vals = struct.unpack_from(endian + str(count) + _TYPE_FMT[typ],
                                  payload, voff)
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF → (h, w, 3) uint8 (see module table for the subset)."""
    if payload[:2] == b"II":
        endian = "<"
    elif payload[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    if struct.unpack_from(endian + "H", payload, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    t = _read_ifd(payload, endian)

    def one(tag, default=None):
        v = t.get(tag)
        return default if v is None else v[0]

    w, h = one(256), one(257)
    if w is None or h is None:
        raise ValueError("TIFF missing dimensions")
    spp = one(277, 1)
    bits = t.get(258, (8,) * spp)
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar != 1:
        raise NotImplementedError("planar TIFF (PlanarConfig=2) not "
                                  "supported; chunky only")
    if any(b != bits[0] for b in bits):
        raise NotImplementedError("mixed per-channel bit depths")
    depth = bits[0]
    if depth not in (1, 8, 16) or (depth == 1 and photo not in (0, 1)):
        raise NotImplementedError(f"{depth}-bit TIFF samples not supported")
    offsets = t.get(273)
    counts = t.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    rows_per_strip = one(278, h)
    row_bytes = (w * spp * depth + 7) // 8
    strips = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = row_bytes * nrows
        raw = payload[off:off + cnt]
        if comp == 1:
            chunk = raw[:expected]
        elif comp == 32773:
            chunk = packbits_decode(raw, expected)
        elif comp == 5:
            chunk = tiff_lzw_decode(raw, expected)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} not supported: none/PackBits/LZW "
                "decode natively; JPEG-in-TIFF plugs into .jpeg here")
        if len(chunk) < expected:
            raise ValueError("TIFF strip shorter than expected")
        strips.append(np.frombuffer(chunk, np.uint8).reshape(nrows,
                                                             row_bytes))
    data = np.concatenate(strips)
    if depth == 1:
        pix = np.unpackbits(data, axis=1)[:, :w].astype(np.uint16)
        pix = pix[:, :, None] * 255
        if photo == 0:  # WhiteIsZero
            pix = 255 - pix
        return np.repeat(pix.astype(np.uint8), 3, axis=2)
    if depth == 16:
        v = data.reshape(h, row_bytes)
        if endian == "<":
            vals = (v[:, 1::2].astype(np.uint16) << 8) | v[:, 0::2]
        else:
            vals = (v[:, 0::2].astype(np.uint16) << 8) | v[:, 1::2]
        vals = vals[:, :w * spp].reshape(h, w, spp)
    else:
        vals = data[:, :w * spp].reshape(h, w, spp).astype(np.uint16)
    if predictor == 2:  # horizontal differencing per channel
        vals = np.cumsum(vals.astype(np.uint32), axis=1) & (
            0xFFFF if depth == 16 else 0xFF)
        vals = vals.astype(np.uint16)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photo == 3:  # palette-color: 16-bit ColorMap, R then G then B
        cmap = t.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, n).T >> 8
               ).astype(np.uint8)
        idx = np.clip(vals[:, :, 0], 0, n - 1)
        return np.ascontiguousarray(lut[idx])
    if depth == 16:
        vals = vals >> 8
    img = vals.astype(np.uint8)
    if photo in (0, 1) and spp == 1:
        if photo == 0:
            img = 255 - img
        return np.repeat(img, 3, axis=2)
    if photo == 2 and spp >= 3:
        return np.ascontiguousarray(img[:, :, :3])  # drop extra samples
    raise NotImplementedError(
        f"TIFF photometric {photo} with {spp} samples not supported")


# ---------------------------------------------------------------------------
# container encode
# ---------------------------------------------------------------------------


def _entry(tag: int, typ: int, vals: tuple, heap: bytearray,
           heap_base: int) -> bytes:
    count = len(vals)
    size = _TYPE_SIZES[typ] * count
    packed = struct.pack("<" + str(count) + _TYPE_FMT[typ], *vals)
    if size <= 4:
        return struct.pack("<HHI", tag, typ, count) + packed.ljust(4, b"\0")
    off = heap_base + len(heap)
    heap += packed
    if len(heap) & 1:
        heap += b"\0"
    return struct.pack("<HHI4s", tag, typ, count,
                       struct.pack("<I", off))


def encode_tiff(img: np.ndarray, compression: int = 1,
                rows_per_strip: Optional[int] = None,
                photometric: int = 2,
                colormap: Optional[np.ndarray] = None,
                predictor: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB — or (h, w) indices/gray with
    ``photometric`` 3/1 — → little-endian TIFF with Compression 1
    (none), 5 (LZW, optional Predictor 2) or 32773 (PackBits)."""
    if img.ndim == 2:
        spp = 1
        flat_rows = img.astype(np.uint8)
    else:
        spp = img.shape[2]
        flat_rows = img.astype(np.uint8).reshape(img.shape[0], -1)
    h, w = img.shape[:2]
    rps = rows_per_strip or h
    strips, offsets, counts = [], [], []
    for y0 in range(0, h, rps):
        rows = flat_rows[y0:y0 + rps]
        if predictor == 2:
            v = rows.reshape(rows.shape[0], -1, spp).astype(np.int16)
            d = np.empty_like(v)
            d[:, 0] = v[:, 0]
            d[:, 1:] = v[:, 1:] - v[:, :-1]
            rows = (d & 0xFF).astype(np.uint8).reshape(rows.shape[0], -1)
        raw = rows.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        elif compression == 5:
            strips.append(tiff_lzw_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")
    header_guess = 8
    tags = []  # assembled twice: once to size the IFD, once for real

    def build(strip_offsets):
        heap = bytearray()
        entries = [
            (256, 3, (w,)), (257, 3, (h,)),
            (258, 3, (8,) * spp),
            (259, 3, (compression,)),
            (262, 3, (photometric,)),
            (273, 4, tuple(strip_offsets)),
            (277, 3, (spp,)),
            (278, 3, (rps,)),
            (279, 4, tuple(len(s) for s in strips)),
        ]
        if predictor != 1:
            entries.append((317, 3, (predictor,)))
        if colormap is not None:
            cm = colormap.astype(np.uint32)
            n = len(cm)
            vals = tuple(int(c) << 8 for c in
                         np.concatenate([cm[:, 0], cm[:, 1], cm[:, 2]]))
            entries.append((320, 3, vals))
        entries.sort()
        n_tags = len(entries)
        ifd_size = 2 + n_tags * 12 + 4
        heap_base = header_guess + ifd_size
        body = struct.pack("<H", n_tags)
        for tag, typ, vals in entries:
            body += _entry(tag, typ, vals, heap, heap_base)
        body += struct.pack("<I", 0)  # no next IFD
        return body + bytes(heap)

    ifd = build([0] * len(strips))
    data_base = header_guess + len(ifd)
    off = data_base
    for s in strips:
        offsets.append(off)
        off += len(s) + (len(s) & 1)
    ifd = build(offsets)
    assert header_guess + len(ifd) == data_base
    out = b"II" + struct.pack("<HI", 42, 8) + ifd
    for s in strips:
        out += s + (b"\0" if len(s) & 1 else b"")
    return out
