"""Truevision TGA (Targa) codec in pure numpy.

The public TGA 2.0 spec: 18-byte header, optional image ID and 24/32-bit
BGR(A) color map, image types 1/2/3 (palette / truecolor / gray, raw)
and 9/10/11 (their RLE forms), pixel depths 8/16(ARGB1555)/24/32,
bottom-up and top-down origins.  Encoders for the raw and RLE truecolor
/ palette / gray paths keep every decoder branch roundtrip-tested
without external fixtures (the repo-wide codec contract)."""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_RAW_PAL, _RAW_RGB, _RAW_GRAY = 1, 2, 3
_RLE_PAL, _RLE_RGB, _RLE_GRAY = 9, 10, 11


def _rle_decode(data: bytes, n_pixels: int, bpp: int) -> bytes:
    out = bytearray()
    pos = 0
    need = n_pixels * bpp
    while len(out) < need:
        if pos >= len(data):
            raise ValueError("truncated TGA RLE stream")
        head = data[pos]
        pos += 1
        count = (head & 0x7F) + 1
        if head & 0x80:  # run packet: one pixel value repeated
            out += data[pos:pos + bpp] * count
            pos += bpp
        else:  # literal packet
            out += data[pos:pos + count * bpp]
            pos += count * bpp
    return bytes(out[:need])


def _rle_encode(pix: np.ndarray) -> bytes:
    """(n, bpp) uint8 pixel rows → TGA RLE packets (128-cap runs)."""
    out = bytearray()
    n = len(pix)
    i = 0
    while i < n:
        run = 1
        while (i + run < n and run < 128
               and (pix[i + run] == pix[i]).all()):
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out += pix[i].tobytes()
            i += run
            continue
        j = i + 1
        while j < n and j - i < 128:
            if j + 1 < n and (pix[j] == pix[j + 1]).all():
                break
            j += 1
        out.append(j - i - 1)
        out += pix[i:j].tobytes()
        i = j
    return bytes(out)


def decode_tga(payload: bytes) -> np.ndarray:
    """TGA → (h, w, 3) uint8 (see module table for the subset)."""
    if len(payload) < 18:
        raise ValueError("not a TGA payload (too short)")
    (id_len, cmap_type, img_type, cm_first, cm_len, cm_bits,
     _xo, _yo, w, h, depth, desc) = struct.unpack_from(
        "<BBBHHBHHHHBB", payload, 0)
    if img_type not in (_RAW_PAL, _RAW_RGB, _RAW_GRAY,
                        _RLE_PAL, _RLE_RGB, _RLE_GRAY):
        raise NotImplementedError(f"TGA image type {img_type}")
    if depth not in (8, 16, 24, 32):
        raise NotImplementedError(f"{depth}-bit TGA pixels")
    pos = 18 + id_len
    palette: Optional[np.ndarray] = None
    if cmap_type == 1:
        entry_bytes = cm_bits // 8
        raw = np.frombuffer(payload, np.uint8,
                            count=cm_len * entry_bytes, offset=pos
                            ).reshape(cm_len, entry_bytes)
        palette = raw[:, 2::-1] if entry_bytes >= 3 else \
            np.repeat(raw[:, :1], 3, axis=1)  # BGR(A) → RGB
        pos += cm_len * entry_bytes
    bpp = depth // 8
    rle = img_type in (_RLE_PAL, _RLE_RGB, _RLE_GRAY)
    if rle:
        data = _rle_decode(payload[pos:], w * h, bpp)
    else:
        data = payload[pos:pos + w * h * bpp]
        if len(data) < w * h * bpp:
            raise ValueError("truncated TGA pixel data")
    pix = np.frombuffer(data, np.uint8).reshape(h, w, bpp)
    base = img_type if not rle else img_type - 8
    if base == _RAW_PAL:
        if palette is None:
            raise ValueError("palette TGA missing color map")
        idx = pix[:, :, 0].astype(np.int64) - cm_first
        out = palette[np.clip(idx, 0, len(palette) - 1)]
    elif base == _RAW_GRAY:
        out = np.repeat(pix[:, :, :1], 3, axis=2)
    elif depth == 16:  # ARGB1555 little-endian
        v = pix[:, :, 0].astype(np.uint16) | (
            pix[:, :, 1].astype(np.uint16) << 8)
        out = np.stack([((v >> 10) & 31), ((v >> 5) & 31), (v & 31)],
                       axis=-1).astype(np.uint16)
        out = (out * 255 // 31).astype(np.uint8)
    else:
        out = pix[:, :, 2::-1]  # BGR(A) → RGB
    if not desc & 0x20:  # origin bottom-left → flip to top-down
        out = out[::-1]
    return np.ascontiguousarray(out)


def _header(img_type: int, w: int, h: int, depth: int,
            top_down: bool, cm_len: int = 0, cm_bits: int = 0) -> bytes:
    return struct.pack("<BBBHHBHHHHBB", 0, 1 if cm_len else 0, img_type,
                       0, cm_len, cm_bits, 0, 0, w, h, depth,
                       0x20 if top_down else 0)


def encode_tga(img: np.ndarray, rle: bool = False,
               top_down: bool = True) -> bytes:
    """(h, w, 3) uint8 → 24-bit truecolor TGA (raw or RLE)."""
    h, w, _ = img.shape
    rows = img if top_down else img[::-1]
    bgr = rows[:, :, ::-1].reshape(-1, 3).astype(np.uint8)
    body = _rle_encode(bgr) if rle else bgr.tobytes()
    return _header(_RLE_RGB if rle else _RAW_RGB, w, h, 24,
                   top_down) + body


def encode_tga_gray(img: np.ndarray, rle: bool = False) -> bytes:
    """(h, w) uint8 → 8-bit grayscale TGA."""
    h, w = img.shape
    flat = img.reshape(-1, 1).astype(np.uint8)
    body = _rle_encode(flat) if rle else flat.tobytes()
    return _header(_RLE_GRAY if rle else _RAW_GRAY, w, h, 8, True) + body


def encode_tga_palette(indices: np.ndarray, palette: np.ndarray,
                       rle: bool = False) -> bytes:
    """(h, w) indices + (n, 3) RGB palette → 8-bit palettized TGA
    (24-bit BGR color map)."""
    h, w = indices.shape
    cmap = palette[:, ::-1].astype(np.uint8).tobytes()
    flat = indices.reshape(-1, 1).astype(np.uint8)
    body = _rle_encode(flat) if rle else flat.tobytes()
    return (_header(_RLE_PAL if rle else _RAW_PAL, w, h, 8, True,
                    cm_len=len(palette), cm_bits=24) + cmap + body)
