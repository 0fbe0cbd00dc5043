"""EXIF metadata for JPEG payloads — pure stdlib+numpy.

EXIF is a TIFF IFD embedded in a JPEG APP1 segment (``Exif\\0\\0`` +
TIFF header); this module walks JPEG markers to find it, parses the
0th IFD plus the Exif sub-IFD with the same tag machinery as
:mod:`.tiff`, and exposes the two operations a curation pipeline runs:

- :func:`exif_tags` — extract the typed metadata (camera make/model,
  timestamps, orientation, ...) that PII-scrubbing and provenance
  passes need;
- :func:`decode_jpeg_oriented` — decode AND apply the Orientation tag
  (the 8 EXIF transforms), so downstream features/hashes see upright
  pixels;
- :func:`strip_exif` — drop every APPn/COM segment (the metadata
  scrubbing op), leaving the compressed image data untouched.

A writer (:func:`build_exif_app1` / :func:`inject_app1`) keeps every
path roundtrip-tested without external fixtures."""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

#: common 0th-IFD / Exif-IFD tags → readable names
TAG_NAMES = {
    0x010F: "make", 0x0110: "model", 0x0112: "orientation",
    0x0131: "software", 0x0132: "datetime", 0x8769: "exif_ifd",
    0x829A: "exposure_time", 0x8827: "iso", 0x9003: "datetime_original",
    0xA002: "pixel_x_dimension", 0xA003: "pixel_y_dimension",
    0x8825: "gps_ifd",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 10: 8}


def _iter_jpeg_segments(payload: bytes):
    """Yield (marker, body_start, body_end) for each JPEG segment up to
    SOS (after which entropy-coded data follows)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker == 0xDA:  # SOS: header then entropy data
            (ln,) = struct.unpack_from(">H", payload, pos + 2)
            yield marker, pos + 4, pos + 2 + ln
            return
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        yield marker, pos + 4, pos + 2 + ln
        pos += 2 + ln


def _parse_ifd(data: bytes, endian: str, ifd_off: int) -> Dict[int, tuple]:
    (n_tags,) = struct.unpack_from(endian + "H", data, ifd_off)
    fmt = {1: "B", 3: "H", 4: "I", 7: "B"}
    tags: Dict[int, tuple] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(endian + "HHI", data, off)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        voff = off + 8 if size <= 4 else \
            struct.unpack_from(endian + "I", data, off + 8)[0]
        if typ == 2:  # ASCII, NUL-terminated
            raw = data[voff:voff + count]
            tags[tag] = (raw.split(b"\0")[0].decode("ascii", "replace"),)
        elif typ == 5:  # RATIONAL: pairs of u32
            vals = struct.unpack_from(endian + str(2 * count) + "I",
                                      data, voff)
            tags[tag] = tuple(vals[j] / vals[j + 1] if vals[j + 1] else 0.0
                              for j in range(0, 2 * count, 2))
        elif typ == 10:  # SRATIONAL
            vals = struct.unpack_from(endian + str(2 * count) + "i",
                                      data, voff)
            tags[tag] = tuple(vals[j] / vals[j + 1] if vals[j + 1] else 0.0
                              for j in range(0, 2 * count, 2))
        else:
            tags[tag] = struct.unpack_from(
                endian + str(count) + fmt[typ], data, voff)
    return tags


def exif_tags(payload: bytes) -> Dict[str, object]:
    """JPEG bytes → named EXIF tags (0th IFD + Exif sub-IFD merged);
    ``{}`` when no APP1/Exif segment exists."""
    for marker, b, e in _iter_jpeg_segments(payload):
        if marker != 0xE1 or payload[b:b + 6] != b"Exif\x00\x00":
            continue
        tiff = payload[b + 6:e]
        endian = "<" if tiff[:2] == b"II" else ">"
        (ifd0,) = struct.unpack_from(endian + "I", tiff, 4)
        tags = _parse_ifd(tiff, endian, ifd0)
        if 0x8769 in tags:  # Exif sub-IFD
            tags.update(_parse_ifd(tiff, endian, int(tags[0x8769][0])))
        out: Dict[str, object] = {}
        for tag, vals in tags.items():
            name = TAG_NAMES.get(tag)
            if name in (None, "exif_ifd", "gps_ifd"):
                continue
            out[name] = vals[0] if len(vals) == 1 else vals
        return out
    return {}


#: EXIF orientation → (rot90 quarter-turns counter-clockwise, mirror-x)
_ORIENT = {1: (0, False), 2: (0, True), 3: (2, False), 4: (2, True),
           5: (3, True), 6: (3, False), 7: (1, True), 8: (1, False)}


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Upright an image per EXIF Orientation 1-8 (flip BEFORE rotate,
    matching the spec's mirrored-then-rotated definitions)."""
    k, mirror = _ORIENT.get(int(orientation), (0, False))
    if mirror:
        img = img[:, ::-1]
    if k:
        img = np.rot90(img, k)
    return np.ascontiguousarray(img)


def decode_jpeg_oriented(payload: bytes) -> np.ndarray:
    """Decode a JPEG and apply its EXIF Orientation tag — downstream
    features/pHash see upright pixels regardless of camera rotation."""
    from xpshacl_ray.stages.jpeg import decode_jpeg

    img = decode_jpeg(payload)
    tags = exif_tags(payload)
    return apply_orientation(img, int(tags.get("orientation", 1)))


def strip_exif(payload: bytes) -> bytes:
    """Drop every APPn (0xE1-0xEF) and COM segment — the metadata
    scrubbing op; image data and decode output are untouched.  APP0
    (JFIF) is kept."""
    out = bytearray(payload[:2])
    pos = 2
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        if marker == 0xDA:  # SOS onward copied verbatim
            out += payload[pos:]
            return bytes(out)
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        if not (0xE1 <= marker <= 0xEF or marker == 0xFE):
            out += payload[pos:pos + 2 + ln]
        pos += 2 + ln
    return bytes(out)


# ---------------------------------------------------------------------------
# writer (fixtures)
# ---------------------------------------------------------------------------


def build_exif_app1(tags: Dict[str, object]) -> bytes:
    """Named tags → APP1 segment bytes (little-endian TIFF, 0th IFD,
    Exif sub-IFD for the exif-specific tags)."""
    name_to_tag = {v: k for k, v in TAG_NAMES.items()}
    exif_set = {"exposure_time", "iso", "datetime_original",
                "pixel_x_dimension", "pixel_y_dimension"}
    ifd0_items: List[Tuple[int, object]] = []
    exif_items: List[Tuple[int, object]] = []
    for name, val in tags.items():
        tag = name_to_tag[name]
        (exif_items if name in exif_set else ifd0_items).append((tag, val))

    def build_ifd(items, base_off, extra_ptr=None):
        entries = sorted(items)
        if extra_ptr is not None:
            entries.append((0x8769, extra_ptr))
        heap = bytearray()
        n = len(entries)
        heap_base = base_off + 2 + n * 12 + 4
        body = struct.pack("<H", n)
        for tag, val in sorted(entries):
            if tag == 0x8769:
                body += struct.pack("<HHII", tag, 4, 1, val)
            elif isinstance(val, str):
                raw = val.encode() + b"\0"
                if len(raw) <= 4:
                    body += struct.pack("<HHI4s", tag, 2, len(raw),
                                        raw.ljust(4, b"\0"))
                else:
                    body += struct.pack("<HHII", tag, 2, len(raw),
                                        heap_base + len(heap))
                    heap += raw
            elif isinstance(val, float):
                num, den = int(round(val * 1_000_000)), 1_000_000
                body += struct.pack("<HHII", tag, 5, 1,
                                    heap_base + len(heap))
                heap += struct.pack("<II", num, den)
            else:
                body += struct.pack("<HHI", tag, 3, 1) \
                    + struct.pack("<H", int(val)) + b"\0\0"
        body += struct.pack("<I", 0)
        return bytes(body) + bytes(heap)

    tiff_header = b"II" + struct.pack("<HI", 42, 8)
    if exif_items:
        ifd0_probe = build_ifd(ifd0_items, 8, extra_ptr=0)
        exif_off = 8 + len(ifd0_probe)
        ifd0 = build_ifd(ifd0_items, 8, extra_ptr=exif_off)
        assert len(ifd0) == len(ifd0_probe)
        tiff = tiff_header + ifd0 + build_ifd(exif_items, exif_off)
    else:
        tiff = tiff_header + build_ifd(ifd0_items, 8)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (before everything else,
    where cameras put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


def make_exif_fixture(n: int = 8, seed: int = 37):
    """Deterministic (media_id, payload) JPEG rows with a KNOWN EXIF
    plan: orientation cycles 1..8, make/model/iso derive from the id,
    and every 4th row carries no EXIF at all.  Returns (arrow table,
    plan) — the plan IS the ground truth, independent of the parser."""
    import pyarrow as pa

    from xpshacl_ray.stages.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    ids, payloads, plan = [], [], []
    for i in range(n):
        h, w = int(rng.integers(16, 40)), int(rng.integers(16, 40))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(np.stack([yy * 7, xx * 5, (yy + xx) * 3], -1),
                      0, 255).astype(np.uint8)
        jp = encode_jpeg(img, quality=90)
        if i % 4 == 3:
            plan.append({"media_id": i, "has_exif": False, "make": None,
                         "model": None, "orientation": None, "iso": None})
        else:
            tags = {"make": f"Cam{i % 3}", "model": f"M-{100 + i}",
                    "orientation": (i % 8) + 1, "iso": 100 * (1 + i % 4)}
            jp = inject_app1(jp, build_exif_app1(tags))
            plan.append({"media_id": i, "has_exif": True, **tags})
        ids.append(i)
        payloads.append(jp)
    table = pa.table({"media_id": pa.array(ids, pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    return table, plan


class ExifExtractor:
    """Actor-pool metadata stage: JPEG payloads → named EXIF columns
    (missing segments → nulls + has_exif=false, in-band)."""

    def __call__(self, batch):
        import pyarrow as pa

        rows = [exif_tags(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "has_exif": pa.array([bool(r) for r in rows], pa.bool_()),
            "make": pa.array([r.get("make") for r in rows], pa.string()),
            "model": pa.array([r.get("model") for r in rows],
                              pa.string()),
            "orientation": pa.array(
                [int(r["orientation"]) if "orientation" in r else None
                 for r in rows], pa.int64()),
            "iso": pa.array([int(r["iso"]) if "iso" in r else None
                             for r in rows], pa.int64()),
        })
