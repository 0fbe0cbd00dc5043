"""ID3v2 tag parsing for MP3 payloads — pure stdlib.

The engine's honest boundary keeps MP3 AUDIO undecodable (no codec
libraries), but the ID3v2 container prepended to an MP3 is pure
structure: a 10-byte header with a syncsafe size, then frames of
``(4-char id, 4-byte size, 2 flag bytes, body)``; text frames (T***)
carry an encoding byte + the value.  Cataloging title/artist/album/
year of a corpus you cannot (or will not) decode is a real curation
op — the audio analog of :mod:`.exif`.

Supports ID3v2.3 (big-endian frame sizes) and v2.4 (syncsafe frame
sizes; UTF-8 encoding byte).  A writer keeps parsing fixture-free."""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

#: frame id → readable name (the common text frames)
FRAME_NAMES = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TYER": "year", "TDRC": "year", "TCON": "genre",
    "TRCK": "track", "TLEN": "length_ms", "TSSE": "encoder",
}

_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def id3_tags(payload: bytes) -> Dict[str, object]:
    """MP3/any bytes → named ID3v2 text tags (``{}`` when no tag)."""
    if payload[:3] != b"ID3":
        return {}
    ver_major = payload[3]
    if ver_major not in (3, 4):
        raise NotImplementedError(f"ID3v2.{ver_major} not supported")
    flags = payload[5]
    size = _unsyncsafe(payload[6:10])
    pos, end = 10, 10 + size
    if flags & 0x40:  # extended header: skip by its own size field
        ext = (_unsyncsafe(payload[10:14]) if ver_major == 4
               else struct.unpack_from(">I", payload, 10)[0] + 4)
        pos += ext
    out: Dict[str, object] = {}
    while pos + 10 <= end:
        fid = payload[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        fsize = (_unsyncsafe(payload[pos + 4:pos + 8]) if ver_major == 4
                 else struct.unpack_from(">I", payload, pos + 4)[0])
        body = payload[pos + 10:pos + 10 + fsize]
        pos += 10 + fsize
        fid_s = fid.decode("ascii", "replace")
        name = FRAME_NAMES.get(fid_s)
        if name is None or not fid_s.startswith("T") or not body:
            continue
        enc = _ENCODINGS.get(body[0], "latin-1")
        text = body[1:].decode(enc, "replace").rstrip("\x00")
        if name in ("length_ms",):
            try:
                out[name] = int(text)
            except ValueError:
                out[name] = None
        else:
            out[name] = text
    return out


def strip_id3(payload: bytes) -> bytes:
    """Drop a leading ID3v2 tag (the audio bytes follow unchanged)."""
    if payload[:3] != b"ID3":
        return payload
    return payload[10 + _unsyncsafe(payload[6:10]):]


def build_id3(tags: Dict[str, object], version: int = 4,
              padding: int = 16) -> bytes:
    """Named tags → ID3v2.3/2.4 tag bytes (UTF-8 text frames for v2.4,
    latin-1 for v2.3 — the era-typical encodings)."""
    name_to_id = {}
    for fid, name in FRAME_NAMES.items():
        if fid == "TDRC" and version == 3:
            continue  # v2.3 spells year TYER
        if fid == "TYER" and version == 4:
            continue  # v2.4 spells year TDRC
        name_to_id.setdefault(name, fid)
    frames = bytearray()
    for name, val in sorted(tags.items()):
        fid = name_to_id[name]
        if version == 4:
            body = b"\x03" + str(val).encode("utf-8")
            size = _syncsafe(len(body))
        else:
            body = b"\x00" + str(val).encode("latin-1", "replace")
            size = struct.pack(">I", len(body))
        frames += fid.encode("ascii") + size + b"\x00\x00" + body
    frames += b"\x00" * padding
    return (b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(frames))
            + bytes(frames))


class Id3Extractor:
    """Actor-pool stage: (media_id, payload) rows → named ID3 columns
    (tag-less rows → has_id3=false + nulls, in-band)."""

    def __call__(self, batch):
        import pyarrow as pa

        rows = [id3_tags(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "has_id3": pa.array([bool(r) for r in rows], pa.bool_()),
            "title": pa.array([r.get("title") for r in rows],
                              pa.string()),
            "artist": pa.array([r.get("artist") for r in rows],
                               pa.string()),
            "album": pa.array([r.get("album") for r in rows],
                              pa.string()),
            "year": pa.array([r.get("year") for r in rows], pa.string()),
            "length_ms": pa.array(
                [r.get("length_ms") for r in rows], pa.int64()),
        })


def make_id3_fixture(n: int = 6, seed: int = 61):
    """Deterministic (media_id, payload) rows: fake MPEG frames with a
    KNOWN ID3 plan — v2.4 on even ids, v2.3 on ids ≡1 (mod 4), no tag
    on ids ≡3 (mod 4).  Returns (arrow table, plan)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    ids, payloads, plan = [], [], []
    for i in range(n):
        audio = b"\xff\xfb" + bytes(rng.integers(0, 256, 64,
                                                 dtype=np.uint8))
        if i % 4 == 3:
            payloads.append(audio)
            plan.append({"media_id": i, "has_id3": False, "title": None,
                         "artist": None, "album": None, "year": None,
                         "length_ms": None})
        else:
            tags = {"title": f"Track {i}", "artist": f"Artist {i % 3}",
                    "album": "Synthetic LP", "year": str(2000 + i),
                    "length_ms": 30000 + 1000 * i}
            version = 4 if i % 2 == 0 else 3
            payloads.append(build_id3(tags, version=version) + audio)
            plan.append({"media_id": i, "has_id3": True, **tags,
                         "year": tags["year"]})
        ids.append(i)
    table = pa.table({"media_id": pa.array(ids, pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    return table, plan
