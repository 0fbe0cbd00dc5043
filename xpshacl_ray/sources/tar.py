"""WebDataset-style tar-shard on-ramp.

Large training corpora ship as directories of ``.tar`` shards whose
members are named ``<sample key>.<ext>`` (image + caption + metadata
per key).  :func:`read_tar_shards` streams such shards as a
``ray.data.Dataset``: one read task per shard (a shard is the natural
parallelism unit — it is written once, read whole, never split), the
tar walked with the stdlib ``tarfile`` module inside ``map_batches``,
one output row per member (flat mode) or per sample key (sample mode,
parts as an Arrow ``map<ext, binary>``).

MIME types are inferred from member extensions so the rows feed
straight into the :mod:`..stages.multimodal` decode stages.  A shard
writer (:func:`write_tar_shard`) exists for fixture-free tests — the
reference has no tar on-ramp at all (single-format input,
``src/main.py:54``); shards are this engine's scale path.
"""

from __future__ import annotations

import io
import tarfile
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

import ray.data

#: member extension → mime for the decode stages
MIME_BY_EXT = {
    "ppm": "image/x-portable-pixmap", "bmp": "image/bmp",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "tif": "image/tiff", "tiff": "image/tiff",
    "mp4": "video/mp4", "wav": "audio/wav", "flac": "audio/flac",
    "au": "audio/basic", "aiff": "audio/aiff", "aif": "audio/aiff",
    "qoi": "image/qoi", "tga": "image/x-tga",
    "txt": "text/plain", "json": "application/json",
    "cls": "text/plain",
}


def _split_key(name: str) -> Tuple[str, str]:
    """``dir/key.ext`` → (key, ext) — WebDataset keys split at the
    FIRST dot of the basename (``a/b.seg.json`` → key ``b``,
    ext ``seg.json``)."""
    base = name.rsplit("/", 1)[-1]
    if "." in base:
        key, ext = base.split(".", 1)
        return key, ext.lower()
    return base, ""


def _maybe_gunzip(name: str, payload: bytes):
    """WebDataset convention: a ``.gz`` member suffix means the PAYLOAD
    is gzip-compressed — inflate transparently and strip the suffix."""
    if name.endswith(".gz"):
        import gzip

        return name[:-3], gzip.decompress(payload)
    return name, payload


def _iter_members(shard: bytes):
    with tarfile.open(fileobj=io.BytesIO(shard), mode="r:*") as tf:
        for m in tf:
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            if f is None:
                continue
            yield _maybe_gunzip(m.name, f.read())


_FLAT_SCHEMA = pa.schema([
    ("shard", pa.string()), ("key", pa.string()), ("member", pa.string()),
    ("ext", pa.string()), ("mime", pa.string()), ("payload", pa.binary()),
    ("n_bytes", pa.int64()),
])

_SAMPLE_SCHEMA = pa.schema([
    ("shard", pa.string()), ("key", pa.string()),
    ("parts", pa.map_(pa.string(), pa.binary())),
])


def _explode_flat(batch: pa.Table) -> pa.Table:
    cols: Dict[str, List] = {c: [] for c in _FLAT_SCHEMA.names}
    for path, data in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        for name, payload in _iter_members(data):
            key, ext = _split_key(name)
            cols["shard"].append(path)
            cols["key"].append(key)
            cols["member"].append(name)
            cols["ext"].append(ext)
            cols["mime"].append(MIME_BY_EXT.get(
                ext.rsplit(".", 1)[-1], "application/octet-stream"))
            cols["payload"].append(payload)
            cols["n_bytes"].append(len(payload))
    return pa.table(cols, schema=_FLAT_SCHEMA)


def _explode_samples(batch: pa.Table) -> pa.Table:
    shards, keys, parts = [], [], []
    for path, data in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        groups: Dict[str, List[Tuple[str, bytes]]] = {}
        order: List[str] = []
        for name, payload in _iter_members(data):
            key, ext = _split_key(name)
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append((ext, payload))
        for key in order:
            shards.append(path)
            keys.append(key)
            parts.append(groups[key])
    return pa.table({
        "shard": pa.array(shards, pa.string()),
        "key": pa.array(keys, pa.string()),
        "parts": pa.array(parts, pa.map_(pa.string(), pa.binary())),
    }, schema=_SAMPLE_SCHEMA)


def read_tar_shards(paths, samples: bool = False,
                    **read_kwargs) -> "ray.data.Dataset":
    """Stream tar shards → member rows (default) or per-key sample rows
    (``samples=True``).

    Each shard is read whole by one task (``read_binary_files``) and
    exploded inside the same ``map_batches`` — members of one sample
    never cross blocks, so sample grouping needs NO shuffle.  At 100 TB
    the unit of work/retry/resume is the shard, exactly how the corpus
    was written."""
    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    **read_kwargs)
    fn = _explode_samples if samples else _explode_flat
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1)


def write_tar_shard(members: List[Tuple[str, bytes]]) -> bytes:
    """[(member name, payload)] → uncompressed tar bytes (fixtures)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 0  # deterministic shards byte-for-byte
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def make_tar_fixture(out_dir: str, n_shards: int = 3,
                     samples_per_shard: int = 4, seed: int = 17
                     ) -> List[str]:
    """Deterministic on-disk WebDataset fixture: each sample is a PPM
    image + a caption ``.txt`` + a ``.json`` metadata member; one WAV
    audio sample per shard.  Idempotent (fixed seed, zero mtimes)."""
    import json
    import os

    import numpy as np

    from xpshacl_ray.stages.multimodal import encode_ppm, encode_wav

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for s in range(n_shards):
        members: List[Tuple[str, bytes]] = []
        for i in range(samples_per_shard):
            key = f"s{s:03d}i{i:03d}"
            w, h = int(rng.integers(6, 20)), int(rng.integers(6, 20))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            members.append((f"{key}.ppm", encode_ppm(img)))
            members.append((f"{key}.txt",
                            f"caption for {key} ({w}x{h})".encode()))
            members.append((f"{key}.json", json.dumps(
                {"key": key, "w": w, "h": h}, sort_keys=True).encode()))
        t = np.arange(800 + 100 * s) / 8000
        x = 0.4 * np.sin(2 * np.pi * (200 + 50 * s) * t)
        members.append((f"s{s:03d}audio.wav", encode_wav(x, 8000)))
        path = os.path.join(out_dir, f"shard-{s:05d}.tar")
        blob = write_tar_shard(members)
        if not (os.path.exists(path)
                and os.path.getsize(path) == len(blob)):
            with open(path, "wb") as f:
                f.write(blob)
        paths.append(path)
    return paths


def write_tar_shards(ds, out_dir: str, samples_per_shard: int = 1000,
                     prefix: str = "shard") -> List[str]:
    """Sample rows (``key`` + ``parts`` map, the :func:`read_tar_shards`
    ``samples=True`` shape) → WebDataset tar shards on disk.

    Each input BLOCK writes its own shard files (one batch = one block,
    chunked at ``samples_per_shard`` inside the task), so the sink is
    shard-parallel and RESUMABLE the same way the reader is: the shard
    file is the unit of work, named ``<prefix>-<content hash>.tar`` —
    block composition is deterministic for a deterministic input, so a
    re-run writes the same files instead of appending duplicates
    (idempotent; zero mtimes inside; atomic rename so readers never see
    partial shards).  Returns the shard paths, sorted."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        parts = batch["parts"].to_pylist()
        out_rows = {"shard": [], "n_samples": [], "n_members": [],
                    "n_bytes": []}
        for c0 in range(0, len(keys), samples_per_shard):
            members: List[Tuple[str, bytes]] = []
            chunk = slice(c0, c0 + samples_per_shard)
            for key, kv in zip(keys[chunk], parts[chunk]):
                for ext, payload in (kv.items() if isinstance(kv, dict)
                                     else kv):
                    members.append((f"{key}.{ext}" if ext else key,
                                    payload))
            blob = write_tar_shard(members)
            fp = hashlib.sha256(blob).hexdigest()[:12]
            path = os.path.join(out_dir, f"{prefix}-{fp}.tar")
            if not os.path.exists(path):
                tmp = f"{path}.{os.getpid()}.tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            out_rows["shard"].append(path)
            out_rows["n_samples"].append(len(keys[chunk]))
            out_rows["n_members"].append(len(members))
            out_rows["n_bytes"].append(len(blob))
        return pa.table({
            "shard": pa.array(out_rows["shard"], pa.string()),
            "n_samples": pa.array(out_rows["n_samples"], pa.int64()),
            "n_members": pa.array(out_rows["n_members"], pa.int64()),
            "n_bytes": pa.array(out_rows["n_bytes"], pa.int64()),
        })

    manifest = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    return sorted(manifest["shard"])


def read_zip_shards(paths, samples: bool = False,
                    members_glob: Optional[str] = None,
                    **read_kwargs) -> "ray.data.Dataset":
    """Zip-shard variant of :func:`read_tar_shards`.

    Zip archives carry a central directory, so unlike tar a task can
    list members WITHOUT scanning the archive body and decompress only
    the ones it wants — ``members_glob`` (fnmatch on member names, e.g.
    ``"*.json"``) prunes at the member level, the zip analog of Parquet
    column pruning."""
    import fnmatch
    import zipfile

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    **read_kwargs)

    def iter_zip(shard: bytes):
        with zipfile.ZipFile(io.BytesIO(shard)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if members_glob and not fnmatch.fnmatch(info.filename,
                                                        members_glob):
                    continue  # never decompressed
                yield _maybe_gunzip(info.filename,
                                    zf.read(info.filename))

    def explode(batch: pa.Table) -> pa.Table:
        if samples:
            shards, keys, parts = [], [], []
            for path, data in zip(batch["path"].to_pylist(),
                                  batch["bytes"].to_pylist()):
                groups: Dict[str, List[Tuple[str, bytes]]] = {}
                order: List[str] = []
                for name, payload in iter_zip(data):
                    key, ext = _split_key(name)
                    if key not in groups:
                        groups[key] = []
                        order.append(key)
                    groups[key].append((ext, payload))
                for key in order:
                    shards.append(path)
                    keys.append(key)
                    parts.append(groups[key])
            return pa.table({
                "shard": pa.array(shards, pa.string()),
                "key": pa.array(keys, pa.string()),
                "parts": pa.array(parts, pa.map_(pa.string(),
                                                 pa.binary())),
            }, schema=_SAMPLE_SCHEMA)
        cols: Dict[str, List] = {c: [] for c in _FLAT_SCHEMA.names}
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            for name, payload in iter_zip(data):
                key, ext = _split_key(name)
                cols["shard"].append(path)
                cols["key"].append(key)
                cols["member"].append(name)
                cols["ext"].append(ext)
                cols["mime"].append(MIME_BY_EXT.get(
                    ext.rsplit(".", 1)[-1], "application/octet-stream"))
                cols["payload"].append(payload)
                cols["n_bytes"].append(len(payload))
        return pa.table(cols, schema=_FLAT_SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=1)


def write_zip_shard(members: List[Tuple[str, bytes]],
                    compress: bool = True) -> bytes:
    """[(member name, payload)] → zip bytes (deflate; fixtures)."""
    import zipfile

    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, payload)
    return buf.getvalue()


def make_zip_fixture(out_dir: str, n_shards: int = 2,
                     samples_per_shard: int = 3, seed: int = 19
                     ) -> List[str]:
    """Deterministic on-disk zip-shard fixture: QOI image + gzipped
    caption + JSON per sample (exercises member-gz inflation and the
    central-directory path).  Idempotent (fixed seed, 1980 epoch)."""
    import gzip
    import json
    import os

    import numpy as np

    from xpshacl_ray.stages.qoi import encode_qoi

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for s in range(n_shards):
        members: List[Tuple[str, bytes]] = []
        for i in range(samples_per_shard):
            key = f"z{s:03d}i{i:03d}"
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((np.stack([yy * 5, xx * 7, yy + xx], -1)
                    + rng.integers(0, 16, (h, w, 3))) % 256).astype(
                np.uint8)
            members.append((f"{key}.qoi", encode_qoi(img)))
            # mtime=0 keeps the gzip header deterministic
            members.append((f"{key}.txt.gz", gzip.compress(
                f"caption {key} ({w}x{h})".encode(), mtime=0)))
            members.append((f"{key}.json", json.dumps(
                {"key": key, "w": w, "h": h}, sort_keys=True).encode()))
        blob = write_zip_shard(members)
        path = os.path.join(out_dir, f"zshard-{s:05d}.zip")
        if not (os.path.exists(path)
                and os.path.getsize(path) == len(blob)):
            with open(path, "wb") as f:
                f.write(blob)
        paths.append(path)
    return paths
