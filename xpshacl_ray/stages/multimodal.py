"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as Arrow ``binary`` columns next to a metadata
struct (mime, width/height or sample rate, frame count).  The Ray-side
plumbing — schema, small batch sizes for wide rows, actor-pool stage
shape, output layout — is real and tested; the codec itself is STUBBED
(no image/audio libraries in this environment): ``DecodeStub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake feature vector so pipelines are exercisable end-to-end.

Swap ``DecodeStub`` for a real decoder (PIL/torchaudio/decord) by keeping
the same actor signature: heavy model/codec setup in ``__init__``, batched
decode in ``__call__``, ``batch_size`` small because payload rows are MBs.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                            ("n_frames", pa.int32())])),
    ]
)


def make_fake_media_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav"
                              for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(
                [{"width": 32, "height": 32, "n_frames": 1}] * n,
                MEDIA_SCHEMA.field("meta").type,
            ),
        }
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage (STUB — see module docstring).

    ``fake=True`` → deterministic 8-dim feature from the payload sha256
    (real plumbing, fake math).  ``fake=False`` → NotImplementedError, the
    explicit marker that a real codec belongs here.
    """

    FEATURE_DIM = 8

    def __init__(self, fake: bool = False):
        self.fake = fake
        # a real implementation loads its codec/model HERE, once per actor

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image/audio library not present in "
                "this environment; construct DecodeStub(fake=True) for the "
                "deterministic test path"
            )
        digest = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(digest[: self.FEATURE_DIM], dtype=np.uint8)
            .astype(np.float64)
            / 255.0
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch["payload"].to_pylist()]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float64()), self.FEATURE_DIM
        )
        return (
            batch.select(["media_id", "mime"]).append_column("features", arr)
        )


def decode_features(
    ds,
    fake: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
):
    """Media dataset → (media_id, mime, features).

    Small ``batch_size``: payload rows are large, so batch × concurrency
    must fit the worker heap (the multimodal sizing rule).
    """
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
