"""Sources: reading the code table and deriving lineage/invariant columns.

Reference analog S1 (``src/main.py:54-55`` parses the whole data graph on
the driver); here the input is a Parquet table of source-code files
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint) read as a
streaming ``ray.data.Dataset`` with column pruning at the read.

Derived at ingest (SURVEY.md §1.3):

- ``content_sha256`` — the per-row invariant asserted against the reference
  oracle (BASELINE.json: "content sha256 equality").
- ``row_id``         — deterministic int64 lineage id derived from the
  natural key (md5 of ``repo|path|commit`` truncated to 63 bits), stable
  across runs, partitionings and resumes — no global counter needed, which
  matters because a streaming executor has no cheap global row offset.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def sha256_hex(values: Sequence[Optional[str]]) -> List[Optional[str]]:
    """sha256 hexdigest per value (None-safe). C-backed hashlib per row."""
    out: List[Optional[str]] = []
    for v in values:
        if v is None:
            out.append(None)
        else:
            out.append(hashlib.sha256(v.encode("utf-8")).hexdigest())
    return out


def md5_hex(values: Sequence[Optional[str]]) -> List[Optional[str]]:
    return [
        None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
        for v in values
    ]


def stable_row_id(keys: Sequence[str]) -> np.ndarray:
    """Deterministic 63-bit int64 id per natural-key string.

    Vectorized keyed siphash (fixed key) — stable across runs, resumes and
    partitionings; ~100× faster than per-row md5 at ingest rates.
    """
    from ..functions.sketches import hash64

    h = hash64(np.asarray(keys, dtype=object))
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def add_lineage_columns(
    batch: pa.Table,
    content_col: str = "content",
    key_cols: Sequence[str] = ("repo", "path", "commit"),
) -> pa.Table:
    """Append ``content_sha256`` and ``row_id`` to a batch."""
    content = batch[content_col].to_pylist()
    sha = pa.array(sha256_hex(content), pa.string())
    key_parts = []
    for c in key_cols:
        key_parts.append(pc.cast(batch[c], pa.string()))
        key_parts.append(pa.array(np.repeat("|", len(batch))))
    joined = pc.binary_join_element_wise(*key_parts[:-1], "")
    rid = pa.array(stable_row_id(joined.to_pylist()), pa.int64())
    return batch.append_column("content_sha256", sha).append_column("row_id", rid)


def read_code_table(
    paths,
    columns: Optional[List[str]] = None,
    with_lineage: bool = True,
    content_col: str = "content",
    key_cols: Sequence[str] = ("repo", "path", "commit"),
    **read_kwargs,
) -> "ray.data.Dataset":
    """``read_parquet`` with column pruning + lineage columns.

    Resume path analog S2 (``src/main.py:75-114``): pass a violations
    directory to :func:`ray.data.read_parquet` directly to re-enter the
    pipeline from a persisted violations table.
    """
    ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    if with_lineage:
        ds = ds.map_batches(
            lambda b: add_lineage_columns(b, content_col, key_cols),
            batch_format="pyarrow",
        )
    return ds
