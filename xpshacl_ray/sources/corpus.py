"""Multi-format text-corpus on-ramp → the engine's documents schema.

Training corpora arrive as Parquet, JSONL (plain or ``.gz`` — Arrow's
readers inflate gzip transparently by extension), CSV or raw text-per-line
files.  :func:`read_text_corpus` reads any of them as a streaming
``ray.data.Dataset`` and normalizes to the engine's documents shape:

- the text column renamed to ``text``;
- a deterministic ``doc_id`` derived when the source has none —
  ``hash64(text)`` masked to 63 bits, so the id is CONTENT-ADDRESSED:
  stable across runs, repartitions and resumes (the same policy as
  ``ingest.stable_row_id``), and identical duplicate texts share an id —
  exactly what the dedup operators key on anyway;
- ``n_chars`` derived when absent (several constraint specs and stats
  configs read it).

Reference analog S1 (``src/main.py:54``: one hard-coded input format);
here the on-ramp is format-plural because a 100 TB corpus is never one
format.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_EXT_FORMAT = {
    ".parquet": "parquet", ".jsonl": "jsonl", ".json": "jsonl",
    ".csv": "csv", ".txt": "text",
}


def _infer_format(path: str) -> str:
    base = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(base)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(
        f"cannot infer corpus format from {path!r} — pass format= "
        f"(one of {sorted(set(_EXT_FORMAT.values()))})")


def read_text_corpus(
    paths,
    format: Optional[str] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    columns: Optional[List[str]] = None,
    **read_kwargs,
) -> "ray.data.Dataset":
    """Streaming read of a text corpus in any supported format,
    normalized to ``(doc_id, text, n_chars, ...)``.

    ``format=None`` infers from the first path's extension
    (``.gz`` suffixes are peeled first).  ``text_col`` names the source's
    text column (raw ``text`` format always yields one line per row in
    a ``text`` column).  Extra ``read_kwargs`` pass through to the
    underlying ``ray.data.read_*``."""
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    fmt = format or _infer_format(str(first))
    if fmt == "parquet":
        ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    elif fmt == "jsonl":
        ds = ray.data.read_json(paths, **read_kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(paths, **read_kwargs)
    elif fmt == "text":
        ds = ray.data.read_text(paths, **read_kwargs)
        text_col = "text"
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")

    def normalize(b: pa.Table) -> pa.Table:
        from ..functions.sketches import hash64

        if text_col != "text":
            if text_col not in b.column_names:
                raise ValueError(
                    f"text column {text_col!r} absent (have "
                    f"{b.column_names})")
            b = b.rename_columns(
                ["text" if c == text_col else c for c in b.column_names])
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if not (pa.types.is_string(txt.type)
                or pa.types.is_large_string(txt.type)):
            txt = pc.cast(txt, pa.string())
        if id_col not in b.column_names:
            # content-addressed 63-bit id (see module docstring)
            h = hash64(np.asarray(txt, dtype=object))
            ids = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
            b = b.append_column(id_col, pa.array(ids, pa.int64()))
        if "n_chars" not in b.column_names:
            b = b.append_column(
                "n_chars", pc.cast(pc.utf8_length(txt), pa.int64()))
        return b

    return ds.map_batches(normalize, batch_format="pyarrow")
