"""Sequence packing: the concat-then-chunk step of an LLM pretraining
data pipeline.

Documents are concatenated in a deterministic order inside deterministic
shards and the token stream is split every ``seq_len`` tokens; each
document therefore occupies the half-open token interval
``[start_tok, start_tok + n_tokens)`` of its shard's stream and spans
context windows ``chunk_first .. chunk_last``.  Emitting the mapping
(rather than the chunks themselves) keeps the operator a pure metadata
pass — the heavy text column never enters the shuffle, and a downstream
writer can materialize any chunk range independently (resumable output).

Determinism contract: shard = ``md5(id) % n_shards`` and order-within-
shard = ``id``, so the SAME packing layout is produced across re-runs,
resumes and repartitionings, and is reproducible in SQL (the oracle uses
the identical hash + window expression — see ``q_pack_sequences``).

Scale: one shuffle (``groupby(shard)``), carrying (id, shard, n_tokens)
only — ~24 B/doc regardless of document size.  The per-shard prefix sum
runs in one task per shard; pick ``n_shards`` so a shard's (id, count)
pairs fit a task (at 10^10 docs and 64k shards that is ~150k rows/shard
— trivially fine).  The packing is embarrassingly parallel ACROSS
shards by construction; global chunk ids, if needed, are
``shard * ceil(shard_tokens / seq_len) + chunk`` after a tiny per-shard
total pass.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .sampling import md5_bucket
from .text import token_count_whitespace


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: Optional[str] = None,
    shard_col: Optional[str] = None,
    n_shards: int = 16,
    salt: str = "",
) -> "ray.data.Dataset":
    """Per-document packing layout: ``(shard, id, n_tokens, start_tok,
    chunk_first, chunk_last)``.

    ``token_col`` supplies a precomputed token count (e.g. from a real
    tokenizer pass); otherwise the whitespace count is computed in-batch
    (Arrow kernels, matches ``len(str_split(text, ' '))``).  ``shard_col``
    uses an existing column (e.g. ``source``) as the shard key; otherwise
    a deterministic ``md5(id) % n_shards`` shard is assigned.  Rows with a
    NULL id or NULL token count are dropped (they have no stable place in
    the stream); the oracle's hash/window expressions skip them the same
    way.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")

    def prepare(b: pa.Table) -> pa.Table:
        if token_col is None:
            b = token_count_whitespace(b, text_col, "n_tokens")
        elif token_col != "n_tokens":
            b = b.append_column("n_tokens",
                                pc.cast(b[token_col], pa.int64()))
        if shard_col is None:
            ids = pc.cast(b[id_col], pa.string()).to_pylist()
            shard = md5_bucket(["" if v is None else v for v in ids],
                               n_shards, salt)
            b = b.append_column("__shard__", pa.array(shard, pa.int64()))
        else:
            b = b.append_column("__shard__", b[shard_col])
        keep = pc.and_(pc.is_valid(b[id_col]), pc.is_valid(b["n_tokens"]))
        return b.filter(keep).select([id_col, "n_tokens", "__shard__"])

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = np.concatenate(([0], np.cumsum(n)[:-1]))
        out = pd.DataFrame({
            "shard": g["__shard__"].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "n_tokens": n,
            "start_tok": start,
            "chunk_first": start // seq_len,
            # empty docs (n==0, possible with a real token_col) sit at
            # their start boundary and span exactly their start chunk
            "chunk_last": np.maximum(start, start + n - 1) // seq_len,
        })
        return out

    return (
        ds.map_batches(prepare, batch_format="pyarrow")
        .groupby("__shard__")
        .map_groups(pack_shard, batch_format="pandas")
    )


def chunk_documents(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    chunk_size: int = 512,
    stride: int = 256,
) -> "ray.data.Dataset":
    """Overlapping character-window chunking — the standard long-document
    split for context-window-bounded training (chunk i covers
    ``[i*stride, i*stride + chunk_size)`` codepoints; every start <
    doc length emits, so tails shorter than ``chunk_size`` survive).

    Map-only (no shuffle, order-free, resume-safe): each batch expands
    independently; a doc's chunks never span batches.  The output fans
    out ~``len/stride`` rows per doc — downstream block sizes shrink
    accordingly, so chunking belongs BEFORE a repartition, not after a
    groupby.  Per-chunk work is one substring copy (Python slice =
    C memcpy); the offsets/fan-out bookkeeping is numpy."""
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")

    def expand(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = b[doc_id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = txt.to_pylist()
        lens = np.asarray(pc.utf8_length(pc.fill_null(txt, "")),
                          dtype=np.int64)
        n_chunks = -(-lens // stride)          # ceil; 0 for empty docs
        if int(n_chunks.sum()) == 0:
            return pa.schema([
                ("doc_id", pa.int64()), ("chunk_id", pa.int64()),
                ("start", pa.int64()), ("chunk_len", pa.int64()),
                ("chunk_text", pa.string())]).empty_table()
        doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
        cum = np.concatenate([[0], np.cumsum(n_chunks)])
        chunk_id = np.arange(len(doc_idx)) - cum[doc_idx]
        starts = chunk_id * stride
        chunks = [texts[d][s:s + chunk_size]
                  for d, s in zip(doc_idx, starts)]
        ids_np = np.asarray(pc.cast(ids, pa.int64()))
        return pa.table({
            "doc_id": pa.array(ids_np[doc_idx], pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "chunk_len": pa.array(
                np.minimum(lens[doc_idx] - starts, chunk_size),
                pa.int64()),
            "chunk_text": pa.array(chunks, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")
