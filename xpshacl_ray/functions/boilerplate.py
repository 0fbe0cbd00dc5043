"""Boilerplate line removal — the C4/Dolma line-level dedup pass: a
"line" whose exact text recurs in >= ``min_docs`` DISTINCT documents is
boilerplate (nav bars, cookie banners, license headers) and is stripped
from every document that contains it.

The synthetic corpus carries no newline-delimited lines, so line
identity is derived deterministically: consecutive windows of
``line_tokens`` non-empty space-separated tokens (case-preserving; the
tail window may be shorter).  The derivation is SQL-reproducible, which
is what lets the DuckDB oracle replay the whole pass.

Scale shape (two passes over the corpus, the minimum for a
corpus-discovered predicate):

1. **Census** — per-batch combiner collapses lines to one
   ``(line_hash, partial_docs)`` row per distinct line per batch
   (distinct-per-doc first, and a document never spans batches, so
   summing partials is the exact distinct-document count).  The only
   shuffle carries (uint64, int64) pairs — never line text.
2. **Scrub** — boilerplate hashes (bounded: only lines repeated across
   documents survive the ``min_docs`` filter) are broadcast once via
   ``ray.put`` and probed with ``searchsorted``; each batch re-derives
   its lines locally, drops the flagged ones and re-joins the survivors
   — a map-only stage, no second shuffle, text never leaves its block.

Memory bound: 8 bytes per boilerplate line on each worker (1e8
boilerplate lines ~ 800 MB); past that, ``use_bloom=True`` broadcasts a
fixed-size Bloom filter instead (false positives OVER-strip at the
filter's fp rate — the conservative direction for boilerplate, mirroring
:mod:`.decontam`).

Line identity is a 64-bit hash (collision odds ~#distinct_lines/2^64;
a collision could only over-strip).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xpshacl_ray.functions.sketches import BloomFilter, hash64


def derive_lines(batch: pa.Table, text_col: str = "text",
                 line_tokens: int = 8):
    """Token-window line derivation for one batch.

    Returns ``(lines, rid, line_no, n_lines)``: a StringArray of line
    texts, the batch-row index and in-doc ordinal of each line, and the
    per-row line count.  Fully vectorized — tokenization is the shared
    case-preserving ``_filtered_tokens`` layout, window regrouping is an
    offsets rewrite over the flat token array, line text assembly is one
    ``binary_join`` kernel."""
    from xpshacl_ray.functions.text import _filtered_tokens

    flat_tokens, tok_offsets = _filtered_tokens(batch[text_col],
                                                lower=False)
    n_tokens = np.diff(tok_offsets)
    n_lines = -(-n_tokens // line_tokens)  # ceil; 0 for empty/NULL docs
    total = int(n_lines.sum())
    if total == 0:
        return (pa.array([], pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64), n_lines)
    lens = np.full(total, line_tokens, dtype=np.int64)
    ends = np.cumsum(n_lines)
    nz = n_lines > 0
    lens[ends[nz] - 1] = n_tokens[nz] - line_tokens * (n_lines[nz] - 1)
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    line_lists = pa.LargeListArray.from_arrays(offsets, flat_tokens)
    lines = pc.binary_join(line_lists, " ")
    rid = np.repeat(np.arange(len(batch), dtype=np.int64), n_lines)
    line_no = np.arange(total, dtype=np.int64) - np.repeat(
        ends - n_lines, n_lines)
    return lines, rid, line_no, n_lines


def partial_line_docs(batch: pa.Table, text_col: str = "text",
                      line_tokens: int = 8) -> pa.Table:
    """Census combiner: one ``(line_h, partial_docs)`` row per distinct
    line per batch, where ``partial_docs`` counts DISTINCT documents in
    this batch — document identity IS the batch row (a document is one
    row and never spans batches), so no id column is consulted."""
    lines, rid, _, _ = derive_lines(batch, text_col, line_tokens)
    if len(lines) == 0:
        return pa.table({"line_h": pa.array([], pa.int64()),
                         "partial_docs": pa.array([], pa.int64())})
    h = hash64(lines.to_numpy(zero_copy_only=False)).view(np.int64)
    # distinct (line, doc) then count docs per line: one lexsort
    order = np.lexsort((rid, h))
    h_s, r_s = h[order], rid[order]
    first = np.r_[True, (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])]
    h_d = h_s[first]
    starts = np.flatnonzero(np.r_[True, h_d[1:] != h_d[:-1]])
    docs = np.diff(np.append(starts, len(h_d)))
    return pa.table({"line_h": pa.array(h_d[starts]),
                     "partial_docs": pa.array(docs, pa.int64())})


def collect_boilerplate(ds: "ray.data.Dataset", min_docs: int = 2,
                        text_col: str = "text", line_tokens: int = 8,
                        ) -> np.ndarray:
    """Census pass → sorted int64 hashes of lines appearing in
    >= ``min_docs`` distinct documents.  The groupby exchange carries
    (hash, count) pairs only; the returned set is bounded by the number
    of cross-document repeated lines (streamed batch-wise, never a
    whole-dataset ``take_all``)."""
    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(
            lambda b: partial_line_docs(b, text_col, line_tokens),
            batch_format="pyarrow")
        .groupby("line_h")
        .aggregate(Sum("partial_docs", alias_name="n_docs"))
    )
    chunks = [
        np.asarray(b.filter(
            pc.greater_equal(b["n_docs"], min_docs))["line_h"],
            dtype=np.int64)
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not chunks:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(chunks))


class _Scrubber:
    """Map-only scrub stage: re-derive lines, drop flagged ones, re-join
    survivors with ``\\n``.  The boilerplate set rides the object store
    (``ray.put`` once, zero-copy read per task), or a Bloom filter when
    the exact set would blow the broadcast bound."""

    def __init__(self, boiler_ref, text_col: str, line_tokens: int,
                 bloom: Optional[bytes]):
        import ray

        self.text_col = text_col
        self.line_tokens = line_tokens
        if bloom is not None:
            self.bloom: Optional[BloomFilter] = BloomFilter.from_bytes(bloom)
            self.boiler = None
        else:
            self.bloom = None
            self.boiler = ray.get(boiler_ref) if boiler_ref is not None \
                else np.empty(0, np.int64)

    def _is_boiler(self, h: np.ndarray) -> np.ndarray:
        if self.bloom is not None:
            return self.bloom.might_contain(h.view(np.uint64))
        if self.boiler is None or len(self.boiler) == 0:
            return np.zeros(len(h), bool)
        idx = np.minimum(np.searchsorted(self.boiler, h),
                         len(self.boiler) - 1)
        return self.boiler[idx] == h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        lines, rid, _, n_lines = derive_lines(batch, self.text_col,
                                              self.line_tokens)
        if len(lines):
            h = hash64(lines.to_numpy(zero_copy_only=False)).view(np.int64)
            keep = ~self._is_boiler(h)
        else:
            keep = np.empty(0, bool)
        kept_counts = np.bincount(rid[keep], minlength=n) if len(rid) \
            else np.zeros(n, np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_lists = pa.LargeListArray.from_arrays(
            offsets, lines.filter(pa.array(keep)))
        joined = pc.binary_join(kept_lists, "\n")
        # NULL in → NULL out (empty docs stay '')
        text_clean = pc.if_else(pc.is_null(batch[self.text_col]),
                                pa.nulls(n, joined.type), joined)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_boiler": pa.array(n_lines - kept_counts, pa.int64()),
            "text_clean": text_clean,
        })


def strip_boilerplate(ds: "ray.data.Dataset", min_docs: int = 2,
                      text_col: str = "text", line_tokens: int = 8,
                      use_bloom: bool = False,
                      bloom_fp: float = 1e-4) -> "ray.data.Dataset":
    """Two-pass boilerplate-line removal (see module docstring).

    Output: ``doc_id, n_lines, n_boiler, text_clean`` — survivors joined
    with newlines, ``''`` for a fully-stripped or token-less doc, NULL
    for NULL text."""
    import ray

    boiler = collect_boilerplate(ds, min_docs, text_col, line_tokens)
    if use_bloom:
        bf = BloomFilter(n_items=max(len(boiler), 1), fp_rate=bloom_fp)
        bf.add(boiler.view(np.uint64))
        kwargs = dict(boiler_ref=None, bloom=bf.to_bytes())
    else:
        kwargs = dict(boiler_ref=ray.put(boiler), bloom=None)
    return ds.map_batches(
        _Scrubber, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col,
                                   line_tokens=line_tokens, **kwargs),
        concurrency=(1, 8))
