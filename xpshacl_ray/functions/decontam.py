"""Benchmark decontamination: flag/drop corpus documents that share
token n-grams with an evaluation (benchmark) set.

The standard LLM-training hygiene pass (n-gram overlap decontamination,
n=13 in GPT-3/PaLM practice): the benchmark side is SMALL (eval sets),
so its distinct n-gram hashes are collected once and broadcast via
``ray.put`` — the corpus pass is then row-local (no shuffle) and streams
at read speed at any corpus size.  Memory bound: 8 bytes per distinct
benchmark n-gram on each worker (1e8 n-grams ≈ 800 MB); past that, pass
``use_bloom=True`` to broadcast a fixed-size Bloom filter instead
(false-positive flags at the filter's fp rate — conservative for
decontamination, where over-dropping is the safe direction).

Tokenization is ``str_split(lower(text), ' ')`` (empties kept) for
byte-parity with the DuckDB oracle; n-grams are compared by 64-bit
polynomial hash (collision odds ~#bench_grams/2^64 — negligible, and
only ever over-flags).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xpshacl_ray.functions.sketches import BloomFilter, hash64
from xpshacl_ray.functions.text import _space_token_lists

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_ngram_hashes(col, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-document DISTINCT token-n-gram hashes, fully vectorized.

    Returns (doc_index, gram_hash) arrays where doc_index refers to the
    row within the batch; documents shorter than n tokens contribute
    nothing.  One polynomial-rolling pass over the flat token array with
    document-boundary masking — no per-row Python.
    """
    toks = _space_token_lists(pc.fill_null(col, ""))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.flatten()
    T = len(flat)
    if T < n:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    h = hash64(flat.to_numpy(zero_copy_only=False)).astype(np.uint64)
    with np.errstate(over="ignore"):
        g = h[: T - n + 1].copy()
        for k in range(1, n):
            g = g * _MIX + h[k: T - n + 1 + k]
    pos = np.arange(T - n + 1, dtype=np.int64)
    doc = np.searchsorted(offsets, pos, side="right") - 1
    valid = pos + n <= offsets[doc + 1]   # n-gram stays inside its doc
    doc_v, g_v = doc[valid], g[valid]
    if len(doc_v) == 0:
        return (doc_v, g_v)
    order = np.lexsort((g_v, doc_v))
    doc_s, g_s = doc_v[order], g_v[order]
    keep = np.empty(len(doc_s), bool)
    keep[0] = True
    keep[1:] = (doc_s[1:] != doc_s[:-1]) | (g_s[1:] != g_s[:-1])
    return doc_s[keep], g_s[keep]


def collect_benchmark_ngrams(bench_ds: "ray.data.Dataset", n: int = 13,
                             text_col: str = "text") -> np.ndarray:
    """Distinct n-gram hashes of the (small) benchmark side, as a sorted
    uint64 array.  Per-batch distinct first, union on the driver — the
    exchange carries hashes only, never text."""

    def partial(b: pa.Table) -> pa.Table:
        _, g = _doc_ngram_hashes(b[text_col], n)
        return pa.table({"g": pa.array(np.unique(g))})

    parts = bench_ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.array([p["g"] for p in parts], dtype=np.uint64))


class _OverlapCounter:
    """Row-local corpus stage: count distinct benchmark n-grams per doc.

    The benchmark hash set is passed as an object-store ref (``ray.put``
    once on the driver, zero-copy-read in every task) — never re-shipped
    per batch.
    """

    def __init__(self, bench_ref, n: int, text_col: str,
                 min_overlap: int, bloom: Optional[bytes]):
        import ray

        self.n = n
        self.text_col = text_col
        self.min_overlap = min_overlap
        if bloom is not None:
            self.bloom: Optional[BloomFilter] = BloomFilter.from_bytes(bloom)
            self.bench = None
        else:
            self.bloom = None
            self.bench = ray.get(bench_ref) if bench_ref is not None \
                else np.empty(0, np.uint64)

    def __call__(self, b: pa.Table) -> pa.Table:
        doc, g = _doc_ngram_hashes(b[self.text_col], self.n)
        counts = np.zeros(len(b), np.int64)
        if len(g):
            if self.bloom is not None:
                hit = self.bloom.might_contain(g)
            elif len(self.bench):
                idx = np.searchsorted(self.bench, g)
                idx_c = np.minimum(idx, len(self.bench) - 1)
                hit = self.bench[idx_c] == g
            else:
                hit = np.zeros(len(g), bool)
            np.add.at(counts, doc, hit.astype(np.int64))
        t = b.append_column("contaminated_ngrams",
                            pa.array(counts, pa.int64()))
        return t.append_column(
            "is_contaminated",
            pa.array(counts >= self.min_overlap, pa.bool_()))


def decontaminate(corpus_ds: "ray.data.Dataset",
                  bench_ds: "ray.data.Dataset",
                  n: int = 13,
                  text_col: str = "text",
                  min_overlap: int = 1,
                  mode: str = "flag",
                  use_bloom: bool = False,
                  bloom_fp: float = 1e-4) -> "ray.data.Dataset":
    """Flag (``mode="flag"``) or drop (``mode="drop"``) corpus documents
    sharing >= ``min_overlap`` distinct token ``n``-grams with the
    benchmark set.  See module docstring for the scale contract."""
    import ray

    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    bench = collect_benchmark_ngrams(bench_ds, n=n, text_col=text_col)
    if use_bloom:
        bf = BloomFilter(n_items=max(len(bench), 1), fp_rate=bloom_fp)
        bf.add(bench)
        fn_kwargs = dict(bench_ref=None, bloom=bf.to_bytes())
    else:
        fn_kwargs = dict(bench_ref=ray.put(bench), bloom=None)
    out = corpus_ds.map_batches(
        _OverlapCounter, batch_format="pyarrow",
        fn_constructor_kwargs=dict(n=n, text_col=text_col,
                                   min_overlap=min_overlap, **fn_kwargs),
        concurrency=(1, 8))
    if mode == "drop":
        out = out.filter(expr="is_contaminated == False") \
                 .drop_columns(["contaminated_ngrams", "is_contaminated"])
    return out
