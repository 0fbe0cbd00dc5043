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


def _doc_ngram_hashes(col, n: int, distinct: bool = True):
    """Per-document DISTINCT token-n-gram hashes, fully vectorized.
    With ``distinct=False`` also returns per-(doc, gram) multiplicities
    as a third array.

    Returns (doc_index, gram_hash) arrays where doc_index refers to the
    row within the batch; documents shorter than n tokens contribute
    nothing.  One polynomial-rolling pass over the flat token array with
    document-boundary masking — no per-row Python.
    """
    toks = _space_token_lists(pc.fill_null(col, ""))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.flatten()
    T = len(flat)
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64))
    if not distinct:
        empty = empty + (np.empty(0, np.int64),)
    if T < n:
        return empty
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
        return empty
    order = np.lexsort((g_v, doc_v))
    doc_s, g_s = doc_v[order], g_v[order]
    keep = np.empty(len(doc_s), bool)
    keep[0] = True
    keep[1:] = (doc_s[1:] != doc_s[:-1]) | (g_s[1:] != g_s[:-1])
    if not distinct:
        # multiplicity per (doc, gram): run lengths between keep marks
        starts = np.flatnonzero(keep)
        counts = np.diff(np.append(starts, len(doc_s)))
        return doc_s[keep], g_s[keep], counts
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


def _explode_doc_grams(b: pa.Table, n: int, text_col: str, id_col: str,
                       n_buckets: int) -> pa.Table:
    """Per-batch combiner for duplicate-span stats: one row per DISTINCT
    (doc, gram) with its in-doc multiplicity ``k`` and the doc's total
    n-gram position count ``n_doc`` — the exchange carries
    (hash, id, two ints), never text."""
    toks = _space_token_lists(pc.fill_null(b[text_col], ""))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    n_doc_all = np.maximum(np.diff(offsets) - n + 1, 0)
    doc, g, k = _doc_ngram_hashes(b[text_col], n, distinct=False)
    ids = np.asarray(b[id_col], dtype=np.int64)
    g_i64 = g.view(np.int64)
    return pa.table({
        "bucket": pa.array((g % np.uint64(n_buckets)).astype(np.int64)),
        "g": pa.array(g_i64),
        "doc_id": pa.array(ids[doc]),
        "k": pa.array(k, pa.int64()),
        "n_doc": pa.array(n_doc_all[doc], pa.int64()),
    })


def duplicate_ngram_stats(ds: "ray.data.Dataset",
                          n: int = 13,
                          min_repeat: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          n_buckets: int = 64) -> "ray.data.Dataset":
    """Cross-document duplicate n-gram span statistics — the exact
    substring-dedup signal of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"), at token-n-gram granularity.

    A corpus-wide n-gram is "duplicated" when its total occurrence count
    (with multiplicity, across all documents) reaches ``min_repeat``.
    Output (docs with at least one duplicated position only):
    ``doc_id, n_ngrams, dup_ngrams, dup_fraction`` where ``dup_fraction =
    dup_ngrams / n_ngrams`` rounded to 6 places.

    Scale shape: per-batch combiner collapses positions to distinct
    (doc, gram, k) rows; grams are bucketed by hash (``n_buckets``) and
    each bucket's totals are computed vectorized (sort + reduceat) —
    never a per-gram Python loop; the per-doc rollup pre-aggregates
    inside batches before the final ``groupby(doc_id)``.  Both exchanges
    carry fixed-width rows (~32 B/position worst case), never text.
    Gram identity is a 64-bit polynomial hash (collisions over-count at
    ~n_grams/2^64 — negligible).
    """
    import ray.data
    from ray.data.aggregate import Max, Sum

    pairs = ds.map_batches(
        lambda b: _explode_doc_grams(b, n, text_col, id_col, n_buckets),
        batch_format="pyarrow")

    def bucket_dups(gtab: pa.Table) -> pa.Table:
        g = np.asarray(gtab["g"], dtype=np.int64)
        k = np.asarray(gtab["k"], dtype=np.int64)
        order = np.argsort(g, kind="stable")
        g_s, k_s = g[order], k[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        totals = np.add.reduceat(k_s, starts)
        per_row_total = np.repeat(totals, np.diff(np.append(starts,
                                                            len(g_s))))
        keep_sorted = per_row_total >= min_repeat
        keep = np.empty(len(g), bool)
        keep[order] = keep_sorted
        return pa.table({
            "doc_id": pa.array(np.asarray(gtab["doc_id"],
                                          dtype=np.int64)[keep]),
            "k": pa.array(k[keep], pa.int64()),
            "n_doc": pa.array(np.asarray(gtab["n_doc"],
                                         dtype=np.int64)[keep]),
        })

    dup_rows = pairs.groupby("bucket").map_groups(bucket_dups,
                                                  batch_format="pyarrow")

    def partial_doc(b: pa.Table) -> pa.Table:
        t = b.group_by(["doc_id"]).aggregate([("k", "sum"),
                                              ("n_doc", "max")])
        return pa.table({"doc_id": t["doc_id"],
                         "k": pc.cast(t["k_sum"], pa.int64()),
                         "n_doc": pc.cast(t["n_doc_max"], pa.int64())})

    agg = (dup_rows.map_batches(partial_doc, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Sum("k"), Max("n_doc")))

    def finish(b: pa.Table) -> pa.Table:
        dup = np.asarray(b["sum(k)"], dtype=np.int64)
        tot = np.asarray(b["max(n_doc)"], dtype=np.int64)
        frac = np.round(dup / np.maximum(tot, 1), 6)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_ngrams": pa.array(tot, pa.int64()),
            "dup_ngrams": pa.array(dup, pa.int64()),
            "dup_fraction": pa.array(frac, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def repetition_signals(batch: pa.Table, ns: Tuple[int, ...] = (2, 3),
                       text_col: str = "text",
                       ) -> pa.Table:
    """WITHIN-document n-gram repetition ratios (Gopher-style quality
    rule: "fraction of duplicated n-grams"): for each n in ``ns`` emits
    ``rep_{n}gram_frac = 1 - distinct_ngrams/total_ngrams`` (0.0 when the
    doc has < n tokens; NULL for NULL text).

    Row-local — a plain ``map_batches`` stage, no shuffle, one rolling
    hash pass per n.  Complements ``duplicate_ngram_stats`` (the
    CROSS-document signal, which needs an exchange).
    """
    col = batch[text_col]
    toks = _space_token_lists(pc.fill_null(col, ""))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    is_null = np.asarray(pc.is_null(col))
    t = batch
    for n in ns:
        totals = np.maximum(np.diff(offsets) - n + 1, 0)
        doc, g, k = _doc_ngram_hashes(col, n, distinct=False)
        distinct = np.bincount(doc, minlength=len(batch))
        frac = np.where(totals > 0, 1.0 - distinct / np.maximum(totals, 1),
                        0.0)
        frac = np.round(frac, 6)
        t = t.append_column(
            f"rep_{n}gram_frac",
            pa.array([None if is_null[i] else float(frac[i])
                      for i in range(len(batch))], pa.float64()))
    return t
