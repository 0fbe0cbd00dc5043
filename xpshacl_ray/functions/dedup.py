"""Deduplication operators for training-data pipelines at 100 TB scale.

Five families, each expressed Ray-Data-first:

- **exact**        : content-hash column → ``groupby(hash)`` → keep first.
  The shuffle moves (hash, id) pairs only — never the text.
- **MinHash+LSH**  : shingle → minhash signature (vectorized universal
  hashing) → banding → ``groupby(band)`` buckets → candidate pairs with
  estimated Jaccard, verified in-bucket (no driver-side candidate
  materialization, so high-dup corpora are safe).  Signature computation
  is embarrassingly parallel; the only shuffle carries (band_id,
  band_hash, id, sig) rows where ``sig`` is 16-bit-quantized by default —
  128 B instead of 512 B per band row (``sig_bits=64`` restores full
  slots).  A digest-only exchange (ship ids, re-derive signatures for
  candidates) was measured and REJECTED: without in-bucket thresholds a
  high-overlap corpus materializes every band collision as a pair row
  (272 s vs 4.7 s at sf0.1) — quantization gets the exchange shrink
  without that failure mode.
- **SimHash**      : 64-bit sign-of-weighted-sum fingerprint; near-dup =
  small Hamming distance, bucketed by 16-bit bands for LSH.  The bucket
  sweep is fully vectorized (XOR + SWAR popcount over pair index arrays).
- **n-gram Jaccard**: exact verification kernel over candidate pairs —
  broadcast text lookup for small candidate sets, bucketed hash join past
  ``broadcast_limit``.
- **embedding cosine**: near-dup via normalized dot product; brute-force
  within LSH (random hyperplane) buckets.

Hot buckets (e.g. thousands of empty/identical docs hashing to one LSH
bucket) are capped at ``hot_bucket_cap`` members per bucket with a
``logging.warning`` of exactly how many pairs were dropped — no silent
caps.

Connected components over candidate pairs run driver-side union-find here
(candidate graphs are tiny relative to the corpus); at 10^12 rows swap in
the iterative min-label-propagation (`groupby` rounds) noted in
``cluster_labels``'s docstring.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .arrowutil import agg_select
from .sketches import hash64

logger = logging.getLogger(__name__)

_MERSENNE = np.uint64((1 << 61) - 1)

# SWAR popcount constants (no np.bitwise_count on numpy 1.x)
_P1 = np.uint64(0x5555555555555555)
_P2 = np.uint64(0x3333333333333333)
_P3 = np.uint64(0x0F0F0F0F0F0F0F0F)
_P4 = np.uint64(0x0101010101010101)


def popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) over a uint64 ndarray."""
    x = x - ((x >> np.uint64(1)) & _P1)
    x = (x & _P2) + ((x >> np.uint64(2)) & _P2)
    x = (x + (x >> np.uint64(4))) & _P3
    return (x * _P4) >> np.uint64(56)


def _cap_bucket(g: pd.DataFrame, cap: int, label: str) -> pd.DataFrame:
    """Deterministically cap a hot bucket (keep lowest ids), loudly."""
    n = len(g)
    if n <= cap:
        return g
    dropped = n * (n - 1) // 2 - cap * (cap - 1) // 2
    logger.warning(
        "hot %s bucket with %d members capped to %d — %d candidate pairs "
        "dropped (raise hot_bucket_cap to keep them)", label, n, cap, dropped,
    )
    return g.head(cap)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_hash(batch: pa.Table, text_col: str = "text",
                  out_col: str = "text_md5") -> pa.Table:
    out = [
        None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(out, pa.string()))


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct text (hash-partitioned first-wins).

    Projects to (hash, id) before the shuffle — the text never moves.
    Returns (text_md5, keep_id, n_dupes).
    """
    from ray.data.aggregate import Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        h = add_text_hash(b, text_col).select(["text_md5", id_col])
        agg = h.group_by(["text_md5"]).aggregate(
            [(id_col, "min"), ([], "count_all")]
        )
        return agg_select(agg, {"text_md5": "text_md5",
                                f"{id_col}_min": "p_min",
                                "count_all": "p_n"})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("p_min", alias_name="keep_id"),
                   Sum("p_n", alias_name="n_total"))
    )

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_md5": b["text_md5"],
                "keep_id": b["keep_id"],
                "n_dupes": pc.subtract(pc.cast(b["n_total"], pa.int64()), 1),
            }
        )

    return merged.map_batches(shape, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor: char-shingle MinHash signatures, vectorized universal hashing.

    ``sig_i(doc) = min over shingles s of (a_i * h(s) + b_i) mod p`` —
    the permutation coefficients are generated once per actor from a fixed
    seed (setup in ``__init__``, work in ``__call__``).
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 seed: int = 42, text_col: str = "text"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    _SHINGLE_BASE = np.uint64(1099511628211)  # FNV prime

    def shingle_hashes(self, text: str) -> np.ndarray:
        """Distinct k-byte-shingle hashes, fully vectorized: a polynomial
        rolling hash is k shifted multiply-adds over the whole byte array —
        no per-shingle Python slicing (which dominates at corpus scale)."""
        k = self.k
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) == 0:
            return np.zeros(1, dtype=np.uint64)
        if len(b) < k:
            pows = self._SHINGLE_BASE ** np.arange(len(b), dtype=np.uint64)
            return np.array([(b * pows).sum() & _MERSENNE], dtype=np.uint64)
        n_sh = len(b) - k + 1
        h = np.zeros(n_sh, dtype=np.uint64)
        for j in range(k):  # k is small (default 5): k vector ops total
            h = h * self._SHINGLE_BASE + b[j : j + n_sh]
        return np.unique(h & _MERSENNE)

    def signature(self, text: str) -> np.ndarray:
        x = self.shingle_hashes(text)
        # (num_perm, n_shingles) universal hash, min over shingles
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def _signatures_chunk(self, texts) -> np.ndarray:
        """Vectorized signatures for a chunk of docs: one (num_perm,
        total_shingles) universal-hash matrix + per-doc ``minimum.reduceat``
        instead of a Python matrix op per document."""
        hash_lists = [self.shingle_hashes(t) if t else
                      np.zeros(1, dtype=np.uint64) for t in texts]
        lengths = np.array([len(h) for h in hash_lists])
        x = np.concatenate(hash_lists)
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        mins = np.minimum.reduceat(vals, starts, axis=1)  # (num_perm, n_docs)
        sigs = mins.T.copy()
        empty = np.array([not t for t in texts])
        if empty.any():
            sigs[empty] = 0
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # chunk so the (num_perm × shingles) matrix stays ~tens of MB
        budget = max(1, 2_000_000 // max(self.num_perm, 1))
        sigs, i = [], 0
        while i < len(texts):
            j, cost = i, 0
            while j < len(texts) and cost < budget:
                cost += max(1, len(texts[j] or "") - self.k + 1)
                j += 1
            sigs.append(self._signatures_chunk(texts[i:j]))
            i = j
        all_sigs = np.concatenate(sigs) if sigs else np.zeros(
            (0, self.num_perm), dtype=np.uint64)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(all_sigs.ravel().astype(np.uint64), pa.uint64()),
            self.num_perm,
        )
        return batch.append_column("minhash", arr)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def choose_bands(num_perm: int, jaccard_threshold: float,
                 fp_weight: float = 0.5, fn_weight: float = 0.5) -> int:
    """Pick the LSH band count minimizing weighted false-positive +
    false-negative mass around the threshold.

    P(candidate | J) = 1 - (1 - J^r)^b with r = num_perm / b; the chosen b
    minimizes ``fp_weight·∫₀^t P + fn_weight·∫ₜ¹ (1-P)`` (the standard
    S-curve tuning, numerically integrated).  Lower thresholds want more
    bands (smaller r); dedup-grade thresholds (~0.8) land at b=16 for 64
    permutations — the module default."""
    if not 0 < jaccard_threshold < 1:
        raise ValueError("jaccard_threshold must be in (0, 1)")
    xs = np.linspace(0, 1, 501)
    best_b, best_err = 1, np.inf
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        p = 1.0 - (1.0 - xs ** r) ** b
        below = xs <= jaccard_threshold
        fp = np.trapz(p[below], xs[below])
        fn = np.trapz(1.0 - p[~below], xs[~below])
        err = fp_weight * fp + fn_weight * fn
        if err < best_err:
            best_b, best_err = b, err
    return best_b


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 band digests: a 64-bit polynomial fold of
    each signature band's ``r`` values, vectorized over documents.  Band
    index is mixed into the seed so equal chunks in different bands don't
    collide.  Replaces the per-doc md5-per-band Python loop (16n hashlib
    calls)."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    prime = np.uint64(1099511628211)
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        h = np.full(n, np.uint64(14695981039346656037) ^ np.uint64(b),
                    dtype=np.uint64)
        for j in range(r):
            h = (h ^ sigs[:, b * r + j]) * prime
        out[:, b] = h
    return out


def explode_bands(batch: pa.Table, num_perm: int, bands: int,
                  id_col: str = "doc_id",
                  sig_bits: int = 16) -> pa.Table:
    """(doc, signature) → one row per band: (band_id, band_hash, doc_id, sig).

    ``sig_bits=16`` (default) quantizes each signature slot to its low 16
    bits before banding AND verification — the carried signature shrinks
    from num_perm×8 B to num_perm×2 B (512 B → 128 B at 64 perms), cutting
    the LSH exchange ~3.6× while keeping verification in-bucket (no second
    pass, no driver-side candidate materialization).  Quantization is
    self-consistent: bucket keys fold the SAME quantized values the
    estimator compares, so banding, first-matching-band dedup and the
    Jaccard estimate all see one algorithm ("16-bit MinHash").  A slot
    false-match costs 2^-16 ≈ 1.5e-5 estimator bias — negligible against
    the 1/num_perm estimator granularity.  ``sig_bits=64`` keeps the full
    slots."""
    sigs = np.asarray(
        batch["minhash"].combine_chunks().flatten()
    ).reshape(-1, num_perm)
    if sig_bits == 16:
        sigs = (sigs & np.uint64(0xFFFF)).astype(np.uint16)
    ids = batch[id_col].to_pylist()
    n = len(ids)
    bh = _band_hashes(sigs.astype(np.uint64), bands)
    sig_bytes = [sigs[i].tobytes() for i in range(n)]
    band_ids, band_hashes, out_ids, out_sigs = [], [], [], []
    for b in range(bands):
        band_ids += [b] * n
        band_hashes += bh[:, b].view(np.int64).tolist()
        out_ids += ids
        out_sigs += sig_bytes
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            id_col: pa.array(out_ids),
            "sig": pa.array(out_sigs, pa.binary()),
        }
    )


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: Optional[int] = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    concurrency=None,
    sig_bits: int = 16,
    hot_bucket_cap: int = 1024,
) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs with estimated Jaccard ≥ threshold.

    shingle→minhash→band→bucket-groupby; within each bucket the signature
    pairs are verified by estimated Jaccard (signature-slot agreement) and
    a pair colliding in several bands is emitted only by its FIRST
    matching band (cross-bucket dedup with no second shuffle).  Returns
    (id_a, id_b, jaccard_est) with id_a < id_b.

    ``sig_bits=16`` (default) carries 2-byte quantized slots through the
    shuffle — 128 B/band-row instead of 512 B (see :func:`explode_bands`);
    verification stays in-bucket either way, so high-dup corpora never
    materialize candidates driver-side.  Hot buckets (e.g. thousands of
    identical docs) are capped loudly at ``hot_bucket_cap`` members.

    The signature stage runs as STATELESS tasks by default —
    ``MinHasher.__init__`` is sub-millisecond numpy param setup, so an
    actor pool only adds its startup latency (measured 2.3× slower at
    bench scale) and the instance ships cheaply in the task closure.
    Pass ``concurrency=(min, max)`` to opt into a pool for a hasher
    subclass with genuinely heavy per-actor state (a model, a big
    vocabulary)."""
    if bands is None:  # autotune from the threshold's S-curve
        bands = choose_bands(num_perm, jaccard_threshold)
    if num_perm % bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}); "
            "tail permutations would silently drop from band hashing")
    if sig_bits not in (16, 64):
        raise ValueError("sig_bits must be 16 or 64")
    from ..tuning import map_batches_maybe_pool

    with_sig = map_batches_maybe_pool(
        ds, MinHasher,
        dict(num_perm=num_perm, shingle_k=shingle_k, text_col=text_col),
        concurrency, batch_format="pyarrow",
    )
    sig_and_id = with_sig.select_columns([id_col, "minhash"])
    n_parts = 64
    sig_dtype = np.uint16 if sig_bits == 16 else np.uint64

    def explode(b: pa.Table) -> pa.Table:
        t = explode_bands(b, num_perm, bands, id_col, sig_bits=sig_bits)
        part = (np.asarray(t["band_hash"], dtype=np.int64)
                % n_parts).astype(np.int32)
        return t.append_column("part", pa.array(np.abs(part)))

    exploded = sig_and_id.map_batches(explode, batch_format="pyarrow")

    _EMPTY = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "jaccard_est": pd.Series(dtype="float64")}
    )

    r = num_perm // bands

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (band_id, _), g in part.groupby(["band_id", "band_hash"],
                                            sort=False):
            g = g.drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            g = g.sort_values(id_col)
            g = _cap_bucket(g, hot_bucket_cap, "minhash-LSH")
            ids = np.asarray(g[id_col].tolist())
            sigs = np.stack(
                [np.frombuffer(s, dtype=sig_dtype) for s in g["sig"]])
            eq3 = sigs[:, None, :] == sigs[None, :, :]
            eq = eq3.mean(axis=2)
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = eq[ii, jj] >= jaccard_threshold
            if not keep.any():
                continue
            # global dedup WITHOUT a second shuffle: a pair colliding in
            # several bands is emitted only by its FIRST matching band,
            # computable locally from the carried signatures
            band_eq = eq3.reshape(len(ids), len(ids), bands, r).all(axis=3)
            first_band = band_eq.argmax(axis=2)  # first True index
            keep &= first_band[ii, jj] == band_id
            if keep.any():
                out.append(pd.DataFrame(
                    {"id_a": ids[ii[keep]].astype("int64"),
                     "id_b": ids[jj[keep]].astype("int64"),
                     "jaccard_est": np.round(eq[ii, jj][keep], 6)}))
        if not out:
            return _EMPTY
        return pd.concat(out, ignore_index=True)

    return exploded.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )


def cluster_labels_distributed(
    pairs: "ray.data.Dataset",
    max_rounds: int = 50,
    n_buckets: int = 64,
    pointer_jumping: bool = True,
    jump_broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Connected components over candidate pairs WITHOUT driver state:
    iterative min-label propagation, one small groupby shuffle per round.

    Returns a Dataset of (node, label) where ``label`` is the minimum id
    in the node's component — the distributed equivalent of
    :func:`cluster_labels` for candidate graphs too large to union-find
    on the driver.  Each round every node adopts
    ``min(own label, neighbours' labels)``; labels only decrease, so the
    driver-side convergence check is one cheap ``Sum`` aggregate per
    round (stop when the label sum stops falling).

    ``pointer_jumping=True`` additionally shortcuts each round:
    ``label(node) ← label(label(node))`` (labels are monotone,
    ``label(x) ≤ x``, so every label value is itself a labelled node and
    the shortcut only decreases labels).  Plain propagation needs
    ≈ graph-diameter rounds; with the shortcut the label of the
    component minimum reaches everyone in O(log diameter) rounds
    (Shiloach–Vishkin style) — the win is deep CHAIN components, where
    near-dup similarity is transitive enough to link a…z through
    pairwise neighbours.

    The jump is applied MAP-SIDE from a broadcast ``label → label(label)``
    table: a self-join on the label would funnel every row of a
    converging component through one hot join key (all members share
    label L), so instead the mapping — one row per DISTINCT label value,
    a set that only shrinks — is collected and shipped via ``ray.put``.
    When the per-batch-HLL estimate of distinct labels exceeds
    ``jump_broadcast_limit`` the jump is skipped for that round (plain
    propagation still makes progress; early rounds have near-n distinct
    labels and don't benefit from jumping anyway) and re-engages once
    the label set collapses under the limit — bounded memory, no hot
    key, same O(log d) tail convergence.
    """
    from ray.data.aggregate import Min, Sum

    def both_dirs(b: pa.Table) -> pa.Table:
        a = pc.cast(b["id_a"], pa.int64())
        c = pc.cast(b["id_b"], pa.int64())
        return pa.table({"src": pa.chunked_array([a, c]).combine_chunks(),
                         "dst": pa.chunked_array([c, a]).combine_chunks()})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    n_edges = edges.count()  # metadata-only on the materialized dataset
    if n_edges == 0:  # no pairs → no components; Sum() on an empty
        # dataset returns None, which would defeat the convergence check
        return ray.data.from_arrow(pa.schema(
            [("node", pa.int64()), ("label", pa.int64())]).empty_table())
    # size the per-round join fan-out to the edge count: each bucket is a
    # task + a sort partition, so 64 buckets over a few hundred edges is
    # pure fixed cost (measured ~30% of round wall time at toy scale);
    # ~1M edges per bucket keeps a bucket one sane task at real scale
    n_buckets = max(2, min(int(n_buckets), -(-n_edges // 1_000_000)))
    # init: label(node) = node
    labels = (
        edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(
            lambda b: pa.table(
                {"node": b["src"],
                 "label": pc.min_element_wise(b["src"], b["nbr_min"])}),
            batch_format="pyarrow",
        ).materialize()
    )
    prev_sum = None
    for _ in range(max_rounds):
        # --- broadcast-propagate fast path -------------------------------
        # labels has one row per node, so when it fits the broadcast
        # bound (count() is metadata-only on the materialized dataset)
        # the round needs TWO executions instead of ~five: collect the
        # (node, label) arrays once — the pointer jump runs to FIXPOINT
        # driver-side (free; monotone, label values are nodes) and the
        # convergence sum is a numpy reduction — then propagate map-side
        # from the broadcast arrays (edges scan, no join shuffle) into
        # one Min-groupby.  Edges may still be arbitrarily large; only
        # the label table is bounded.  Past the bound, the sort-bucket
        # hash_join path below takes over.
        if labels.count() <= jump_broadcast_limit:
            nd_l, lb_l = [], []
            for blk in labels.iter_batches(batch_format="pyarrow", batch_size=None):
                nd_l.append(np.asarray(blk["node"]))
                lb_l.append(np.asarray(blk["label"]))
            nd = (np.concatenate(nd_l) if nd_l
                  else np.array([], np.int64))
            lb = (np.concatenate(lb_l) if lb_l
                  else np.array([], np.int64))
            order = np.argsort(nd)
            nd, lb = nd[order], lb[order]
            if pointer_jumping and len(nd):
                while True:  # label(label) to fixpoint — O(log d) passes
                    pos = np.clip(np.searchsorted(nd, lb), 0, len(nd) - 1)
                    hit = nd[pos] == lb
                    nxt = np.where(hit, lb[pos], lb)
                    if (nxt == lb).all():
                        break
                    lb = nxt
            cur = int(lb.sum())
            if prev_sum is not None and cur == prev_sum:
                labels = ray.data.from_arrow(pa.table(
                    {"node": pa.array(nd, pa.int64()),
                     "label": pa.array(lb, pa.int64())}))
                break
            prev_sum = cur
            arr_ref = _jump_put((nd, lb))
            self_tbl = pa.table({"dst": pa.array(nd, pa.int64()),
                                 "offer": pa.array(lb, pa.int64())})

            def offer_vec(b: pa.Table, r=arr_ref) -> pa.Table:
                import ray as _ray

                nd_s, lb_s = _ray.get(r)
                src = np.asarray(b["src"])
                pos = np.clip(np.searchsorted(nd_s, src),
                              0, max(0, len(nd_s) - 1))
                hit = nd_s[pos] == src if len(nd_s) else np.zeros(
                    len(src), bool)  # every edge src has a label row
                off = np.where(hit, lb_s[pos], src)
                return pa.table({"dst": b["dst"],
                                 "offer": pa.array(off, pa.int64())})

            labels = (
                edges.map_batches(offer_vec, batch_format="pyarrow")
                .union(ray.data.from_arrow(self_tbl))
                .groupby("dst")
                .aggregate(Min("offer", alias_name="label"))
                .map_batches(
                    lambda b: pa.table({"node": b["dst"],
                                        "label": b["label"]}),
                    batch_format="pyarrow")
                .materialize()
            )
            continue

        # --- shuffle-propagate path (labels exceed the broadcast bound) --
        # propagate: dst receives src's label, then node = min(all offers)
        def rename(b: pa.Table) -> pa.Table:
            return pa.table({"src": b["node"], "offer": b["label"]})

        offers_self = labels.map_batches(
            lambda b: pa.table({"dst": b["node"], "offer": b["label"]}),
            batch_format="pyarrow")
        from .joins import hash_join

        edge_offers = hash_join(
            edges, labels.map_batches(rename, batch_format="pyarrow"),
            key="src", n_buckets=n_buckets,
        ).map_batches(
            lambda b: pa.table({"dst": b["dst"], "offer": b["offer"]}),
            batch_format="pyarrow")
        labels = (
            edge_offers.union(offers_self)
            .groupby("dst")
            .aggregate(Min("offer", alias_name="label"))
            .map_batches(
                lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
                batch_format="pyarrow")
            .materialize()  # read twice: summary pass + jump pass
        )
        # ONE summary pass over the fresh labels folds what used to be
        # three separate executions (VERDICT r4 item 4): the convergence
        # partial sums, the per-batch distinct-label HLL blobs, AND the
        # per-batch unique label values (capped — a batch with more than
        # _SUMMARY_VALS_CAP uniques ships none and sets `capped`, so the
        # driver collect stays bounded in the early near-n-distinct
        # rounds, which are exactly the rounds the jump skips anyway).
        summaries = labels.map_batches(
            _label_round_summary, batch_format="pyarrow").take_all()
        cur = sum(int(r["partial_sum"]) for r in summaries)
        # measured PRE-jump each round, so sums are comparable: equal
        # consecutive pre-jump sums + per-element monotone decrease ⟹
        # element-wise fixpoint (jump at fixpoint is identity)
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
        if pointer_jumping:
            # labels rows exceed the broadcast bound, but the DISTINCT
            # label set only shrinks; broadcast the label→label mapping
            # only once it fits
            from .sketches import HyperLogLog

            est = HyperLogLog.merge_many(
                [r["hll"] for r in summaries]).estimate()
            if est <= jump_broadcast_limit:
                # mapping rows: nodes that ARE label values (every label
                # value has a label row; per-batch membership filter,
                # driver collect bounded by the distinct-label count)
                if any(r["capped"] for r in summaries):
                    # rare: HLL says the set fits but some batch was
                    # locally too diverse to ship its values for free —
                    # fall back to the dedicated collection pass
                    lbl_vals = set()
                    for blk in labels.map_batches(
                            lambda b: pa.table({"label": pa.array(np.unique(
                                np.asarray(b["label"])))}),
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow", batch_size=None):
                        lbl_vals.update(np.asarray(blk["label"]).tolist())
                else:
                    lbl_vals = set()
                    for r in summaries:
                        lbl_vals.update(r["vals"])
                set_ref = _jump_put(lbl_vals)
                mapping = {}
                for blk in labels.map_batches(
                        lambda b, r=set_ref: _filter_label_rows(b, r),
                        batch_format="pyarrow").iter_batches(
                            batch_format="pyarrow", batch_size=None):
                    mapping.update(zip(np.asarray(blk["node"]).tolist(),
                                       np.asarray(blk["label"]).tolist()))
                map_ref = _jump_put(mapping)

                def jump(b: pa.Table, r=map_ref) -> pa.Table:
                    import ray as _ray

                    m = _ray.get(r)
                    lab = np.asarray(b["label"])
                    out = np.fromiter((m.get(int(v), int(v)) for v in lab),
                                      dtype=np.int64, count=len(lab))
                    return pa.table({"node": b["node"],
                                     "label": pa.array(out)})

                labels = labels.map_batches(
                    jump, batch_format="pyarrow").materialize()
            # else: skip the jump this round — early rounds have ~n
            # distinct labels; the jump re-engages once they collapse
    return labels


def _hll_of_int64(col) -> bytes:
    from .sketches import HyperLogLog, hash64

    h = HyperLogLog(p=14)
    vals = np.asarray(col)
    h.add_hashes(hash64([str(v) for v in vals]).astype(np.uint64))
    return h.to_bytes()


#: per-batch unique-label shipping cap for the fused round summary —
#: bounds the driver collect at (blocks × cap) int64s even when the HLL
#: estimate is about to say "skip the jump this round"
_SUMMARY_VALS_CAP = 50_000


def _label_round_summary(b: pa.Table) -> pa.Table:
    """One row per labels batch: convergence partial sum + distinct-label
    HLL blob + the batch's unique label values (empty + ``capped=True``
    when there are more than :data:`_SUMMARY_VALS_CAP` of them).  Fuses
    the three per-round driver reads of the shuffle-propagate path into
    one execution (VERDICT r4 item 4)."""
    lab = np.asarray(b["label"])
    uniq = np.unique(lab)
    capped = len(uniq) > _SUMMARY_VALS_CAP
    return pa.table({
        "partial_sum": pa.array([int(lab.sum())], pa.int64()),
        "hll": pa.array([_hll_of_int64(b["label"])], pa.binary()),
        "vals": pa.array([[] if capped else uniq.tolist()],
                         pa.list_(pa.int64())),
        "capped": pa.array([capped], pa.bool_()),
    })


def _jump_put(obj):
    import ray as _ray

    return _ray.put(obj)


def _filter_label_rows(b: pa.Table, set_ref) -> pa.Table:
    import ray as _ray

    s = _ray.get(set_ref)
    nodes = np.asarray(b["node"])
    mask = np.fromiter((int(v) in s for v in nodes), dtype=bool,
                       count=len(nodes))
    return b.filter(pa.array(mask))


def cluster_labels(pairs: List[Tuple[int, int]]) -> Dict[int, int]:
    """Union-find cluster labels (min id wins) over candidate pairs.

    Driver-side: candidate graphs are tiny vs the corpus.  At 10^12-row
    scale use :func:`cluster_labels_distributed` — iterative min-label
    propagation, one small shuffle over the pair table per round.
    """
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor: 64-bit SimHash over word tokens (regex compiled once).

    The full 64-bit fingerprint is kept — stored as the int64
    reinterpretation of the uint64 hash (bit 63 intact, so all four
    16-bit bands carry 16 effective bits; values may be negative)."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash64"):
        import re

        self.word_re = re.compile(r"\w+", re.UNICODE)
        self.text_col = text_col
        self.out_col = out_col
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = self.word_re.findall(text.lower())
        if not toks:
            return 0
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        hs = hash64(uniq)
        # bit matrix (n_tokens, 64) in {-1,+1}, weighted by counts
        bits = ((hs[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        word = np.where(acc > 0, np.uint64(1), np.uint64(0))
        h = int((word << self.bit_idx).sum())
        return h - (1 << 64) if h >= (1 << 63) else h  # int64 view

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [
            None if t is None else self.simhash(t)
            for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(vals, pa.int64()))


_U64_MASK = (1 << 64) - 1


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _U64_MASK).count("1")


def simhash_near_dups(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
    hot_bucket_cap: int = 2048,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: LSH on 16-bit bands → verify Hamming.

    Hashing runs as stateless tasks by default (``SimHasher.__init__``
    is sub-millisecond — an actor pool only adds startup latency; same
    rationale as :func:`minhash_lsh_candidates`); pass
    ``concurrency=(min, max)`` to opt into a pool.  Pair finding is the
    generic 64-bit banding sweep (:func:`hash64_near_dups`).
    """
    from ..tuning import map_batches_maybe_pool

    hashed = map_batches_maybe_pool(
        ds, SimHasher, dict(text_col=text_col), concurrency,
        batch_format="pyarrow",
    ).select_columns([id_col, "simhash64"])
    return hash64_near_dups(hashed, hash_col="simhash64", id_col=id_col,
                            max_hamming=max_hamming,
                            hot_bucket_cap=hot_bucket_cap)


def hash64_near_dups(
    hashed: "ray.data.Dataset",
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hot_bucket_cap: int = 2048,
    n_bands: int = 4,
) -> "ray.data.Dataset":
    """Near-dup pairs over ANY 64-bit fingerprint column (SimHash,
    image pHash, ...): LSH on 64/n_bands-bit bands → verify Hamming.

    A pair within Hamming distance ≤ n_bands - 1 must agree on at least
    one band (pigeonhole), so banding finds all such pairs with one
    small shuffle — ``n_bands=4`` (16-bit bands) covers ``max_hamming``
    ≤ 3, ``n_bands=8`` (8-bit bands) covers ≤ 7.  The in-bucket sweep
    is fully vectorized: XOR + SWAR popcount over pair index arrays (no
    Python per-pair loop, no (n, n) tensor — memory is O(pairs)); hot
    buckets (e.g. thousands of empty docs at band value 0) are capped
    loudly.
    """
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banding with {n_bands} bands only guarantees recall for "
            f"Hamming <= {n_bands - 1}, got max_hamming={max_hamming}")
    band_bits = 64 // n_bands
    band_mask = (1 << band_bits) - 1
    n_parts = 64

    def explode(b: pa.Table) -> pa.Table:
        # null inputs carry a null hash — drop them BEFORE the int64
        # cast (NaN→int64 is undefined behavior that would alias every
        # null row to fingerprint INT64_MIN, i.e. spurious Hamming-0
        # "near-dups" of each other)
        col = b[hash_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            b = b.filter(pc.is_valid(col))
        # fully vectorized band explode: no per-row Python list building
        h = np.ascontiguousarray(
            np.asarray(b[hash_col].combine_chunks()
                       if isinstance(b[hash_col], pa.ChunkedArray)
                       else b[hash_col], dtype=np.int64)
        ).view(np.uint64)
        n = len(h)
        ids = (b[id_col].combine_chunks()
               if isinstance(b[id_col], pa.ChunkedArray) else b[id_col])
        band_id = np.repeat(np.arange(n_bands, dtype=np.int64), n)
        band_val = np.concatenate(
            [((h >> np.uint64(band * band_bits))
              & np.uint64(band_mask)).view(np.int64)
             for band in range(n_bands)])
        part = ((band_id * 65537 + band_val) % n_parts).astype(np.int32)
        return pa.table(
            {
                "band_id": pa.array(band_id.astype(np.int32)),
                "band_val": pa.array(band_val, pa.int64()),
                id_col: pa.chunked_array([ids] * n_bands).combine_chunks(),
                "hash64": pa.array(np.tile(h.view(np.int64), n_bands),
                                   pa.int64()),
                "part": pa.array(part),
            }
        )

    _EMPTY = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (band_id, _), g in part.groupby(["band_id", "band_val"],
                                            sort=False):
            g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(g) < 2:
                continue
            g = _cap_bucket(g, hot_bucket_cap, "hash64")
            ids = g[id_col].to_numpy()
            hs = np.ascontiguousarray(
                g["hash64"].to_numpy(dtype=np.int64)).view(np.uint64)
            n = len(ids)
            ii, jj = np.triu_indices(n, k=1)
            d = popcount_u64(hs[ii] ^ hs[jj]).astype(np.int64)
            keep = d <= max_hamming
            if not keep.any():
                continue
            # emit only from the FIRST band on which the two hashes agree
            # — global dedup with no second shuffle, fully vectorized
            bands_mat = (
                hs[:, None] >> (np.uint64(band_bits)
                                * np.arange(n_bands, dtype=np.uint64))
            ) & np.uint64(band_mask)  # (n, n_bands)
            first = (bands_mat[ii] == bands_mat[jj]).argmax(axis=1)
            keep &= first == band_id
            if keep.any():
                out.append(pd.DataFrame(
                    {"id_a": ids[ii[keep]].astype("int64"),
                     "id_b": ids[jj[keep]].astype("int64"),
                     "hamming": d[keep]}))
        if not out:
            return _EMPTY
        return pd.concat(out, ignore_index=True)

    pairs = (
        hashed.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pandas")
    )

    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification kernel)
# ---------------------------------------------------------------------------


def ngram_set(text: str, n: int = 3) -> set:
    toks = (text or "").lower().split()  # NULL text == empty text
    if len(toks) < n:
        return {tuple(toks)} if toks else set()
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def ngram_containment(a: str, b: str, n: int = 3) -> float:
    """Asymmetric near-dup signal: |A∩B| / min(|A|,|B|) over word
    n-gram sets — ≈1 when one document is (mostly) CONTAINED in the
    other even if Jaccard is low (sub-document duplication: quoted
    articles, boilerplate wrappers, chunk-of-a-doc leaks)."""
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / min(len(sa), len(sb))


def levenshtein_distance(a: str, b: str) -> int:
    """Character-level edit distance, rows vectorized: the insert-chain
    recurrence ``row[j] = min(m[j-1], row[j-1]+1)`` is solved in one
    ``minimum.accumulate`` over ``row[j]-j`` (monotone transform), so
    the DP is O(|a|) numpy passes instead of O(|a|·|b|) Python steps.
    Operates on codepoints (UTF-32) — DuckDB ``levenshtein()`` parity."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    if len(ca) < len(cb):  # iterate over the longer side, vectorize wider
        ca, cb = cb, ca
    la, lb = len(ca), len(cb)
    if lb == 0:
        return la
    prev = np.arange(lb + 1, dtype=np.int64)
    j = np.arange(1, lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        m = np.minimum(prev[1:] + 1, prev[:-1] + (cb != ca[i - 1]))
        z = np.minimum.accumulate(np.r_[np.int64(i), m - j])
        prev = z + np.r_[np.int64(0), j]
    return int(prev[-1])


def edit_similarity(a: str, b: str, n: int = 3) -> float:
    """Normalized edit similarity ``1 − lev(a,b)/max(len)`` (``n`` is
    ignored — kernel-signature compatibility with the n-gram metrics);
    two empty strings are identical (1.0)."""
    a, b = a or "", b or ""
    if not a and not b:
        return 1.0
    return 1.0 - levenshtein_distance(a, b) / max(len(a), len(b))


_PAIR_METRICS = {"jaccard": ngram_jaccard, "containment": ngram_containment,
                 "edit_sim": edit_similarity}


def verify_pairs_ngram(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 100_000,
    metric: str = "jaccard",
) -> "ray.data.Dataset":
    """Exact n-gram similarity over candidate pairs — ``metric`` picks
    the kernel: "jaccard" (symmetric near-dup) or "containment"
    (|A∩B|/min — sub-document duplication); the output column is named
    after the metric.

    Below ``broadcast_limit`` candidate pairs: broadcast text lookup (the
    text map covers candidate ids only — tiny vs the corpus).  Above it:
    bucketed hash joins attach ``text_a``/``text_b`` with no driver-side
    materialization at all — the 100 TB high-dup path.  Both produce the
    identical pair set.
    """
    kernel = _PAIR_METRICS[metric]
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        (metric, pa.float64())])
    # candidates usually arrive as the UNMATERIALIZED LSH pipeline —
    # pin them once so count / Bloom build / join don't re-run the
    # signature+shuffle stages (pairs are small relative to the corpus)
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(schema.empty_table())

    if n_pairs > broadcast_limit:
        return _verify_pairs_ngram_join(ds, pairs, n_pairs, threshold, n,
                                        id_col, text_col, schema,
                                        metric, kernel)

    import ray as _ray

    need = set()
    pair_rows = pairs.take_all()
    for r in pair_rows:
        need.add(r["id_a"])
        need.add(r["id_b"])
    # prebuild the sorted value_set ONCE (an in-UDF sorted() would redo
    # O(n log n) Python work per batch on an immutable set)
    need_ref = _ray.put(pa.array(sorted(need)))
    texts = ds.map_batches(
        lambda b: b.select([id_col, text_col]).filter(
            pc.is_in(b[id_col], value_set=_ray.get(need_ref))
        ),
        batch_format="pyarrow",
    ).take_all()
    tmap = {r[id_col]: r[text_col] for r in texts}
    # membership (not value) check: an id ABSENT from ds (pairs from a
    # superset / pre-dedup run) skips, matching the join path's
    # inner-join-on-id behavior; a present id with NULL text scores as
    # empty text — the join path and the SQL oracles coalesce the same
    # way, so the pair set no longer depends on the broadcast/join
    # path choice
    out = [
        {
            "id_a": r["id_a"],
            "id_b": r["id_b"],
            metric: round(kernel(tmap[r["id_a"]],
                                 tmap[r["id_b"]], n), 6),
        }
        for r in pair_rows
        if r["id_a"] in tmap and r["id_b"] in tmap
    ]
    out = [r for r in out if r[metric] >= threshold]
    if not out:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(out, schema=schema))


def _verify_pairs_ngram_join(ds, pairs, n_pairs, threshold, n, id_col,
                             text_col, schema, metric="jaccard",
                             kernel=None) -> "ray.data.Dataset":
    """Join path: two bucketed hash joins attach both texts, then the exact
    Jaccard kernel runs per batch.  Before the exchange, the text table is
    pruned with a Bloom filter of the candidate ids (built distributed,
    ~1.2 MB per million candidates at 1% fp, broadcast once) — only
    candidate texts (plus ≤ fp_rate false positives, which the inner join
    then drops) pay the shuffle; the wide non-candidate majority never
    moves."""
    import ray as _ray

    from ..stages.referential import bloom_keys
    from .joins import hash_join

    bloom = bloom_keys(
        pairs.select_columns(["id_a"]).union(
            pairs.map_batches(
                lambda b: pa.table({"id_a": b["id_b"]}),
                batch_format="pyarrow")),
        "id_a", expected_items=max(64, 2 * n_pairs), fp_rate=0.01)
    bloom_ref = _ray.put(bloom)

    def rename(side: str):
        def _r(b: pa.Table) -> pa.Table:
            f = _ray.get(bloom_ref)
            ids = b[id_col].to_pylist()
            keep = f.might_contain([str(v) for v in ids])
            t = pa.table({f"id_{side}": pc.cast(b[id_col], pa.int64()),
                          f"text_{side}": b[text_col]})
            return t.filter(pa.array(keep))
        return _r

    texts_a = ds.map_batches(rename("a"), batch_format="pyarrow")
    texts_b = ds.map_batches(rename("b"), batch_format="pyarrow")
    p = pairs.select_columns(["id_a", "id_b"])
    j1 = hash_join(p, texts_a, key="id_a")
    j2 = hash_join(j1, texts_b, key="id_b")

    fn = kernel or ngram_jaccard

    def score(b: pa.Table) -> pa.Table:
        ja = [
            round(fn(a, c, n), 6)
            for a, c in zip(b["text_a"].to_pylist(), b["text_b"].to_pylist())
        ]
        t = pa.table({"id_a": pc.cast(b["id_a"], pa.int64()),
                      "id_b": pc.cast(b["id_b"], pa.int64()),
                      metric: pa.array(ja, pa.float64())})
        return t.filter(pc.greater_equal(t[metric], pa.scalar(threshold)))

    return j2.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    hot_bucket_cap: int = 4096,
    num_tables: int = 1,
) -> "ray.data.Dataset":
    """Near-dup pairs by cosine ≥ threshold, LSH-bucketed by random
    hyperplane signs; exact cosine verified within buckets (numpy matmul).

    High-cosine pairs agree on most hyperplane signs, so bucketing by the
    full sign byte finds them with one shuffle.  For lower thresholds the
    single-table miss rate grows — set ``num_tables>1``: every table uses
    an independent plane set (seed+i) and each vector lands in one bucket
    PER table (the multi-table LSH recall amplifier); a pair is emitted
    only by the FIRST table whose bucket catches it (vectorized sign-byte
    check against the carried per-table buckets), so no cross-table dedup
    shuffle is needed.
    """
    rng = np.random.default_rng(seed)
    sample = ds.take(1)
    if not sample:  # empty corpus → no pairs (match the other finders)
        return ray.data.from_arrow(pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("cosine", pa.float64())]).empty_table())
    dim = len(sample[0][vec_col])
    planes = np.stack([
        np.random.default_rng(seed + i).standard_normal((dim, num_planes))
        for i in range(num_tables)
    ]) if num_tables > 1 else rng.standard_normal(
        (1, dim, num_planes))
    import ray as _ray

    planes_ref = _ray.put(planes.astype(np.float64))
    pow2 = 1 << np.arange(num_planes)

    def bucketize(b: pa.Table) -> pa.Table:
        p = _ray.get(planes_ref)
        mat = np.asarray(
            b[vec_col].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(b), -1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        # (n, num_tables) bucket byte per table
        buckets = np.stack(
            [((unit @ p[t]) > 0) @ pow2 for t in range(len(p))], axis=1)
        n = len(b)
        unit_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(unit, (len(p), 1)).ravel(), pa.float64()),
            unit.shape[1])
        all_bk = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(buckets, (len(p), 1)).ravel(), pa.int64()),
            buckets.shape[1])
        ids = b[id_col].combine_chunks() if isinstance(
            b[id_col], pa.ChunkedArray) else b[id_col]
        return pa.table(
            {
                id_col: pa.chunked_array([ids] * len(p)).combine_chunks(),
                "table_id": pa.array(
                    np.repeat(np.arange(len(p)), n).astype(np.int32)),
                "bucket": pa.array(buckets.T.reshape(-1).astype(np.int64)),
                "buckets_all": all_bk,
                "unit": unit_arr,
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        out = []
        for (table_id, _), gg in g.groupby(["table_id", "bucket"],
                                           sort=False):
            gg = gg.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(gg) < 2:
                continue
            gg = _cap_bucket(gg, hot_bucket_cap, "hyperplane-LSH")
            ids = gg[id_col].to_numpy()
            mat = np.stack([np.asarray(v) for v in gg["unit"]])
            sims = mat @ mat.T
            ii, jj = np.triu_indices(len(ids), k=1)
            c = sims[ii, jj]
            keep = c >= threshold
            if not keep.any():
                continue
            # first-catching-table rule: cross-table dedup with no shuffle
            bks = np.stack([np.asarray(v) for v in gg["buckets_all"]])
            first = (bks[ii] == bks[jj]).argmax(axis=1)
            keep &= first == table_id
            if not keep.any():
                continue
            out.append(pd.DataFrame(
                {"id_a": ids[ii[keep]].astype("int64"),
                 "id_b": ids[jj[keep]].astype("int64"),
                 "cosine": np.round(c[keep], 6)}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            (np.asarray(b["table_id"], dtype=np.int64) * 1_000_003
             + np.asarray(b["bucket"], dtype=np.int64)) % 64
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def corpus_diff(
    ds_a: "ray.data.Dataset",
    ds_b: "ray.data.Dataset",
    text_col: str = "text",
    broadcast_limit: int = 50_000_000,
) -> "ray.data.Dataset":
    """Rows of ``ds_a`` whose CONTENT does not appear in ``ds_b`` (by
    md5 of ``text_col``) — the snapshot-diff primitive of incremental
    curation: "which documents are NEW since the last crawl", robust to
    re-crawled copies getting fresh ids.

    The B side reduces to distinct content hashes (per-batch combiner →
    ``unique``; 16 B/distinct-doc) and broadcasts once via ``ray.put``;
    A-side probing is a vectorized ``is_in`` per batch — text never
    shuffles on either side.  Past ``broadcast_limit`` distinct hashes,
    raise: switch to the Bloom pre-filter + bucketed join pattern
    (``stages/referential``) — one-sided error means a Bloom MISS is
    certainly new, so only the might-contain minority needs the exact
    join."""
    import ray as _ray

    def hashes(b: pa.Table) -> pa.Table:
        h = add_text_hash(b, text_col).select(["text_md5"])
        return h.group_by(["text_md5"]).aggregate([])

    b_hashes = ds_b.map_batches(hashes, batch_format="pyarrow") \
                   .unique("text_md5")
    if len(b_hashes) > broadcast_limit:
        raise ValueError(
            f"{len(b_hashes)} distinct B-side hashes exceeds "
            f"broadcast_limit={broadcast_limit}; use the Bloom + "
            "bucketed-join path")
    ref = _ray.put(pa.array(sorted(h for h in b_hashes if h is not None),
                            pa.string()))

    def probe(b: pa.Table) -> pa.Table:
        known = _ray.get(ref)
        h = add_text_hash(b, text_col)["text_md5"]
        hit = pc.fill_null(pc.is_in(h, value_set=known), False)
        return b.filter(pc.invert(hit))

    return ds_a.map_batches(probe, batch_format="pyarrow")


def dup_rate_by_key(ds: "ray.data.Dataset", key_col: str = "source",
                    text_col: str = "text") -> "ray.data.Dataset":
    """Per-key duplication report: ``(key, n_docs, n_unique,
    dup_fraction)`` — the monitoring readout that tells you WHICH shard
    of a corpus is flooding the dedup stage before you pay for it.

    Per-batch combiner collapses rows to distinct (key, text-hash)
    pairs with their row counts, so the first exchange carries
    fixed-width hash rows (never text); after the pair groupby each
    distinct pair exists exactly once globally, and the per-key rollup
    is a second tiny exchange.  NULL texts count toward ``n_docs`` but
    not ``n_unique`` (SQL ``count(DISTINCT text)`` parity).  Text
    identity is a 64-bit hash (collision merges at ~pairs/2^64 —
    negligible, and only ever undercounts uniques).
    """
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    from xpshacl_ray.functions.sketches import hash64

    def pairs(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        null = np.asarray(pc.is_null(txt))
        h = hash64(pc.fill_null(txt, "").to_numpy(
            zero_copy_only=False)).view(np.int64)
        t = pa.table({key_col: b[key_col],
                      "h": pa.array(h),
                      "is_null": pa.array(null),
                      "c": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by([key_col, "h", "is_null"]).aggregate([("c", "sum")])
        return agg_select(g, {key_col: key_col, "h": "h",
                              "is_null": "is_null", "c_sum": "cnt"})

    pair_counts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby([key_col, "h", "is_null"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def per_key_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: b[key_col],
            "p_docs": b["cnt"],
            "p_unique": pc.cast(pc.invert(b["is_null"]), pa.int64()),
        })
        g = t.group_by([key_col]).aggregate(
            [("p_docs", "sum"), ("p_unique", "sum")])
        return agg_select(g, {key_col: key_col,
                              "p_docs_sum": "p_docs",
                              "p_unique_sum": "p_unique"})

    agg = (pair_counts.map_batches(per_key_partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Sum("p_docs", alias_name="n_docs"),
                      Sum("p_unique", alias_name="n_unique")))

    def finish(b: pa.Table) -> pa.Table:
        nd = np.asarray(b["n_docs"], dtype=np.int64)
        nu = np.asarray(b["n_unique"], dtype=np.int64)
        return pa.table({
            key_col: b[key_col],
            "n_docs": pa.array(nd),
            "n_unique": pa.array(nu),
            "dup_fraction": pa.array(
                np.round((nd - nu) / np.maximum(nd, 1), 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def source_overlap_matrix(ds: "ray.data.Dataset", key_col: str = "source",
                          text_col: str = "text",
                          n_buckets: int = 32) -> "ray.data.Dataset":
    """Pairwise shard contamination: for every pair of ``key_col``
    values, how many DISTINCT texts they share — the matrix that tells
    you which two ingest feeds are re-crawling each other before a
    cross-source dedup pays for itself.

    Distinct (text-hash, key) rows first (per-batch combiner + one
    groupby, text never moves), then a bucketed self-join on the hash:
    per-hash fan-out is bounded by the number of KEYS (shards), not
    rows, so the join cannot explode; pair counts pre-aggregate per
    batch before the final tiny groupby.  NULL texts are ignored.
    """
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    from xpshacl_ray.functions.joins import hash_join
    from xpshacl_ray.functions.sketches import hash64

    def pairs(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        ok = np.asarray(pc.is_valid(txt))
        h = hash64(pc.fill_null(txt, "").to_numpy(
            zero_copy_only=False)).view(np.int64)
        t = pa.table({"h": pa.array(h[ok]),
                      key_col: b[key_col].filter(pa.array(ok))})
        return t.group_by(["h", key_col]).aggregate([])

    # materialize before the self-join fan-out: both join sides read
    # `d`, and an unmaterialized lineage would re-run the census map +
    # distinct groupby twice
    d = (ds.map_batches(pairs, batch_format="pyarrow")
         .groupby(["h", key_col]).count()
         .map_batches(lambda b: b.select(["h", key_col]),
                      batch_format="pyarrow")).materialize()

    left = d.map_batches(
        lambda b: pa.table({"h": b["h"], "src_a": b[key_col]}),
        batch_format="pyarrow")
    right = d.map_batches(
        lambda b: pa.table({"h": b["h"], "src_b": b[key_col]}),
        batch_format="pyarrow")
    joined = hash_join(left, right, key="h", n_buckets=n_buckets)

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.less(b["src_a"], b["src_b"])
        t = pa.table({"src_a": b["src_a"].filter(keep),
                      "src_b": b["src_b"].filter(keep)})
        g = t.group_by(["src_a", "src_b"]).aggregate([([], "count_all")])
        return pa.table({"source_a": g["src_a"], "source_b": g["src_b"],
                         "p_n": pc.cast(g["count_all"], pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("p_n", alias_name="n_shared")))
