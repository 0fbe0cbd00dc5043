"""Mergeable sketches for the single-pass stats layer (SURVEY.md ST5).

The north star mandates per-partition column statistics — count / null-rate /
distinct (HyperLogLog) / numeric quantiles (t-digest) / categorical
histograms — computed in one streaming pass and merged through a
groupby-aggregate shuffle.  Everything here is:

- **pure numpy** (vectorized add paths — no Python loop over rows),
- **mergeable** (the merge of two sketches equals the sketch of the union,
  up to the sketch's error bound — this is what makes salted two-level
  groupby merges exact-enough by design, SURVEY.md §4),
- **serializable to bytes** so a sketch is one Arrow ``binary`` cell.

Public algorithms: HyperLogLog (Flajolet et al., 2007) and the t-digest
(Dunning & Ertl, "Computing Extremely Accurate Quantiles Using t-Digests").
"""

from __future__ import annotations

import struct
from typing import Dict, Iterable, Optional, Sequence

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"  # pandas default; fixed for determinism


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash64(values) -> np.ndarray:
    """Deterministic uint64 hashes of a value array (C-backed, vectorized).

    Numeric ndarrays take pandas' native vectorized path; strings/objects
    go through the cython object hasher.  Hashes are only compared within
    one column, so the int-vs-str domain split is irrelevant.
    """
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O", "V"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def key_hash64(col) -> np.ndarray:
    """uint64 hashes of an Arrow key column, independent of the batch's
    null layout (ADVICE r4).

    ``to_numpy(zero_copy_only=False)`` widens a null-containing integer
    batch to float64, so the same key value would hash differently
    depending on which batch it rides in — and land in a different join
    bucket, silently dropping matches.  Normalize first: integer /
    temporal / boolean columns cast to int64 with nulls filled to 0
    (null keys never equal anything in join semantics, so WHERE a null
    lands is irrelevant — only that non-null keys hash identically in
    every batch).  Strings/floats keep their layout-stable paths.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        return hash64(col)
    t = col.type
    if pa.types.is_dictionary(t):
        col = col.cast(t.value_type)
        t = col.type
    if (pa.types.is_integer(t) or pa.types.is_temporal(t)
            or pa.types.is_boolean(t)):
        col = pc.fill_null(pc.cast(col, pa.int64()), 0)
    return hash64(col.to_numpy(zero_copy_only=False))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """HLL distinct-count sketch with a sparse small-set mode.

    Small inputs stay a raw uint64 hash set (exact estimate, ~8 B/value
    serialization, no 4 KiB register allocation per tiny group — the common
    case for per-batch partials of high-cardinality group keys); past
    ``SPARSE_MAX`` distinct hashes the sketch densifies to classic
    registers (~0.8% error at p=14; default p=12).  Merges handle any
    sparse/dense combination, so the merge-of-union law still holds.
    """

    __slots__ = ("p", "m", "registers", "sparse")

    SPARSE_MAX = 256

    def __init__(self, p: int = 12, registers: Optional[np.ndarray] = None,
                 sparse: Optional[np.ndarray] = None):
        self.p = p
        self.m = 1 << p
        if registers is not None:
            self.registers: Optional[np.ndarray] = registers
            self.sparse: Optional[np.ndarray] = None
        else:
            self.registers = None
            self.sparse = sparse if sparse is not None else np.empty(
                0, dtype=np.uint64)

    def _densify(self) -> None:
        if self.registers is None:
            sparse, self.sparse = self.sparse, None
            self.registers = np.zeros(self.m, dtype=np.uint8)
            if len(sparse):
                self._add_dense(sparse)

    def _add_dense(self, h: np.ndarray) -> None:
        q = 64 - self.p
        idx = (h >> np.uint64(q)).astype(np.int64)
        w = h & np.uint64((1 << q) - 1)
        # rho = leading zeros in the q-bit window + 1 = q - bit_length(w) + 1
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w != 0
        # values < 2^52 are exactly representable in float64 for p >= 12
        bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = (q - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        if self.registers is None:
            merged = np.unique(np.concatenate([self.sparse, h]))
            if len(merged) <= self.SPARSE_MAX:
                self.sparse = merged
                return self
            self.sparse = merged
            self._densify()
            return self
        self._add_dense(h)
        return self

    def add(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        if other.registers is None:
            return self.add_hashes(other.sparse)
        self._densify()
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        if self.registers is None:
            return float(len(self.sparse))  # exact in sparse mode
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        if self.registers is None:
            return struct.pack("<BB", 1, self.p) + self.sparse.tobytes()
        return struct.pack("<BB", 0, self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        mode, p = struct.unpack("<BB", b[:2])
        if mode == 1:
            return cls(p=p, sparse=np.frombuffer(b[2:], dtype=np.uint64).copy())
        return cls(p=p, registers=np.frombuffer(b[2:], dtype=np.uint8).copy())

    @classmethod
    def merge_many(cls, blobs: Iterable[bytes]) -> "HyperLogLog":
        out = None
        for b in blobs:
            s = cls.from_bytes(b)
            out = s if out is None else out.merge(s)
        return out if out is not None else cls()


# ---------------------------------------------------------------------------
# Bloom filter (membership; the broadcast-side scale path for huge key sets)
# ---------------------------------------------------------------------------


class BloomFilter:
    """Vectorized Bloom filter: ``m`` bits, ``k`` probes by double hashing.

    Scale role (referential checks, C4): broadcasting 10^9 dimension keys
    as raw values costs ~8+ GB; at 10 bits/key a Bloom filter is ~1.2 GB
    with ~1% false positives.  Semantics for an anti-join are one-sided:
    ``might_contain == False`` ⇒ certainly dangling (definite violation);
    ``True`` ⇒ present OR false positive, i.e. up to ``fp_rate`` of truly
    dangling refs are missed.  Use where a quantified miss rate is
    acceptable (continuous monitoring) or as a pre-filter before an exact
    partitioned join over the survivors.
    """

    __slots__ = ("m", "k", "bits")

    def __init__(self, n_items: int = 1000, fp_rate: float = 0.01,
                 bits: Optional[np.ndarray] = None, m: Optional[int] = None,
                 k: Optional[int] = None):
        if bits is not None:
            self.bits = bits
            self.m = m if m is not None else len(bits) * 8
            self.k = k or 7
            return
        m_bits = max(64, int(-n_items * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = ((m_bits + 63) // 64) * 64
        self.k = max(1, int(round(self.m / max(n_items, 1) * np.log(2))))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        h1 = hash64(values)
        # second hash derived by integer mixing (splitmix64 finalizer) —
        # pure uint64 vector ops, no per-value string building; |1 keeps
        # the double-hash stride nonzero
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        # double hashing: pos_j = (h1 + j*h2) mod m   (shape: n × k)
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(self.m)).astype(np.int64)

    def add(self, values) -> "BloomFilter":
        if len(values) == 0:
            return self
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos // 8,
                         (1 << (pos % 8)).astype(np.uint8))
        return self

    def might_contain(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        probed = (self.bits[pos // 8] >> (pos % 8)) & 1
        return probed.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits = np.bitwise_or(self.bits, other.bits)
        return self

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        m, k = struct.unpack("<qq", b[:16])
        return cls(bits=np.frombuffer(b[16:], dtype=np.uint8).copy(),
                   m=m, k=k)


# ---------------------------------------------------------------------------
# t-digest (merging variant, fully vectorized compression)
# ---------------------------------------------------------------------------


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    q = np.clip(q, 0.0, 1.0)
    return delta * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5)


class TDigest:
    """Mergeable quantile sketch with vectorized batched compression.

    Deviates from strict one-at-a-time Dunning merging only in that incoming
    batches are pre-clustered on a k-scale grid (vectorized ``reduceat``),
    which preserves mergeability and the ~O(1/δ) tail accuracy.
    """

    __slots__ = ("delta", "means", "weights", "_min", "_max")

    def __init__(
        self,
        delta: float = 200.0,
        means: Optional[np.ndarray] = None,
        weights: Optional[np.ndarray] = None,
        vmin: float = np.inf,
        vmax: float = -np.inf,
    ):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)
        self._min = vmin
        self._max = vmax

    # -- core -----------------------------------------------------------

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total <= 0 or len(means) == 0:
            self.means, self.weights = means, weights
            return
        cum = np.cumsum(weights)
        q = (cum - weights * 0.5) / total
        k = _k_scale(q, self.delta)
        # new cluster whenever the k-value crosses an integer boundary
        cluster = np.floor(k).astype(np.int64)
        # force strictly increasing boundaries for reduceat
        change = np.empty(len(cluster), dtype=bool)
        change[0] = True
        change[1:] = cluster[1:] != cluster[:-1]
        starts = np.flatnonzero(change)
        w_sum = np.add.reduceat(weights, starts)
        mw_sum = np.add.reduceat(means * weights, starts)
        self.means = mw_sum / w_sum
        self.weights = w_sum

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        v.sort(kind="mergesort")
        if len(self.means) == 0 and len(v) <= 128:
            # small-input fast path: raw values are exact unit centroids;
            # compression happens on the first real merge (per-batch
            # partials of tiny groups are the common case)
            self.means = v
            self.weights = np.ones(len(v))
            return self
        all_means = np.concatenate([self.means, v])
        all_weights = np.concatenate([self.weights, np.ones(len(v))])
        self._compress(all_means, all_weights)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        if len(other.means) == 0:
            return self
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile(s); vectorized over q."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(qs), np.nan)
        if len(self.means) == 1:
            return np.full(len(qs), self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights * 0.5
        grid = cum / total
        out = np.interp(qs, grid, self.means)
        out = np.clip(out, self._min, self._max)
        out[qs <= 0] = self._min
        out[qs >= 1] = self._max
        return out

    def cdf(self, x) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights * 0.5
        grid = cum / total
        out = np.interp(xs, self.means, grid)
        out[xs < self._min] = 0.0
        out[xs > self._max] = 1.0
        return out

    # -- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        header = struct.pack("<dddq", self.delta, self._min, self._max,
                             len(self.means))
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, vmin, vmax, n = struct.unpack("<dddq", b[:32])
        off = 32
        means = np.frombuffer(b[off : off + 8 * n], dtype=np.float64).copy()
        off += 8 * n
        weights = np.frombuffer(b[off : off + 8 * n], dtype=np.float64).copy()
        return cls(delta=delta, means=means, weights=weights, vmin=vmin, vmax=vmax)

    @classmethod
    def merge_many(cls, blobs: Iterable[bytes]) -> "TDigest":
        out = None
        for b in blobs:
            s = cls.from_bytes(b)
            out = s if out is None else out.merge(s)
        return out if out is not None else cls()


# ---------------------------------------------------------------------------
# Bounded categorical histogram
# ---------------------------------------------------------------------------

OTHER_BUCKET = "__other__"


class CategoricalHistogram:
    """Exact value→count map capped at ``max_categories`` (overflow bucket).

    Merge is exact while both sides stay under the cap — sized for
    low-cardinality columns (lang, severity, event_type...).
    """

    __slots__ = ("max_categories", "counts")

    def __init__(self, max_categories: int = 256,
                 counts: Optional[Dict[str, int]] = None):
        self.max_categories = max_categories
        self.counts = counts or {}

    def add(self, values: Sequence) -> "CategoricalHistogram":
        arr = np.asarray([v for v in values if v is not None], dtype=object)
        if len(arr) == 0:
            return self
        uniq, cnt = np.unique(arr.astype("U"), return_counts=True)
        for u, c in zip(uniq.tolist(), cnt.tolist()):
            self.counts[u] = self.counts.get(u, 0) + int(c)
        self._cap()
        return self

    def _cap(self) -> None:
        if len(self.counts) <= self.max_categories:
            return
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = items[: self.max_categories - 1]
        spill = sum(c for _, c in items[self.max_categories - 1 :])
        self.counts = dict(keep)
        self.counts[OTHER_BUCKET] = self.counts.get(OTHER_BUCKET, 0) + spill

    def merge(self, other: "CategoricalHistogram") -> "CategoricalHistogram":
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self._cap()
        return self

    @property
    def total(self) -> int:
        return sum(self.counts.values())

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(self.counts, sort_keys=True).encode("utf-8")

    @classmethod
    def from_bytes(cls, b: bytes, max_categories: int = 256) -> "CategoricalHistogram":
        import json

        return cls(max_categories=max_categories, counts=json.loads(b.decode("utf-8")))

    @classmethod
    def merge_many(cls, blobs: Iterable[bytes]) -> "CategoricalHistogram":
        out = cls()
        for b in blobs:
            out.merge(cls.from_bytes(b))
        return out


# ---------------------------------------------------------------------------
# Drift measures (KS over t-digests, PSI over histograms)
# ---------------------------------------------------------------------------


def ks_statistic(a: TDigest, b: TDigest) -> float:
    """Two-sample KS statistic approximated from two t-digests."""
    xs = np.unique(np.concatenate([a.means, b.means]))
    if len(xs) == 0:
        return 0.0
    return float(np.abs(a.cdf(xs) - b.cdf(xs)).max())


def psi(expected: CategoricalHistogram, actual: CategoricalHistogram,
        eps: float = 1e-6) -> float:
    """Population Stability Index between two categorical histograms."""
    cats = sorted(set(expected.counts) | set(actual.counts))
    te, ta = max(expected.total, 1), max(actual.total, 1)
    p = np.array([expected.counts.get(c, 0) / te for c in cats]) + eps
    q = np.array([actual.counts.get(c, 0) / ta for c in cats]) + eps
    return float(np.sum((q - p) * np.log(q / p)))


# ---------------------------------------------------------------------------
# Misra–Gries frequent-items sketch
# ---------------------------------------------------------------------------


class MisraGries:
    """Mergeable heavy-hitters sketch (Misra–Gries / "frequent" algorithm).

    Holds at most ``capacity`` (item, count) entries.  Counts are LOWER
    bounds: after observing N items (across any sequence of adds and
    merges), every stored count undercounts its true frequency by at most
    ``error_bound() = n_decremented / (capacity + 1) ≤ N/(capacity+1)``,
    and any item with true frequency > that bound is guaranteed present
    (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
    Summaries", PODS 2012).  Batch entry is vectorized: exact
    ``np.unique`` counts within the batch, one trim after.

    The engine uses it as the pass-1 candidate generator of the exact
    two-pass heavy-hitters operator
    (`xpshacl_ray.functions.text.heavy_hitter_terms`).
    """

    __slots__ = ("capacity", "counts", "n_total", "n_dropped")

    def __init__(self, capacity: int = 256,
                 counts: Optional[Dict[str, int]] = None):
        if capacity < 1:
            raise ValueError("MisraGries capacity must be >= 1")
        self.capacity = capacity
        self.counts: Dict[str, int] = counts or {}
        self.n_total = 0      # items observed
        self.n_dropped = 0    # total count mass removed by trims

    def add_counts(self, items: Sequence, counts: np.ndarray) -> "MisraGries":
        """Add pre-aggregated (item, count) pairs (e.g. np.unique output)."""
        c = np.asarray(counts, dtype=np.int64)
        for t, k in zip(items, c.tolist()):
            self.counts[t] = self.counts.get(t, 0) + k
        self.n_total += int(c.sum())
        self._trim()
        return self

    def add(self, values: Sequence) -> "MisraGries":
        arr = np.asarray([v for v in values if v is not None], dtype=object)
        if len(arr) == 0:
            return self
        uniq, cnt = np.unique(arr.astype("U"), return_counts=True)
        return self.add_counts(uniq.tolist(), cnt)

    def _trim(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        vals = np.fromiter(self.counts.values(), np.int64, len(self.counts))
        # classic MG step: subtract the (capacity+1)-th largest count from
        # everything, drop the non-positive — at most `capacity` survive
        kth = int(np.partition(vals, -self.capacity - 1)[-self.capacity - 1])
        before = int(vals.sum())
        self.counts = {t: c - kth for t, c in self.counts.items()
                       if c - kth > 0}
        self.n_dropped += before - sum(self.counts.values())

    def merge(self, other: "MisraGries") -> "MisraGries":
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self.n_total += other.n_total
        self.n_dropped += other.n_dropped
        self._trim()
        return self

    def error_bound(self) -> int:
        """Max undercount of any stored (or absent) item's true frequency."""
        # every unit of dropped mass corresponds to >= capacity+1 distinct
        # decrements, so undercount per item <= n_dropped/(capacity+1)...
        # but the safe, standard bound is simply the total decrement depth:
        return self.n_dropped // (self.capacity + 1) if self.n_dropped else 0

    def candidates(self, min_count: float) -> List[str]:
        """Items whose true count COULD be >= min_count (superset of the
        true heavy hitters when min_count > error_bound())."""
        eb = self.error_bound()
        return sorted(t for t, c in self.counts.items() if c + eb >= min_count)

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(
            {"capacity": self.capacity, "counts": self.counts,
             "n_total": self.n_total, "n_dropped": self.n_dropped},
            sort_keys=True).encode("utf-8")

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        import json

        d = json.loads(b.decode("utf-8"))
        out = cls(capacity=d["capacity"], counts=d["counts"])
        out.n_total = d["n_total"]
        out.n_dropped = d["n_dropped"]
        return out

    @classmethod
    def merge_many(cls, blobs: Iterable[bytes]) -> "MisraGries":
        out: Optional[MisraGries] = None
        for b in blobs:
            s = cls.from_bytes(b)
            out = s if out is None else out.merge(s)
        return out if out is not None else cls()


class CountMinSketch:
    """Count-min sketch: fixed-memory approximate frequencies with a
    one-sided error (never under-counts; over-counts by ≤ εN with
    probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉).

    Mergeable by cell-wise addition — the same combiner→groupby shape as
    every other sketch here: per-batch partial CMS rows, merged along
    the profile keys.  Hashing: one ``hash64`` pass per depth row with a
    per-row salt (deterministic across actors/runs).  Complements
    MisraGries: MG returns the top items but forgets the tail; CMS
    answers point queries for ANY item (with the ε bound), e.g. "how
    often does THIS benchmark n-gram appear corpus-wide"."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    def add(self, values, counts=None) -> "CountMinSketch":
        vals = ["" if v is None else str(v) for v in values]
        if not vals:
            return self
        c = (np.ones(len(vals), dtype=np.int64) if counts is None
             else np.asarray(counts, dtype=np.int64))
        for d in range(self.depth):
            idx = (hash64([f"{d}:{v}" for v in vals]).astype(np.uint64)
                   % np.uint64(self.width)).astype(np.int64)
            np.add.at(self.table[d], idx, c)
        return self

    def query(self, values) -> np.ndarray:
        vals = ["" if v is None else str(v) for v in values]
        if not vals:
            return np.zeros(0, dtype=np.int64)
        est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            idx = (hash64([f"{d}:{v}" for v in vals]).astype(np.uint64)
                   % np.uint64(self.width)).astype(np.int64)
            est = np.minimum(est, self.table[d][idx])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CMS of different shapes")
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.depth, self.width], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        head = np.frombuffer(b[:16], dtype=np.int64)
        s = cls(width=int(head[1]), depth=int(head[0]))
        s.table = np.frombuffer(b[16:], dtype=np.int64).reshape(
            s.depth, s.width).copy()
        return s

    @classmethod
    def merge_many(cls, blobs) -> "CountMinSketch":
        out = None
        for b in blobs:
            s = cls.from_bytes(b)
            out = s if out is None else out.merge(s)
        return out if out is not None else cls()
