"""Sketch unit tests: accuracy bounds, merge laws, serialization round-trip."""

import numpy as np
import pytest

from xpshacl_ray.functions.sketches import (
    CategoricalHistogram,
    HyperLogLog,
    TDigest,
    hash64,
    ks_statistic,
    psi,
)


def test_hash64_deterministic():
    a = hash64(["a", "b", "a"])
    assert a[0] == a[2] and a[0] != a[1]
    assert hash64(["a"])[0] == a[0]  # stable across calls


class TestHLL:
    def test_estimate_accuracy(self):
        h = HyperLogLog()
        h.add([f"v{i}" for i in range(50000)])
        assert abs(h.estimate() - 50000) / 50000 < 0.05

    def test_small_range_linear_counting(self):
        h = HyperLogLog()
        h.add([f"v{i}" for i in range(100)])
        assert abs(h.estimate() - 100) < 5

    def test_merge_equals_union(self):
        vals = [f"v{i}" for i in range(20000)]
        h1 = HyperLogLog().add(vals[:12000])
        h2 = HyperLogLog().add(vals[8000:])
        merged = HyperLogLog.merge_many([h1.to_bytes(), h2.to_bytes()])
        whole = HyperLogLog().add(vals)
        assert merged.estimate() == whole.estimate()  # register-exact

    def test_roundtrip_sparse_and_dense(self):
        h = HyperLogLog().add(["x", "y"])  # sparse mode
        back = HyperLogLog.from_bytes(h.to_bytes())
        assert back.registers is None
        assert np.array_equal(back.sparse, h.sparse)
        assert back.estimate() == 2.0
        d = HyperLogLog().add([f"v{i}" for i in range(1000)])  # dense mode
        back_d = HyperLogLog.from_bytes(d.to_bytes())
        assert np.array_equal(back_d.registers, d.registers)

    def test_sparse_dense_merge_consistent(self):
        vals = [f"v{i}" for i in range(2000)]
        small = HyperLogLog().add(vals[:50])          # sparse
        big = HyperLogLog().add(vals[40:])            # dense
        m1 = HyperLogLog.merge_many([small.to_bytes(), big.to_bytes()])
        m2 = HyperLogLog.merge_many([big.to_bytes(), small.to_bytes()])
        whole = HyperLogLog().add(vals)
        assert m1.estimate() == whole.estimate()
        assert m2.estimate() == whole.estimate()


class TestTDigest:
    def test_quantile_accuracy(self):
        rng = np.random.default_rng(7)
        data = rng.exponential(10, 100000)
        td = TDigest()
        for i in range(0, len(data), 8192):
            td.add(data[i : i + 8192])
        for q in (0.1, 0.5, 0.9, 0.99):
            est = float(td.quantile(q)[0])
            true = float(np.quantile(data, q))
            assert abs(est - true) / max(true, 1e-9) < 0.03
        assert float(td.quantile(0.0)[0]) == data.min()
        assert float(td.quantile(1.0)[0]) == data.max()

    def test_bounded_size(self):
        td = TDigest(delta=100)
        td.add(np.arange(1_000_00, dtype=float))
        assert len(td.means) < 400

    def test_merge(self):
        rng = np.random.default_rng(3)
        data = rng.normal(0, 1, 50000)
        t1 = TDigest().add(data[:25000])
        t2 = TDigest().add(data[25000:])
        tm = TDigest.merge_many([t1.to_bytes(), t2.to_bytes()])
        assert tm.count == 50000
        assert abs(float(tm.quantile(0.5)[0]) - float(np.median(data))) < 0.02

    def test_nan_ignored(self):
        td = TDigest().add(np.array([1.0, np.nan, 3.0]))
        assert td.count == 2


class TestHistogram:
    def test_counts_and_merge(self):
        c1 = CategoricalHistogram().add(["a", "a", "b", None])
        c2 = CategoricalHistogram().add(["b", "c"])
        m = CategoricalHistogram.merge_many([c1.to_bytes(), c2.to_bytes()])
        assert m.counts == {"a": 2, "b": 2, "c": 1}
        assert m.total == 5

    def test_cap_overflow(self):
        h = CategoricalHistogram(max_categories=3)
        h.add([f"k{i}" for i in range(10)] + ["k0"] * 5)
        assert len(h.counts) == 3
        assert "__other__" in h.counts
        assert h.total == 15


def test_drift_measures():
    rng = np.random.default_rng(11)
    a = TDigest().add(rng.normal(0, 1, 20000))
    b = TDigest().add(rng.normal(0, 1, 20000))
    c = TDigest().add(rng.normal(2, 1, 20000))
    assert ks_statistic(a, b) < 0.05
    assert ks_statistic(a, c) > 0.5
    h1 = CategoricalHistogram().add(["x"] * 90 + ["y"] * 10)
    h2 = CategoricalHistogram().add(["x"] * 10 + ["y"] * 90)
    assert psi(h1, h1) == 0.0
    assert psi(h1, h2) > 1.0


def test_misra_gries_guarantee_and_merge():
    import collections

    import numpy as np

    from xpshacl_ray.functions.sketches import MisraGries

    rng = np.random.default_rng(7)
    items = [f"t{i}" for i in rng.zipf(1.4, 50000) if i < 500]
    n = len(items)
    true = collections.Counter(items)
    # simulate per-batch partials + merge (the distributed layout)
    blobs = []
    for i in range(0, n, 4000):
        blobs.append(MisraGries(capacity=12)
                     .add(items[i:i + 4000]).to_bytes())
    mg = MisraGries.merge_many(blobs)
    assert len(mg.counts) <= 12
    eb = mg.error_bound()
    assert 0 < eb < n // 13  # tighter than the worst-case bound
    for t, c in true.items():
        if c > eb:  # every item above the bound must survive the trims
            assert t in mg.counts
            assert mg.counts[t] <= c <= mg.counts[t] + eb
    # candidates(min_count) is a superset of the true heavy hitters
    thresh = eb + 1
    cands = set(mg.candidates(thresh))
    assert {t for t, c in true.items() if c >= thresh} <= cands


def test_heavy_hitter_terms_exact(ray_session):
    import collections

    import pyarrow as pa
    import ray.data

    from xpshacl_ray.functions.text import heavy_hitter_terms

    docs = ["join scan " * 30 + "rare",
            "join hash hash " * 20,
            "scan scan filter " * 10 + "oddball"] * 40
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(6)
    true = collections.Counter(" ".join(docs).split())
    n = sum(true.values())
    out = heavy_hitter_terms(ds, threshold_frac=0.01,
                             capacity=64).to_pandas()
    want = {t: c for t, c in true.items() if c >= 0.01 * n}
    got = dict(zip(out["term"], out["n_occurrences"]))
    assert got == want  # exact counts, exact membership
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitter_terms(ds, threshold_frac=0.00001, capacity=1)


def test_count_min_sketch_bounds_and_merge_law():
    from xpshacl_ray.functions.sketches import CountMinSketch

    rng = np.random.default_rng(5)
    vals = [f"item{i}" for i in rng.integers(0, 50, size=2000)]
    import collections

    true = collections.Counter(vals)
    # one-shot vs merged halves: cell-wise merge equals sketch-of-union
    whole = CountMinSketch(width=256, depth=4).add(vals)
    half1 = CountMinSketch(width=256, depth=4).add(vals[:1000])
    half2 = CountMinSketch(width=256, depth=4).add(vals[1000:])
    merged = half1.merge(half2)
    assert (whole.table == merged.table).all()
    roundtrip = CountMinSketch.from_bytes(whole.to_bytes())
    assert (roundtrip.table == whole.table).all()
    # one-sided error: estimates never under-count
    keys = sorted(true)
    est = whole.query(keys)
    for k, e in zip(keys, est):
        assert e >= true[k]
    # weighted add counts as many
    w = CountMinSketch(width=256, depth=4).add(["x"], counts=[7])
    assert w.query(["x"])[0] >= 7
    with pytest.raises(ValueError):
        CountMinSketch(width=8, depth=2).merge(CountMinSketch())
