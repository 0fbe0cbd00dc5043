"""Property-based tests (hypothesis): merge laws and signature stability
hold for arbitrary inputs, not just the fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xpshacl_ray.functions.sketches import (
    CategoricalHistogram,
    HyperLogLog,
    TDigest,
)
from xpshacl_ray.model import ViolationType, signature_key, signature_string

values = st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=300)


@settings(max_examples=25, deadline=None)
@given(values, values)
def test_hll_merge_law(a, b):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — register/set exact."""
    ha = HyperLogLog().add(a) if a else HyperLogLog()
    hb = HyperLogLog().add(b) if b else HyperLogLog()
    merged = HyperLogLog.merge_many([ha.to_bytes(), hb.to_bytes()])
    whole = HyperLogLog().add(a + b) if (a + b) else HyperLogLog()
    assert merged.estimate() == whole.estimate()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=499),
)
def test_tdigest_split_merge_accuracy(vals, cut):
    cut = min(cut, len(vals))
    t1 = TDigest().add(np.array(vals[:cut]))
    t2 = TDigest().add(np.array(vals[cut:]))
    merged = TDigest.merge_many([t1.to_bytes(), t2.to_bytes()])
    assert merged.count == len(vals)
    true_med = float(np.quantile(np.array(vals), 0.5))
    est = float(merged.quantile(0.5)[0])
    spread = max(vals) - min(vals)
    assert abs(est - true_med) <= max(spread * 0.15, 1e-9)
    # min/max are exact
    assert float(merged.quantile(0.0)[0]) == min(vals)
    assert float(merged.quantile(1.0)[0]) == max(vals)


@settings(max_examples=25, deadline=None)
@given(values, values)
def test_histogram_merge_law(a, b):
    ha = CategoricalHistogram().add(a)
    hb = CategoricalHistogram().add(b)
    merged = CategoricalHistogram.merge_many([ha.to_bytes(), hb.to_bytes()])
    whole = CategoricalHistogram().add(a + b)
    assert merged.counts == whole.counts


@settings(max_examples=50, deadline=None)
@given(
    st.text(min_size=1, max_size=40),
    st.one_of(st.none(), st.text(min_size=1, max_size=20)),
    st.sampled_from(list(ViolationType)),
    st.dictionaries(st.text(min_size=1, max_size=5),
                    st.text(max_size=5), max_size=4),
)
def test_signature_stable_and_param_order_free(cid, path, vtype, params):
    s1 = signature_string(cid, path, vtype, params)
    s2 = signature_string(cid, path, vtype, dict(reversed(list(params.items()))))
    assert s1 == s2  # param insertion order never changes the signature
    assert signature_key(s1) == signature_key(s2)
    assert len(signature_key(s1)) == 32
