"""Round-3 scale-guard fixes (VERDICT r2 items 3-5): profile_columns
HLL-gated sketch fallback, exact-quantile distinct-cardinality guard,
pagerank join-state path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import xpshacl_ray.stages.stats as stats_mod
from xpshacl_ray.functions.graph import pagerank
from xpshacl_ray.functions.sampling import (
    exact_quantile_threshold,
    exact_quantile_thresholds,
)
from xpshacl_ray.stages.stats import profile_columns


def _table(n=3000):
    rng = np.random.default_rng(11)
    ids = np.arange(n, dtype=np.int64)          # high-cardinality (n distinct)
    cat = rng.integers(0, 7, n)                 # bounded-cardinality
    t = pa.table({"id": ids, "cat": cat})
    return ray.data.from_arrow(t)


# --- profile_columns: HLL-gated fallback ------------------------------------


def test_profile_columns_high_cardinality_routes_to_sketch(monkeypatch):
    calls = []
    real = stats_mod._profile_column_sketch

    def spy(sub, c, n, **kw):
        calls.append(c)
        return real(sub, c, n, **kw)

    monkeypatch.setattr(stats_mod, "_profile_column_sketch", spy)
    ds = _table()
    t = profile_columns(ds, ["id", "cat"], exact_distinct_limit=100)
    assert calls == ["id"]  # cat (7 distinct) stays exact
    r = {row["column"]: row for row in t.to_pylist()}
    # sketch path: n / n_null / min / max exact, n_distinct ~HLL (±2%)
    assert r["id"]["n"] == 3000 and r["id"]["n_null"] == 0
    assert r["id"]["min_str"] == "0" and r["id"]["max_str"] == "2999"
    assert abs(r["id"]["n_distinct"] - 3000) <= 60
    # exact path untouched
    assert r["cat"]["n_distinct"] == 7


def test_profile_columns_exact_path_default_unchanged():
    ds = _table(500)
    t = profile_columns(ds, ["cat"])
    r = t.to_pylist()[0]
    assert r["n_distinct"] == 7 and r["n"] == 500


def test_profile_column_sketch_handles_nulls():
    t = pa.table({"x": pa.array([1, None, 3, None, 5], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = profile_columns(ds, ["x"], exact_distinct_limit=0)
    r = out.to_pylist()[0]
    assert r["n"] == 5 and r["n_null"] == 2
    assert r["min_str"] == "1" and r["max_str"] == "5"


# --- exact-quantile guard ----------------------------------------------------


def test_exact_quantile_raises_past_distinct_limit():
    rng = np.random.default_rng(3)
    ds = ray.data.from_arrow(pa.table({"x": rng.standard_normal(2000)}))
    with pytest.raises(ValueError, match="t-digest"):
        exact_quantile_thresholds(ds, "x", [5000], distinct_limit=100)


def test_exact_quantile_fine_under_limit():
    ds = ray.data.from_arrow(pa.table({"x": np.arange(100, dtype=np.int64)}))
    thr, n = exact_quantile_threshold(ds, "x", 5000)
    assert n == 100 and thr == 49


# --- pagerank join-state path ------------------------------------------------


@pytest.mark.slow
def test_pagerank_join_path_matches_driver_path():
    rng = np.random.default_rng(7)
    E = pa.table({"src": rng.integers(0, 150, 1500),
                  "dst": rng.integers(0, 150, 1500)})
    ds = ray.data.from_arrow(E)
    a = pagerank(ds, node_state="driver", iters=2)
    # driver_node_limit=0 forces auto -> join (the dup_clusters-style
    # forcing test the verdict asked for)
    b = pagerank(ds, iters=2, driver_node_limit=0, join_partitions=4)
    assert a.equals(b)


def test_pagerank_rejects_unknown_node_state():
    ds = ray.data.from_arrow(pa.table({"src": [1], "dst": [2]}))
    with pytest.raises(ValueError, match="node_state"):
        pagerank(ds, node_state="banana")


# --- bounded-window EWMA -------------------------------------------------


def test_ewma_by_key_bounded_window_and_key_reset():
    from xpshacl_ray.stages.window import ewma_by_key

    t = pa.table({
        "k": ["a"] * 4 + ["b"] * 2,
        "o": [1, 2, 3, 4, 1, 2],
        "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0],
    })
    out = (ewma_by_key(ray.data.from_arrow(t), "k", ["o"], "v",
                       alpha=0.5, window=2)
           .to_pandas().sort_values(["k", "o"]))
    got = out["ewma"].to_numpy()
    # W=2, α=.5: weights (1, .5)/1.5 after warmup; first row = value
    exp = [1.0,
           (2.0 + 0.5 * 1.0) / 1.5,
           (3.0 + 0.5 * 2.0) / 1.5,
           (4.0 + 0.5 * 3.0) / 1.5,
           10.0,                      # key boundary resets the window
           (20.0 + 0.5 * 10.0) / 1.5]
    assert np.allclose(got, np.round(exp, 6))


def test_ewma_by_key_rejects_null_values():
    from xpshacl_ray.stages.window import ewma_by_key

    t = pa.table({"k": ["a", "a"], "o": [1, 2],
                  "v": pa.array([1.0, None], pa.float64())})
    with pytest.raises((ValueError, Exception)):
        ewma_by_key(ray.data.from_arrow(t), "k", ["o"], "v").to_pandas()


@pytest.mark.slow
def test_pagerank_mixed_width_int_ids_join_path():
    # int32 src / int64 dst previously crashed pa.concat_arrays in the
    # join path's node stack; both paths must agree
    rng = np.random.default_rng(5)
    E = pa.table({"src": pa.array(rng.integers(0, 60, 400), pa.int32()),
                  "dst": pa.array(rng.integers(0, 60, 400), pa.int64())})
    ds = ray.data.from_arrow(E)
    a = pagerank(ds, node_state="driver", iters=1)
    b = pagerank(ds, node_state="join", iters=1, join_partitions=4)
    assert a.equals(b)


def test_pagerank_null_endpoint_rejected_on_both_paths():
    small = ray.data.from_arrow(pa.table(
        {"src": pa.array([1, None], pa.int64()),
         "dst": pa.array([2, 3], pa.int64())}))
    with pytest.raises(Exception, match="NULL"):
        pagerank(small)  # packed path (ids < 2^31)
    strings = ray.data.from_arrow(pa.table(
        {"src": pa.array(["a", None]), "dst": pa.array(["b", "c"])}))
    with pytest.raises(Exception, match="NULL"):
        pagerank(strings)  # two-column path


def test_queries_rotation_puts_never_green_first():
    """Round 4 refined the rotation to least-recently-green and round 5
    added the ORACLE_SWEEP artifact family (see test_round4_fixes /
    test_round5_fixes for the synthetic ordering pins); the invariant
    kept here runs against the REAL on-disk artifacts: never-DRIVER-
    green entries lead, and within each tier the newest hash-green
    round (across BOTH families) is non-decreasing."""
    import glob
    import json
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    last: dict = {}
    driver_green: set = set()
    files = (glob.glob("/root/repo/CORRECTNESS_r*.json")
             + glob.glob("/root/repo/ORACLE_SWEEP_r*.json"))
    for f in sorted(files):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for k, v in json.load(open(f)).items():
            if v and v.get("hash_match"):
                last[k] = max(last.get(k, 0), rnd)
                if "CORRECTNESS" in f:
                    driver_green.add(k)
    keys = list(e.queries().keys())
    ranks = [(k in driver_green, last.get(k, -1)) for k in keys]
    # never-driver-green first, then non-decreasing last-green round
    assert ranks == sorted(ranks)
    # oracle coverage stays total after rotation
    assert set(keys) == set(e.oracle_sql().keys())
