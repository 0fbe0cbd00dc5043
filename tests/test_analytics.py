"""Analytics operators: histogram, pivot, rollup, winsorize."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.functions.analytics import (histogram, pivot_counts,
                                             rollup_sum)
from xpshacl_ray.functions.sampling import (exact_quantile_thresholds,
                                            winsorize)


def test_histogram_bins_and_nulls():
    t = pa.table({"x": pa.array([0.0, 1.5, 2.0, 2.9, -0.1, None, 10.0],
                                pa.float64())})
    out = histogram(ray.data.from_arrow(t).repartition(3), "x",
                    width=1.0).to_pandas().sort_values(
        "bin").reset_index(drop=True)
    # bins: 0:[0,1.5? no—1.5 is bin 1] → bin0:{0.0}, bin1:{1.5}, bin2:{2.0,2.9},
    # bin-1:{-0.1}, bin10:{10.0}; NULL dropped
    assert list(out["bin"]) == [-1, 0, 1, 2, 10]
    assert list(out["n"]) == [1, 1, 1, 2, 1]
    assert out.loc[out["bin"] == 2, "sum_value"].iloc[0] == pytest.approx(4.9)
    assert out.loc[out["bin"] == -1, "lo"].iloc[0] == pytest.approx(-1.0)
    assert out.loc[out["bin"] == -1, "hi"].iloc[0] == pytest.approx(0.0)


def test_histogram_rejects_bad_width():
    t = pa.table({"x": pa.array([1.0])})
    with pytest.raises(ValueError):
        histogram(ray.data.from_arrow(t), "x", width=0.0)


def test_pivot_counts_cells_and_missing():
    t = pa.table({
        "r": pa.array(["a", "a", "b", "b", "b"]),
        "c": pa.array(["x", "y", "x", "x", "y"]),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = pivot_counts(ray.data.from_arrow(t).repartition(2), "r", "c",
                       col_values=["x", "y", "z"], value_col="v"
                       ).to_pandas().set_index("r")
    assert out.loc["a", "n_x"] == 1 and out.loc["a", "sum_x"] == 1
    assert out.loc["b", "n_x"] == 2 and out.loc["b", "sum_x"] == 7
    assert out.loc["b", "n_y"] == 1 and out.loc["b", "sum_y"] == 5
    # pinned column with no data: zero-filled, schema stable
    assert out.loc["a", "n_z"] == 0 and out.loc["a", "sum_z"] == 0


def test_pivot_counts_without_values():
    t = pa.table({"r": pa.array(["a", "b", "a"]),
                  "c": pa.array(["x", "x", "y"])})
    out = pivot_counts(ray.data.from_arrow(t), "r", "c").to_pandas()
    assert sorted(out.columns) == ["n_x", "n_y", "r"]


def test_rollup_sum_levels():
    t = pa.table({
        "k1": pa.array(["r1", "r1", "r2"]),
        "k2": pa.array(["n1", "n2", "n3"]),
        "v": pa.array([10, 20, 5], pa.int64()),
    })
    out = rollup_sum(ray.data.from_arrow(t).repartition(2),
                     ["k1", "k2"], "v").to_pandas()
    assert len(out) == 3 + 2 + 1  # finest + per-k1 + grand total
    sub = out[out["k2"].isna() & out["k1"].notna()].set_index("k1")
    assert sub.loc["r1", "total"] == 30 and sub.loc["r2", "total"] == 5
    grand = out[out["k1"].isna()]
    assert grand["total"].iloc[0] == 35 and grand["n"].iloc[0] == 3


def test_rollup_sum_rejects_null_keys():
    t = pa.table({"k1": pa.array(["a", None]),
                  "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="ambiguous"):
        rollup_sum(ray.data.from_arrow(t), ["k1"], "v")


def test_exact_quantile_thresholds_multi():
    t = pa.table({"x": pa.array(list(range(1, 101)), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    (p5, p95), n = exact_quantile_thresholds(ds, "x", [500, 9500])
    assert n == 100 and p5 == 5 and p95 == 95
    with pytest.raises(ValueError):
        exact_quantile_thresholds(ds, "x", [0])


def test_winsorize_clamps_and_preserves_nulls():
    vals = list(range(1, 101)) + [None]
    t = pa.table({"id": pa.array(range(101), pa.int64()),
                  "x": pa.array(vals, pa.int64())})
    out, (lo, hi) = winsorize(ray.data.from_arrow(t).repartition(3), "x",
                              lo_bp=1000, hi_bp=9000)
    assert (lo, hi) == (10, 90)
    df = out.to_pandas().set_index("id")
    assert df.loc[0, "x_w"] == 10      # 1 clamped up
    assert df.loc[99, "x_w"] == 90     # 100 clamped down
    assert df.loc[49, "x_w"] == 50     # interior untouched
    assert pd.isna(df.loc[100, "x_w"])  # NULL passes through
    with pytest.raises(ValueError):
        winsorize(ray.data.from_arrow(t), "x", lo_bp=5000, hi_bp=5000)


def test_correlation_matrix_known_values():
    from xpshacl_ray.functions.analytics import correlation_matrix
    n = 200
    rng = np.random.default_rng(3)
    x = rng.normal(size=n)
    t = pa.table({
        "a": pa.array(x),
        "b": pa.array(2.0 * x + 1.0),        # corr +1
        "c": pa.array(-x),                   # corr -1
        "d": pa.array(np.full(n, 7.0)),      # zero variance -> NULL
    })
    out = correlation_matrix(ray.data.from_arrow(t).repartition(4),
                             ["a", "b", "c", "d"]).to_pandas()
    got = {(r["col_a"], r["col_b"]): r["corr"] for _, r in out.iterrows()}
    assert got[("a", "b")] == pytest.approx(1.0)
    assert got[("a", "c")] == pytest.approx(-1.0)
    assert pd.isna(got[("a", "d")])
    assert len(out) == 6
    with pytest.raises(ValueError):
        correlation_matrix(ray.data.from_arrow(t), ["a"])


def test_correlation_matrix_listwise_nulls():
    from xpshacl_ray.functions.analytics import correlation_matrix
    t = pa.table({"a": pa.array([1.0, 2.0, 3.0, None]),
                  "b": pa.array([2.0, 4.0, 6.0, 100.0])})
    out = correlation_matrix(ray.data.from_arrow(t), ["a", "b"]
                             ).to_pandas()
    assert out["corr"].iloc[0] == pytest.approx(1.0)  # row 4 dropped


def test_mad_robust_z_hand_computed():
    from xpshacl_ray.stages.stats import mad_robust_z
    # group g: values 1..7 plus outlier 100 -> median 4.5 (even n),
    # |d| = 3.5,2.5,1.5,.5,.5,1.5,2.5,95.5 -> MAD = 2.0
    vals = [1, 2, 3, 4, 5, 6, 7, 100]
    t = pa.table({"g": pa.array(["g"] * 8), "id": pa.array(range(8)),
                  "x": pa.array(vals, pa.int64())})
    out = mad_robust_z(ray.data.from_arrow(t).repartition(3), "x", ["g"]
                       ).to_pandas().set_index("id")
    med, mad = 4.5, 2.0
    for i, v in enumerate(vals):
        assert out.loc[i, "robust_z"] == pytest.approx(
            round((v - med) / (1.4826 * mad), 6))


def test_mad_robust_z_zero_mad_gives_null():
    from xpshacl_ray.stages.stats import mad_robust_z
    t = pa.table({"g": pa.array(["a"] * 5), "id": pa.array(range(5)),
                  "x": pa.array([3, 3, 3, 3, 9], pa.int64())})
    out = mad_robust_z(ray.data.from_arrow(t), "x", ["g"]).to_pandas()
    assert out["robust_z"].isna().all()  # MAD = 0 -> unscorable


def test_dup_rate_by_key_counts():
    from xpshacl_ray.functions.dedup import dup_rate_by_key
    t = pa.table({
        "source": pa.array(["s1"] * 4 + ["s2"] * 3),
        "text": pa.array(["a", "a", "b", None, "x", "y", "z"]),
    })
    out = {r["source"]: r for r in dup_rate_by_key(
        ray.data.from_arrow(t).repartition(3)).take_all()}
    assert out["s1"]["n_docs"] == 4 and out["s1"]["n_unique"] == 2
    assert out["s1"]["dup_fraction"] == pytest.approx(0.5)
    assert out["s2"]["n_docs"] == 3 and out["s2"]["n_unique"] == 3
    assert out["s2"]["dup_fraction"] == 0.0


@pytest.mark.slow
def test_pagerank_hand_graph_and_multi_edge_dedup():
    from xpshacl_ray.functions.graph import pagerank
    # star a->c, b->c (c dangling); duplicate a->c must NOT double-count
    e = pa.table({"src": pa.array(["a", "a", "b"]),
                  "dst": pa.array(["c", "c", "c"])})
    out = {r["node"]: r["pr"] for r in pa.Table.to_pylist(
        pagerank(ray.data.from_arrow(e).repartition(2), iters=3))}
    # p1: c = .05 + .85*(2/3); p2,p3: a=b stuck at .05 -> c = .05+.85*.1
    assert out["a"] == pytest.approx(0.05)
    assert out["b"] == pytest.approx(0.05)
    assert out["c"] == pytest.approx(0.135)


@pytest.mark.slow
def test_pagerank_cycle_stays_uniform():
    from xpshacl_ray.functions.graph import pagerank
    e = pa.table({"src": pa.array(["a", "b", "c"]),
                  "dst": pa.array(["b", "c", "a"])})
    out = {r["node"]: r["pr"]
           for r in pa.Table.to_pylist(pagerank(ray.data.from_arrow(e)))}
    for v in out.values():
        assert v == pytest.approx(1 / 3, abs=1e-6)


def test_hash_join_left_outer_null_fill():
    from xpshacl_ray.functions.joins import hash_join
    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "lv": pa.array(["x", "y", "z"])})
    right = pa.table({"k": pa.array([1, 3], pa.int64()),
                      "rv": pa.array([10, 30], pa.int64())})
    out = hash_join(ray.data.from_arrow(left).repartition(2),
                    ray.data.from_arrow(right), key="k",
                    how="left").to_pandas().sort_values(
        "k").reset_index(drop=True)
    assert len(out) == 3  # every left row survives
    assert out.loc[1, "k"] == 2 and pd.isna(out.loc[1, "rv"])
    assert out.loc[0, "rv"] == 10 and out.loc[2, "rv"] == 30


def test_mean_pool_by_group_elementwise():
    from xpshacl_ray.functions.similarity import mean_pool_by_group
    t = pa.table({
        "vec_id": pa.array([0, 1, 10], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 6.0], [5.0, 5.0]],
                              pa.list_(pa.float32())),
    })
    out = mean_pool_by_group(
        ray.data.from_arrow(t).repartition(3),
        lambda b: np.asarray(b["vec_id"], dtype=np.int64) // 10,
    ).to_pandas().set_index(["grp", "dim"])
    assert out.loc[(0, 0), "avg"] == pytest.approx(2.0)   # (1+3)/2
    assert out.loc[(0, 1), "avg"] == pytest.approx(4.0)   # (2+6)/2
    assert out.loc[(1, 0), "avg"] == pytest.approx(5.0)
    assert len(out) == 4


def test_source_overlap_matrix_counts():
    from xpshacl_ray.functions.dedup import source_overlap_matrix
    t = pa.table({
        "source": pa.array(["s1", "s1", "s2", "s2", "s3", "s3", "s1"]),
        "text": pa.array(["shared", "only1", "shared", "also23",
                          "also23", "shared", None]),
    })
    out = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap_matrix(
               ray.data.from_arrow(t).repartition(3)).take_all()}
    # 'shared' spans s1/s2/s3 -> 3 pairs; 'also23' spans s2/s3; NULL ignored
    assert out[("s1", "s2")] == 1
    assert out[("s1", "s3")] == 1
    assert out[("s2", "s3")] == 2
    assert len(out) == 3


def test_bigram_logprob_hand_computed():
    import math
    from xpshacl_ray.functions.text import bigram_logprob
    # corpus: "a b a b" and "a b"; V=2; bigrams: (a,b)x3, (b,a)x1
    # c(a.)=3, c(b.)=1; P(b|a)=(3+1)/(3+2)=0.8; P(a|b)=(1+1)/(1+2)=2/3
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b a b", "a b", None])})
    out = {r["doc_id"]: r for r in bigram_logprob(
        ray.data.from_arrow(t).repartition(2)).take_all()}
    exp1 = round((2 * math.log(0.8) + math.log(2 / 3)) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(exp1)
    assert out[2]["avg_logprob"] == pytest.approx(round(math.log(0.8), 6))
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] == 0.0


def test_keyness_g2_hand_computed():
    import math
    from xpshacl_ray.functions.text import keyness_by_key
    # shard A: 'x' * 6 + 'y' * 2 ; shard B: 'y' * 6 + 'x' * 2
    t = pa.table({
        "source": pa.array(["A", "B"]),
        "text": pa.array(["x x x x x x y y", "y y y y y y x x"]),
    })
    out = {(r["source"], r["term"]): r for r in keyness_by_key(
        ray.data.from_arrow(t).repartition(2), min_count=5).take_all()}
    # ('A','x'): a=6, ct=8, ns=8, n=16 -> E1=4, b=2, E2=4
    g2 = 2 * (6 * math.log(6 / 4) + 2 * math.log(2 / 4))
    assert out[("A", "x")]["n"] == 6
    assert out[("A", "x")]["g2"] == pytest.approx(round(g2, 6))
    # min_count filter: ('A','y') has a=2 < 5 -> absent
    assert ("A", "y") not in out
    assert out[("B", "y")]["g2"] == pytest.approx(round(g2, 6))


def test_profile_columns_exact():
    from xpshacl_ray.stages.stats import profile_columns
    t = pa.table({
        "i": pa.array([3, 1, 1, None], pa.int64()),
        "s": pa.array(["b", "a", None, "a"]),
    })
    out = {r["column"]: r for r in pa.Table.to_pylist(
        profile_columns(ray.data.from_arrow(t).repartition(2),
                        ["i", "s"]))}
    assert out["i"]["n"] == 4 and out["i"]["n_null"] == 1
    assert out["i"]["n_distinct"] == 2
    assert out["i"]["min_str"] == "1" and out["i"]["max_str"] == "3"
    assert out["s"]["n_distinct"] == 2 and out["s"]["max_str"] == "b"
