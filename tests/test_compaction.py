"""latest_by_key / kfold_assign / budget_sample (functions/compaction.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.functions.compaction import (budget_sample, kfold_assign,
                                              latest_by_key)


def test_latest_by_key_ties_and_batches():
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 30, 30, 5, 5], pa.int64()),
        "id": pa.array([100, 101, 102, 200, 201], pa.int64()),
        "payload": pa.array(list("abcde")),
    })
    out = {r["k"]: r for r in latest_by_key(
        ray.data.from_arrow(t).repartition(4), "k",
        ["ts", "id"]).take_all()}
    # key 1: ts tie at 30 -> larger id 102 wins; key 2: tie -> id 201
    assert out[1]["id"] == 102 and out[1]["payload"] == "c"
    assert out[2]["id"] == 201 and out[2]["payload"] == "e"


def test_latest_by_key_rejects_null_order():
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "ts": pa.array([None], pa.int64()),
                  "id": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        latest_by_key(ray.data.from_arrow(t), "k", ["ts", "id"]).take_all()


def test_kfold_assign_deterministic_and_complete():
    t = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    out = kfold_assign(ray.data.from_arrow(t).repartition(3),
                       "doc_id", k=5).to_pandas()
    assert set(out["fold"].unique()) == {0, 1, 2, 3, 4}
    # matches the closed-form md5 expression
    for _, r in out.head(20).iterrows():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        assert r["fold"] == h % 5
    with pytest.raises(ValueError):
        kfold_assign(ray.data.from_arrow(t), "doc_id", k=1)


def test_budget_sample_matches_bruteforce_prefix():
    rng = np.random.default_rng(7)
    ids = list(range(300))
    costs = rng.integers(10, 100, size=300).tolist()
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "cost": pa.array(costs, pa.int64())})
    budget = 4000
    out, report = budget_sample(
        ray.data.from_arrow(t).repartition(4), "doc_id", "cost",
        budget=budget, n_buckets=16)
    got = sorted(r["doc_id"] for r in out.take_all())
    # brute force: cumulative prefix in md5 order (greedy stops at first
    # overflow — emulate by walking until cum > budget then breaking)
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode())
                   .hexdigest())
    kept, spent = [], 0
    for i in order:
        if spent + costs[i] > budget:
            break
        spent += costs[i]
        kept.append(i)
    assert got == sorted(kept)
    assert report["spent"] == spent <= budget


def test_budget_sample_whole_corpus_fits():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "cost": pa.array([5, 5], pa.int64())})
    out, report = budget_sample(ray.data.from_arrow(t), "doc_id", "cost",
                                budget=100)
    assert out.count() == 2 and report["boundary_bucket"] is None


def test_budget_sample_zero_budget():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "cost": pa.array([5, 5], pa.int64())})
    out, report = budget_sample(ray.data.from_arrow(t), "doc_id", "cost",
                                budget=0)
    assert out.count() == 0 and report["spent"] == 0


def test_sample_weighted_k_proportional_and_exact():
    import math
    from xpshacl_ray.functions.sampling import sample_weighted_k
    n = 400
    # weights: heavy ids (multiples of 4) weigh 50x the rest
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "w": pa.array([50 if i % 4 == 0 else 1
                                 for i in range(n)], pa.int64())})
    out = sample_weighted_k(ray.data.from_arrow(t).repartition(5),
                            "id", "w", k=50).take_all()
    assert len(out) == 50
    heavy = sum(1 for r in out if r["id"] % 4 == 0)
    assert heavy > 35  # heavy items dominate (prob ~ 50:1)
    # brute-force replay: same priorities, smallest-k
    pri = {}
    for i in range(n):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        w = 50 if i % 4 == 0 else 1
        pri[i] = -math.log((h + 1.0) / 4294967297.0) / w
    expect = sorted(sorted(pri, key=lambda i: (pri[i], i))[:50])
    assert sorted(r["id"] for r in out) == expect
    # zero/NULL weights drop; NULL ids raise
    t2 = pa.table({"id": pa.array([1, 2], pa.int64()),
                   "w": pa.array([0, None], pa.int64())})
    assert sample_weighted_k(ray.data.from_arrow(t2), "id", "w",
                             k=5).count() == 0
