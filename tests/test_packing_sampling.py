"""Sequence packing, exact quantile gating, and domain-mixture
rebalancing — the corpus layout/selection steps of a pretraining
pipeline (oracle-checked end-to-end by the driver; invariants and edge
cases here)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.functions.packing import pack_sequences
from xpshacl_ray.functions.sampling import (
    exact_quantile_threshold,
    md5_bucket,
    quantile_filter,
    rebalance_mixture,
)


# --- pack_sequences --------------------------------------------------------


def test_pack_sequences_layout_invariants(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = pack_sequences(docs, seq_len=64, n_shards=4).to_pandas()
    assert len(out) == docs.count()
    for _, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        start = g["start_tok"].to_numpy()
        # concatenation: each doc starts where the previous one ended
        assert start[0] == 0
        assert (start[1:] == start[:-1] + n[:-1]).all()
        assert (g["chunk_first"].to_numpy() == start // 64).all()
        assert (g["chunk_last"].to_numpy() == (start + n - 1) // 64).all()
        # a doc spans ceil(n/64)-ish windows: never more than n//64 + 1
        assert ((g["chunk_last"] - g["chunk_first"]) <= n // 64 + 1).all()


def test_pack_sequences_shard_col_and_token_col():
    t = pa.table({
        "doc_id": [3, 1, 2, 10],
        "grp": ["a", "a", "a", "b"],
        "n_tok": [10, 5, 7, 130],
    })
    out = pack_sequences(
        ray.data.from_arrow(t), seq_len=128, token_col="n_tok",
        shard_col="grp",
    ).to_pandas().sort_values(["shard", "doc_id"]).reset_index(drop=True)
    a = out[out["shard"] == "a"]
    # order within shard is doc_id: 1(5), 2(7), 3(10)
    assert a["start_tok"].tolist() == [0, 5, 12]
    assert a["chunk_first"].tolist() == [0, 0, 0]
    # shard b: one 130-token doc spans windows 0..1
    b = out[out["shard"] == "b"].iloc[0]
    assert (b["start_tok"], b["chunk_first"], b["chunk_last"]) == (0, 0, 1)


def test_pack_sequences_empty_doc_and_null_rows():
    t = pa.table({
        "doc_id": [1, 2, None, 3],
        "n_tok": [128, 0, 5, None],
    })
    out = pack_sequences(
        ray.data.from_arrow(t), seq_len=128, token_col="n_tok",
        shard_col=None, n_shards=1,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # null id and null count rows dropped
    assert out["doc_id"].tolist() == [1, 2]
    # empty doc sits at its boundary: start 128, spans exactly chunk 1
    assert out.iloc[1]["start_tok"] == 128
    assert out.iloc[1]["chunk_first"] == 1
    assert out.iloc[1]["chunk_last"] == 1
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(ray.data.from_arrow(t), seq_len=0, token_col="n_tok")


# --- quantile_filter -------------------------------------------------------


def test_exact_quantile_threshold_definition():
    vals = [10, 20, 20, 30, 40, 50, 60, 70, 80, 90]
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    # P25 of 10 rows: k = ceil(10 * 0.25) = 3 → 3rd smallest = 20
    thr, n = exact_quantile_threshold(ds, "v", 2500)
    assert (thr, n) == (20, 10)
    # P100 → max
    assert exact_quantile_threshold(ds, "v", 10000)[0] == 90
    with pytest.raises(ValueError):
        exact_quantile_threshold(ds, "v", 0)
    with pytest.raises(ValueError):
        exact_quantile_threshold(ds, "v", 10001)


def test_quantile_filter_tails_and_nulls():
    t = pa.table({"id": list(range(8)),
                  "v": [1, 2, 3, 4, None, 6, 7, 8]})
    ds = ray.data.from_arrow(t)
    upper, thr = quantile_filter(ds, "v", 5000, keep="upper")
    # 7 non-null, k=ceil(3.5)=4 → threshold 4; nulls dropped
    assert thr == 4
    assert sorted(upper.to_pandas()["v"]) == [4, 6, 7, 8]
    lower, thr2 = quantile_filter(ds, "v", 5000, keep="lower")
    assert thr2 == 4
    assert sorted(lower.to_pandas()["v"]) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="keep"):
        quantile_filter(ds, "v", 5000, keep="middle")


# --- rebalance_mixture -----------------------------------------------------


def _domains_table():
    # 100 a, 50 b, 30 c, 40 d (d not in target → dropped)
    rows = [("a", i) for i in range(100)] + [("b", 100 + i) for i in range(50)] \
        + [("c", 200 + i) for i in range(30)] + [("d", 300 + i) for i in range(40)]
    return pa.table({"dom": [r[0] for r in rows],
                     "id": [r[1] for r in rows]})


def test_rebalance_mixture_hits_target_and_is_deterministic():
    ds = ray.data.from_arrow(_domains_table())
    target = {"a": 5000, "b": 3000, "c": 2000}
    out, report = rebalance_mixture(ds, "id", "dom", target)
    # binding domain: c → T = 30 * 10000 // 2000 = 150
    assert report["total_target"] == 150
    assert report["rates_bp"] == {"a": 7500, "b": 9000, "c": 10000}
    df = out.to_pandas()
    got = df["dom"].value_counts().to_dict()
    # md5 buckets are near-uniform but not exact: bound the deviation
    for s, want in report["expected_kept"].items():
        assert abs(got.get(s, 0) - want) <= max(5, want // 5)
    assert "d" not in got
    # deterministic across repartition: identical surviving id set
    df2 = rebalance_mixture(
        ds.repartition(7), "id", "dom", target)[0].to_pandas()
    assert sorted(df2["id"]) == sorted(df["id"])
    # and the selection matches the documented hash rule exactly
    for _, row in df.iterrows():
        assert md5_bucket([row["id"]], 10000)[0] \
            < report["rates_bp"][row["dom"]]


def test_rebalance_mixture_validation():
    ds = ray.data.from_arrow(_domains_table())
    with pytest.raises(ValueError, match="sum to 10000"):
        rebalance_mixture(ds, "id", "dom", {"a": 5000, "b": 3000})
    with pytest.raises(ValueError, match="absent"):
        rebalance_mixture(ds, "id", "dom", {"a": 5000, "zz": 5000})
    with pytest.raises(ValueError, match="positive"):
        rebalance_mixture(ds, "id", "dom", {"a": 10000, "b": 0})


def test_chunk_documents_windows_and_tails():
    from xpshacl_ray.functions.packing import chunk_documents

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["abcdefghij",   # 10 chars -> starts 0,4,8 (size 6/stride 4)
                 "ab",           # one short chunk
                 ""],            # empty -> nothing
    }))
    rows = sorted(chunk_documents(ds, chunk_size=6, stride=4).take_all(),
                  key=lambda r: (r["doc_id"], r["chunk_id"]))
    got = [(r["doc_id"], r["chunk_id"], r["start"], r["chunk_len"],
            r["chunk_text"]) for r in rows]
    assert got == [
        (1, 0, 0, 6, "abcdef"),
        (1, 1, 4, 6, "efghij"),
        (1, 2, 8, 2, "ij"),
        (2, 0, 0, 2, "ab"),
    ]
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_size=0)


def test_char_entropy_unicode_codepoints():
    from xpshacl_ray.functions.text import char_entropy

    t = pa.table({"doc_id": [1, 2], "text": ["αβ", "ééé é"]})
    out = {r["doc_id"]: r for r in char_entropy(t).to_pylist()}
    # 2 distinct codepoints, uniform -> 1 bit; counted per codepoint
    assert out[1]["n_chars_text"] == 2 and abs(out[1]["entropy"] - 1.0) < 1e-12
    # 'ééé é': 5 codepoints, counts {é:4, ' ':1}
    import math
    want = math.log2(5) - (4 * math.log2(4)) / 5
    assert out[2]["n_chars_text"] == 5
    assert abs(out[2]["entropy"] - want) < 1e-12


def test_sample_weighted_probability_and_determinism():
    from xpshacl_ray.functions.sampling import sample_weighted

    n = 4000
    df = pd.DataFrame({"id": [f"d{i}" for i in range(n)],
                       "w": [0.0] * (n // 2) + [1.0] * (n // 2)})
    ds = ray.data.from_pandas(df).repartition(4)
    kept = sample_weighted(ds, "id", "w").take_all()
    ids = sorted(r["id"] for r in kept)
    # weight 0 never keeps; weight 1 always keeps
    assert len(ids) == n // 2 and all(
        int(i[1:]) >= n // 2 for i in ids)
    # half-weight keeps ~50% and is layout-independent
    df2 = pd.DataFrame({"id": [f"d{i}" for i in range(n)], "w": 0.5})
    a = sorted(r["id"] for r in
               sample_weighted(ray.data.from_pandas(df2), "id", "w")
               .take_all())
    b = sorted(r["id"] for r in
               sample_weighted(ray.data.from_pandas(df2).repartition(7),
                               "id", "w").take_all())
    assert a == b and 0.4 < len(a) / n < 0.6
    with pytest.raises(ValueError):
        sample_weighted(ds, "id", "w", scale_bp=-1)


def test_bigram_pmi_hand_corpus():
    import math

    from xpshacl_ray.functions.text import bigram_pmi

    # "a b" occurs 3x, tokens: a:3 b:3 c:2 -> T1=8, bigrams: ab x3, bc x2
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c", "a b c", "a b"],
    })).repartition(2)
    rows = bigram_pmi(ds, min_count=2, top_k=10).take_all()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("a", "b"), ("b", "c")}
    t12, t1 = 5, 8
    want_ab = math.log((3 / t12) / ((3 / t1) * (3 / t1)))
    assert abs(got[("a", "b")]["pmi"] - want_ab) < 1e-12
    assert got[("a", "b")]["c12"] == 3


def test_take_per_group_deterministic_unbiased_cap():
    import hashlib

    from xpshacl_ray.functions.sampling import take_per_group

    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 2,
        "id": list(range(6)) + [100, 101],
    })
    out = take_per_group(ray.data.from_pandas(df).repartition(3),
                         ["g"], "id", n=3, n_parts=4)
    rows = sorted((r["g"], r["id"]) for r in out.take_all())
    # group b under the cap: kept whole
    assert [r for r in rows if r[0] == "b"] == [("b", 100), ("b", 101)]
    # group a: exactly the 3 lowest md5(id) — layout-independent
    want = sorted(range(6),
                  key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(),
                                 v))[:3]
    assert [i for g, i in rows if g == "a"] == sorted(want)
    # repartitioning never changes the selection
    out2 = take_per_group(ray.data.from_pandas(df).repartition(7),
                          ["g"], "id", n=3, n_parts=4)
    assert sorted((r["g"], r["id"]) for r in out2.take_all()) == rows
    with pytest.raises(ValueError):
        take_per_group(ray.data.from_pandas(df), ["g"], "id", n=-1)


def test_sample_exact_k_budget_and_layout_stability():
    import hashlib

    from xpshacl_ray.functions.sampling import sample_exact_k

    df = pd.DataFrame({"id": list(range(20)) + [None],
                       "v": list(range(21))})
    a = sorted(r["id"] for r in
               sample_exact_k(ray.data.from_pandas(df), "id", 7)
               .take_all())
    b = sorted(r["id"] for r in
               sample_exact_k(ray.data.from_pandas(df).repartition(5),
                              "id", 7).take_all())
    want = sorted(sorted(
        range(20),
        key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[:7])
    assert a == b == [float(x) for x in want] or a == b == want
    # k beyond n returns all non-null-id rows
    full = sample_exact_k(ray.data.from_pandas(df), "id", 100).take_all()
    assert len(full) == 20
    with pytest.raises(ValueError):
        sample_exact_k(ray.data.from_pandas(df), "id", -1)
