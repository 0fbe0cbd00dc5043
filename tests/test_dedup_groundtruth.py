"""Dedup quality bounds vs brute-force all-pairs ground truth.

Not row counts: recall/precision of the LSH pipelines is asserted against
the quadratic sweep (every pair, no banding) computed by the INDEPENDENT
reimplementations in tools/make_goldens.py — the same code that generates
the driver's golden oracles."""

import sys

import numpy as np
import pandas as pd
import pytest
import ray.data

sys.path.insert(0, "/root/repo/tools")
import make_goldens as mg  # noqa: E402  (independent reimplementation)

from xpshacl_ray.functions.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash_near_dups,
    verify_pairs_ngram,
)


@pytest.fixture(scope="module")
def corpus(sf_dir):
    """Base docs + exact copies + lightly perturbed copies (true near-dups)
    + a shuffled distant cousin (true negative at high thresholds)."""
    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet").take(30)
    rows = [{"doc_id": r["doc_id"], "text": r["text"]} for r in base]
    nxt = 100_000
    for r in base[:8]:
        rows.append({"doc_id": nxt, "text": r["text"]})  # exact copy
        nxt += 1
    for r in base[8:16]:
        toks = r["text"].split()
        toks[len(toks) // 2] = "zzzperturbed"
        rows.append({"doc_id": nxt, "text": " ".join(toks)})  # near-dup
        nxt += 1
    for r in base[16:20]:
        toks = r["text"].split()[::-1]
        rows.append({"doc_id": nxt, "text": " ".join(toks)})  # scrambled
        nxt += 1
    df = pd.DataFrame(rows)
    return df, ray.data.from_pandas(df)


def _true_pairs(df, threshold):
    ids = df["doc_id"].tolist()
    texts = df["text"].tolist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ngram_jaccard(texts[i], texts[j]) >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


def test_minhash_recall_and_verify_precision(corpus):
    df, ds = corpus
    truth_high = _true_pairs(df, 0.95)  # exact + near-exact pairs
    assert len(truth_high) >= 8
    cand = minhash_lsh_candidates(ds, jaccard_threshold=0.5)
    found = {tuple(sorted((a, b)))
             for a, b in zip(*[cand.to_pandas()[c] for c in ("id_a", "id_b")])}
    recall = len(truth_high & found) / len(truth_high)
    assert recall >= 0.9, f"high-Jaccard recall {recall} below bound"

    verified = verify_pairs_ngram(ds, cand, threshold=0.8).to_pandas()
    # exact-verification precision is 1.0 BY CONSTRUCTION — check it
    tmap = dict(zip(df["doc_id"], df["text"]))
    for a, b, j in zip(verified.id_a, verified.id_b, verified.jaccard):
        assert j == round(ngram_jaccard(tmap[a], tmap[b]), 6)
        assert j >= 0.8
    # and the scrambled cousins (low n-gram overlap) never survive verify
    scrambled = set(df["doc_id"][df["doc_id"] >= 100_016])
    assert not any(a in scrambled or b in scrambled
                   for a, b in zip(verified.id_a, verified.id_b))


def test_minhash_pairs_match_bruteforce_groundtruth(corpus):
    df, ds = corpus
    sigs = mg.minhash_signatures(df["text"].tolist())
    want = mg.brute_minhash_pairs(np.asarray(df["doc_id"]), sigs,
                                  threshold=0.8)
    got = minhash_lsh_candidates(ds, jaccard_threshold=0.8).to_pandas()
    key = lambda d: sorted(zip(d.id_a, d.id_b, d.jaccard_est))  # noqa: E731
    assert key(got) == key(want)


def test_simhash_pairs_match_bruteforce_groundtruth(corpus):
    df, ds = corpus
    sh = mg.simhash64(df["text"].tolist())
    want = mg.brute_simhash_pairs(np.asarray(df["doc_id"]), sh,
                                  max_hamming=3)
    got = simhash_near_dups(ds, max_hamming=3).to_pandas()
    key = lambda d: sorted(zip(d.id_a, d.id_b, d.hamming))  # noqa: E731
    assert key(got) == key(want)
    # exact copies must collide at hamming 0
    zero = got[got.hamming == 0]
    assert len(zero) >= 8


def test_distributed_cluster_labels_match_union_find():
    from xpshacl_ray.functions.dedup import (
        cluster_labels,
        cluster_labels_distributed,
    )

    # components incl. a short chain (exercises multi-round propagation);
    # kept small because each propagation round is a real shuffle
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]               # chain
    pairs += [(100, 101), (101, 102), (100, 102)]          # triangle
    pairs += [(200, 201), (300, 301), (301, 300)]          # pairs + dup edge
    want = cluster_labels(pairs)

    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    got = {r["node"]: r["label"]
           for r in cluster_labels_distributed(ds, n_buckets=4).take_all()}
    assert got == {k: v for k, v in want.items()}


def test_pointer_jumping_converges_on_deep_chain_in_few_rounds():
    from xpshacl_ray.functions.dedup import (
        cluster_labels,
        cluster_labels_distributed,
    )

    # a 17-node chain: plain min-label propagation needs ~diameter (16)
    # rounds — more than max_rounds=5 — while pointer jumping shortcuts
    # label(node) <- label(label(node)) and converges in O(log d)
    # (measured: 4 rounds on this chain)
    pairs = [(i, i + 1) for i in range(16)]
    want = cluster_labels(pairs)
    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["id_a", "id_b"]))

    got = {r["node"]: r["label"]
           for r in cluster_labels_distributed(
               ds, n_buckets=4, max_rounds=5).take_all()}
    assert got == want  # everyone labelled 0

    plain = {r["node"]: r["label"]
             for r in cluster_labels_distributed(
                 ds, n_buckets=4, max_rounds=5,
                 pointer_jumping=False).take_all()}
    assert plain != want  # diameter rounds not reached: tail still wrong


def test_dup_clusters_matches_recursive_cte_oracle():
    """The driver's dup_clusters oracle shape: DuckDB recursive
    reachability closure + per-node min label must equal the engine's
    distributed min-label propagation on an arbitrary pair graph."""
    import duckdb

    from xpshacl_ray.functions.dedup import cluster_labels_distributed

    pairs = [(5, 9), (9, 14), (14, 3), (42, 40), (40, 41), (7, 8),
             (8, 7), (99, 98)]
    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    got = {r["node"]: r["label"]
           for r in cluster_labels_distributed(ds, n_buckets=4).take_all()}

    values = ",".join(f"({a},{b})" for a, b in pairs)
    sql = f"""
        WITH RECURSIVE pairs(id_a, id_b) AS (VALUES {values}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        walk (node, lab) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.node
        )
        SELECT node, min(lab) AS cluster FROM walk GROUP BY node
    """
    want = {int(n): int(c) for n, c in duckdb.sql(sql).fetchall()}
    assert got == want


@pytest.mark.slow
def test_cluster_labels_shuffle_path_still_exact():
    """jump_broadcast_limit=0 forces the sort-bucket hash_join propagate
    (the >5M-label path) — the broadcast fast path must not be the only
    correct one."""
    from xpshacl_ray.functions.dedup import (
        cluster_labels,
        cluster_labels_distributed,
    )

    pairs = [(0, 1), (1, 2), (2, 3), (100, 101), (200, 201), (201, 202)]
    want = cluster_labels(pairs)
    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    got = {r["node"]: r["label"]
           for r in cluster_labels_distributed(
               ds, n_buckets=4, max_rounds=10,
               jump_broadcast_limit=0).take_all()}
    assert got == want


def test_containment_metric_and_join_path_agree():
    from xpshacl_ray.functions.dedup import (
        ngram_containment,
        verify_pairs_ngram,
    )

    # b is a strict substring of a: containment 1.0, jaccard < 1
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "w3 w4 w5 w6"
    assert ngram_containment(a, b) == 1.0
    assert ngram_containment("", "") == 1.0
    assert ngram_containment(a, "") == 0.0

    docs = pd.DataFrame({"doc_id": [1, 2], "text": [a, b]})
    ds = ray.data.from_pandas(docs)
    pairs = ray.data.from_pandas(pd.DataFrame({"id_a": [1], "id_b": [2]}))
    got = verify_pairs_ngram(ds, pairs, threshold=0.9,
                             metric="containment").take_all()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in got] \
        == [(1, 2, 1.0)]
    # join path (broadcast_limit=0) produces the identical verdict
    got_j = verify_pairs_ngram(ds, pairs, threshold=0.9,
                               metric="containment",
                               broadcast_limit=0).take_all()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in got_j] \
        == [(1, 2, 1.0)]
