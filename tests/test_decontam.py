"""Benchmark decontamination: n-gram overlap flags, drop mode, Bloom
variant, and document-boundary correctness of the rolling n-gram pass."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.functions.decontam import (
    _doc_ngram_hashes,
    collect_benchmark_ngrams,
    decontaminate,
)


def test_doc_ngram_hashes_respects_boundaries():
    col = pa.chunked_array([pa.array(["a b c d", "c d a b", "a b", None])])
    doc, g = _doc_ngram_hashes(col, 2)
    # doc 0: {a b, b c, c d}; doc 1: {c d, d a, a b}; doc 2: {a b};
    # doc 3 (null -> ""): nothing
    assert list(np.bincount(doc, minlength=4)) == [3, 3, 1, 0]
    grams = {d: set() for d in range(4)}
    for d, h in zip(doc, g):
        grams[d].add(int(h))
    # shared n-grams hash identically across docs
    assert len(grams[0] & grams[1]) == 2          # "a b" and "c d"
    assert grams[2] <= grams[0]
    # no n-gram spans the doc 0 / doc 1 boundary ("d c" never exists)
    doc2, g2 = _doc_ngram_hashes(pa.array(["d c"]), 2)
    assert int(g2[0]) not in grams[0] | grams[1]


def test_doc_ngram_hashes_distinct_within_doc():
    doc, g = _doc_ngram_hashes(pa.array(["x y x y x y"]), 2)
    # 5 positions but only 2 distinct bigrams: "x y", "y x"
    assert len(g) == 2


def test_decontaminate_flag_drop_and_bloom(ray_session):
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the quick brown fox jumps high",
                 "nothing in common at all here",
                 "a quick brown fox appears"],
    }))
    bench = ray.data.from_arrow(
        pa.table({"text": ["saw the quick brown fox yesterday"]}))
    out = decontaminate(corpus, bench, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["is_contaminated"]) == [True, False, True]
    assert out.loc[0, "contaminated_ngrams"] >= 2  # two shared trigrams
    kept = decontaminate(corpus, bench, n=3, mode="drop").to_pandas()
    assert list(kept["doc_id"]) == [2]
    assert "is_contaminated" not in kept.columns
    outb = decontaminate(corpus, bench, n=3, use_bloom=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(outb["is_contaminated"]) == [True, False, True]


def test_decontaminate_empty_benchmark(ray_session):
    corpus = ray.data.from_arrow(pa.table({"text": ["a b c d e"]}))
    bench = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert collect_benchmark_ngrams(bench, n=3).size == 0
    out = decontaminate(corpus, bench, n=3).to_pandas()
    assert not out["is_contaminated"].any()


def test_decontaminate_rejects_bad_mode(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": ["a"]}))
    with pytest.raises(ValueError, match="mode"):
        decontaminate(ds, ds, mode="quarantine")


def test_duplicate_ngram_stats_exact(ray_session):
    import collections

    from xpshacl_ray.functions.decontam import duplicate_ngram_stats

    docs = {
        1: "a b c d e f",       # "a b c" shared with doc 2
        2: "a b c x y z",
        3: "p q r s t u",       # internally repeated below
        4: "p q r p q r p q",   # "p q r" ×2 internal + doc 3's
        5: "m n o",             # one gram, unique
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": list(docs.values()),
    })).repartition(3)
    out = duplicate_ngram_stats(ds, n=3).to_pandas() \
        .set_index("doc_id").sort_index()
    # ground truth by brute force
    grams = collections.Counter()
    per_doc = {}
    for d, t in docs.items():
        toks = t.split(" ")
        gs = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        per_doc[d] = gs
        grams.update(gs)
    for d, gs in per_doc.items():
        dup = sum(1 for g in gs if grams[g] >= 2)
        if dup == 0:
            assert d not in out.index
        else:
            assert out.loc[d, "n_ngrams"] == len(gs)
            assert out.loc[d, "dup_ngrams"] == dup
            assert out.loc[d, "dup_fraction"] == round(dup / len(gs), 6)


def test_duplicate_ngram_stats_no_dups(ray_session):
    from xpshacl_ray.functions.decontam import duplicate_ngram_stats

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["completely unique words one", "other disjoint tokens two"],
    }))
    assert duplicate_ngram_stats(ds, n=3).count() == 0


def test_repetition_signals_values():
    from xpshacl_ray.functions.decontam import repetition_signals

    t = pa.table({"text": ["a b a b a b", "x y z w", "ab", None, ""]})
    out = repetition_signals(t).to_pandas()
    # "a b a b a b": 5 bigrams, 2 distinct -> 0.6; 4 trigrams, 2 -> 0.5
    assert out.loc[0, "rep_2gram_frac"] == 0.6
    assert out.loc[0, "rep_3gram_frac"] == 0.5
    assert out.loc[1, "rep_2gram_frac"] == 0.0
    assert out.loc[2, "rep_2gram_frac"] == 0.0   # shorter than n
    assert np.isnan(out.loc[3, "rep_2gram_frac"])  # NULL text stays NULL
    assert out.loc[4, "rep_2gram_frac"] == 0.0
