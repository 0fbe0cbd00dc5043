"""Boilerplate-line stripping (functions/boilerplate.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.functions.boilerplate import (collect_boilerplate,
                                               derive_lines,
                                               strip_boilerplate)

BANNER = "accept all cookies to continue using this site ok"  # 9 tokens


def _corpus():
    # docs 1..3 share the same leading 8-token window (the "banner");
    # doc 4 contains that window twice (both copies must be stripped);
    # doc 5 repeats a line only WITHIN itself (1 distinct doc -> kept);
    # docs 6/7: NULL and empty.
    own = "my own words " * 4  # 12 tokens -> distinct tails
    return pa.table({
        "doc_id": pa.array(range(1, 8), pa.int64()),
        "text": pa.array([
            f"{BANNER} alpha beta gamma delta epsilon zeta eta",
            f"{BANNER} one two three four five six seven",
            f"{BANNER} red orange yellow green blue indigo violet",
            f"{BANNER[:-3]} {BANNER} uniq",  # 8 tokens, then banner again
            own + own,                        # self-repeat only
            None,
            "",
        ], pa.string()),
    })


def test_derive_lines_windows():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a  b c d e f g h i j"], pa.string())})
    lines, rid, line_no, n_lines = derive_lines(t)
    # double space collapses (empty tokens dropped): 10 tokens -> 2 lines
    assert lines.to_pylist() == ["a b c d e f g h", "i j"]
    assert list(rid) == [0, 0] and list(line_no) == [0, 1]
    assert list(n_lines) == [2]


def test_strip_boilerplate_end_to_end():
    ds = ray.data.from_arrow(_corpus()).repartition(3)
    out = {r["doc_id"]: r
           for r in strip_boilerplate(ds, min_docs=2).take_all()}
    banner8 = " ".join(BANNER.split()[:8])
    # banner window stripped from docs 1-3, survivors intact
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] == 1
        assert banner8 not in out[d]["text_clean"]
        assert out[d]["n_lines"] == 2
    # doc 4: tokens = 8 banner-prefix + 9 banner + 'uniq' = 18 -> 3 lines;
    # its window 0 ('accept .. this' minus last token + ...) differs from
    # banner8 only if alignment differs — assert by recomputation instead
    lines4, _, _, _ = derive_lines(
        pa.table({"doc_id": pa.array([4], pa.int64()),
                  "text": pa.array([_corpus()["text"][3].as_py()],
                                   pa.string())}))
    boiler_lines = {banner8}
    expect_kept = [l for l in lines4.to_pylist() if l not in boiler_lines]
    got = out[4]["text_clean"].split("\n") if out[4]["text_clean"] else []
    assert got == expect_kept
    # self-repeating doc 5 untouched (1 distinct doc < min_docs)
    assert out[5]["n_boiler"] == 0
    # NULL in -> NULL out; empty -> ''
    assert out[6]["text_clean"] is None and out[6]["n_lines"] == 0
    assert out[7]["text_clean"] == "" and out[7]["n_lines"] == 0


def test_collect_boilerplate_threshold():
    ds = ray.data.from_arrow(_corpus())
    assert len(collect_boilerplate(ds, min_docs=2)) >= 1
    # banner8 is in docs 1-4 (doc 4's prefix window aligns with it);
    # no line appears in 5+ distinct docs
    assert len(collect_boilerplate(ds, min_docs=4)) == 1
    assert len(collect_boilerplate(ds, min_docs=5)) == 0


def test_bloom_path_superset_of_exact():
    ds = ray.data.from_arrow(_corpus()).repartition(2)
    exact = {r["doc_id"]: r["n_boiler"]
             for r in strip_boilerplate(ds, min_docs=2).take_all()}
    bloom = {r["doc_id"]: r["n_boiler"]
             for r in strip_boilerplate(ds, min_docs=2,
                                        use_bloom=True).take_all()}
    for d in exact:  # Bloom may only over-strip, never under-strip
        assert bloom[d] >= exact[d]
    assert sum(bloom.values()) <= sum(exact.values()) + 1  # fp ~1e-4


def test_partitioning_invariance():
    t = _corpus()
    a = strip_boilerplate(ray.data.from_arrow(t).repartition(1),
                          min_docs=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = strip_boilerplate(ray.data.from_arrow(t).repartition(5),
                          min_docs=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_no_boilerplate_is_identity_reassembly():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["w1 w2 w3", "x1 x2 x3 x4"],
                                   pa.string())})
    out = strip_boilerplate(ray.data.from_arrow(t)).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["text_clean"] == "w1 w2 w3"
    assert by_id[2]["text_clean"] == "x1 x2 x3 x4"


def test_edit_similarity_kernel():
    from xpshacl_ray.functions.dedup import (edit_similarity,
                                             levenshtein_distance)
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "") == 3
    assert edit_similarity("", "") == 1.0
    assert edit_similarity("abcd", "abcd") == 1.0
    assert edit_similarity("abcd", "abce") == 0.75
    assert edit_similarity(None, "ab") == 0.0  # null-as-empty guard


def test_verify_pairs_edit_metric_paths_agree():
    import ray.data
    from xpshacl_ray.functions.dedup import verify_pairs_ngram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the quick brown fox", "the quick brown fix",
                          "completely different words"]),
    })
    prs = pa.table({"id_a": pa.array([1, 1], pa.int64()),
                    "id_b": pa.array([2, 3], pa.int64())})
    ds, pd_ = ray.data.from_arrow(docs), ray.data.from_arrow(prs)
    a = sorted(verify_pairs_ngram(ds, pd_, threshold=0.0,
                                  metric="edit_sim").take_all(),
               key=lambda r: r["id_b"])
    b = sorted(verify_pairs_ngram(ds, pd_, threshold=0.0,
                                  metric="edit_sim",
                                  broadcast_limit=0).take_all(),
               key=lambda r: r["id_b"])
    assert a == b  # broadcast vs bucketed-join path
    assert a[0]["edit_sim"] == pytest.approx(1 - 1 / 19)


def test_token_dropout_deterministic_and_nulls():
    import hashlib
    from xpshacl_ray.functions.text import token_dropout
    b = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "text": pa.array(["a b c d e f g h i j", None])})
    out = token_dropout(b, rate_pct=50)
    toks = "a b c d e f g h i j".split()
    kept = [t for i, t in enumerate(toks)
            if int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8],
                   16) % 100 >= 50]
    assert out["text_aug"][0].as_py() == " ".join(kept)
    assert out["n_tokens"][0].as_py() == 10
    assert out["n_dropped"][0].as_py() == 10 - len(kept)
    assert out["text_aug"][1].as_py() is None
    # rate 0 is identity
    out0 = token_dropout(b, rate_pct=0)
    assert out0["text_aug"][0].as_py() == "a b c d e f g h i j"


def test_levenshtein_fuzz_vs_reference_dp():
    import random
    from xpshacl_ray.functions.dedup import levenshtein_distance

    def ref(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            diag, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                diag, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       diag + (a[i - 1] != b[j - 1]))
        return d[len(b)]

    rng = random.Random(1)
    for _ in range(300):
        a = "".join(rng.choice("abcdé") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcdé") for _ in range(rng.randint(0, 12)))
        assert levenshtein_distance(a, b) == ref(a, b), (a, b)
