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
