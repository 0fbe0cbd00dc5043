"""Regression tests for the round-2 code-review findings."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import __ray_entry__ as entrymod
from xpshacl_ray.functions.dedup import cluster_labels_distributed
from xpshacl_ray.functions.similarity import train_centroids
from xpshacl_ray.sources.ttl import parse_turtle, validate_ttl
from xpshacl_ray.stages.multimodal import MediaDecoder, make_real_media_table


def test_ttl_numeric_bound_with_absent_predicate(tmp_path):
    # no Person carries hasAge: the MinCount violation must be REPORTED,
    # not crash on a string-null column under a numeric bound
    data = tmp_path / "d.ttl"
    data.write_text("""@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:hasName "A" .
""")
    shapes = tmp_path / "s.ttl"
    shapes.write_text("""@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
    sh:targetClass ex:Person ;
    sh:property [ sh:path ex:hasAge ; sh:minCount 1 ;
                  sh:minInclusive 0 ] .
""")
    viol = validate_ttl(str(data), str(shapes)).to_pandas()
    assert len(viol) == 1
    assert viol["constraint_id"].iloc[0].endswith(
        "MinCountConstraintComponent")


def test_numeric_bound_on_string_column_flags_unparseable():
    # untyped Turtle literals hydrate as strings: non-numeric values under
    # a numeric bound are not comparable -> violation (pyshacl semantics)
    from xpshacl_ray import MinInclusive, ValidationEngine, ValidationSpec

    t = pa.table({"id": [1, 2, 3, 4],
                  "x": ["5", "-2", "abc", None]})
    spec = ValidationSpec(
        constraints=[MinInclusive(column="x", bound=0)],
        id_columns=["id"], focus_template="r:{id}")
    out = ValidationEngine(spec).validate(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["id"]) == [2, 3]  # -2 below bound, abc unparseable


def test_pname_trailing_dot_is_statement_terminator():
    triples, _ = parse_turtle(
        "@prefix ex: <http://example.org/> .\nex:r1 a ex:Person.")
    assert len(triples) == 1
    assert triples[0].o == "http://example.org/Person"


def test_scaled_int_rounds_half_away_and_zeroes_nan():
    x = np.array([1.125, -1.125, float("nan"), 2.0])
    got = entrymod._to_scaled_int(x, 100)
    # DuckDB round(): half away from zero; NULL contributes 0 like SQL SUM
    assert got.tolist() == [113, -113, 0, 200]


def test_cluster_labels_distributed_empty_pairs_fast():
    import pandas as pd

    empty = ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                      "id_b": pd.Series(dtype="int64")}))
    out = cluster_labels_distributed(empty)
    assert out.count() == 0


def test_media_decoder_empty_batch():
    t = make_real_media_table(4).slice(0, 0)
    out = MediaDecoder()(t)
    assert len(out) == 0
    assert out.column_names == ["media_id", "mime", "features"]


def test_train_centroids_without_id_column(sf_dir):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    no_id = emb.select_columns(["embedding"])
    cent = train_centroids(no_id, n_centroids=4, iters=3)
    assert cent.shape[0] == 4
    # deterministic across block layouts
    cent2 = train_centroids(no_id.repartition(7), n_centroids=4, iters=3)
    assert np.allclose(cent, cent2)


def test_run_with_zero_violations_writes_readable_report(tmp_path):
    import pyarrow.dataset as pads

    from xpshacl_ray import MinInclusive, ValidationSpec

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "x": pa.array([5, 6, 7], pa.int64())})
    eng_spec = ValidationSpec(
        constraints=[MinInclusive(column="x", bound=0)],
        id_columns=["id"], focus_template="r:{id}")
    from xpshacl_ray import ValidationEngine

    out = str(tmp_path / "report")
    res = ValidationEngine(eng_spec).run(
        ray.data.from_arrow(t), out_dir=out, save_kg=False)
    assert res["report"].count() == 0
    dset = pads.dataset(out)
    assert dset.count_rows() == 0
    assert "constraint_id" in dset.schema.names


def test_turtle_true_prefix_and_long_literal_edges():
    # 'true'/'false' as prefix names must lex as pnames, not booleans
    triples, prefixes = parse_turtle(
        "@prefix true: <http://example.org/t/> .\n"
        "true:x a true:Thing .")
    assert prefixes["true"] == "http://example.org/t/"
    assert triples[0].s == "http://example.org/t/x"
    # long literal: content with inner quotes, double quotes, escapes
    triples, _ = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        'ex:r ex:p """say "hi" and ""twice"" plus \\"esc\\"\nline2""" .')
    assert triples[0].o == 'say "hi" and ""twice"" plus "esc"\nline2'
    # boolean literals still work as objects
    triples, _ = parse_turtle(
        "@prefix ex: <http://example.org/> .\nex:r ex:flag true .")
    assert triples[0].o == "true"
    assert triples[0].datatype.endswith("boolean")


def test_ttl_mixed_numeric_and_length_facets_on_absent_predicate(tmp_path):
    # minInclusive + maxLength on one absent path: report the MinCount
    # violation, no Arrow kernel crash on the typed-null column
    data = tmp_path / "d.ttl"
    data.write_text("""@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:hasName "A" .
""")
    shapes = tmp_path / "s.ttl"
    shapes.write_text("""@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
    sh:targetClass ex:Person ;
    sh:property [ sh:path ex:hasCode ; sh:minCount 1 ;
                  sh:minInclusive 0 ; sh:maxLength 10 ] .
""")
    viol = validate_ttl(str(data), str(shapes)).to_pandas()
    assert len(viol) == 1
    assert viol["constraint_id"].iloc[0].endswith(
        "MinCountConstraintComponent")


def test_unigram_logprob_emits_zero_token_docs_under_any_partitioning():
    """A block containing ONLY zero-token docs must still emit its rows
    (review finding: output was partition-dependent)."""
    import pandas as pd

    from xpshacl_ray.functions.text import unigram_logprob

    a = pd.DataFrame({"doc_id": [1, 2], "text": ["x x", "x y"]})
    b = pd.DataFrame({"doc_id": [3], "text": [""]})
    ds = ray.data.from_pandas(a).union(ray.data.from_pandas(b))
    got = {r["doc_id"]: r for r in unigram_logprob(ds).take_all()}
    assert set(got) == {1, 2, 3}
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logprob"] == 0.0


def test_quantized_knn_empty_index_returns_empty_frame():
    import pandas as pd

    from xpshacl_ray.functions.similarity import (
        knn_cosine_quantized,
        quantize_embeddings,
    )

    empty = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype=object)}))
    out = knn_cosine_quantized(quantize_embeddings(empty), empty,
                               np.ones(4), k=3, shortlist=5)
    assert out.empty and list(out.columns) == ["vec_id", "cosine", "rank"]


def test_quantized_scan_handles_sliced_fixed_size_list_batches():
    """.flatten() vs .values: a zero-copy Arrow slice must score the
    in-slice vectors, not the parent buffer (review finding)."""
    import pyarrow as pa

    from xpshacl_ray.functions.similarity import (
        knn_cosine_quantized,
        quantize_embeddings,
    )

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 8))
    tbl = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array([list(map(float, v))
                                           for v in mat])})
    full = ray.data.from_arrow(tbl)
    q = mat[3]
    # tiny batch_size forces Ray to slice blocks zero-copy
    qds = quantize_embeddings(full).materialize()
    out = knn_cosine_quantized(qds, full, q, k=5, shortlist=40)
    assert out.iloc[0]["vec_id"] == 3
    assert out.iloc[0]["cosine"] == pytest.approx(1.0)


def test_sample_weighted_empty_batch_ok():
    import pandas as pd

    from xpshacl_ray.functions.sampling import sample_weighted

    df = pd.DataFrame({"id": ["a", "b"], "w": [1.0, 1.0]})
    # union with an empty dataset produces 0-row blocks downstream
    empty = pd.DataFrame({"id": pd.Series([], dtype=object),
                          "w": pd.Series([], dtype="float64")})
    ds = ray.data.from_pandas(df).union(ray.data.from_pandas(empty))
    assert sorted(r["id"] for r in
                  sample_weighted(ds, "id", "w").take_all()) == ["a", "b"]
