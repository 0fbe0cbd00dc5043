"""Conformance harness (S6/S7/§3.3) + context-retriever (X1-X5) parity tests."""

import os

import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.context import (
    ContextRetriever,
    DomainRule,
    rules_for_column,
    shape_documentation,
    similar_cases,
)
from xpshacl_ray.pipelines.code_files import build_engine
from xpshacl_ray.pipelines.harness import message_histogram, run_conformance_harness
from xpshacl_ray.sources.fixtures import generate_code_files
from xpshacl_ray.sources.http import UrlFetcher, read_urls
from xpshacl_ray.sources.ingest import read_code_table


# --- context retriever (reference format pinning,
#     tests/test_context_retriever.py:57-154) --------------------------------


def test_domain_rule_render_formats():
    # exact `Rule <uri> (label): comment` format (:114-119)
    full = DomainRule("http://x.org/rule1", "lang", "Rule One Label",
                      "Rule 1 description")
    assert full.render() == "Rule <http://x.org/rule1> (Rule One Label): Rule 1 description"
    label_only = DomainRule("http://x.org/r2", "lang", "L", None)
    assert label_only.render() == "Rule <http://x.org/r2> (L)"
    bare = DomainRule("http://x.org/r3", "lang", None, None)
    assert bare.render() == "Rule <http://x.org/r3>: Applies to this property."
    comment_only = DomainRule("http://x.org/r4", "lang", None, "C")
    assert comment_only.render() == "Rule <http://x.org/r4>: C"


def test_rules_filtered_by_column():
    rules = [DomainRule("r1", "lang"), DomainRule("r2", "path")]
    assert len(rules_for_column(rules, "lang")) == 1
    assert rules_for_column(rules, None) == []


def test_shape_documentation_format():
    # "Shape Name: X" format (:79-83)
    docs = shape_documentation("A comment", "MyShape")
    assert docs == ["A comment", "Shape Name: MyShape"]
    assert shape_documentation(None, None) == []


def test_retriever_bundles_domain_context():
    r = ContextRetriever(
        rules=[DomainRule("http://x.org/rule1", "lang", "L", "C")],
        spec_docs={"abc": {"name": "LangShape", "description": "desc"}},
    )
    ctx = r.retrieve(
        {
            "doc_id": 7,
            "focus_node": "doc:7",
            "property_path": "lang",
            "value": "xx",
            "signature_key": "abc",
            "shape_id": "s", "constraint_id": "c", "violation_type": "other",
            "message": "m", "severity": "V", "context": "{}",
            "signature": "sig",
        }
    )
    assert ctx.domain_rules == ["Rule <http://x.org/rule1> (L): C"]
    assert ctx.shape_documentation == ["desc", "Shape Name: LangShape"]
    assert any("doc:7" in f and '"xx"' in f for f in ctx.ontology_fragments)
    assert ctx.to_json().startswith("{")


def test_similar_cases_bounded(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    # no nulls in documents → empty similar-cases list, no error
    out = similar_cases(docs, "lang", k=3)
    assert out == []


# --- conformance harness ----------------------------------------------------


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("harness")
    out = {}
    for i in range(2):
        fx = generate_code_files(200, seed=50 + i)
        p = str(d / f"s{i}.parquet")
        pq.write_table(fx.table, p)
        out[f"s{i}"] = [p]
    # a clean shard (constraints won't fire): only valid rows
    fx = generate_code_files(50, seed=99)
    clean = fx.table.slice(0, 5)
    p = str(d / "broken.parquet")
    pq.write_table(clean.select(["repo", "path"]), p)  # missing columns
    out["broken"] = [p]
    return out


def test_harness_verdicts_and_csv(shards, tmp_path):
    eng = build_engine()
    # drop referential (needs the commits dim) for the harness test
    eng.compiled.referential.clear()
    csv = str(tmp_path / "results.csv")
    verdicts = run_conformance_harness(
        shards, eng, out_csv=csv,
        reader=lambda files: read_code_table(files),
    )
    by_name = {v.shard: v for v in verdicts}
    assert not by_name["s0"].conforms
    assert by_name["s0"].n_violations > 0
    assert sum(by_name["s0"].message_histogram.values()) == by_name["s0"].n_violations
    # count-and-continue: the broken shard is an error row, not an abort
    assert by_name["broken"].error is not None
    assert os.path.exists(csv)
    with open(csv) as f:
        header = f.readline().strip()
    assert header == "shard;size;test;fail"


def test_message_histogram_is_g9_aggregate(shards):
    eng = build_engine()
    eng.compiled.referential.clear()
    ds = read_code_table(shards["s0"])
    viol = eng.validate(ds)
    hist = message_histogram(viol)
    assert sum(hist.values()) == viol.count()
    assert all(isinstance(k, str) and v > 0 for k, v in hist.items())


# --- HTTP source stub -------------------------------------------------------


def test_url_fetcher_error_rows_inband():
    def fake_fetch(url):
        if "bad" in url:
            raise IOError("boom")
        return b"payload:" + url.encode()

    ds = read_urls(["http://a.example/x", "http://bad.example/y"],
                   fetch_fn=fake_fetch)
    rows = {r["url"]: r for r in ds.take_all()}
    assert rows["http://a.example/x"]["status"] == 200
    assert rows["http://a.example/x"]["payload"].startswith(b"payload:")
    assert rows["http://bad.example/y"]["status"] == -1
    assert "boom" in rows["http://bad.example/y"]["error"]
