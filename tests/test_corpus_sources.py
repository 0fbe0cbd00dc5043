"""Multi-format corpus on-ramp: jsonl(.gz)/csv/text/parquet → normalized
documents schema with content-addressed ids."""

import gzip
import pytest
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from xpshacl_ray.sources.corpus import read_text_corpus

DOCS = ["hello world", "ray data engine", "hello world", "third doc"]


def _write_fixtures(tmp_path):
    paths = {}
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps({"body": t, "lang": "en"})
                            for t in DOCS))
    paths["jsonl"] = str(jl)
    gz = tmp_path / "docs.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(json.dumps({"body": t}) for t in DOCS))
    paths["jsonl_gz"] = str(gz)
    cs = tmp_path / "docs.csv"
    cs.write_text("body,lang\n" + "\n".join(f"{t},en" for t in DOCS))
    paths["csv"] = str(cs)
    tx = tmp_path / "docs.txt"
    tx.write_text("\n".join(DOCS))
    paths["text"] = str(tx)
    pqp = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"body": pa.array(DOCS)}), pqp)
    paths["parquet"] = str(pqp)
    return paths


@pytest.mark.slow
def test_all_formats_normalize_identically(tmp_path, ray_session):
    paths = _write_fixtures(tmp_path)
    frames = {}
    for fmt_key, p in paths.items():
        text_col = "text" if fmt_key == "text" else "body"
        ds = read_text_corpus(p, text_col=text_col)
        df = ds.to_pandas().sort_values("text").reset_index(drop=True)
        assert {"doc_id", "text", "n_chars"} <= set(df.columns)
        frames[fmt_key] = df[["doc_id", "text", "n_chars"]]
    base = frames["jsonl"]
    for k, f in frames.items():
        assert f.equals(base), k
    # content-addressed: identical texts share an id; ids are 63-bit
    dup = base[base.text == "hello world"]
    assert dup["doc_id"].nunique() == 1
    assert (base["doc_id"] >= 0).all()
    assert all(n == len(t) for n, t in zip(base["n_chars"], base["text"]))


def test_ids_stable_across_repartition(tmp_path, ray_session):
    paths = _write_fixtures(tmp_path)
    a = read_text_corpus(paths["jsonl"], text_col="body").to_pandas()
    b = read_text_corpus(paths["jsonl"], text_col="body") \
        .repartition(3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_format_inference_and_errors(tmp_path, ray_session):
    import pytest

    with pytest.raises(ValueError, match="cannot infer"):
        read_text_corpus("/tmp/whatever.zzz")
    paths = _write_fixtures(tmp_path)
    with pytest.raises(Exception, match="absent"):  # Ray wraps the ValueError
        read_text_corpus(paths["jsonl"], text_col="nope").to_pandas()
    # explicit format overrides extension
    ds = read_text_corpus(paths["jsonl"], format="jsonl", text_col="body")
    assert ds.count() == 4
