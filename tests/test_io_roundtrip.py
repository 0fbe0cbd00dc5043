"""Source-format coverage: JSONL and CSV roundtrips through Ray Data
readers match the Parquet-read truth (schema-compatible, value-equal).

The engine's pipelines read Parquet by design; these prove a user with
JSONL/CSV corpora has a lossless on-ramp (``ray.data.read_json`` /
``read_csv``) into the same operators."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _docs_table():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["hello world", "", "quote\"comma, test", None]),
        "n_chars": pa.array([11, 0, 17, None], pa.int64()),
    })


def test_jsonl_roundtrip(tmp_path):
    t = _docs_table()
    src = ray.data.from_arrow(t)
    out = str(tmp_path / "jsonl")
    src.write_json(out)
    back = (ray.data.read_json(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = t.to_pandas()
    assert list(back["doc_id"]) == list(orig["doc_id"])
    assert list(back["text"].fillna("~")) == list(orig["text"].fillna("~"))
    # null int survives (JSON null -> pandas NaN)
    assert pd.isna(back["n_chars"].iloc[3])


def test_csv_roundtrip(tmp_path):
    t = _docs_table()
    out = str(tmp_path / "csv")
    ray.data.from_arrow(t).write_csv(out)
    back = (ray.data.read_csv(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = t.to_pandas()
    assert list(back["doc_id"]) == list(orig["doc_id"])
    # CSV can't distinguish "" from NULL; quoted content must survive
    assert back["text"].iloc[2] == 'quote"comma, test'
    assert back["n_chars"].iloc[0] == 11 and pd.isna(back["n_chars"].iloc[3])


def test_jsonl_feeds_engine_operator(tmp_path):
    """A JSONL corpus flows into a real operator unchanged."""
    from xpshacl_ray.functions.text import token_count_whitespace

    out = str(tmp_path / "docs")
    ray.data.from_arrow(_docs_table()).write_json(out)
    ds = ray.data.read_json(out)
    got = {r["doc_id"]: r["n_tokens"] for r in ds.map_batches(
        token_count_whitespace, batch_format="pyarrow").take_all()}
    assert got[1] == 2  # "hello world"
