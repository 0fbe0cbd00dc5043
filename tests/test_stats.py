"""Stats layer tests: one-pass profile, salted merge equivalence, drift."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from xpshacl_ray.stages.stats import (
    DriftThresholds,
    StatsConfig,
    drift_report,
    finalize_stats,
    profile,
    sketch_rows,
)


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


CFG = StatsConfig(
    group_keys=["lang"],
    numeric_cols=["n_chars"],
    categorical_cols=["source"],
    distinct_cols=["doc_id"],
)


def test_profile_counts_match_exact(docs_ds):
    prof = profile(docs_ds, CFG).set_index("lang").sort_index()
    exact = (
        docs_ds.to_pandas()
        .groupby("lang")
        .agg(n=("doc_id", "size"), nulls=("n_chars", lambda s: s.isna().sum()),
             lo=("n_chars", "min"), hi=("n_chars", "max"),
             distinct=("doc_id", "nunique"))
        .sort_index()
    )
    assert (prof["n_rows"] == exact["n"]).all()
    assert (prof["n_chars_nulls"] == exact["nulls"]).all()
    assert (prof["n_chars_min"] == exact["lo"]).all()
    assert (prof["n_chars_max"] == exact["hi"]).all()
    # HLL within 5% (exact at this cardinality it's linear counting)
    rel = (prof["doc_id_distinct_est"] - exact["distinct"]).abs() / exact["distinct"]
    assert (rel < 0.05).all()


def test_profile_quantiles_close(docs_ds):
    prof = profile(docs_ds, CFG).set_index("lang")
    pdf = docs_ds.to_pandas()
    for lang, g in pdf.groupby("lang"):
        true_p50 = g["n_chars"].quantile(0.5)
        est = prof.loc[lang, "n_chars_p50"]
        assert abs(est - true_p50) / true_p50 < 0.1


def test_salted_merge_equals_unsalted(docs_ds):
    plain = sketch_rows(docs_ds, CFG).to_pandas()
    salted_cfg = StatsConfig(**{**CFG.__dict__, "salt_buckets": 4})
    salted = sketch_rows(docs_ds, salted_cfg).to_pandas()
    a = finalize_stats(plain, CFG).set_index("lang").sort_index()
    b = finalize_stats(salted, salted_cfg).set_index("lang").sort_index()
    # counts & null counts identical; sketches register-identical for HLL
    assert (a["n_rows"] == b["n_rows"]).all()
    assert (a["doc_id_distinct_est"] == b["doc_id_distinct_est"]).all()
    # t-digest quantiles within sketch tolerance
    assert np.allclose(a["n_chars_p50"], b["n_chars_p50"], rtol=0.05)


def test_drift_self_passes_shifted_fails(docs_ds):
    ref = sketch_rows(docs_ds, CFG).to_pandas()
    # self vs self → pass
    rep = drift_report(ref, ref, CFG)
    assert (rep["verdict"] == "pass").all()
    # shift n_chars +3x and skew source → fail
    shifted = docs_ds.map_batches(
        lambda df: df.assign(n_chars=df["n_chars"] * 3, source="srcX"),
        batch_format="pandas",
    )
    cur = sketch_rows(shifted, CFG).to_pandas()
    rep2 = drift_report(cur, ref, CFG)
    assert (rep2["verdict"] == "fail").all()
    assert (rep2["n_chars_ks"] > 0.5).all()
    assert (rep2["source_psi"] > 1.0).all()


def test_drift_missing_reference_group_fails(docs_ds):
    ref = sketch_rows(docs_ds, CFG).to_pandas()
    ref_no_en = ref[ref["lang"] != "en"]
    cur = ref[ref["lang"] == "en"]
    rep = drift_report(cur, ref_no_en, CFG)
    assert (rep["verdict"] == "fail").all()
    assert not rep["reference_found"].iloc[0]


def test_estimate_group_count_no_shuffle(docs_ds):
    from xpshacl_ray.stages.grouped import estimate_group_count

    est = estimate_group_count(docs_ds, ["lang"])
    assert abs(est - 5) < 1  # 5 langs, sparse-HLL exact at this cardinality
    est2 = estimate_group_count(docs_ds, ["source", "lang"])
    exact = docs_ds.to_pandas().groupby(["source", "lang"]).ngroups
    assert abs(est2 - exact) / exact < 0.05
