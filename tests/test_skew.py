"""Skew handling: the megarepo fixture (~30% of rows in one repo) profiled
with salted two-level merge must agree with the unsalted profile — the
mergeable-sketch property that makes salting safe (SURVEY.md §4)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from xpshacl_ray.sources.fixtures import generate_code_files
from xpshacl_ray.stages.stats import StatsConfig, finalize_stats, sketch_rows


@pytest.fixture(scope="module")
def skewed_ds():
    fx = generate_code_files(3000, seed=42, skew_megarepo=True)
    t = fx.table.append_column(
        "content_len", pc.utf8_length(fx.table["content"]))
    return ray.data.from_arrow(t)


def _cfg(salt):
    return StatsConfig(group_keys=["repo", "lang"],
                       numeric_cols=["content_len"],
                       categorical_cols=["lang"],
                       distinct_cols=["path"],
                       salt_buckets=salt)


def test_megarepo_skew_exists(skewed_ds):
    counts = skewed_ds.to_pandas()["repo"].value_counts()
    assert counts.iloc[0] / counts.sum() > 0.25
    assert counts.index[0] == "org0/megarepo"


def test_salted_profile_matches_unsalted_on_skew(skewed_ds):
    plain = finalize_stats(
        sketch_rows(skewed_ds, _cfg(0), concurrency=2).to_pandas(), _cfg(0)
    ).set_index(["repo", "lang"]).sort_index()
    salted = finalize_stats(
        sketch_rows(skewed_ds, _cfg(8), concurrency=2).to_pandas(), _cfg(8)
    ).set_index(["repo", "lang"]).sort_index()
    assert plain.index.equals(salted.index)
    # counts / nulls / min / max / HLL are merge-exact under salting
    for col in ["n_rows", "content_len_nulls", "content_len_min",
                "content_len_max", "path_distinct_est"]:
        assert (plain[col] == salted[col]).all(), col
    # t-digest quantiles agree within sketch tolerance
    assert np.allclose(plain["content_len_p50"], salted["content_len_p50"],
                       rtol=0.05)
    # sanity: the megarepo group really is the heavy one
    heavy = plain.loc[("org0/megarepo",)].n_rows.sum()
    assert heavy > 0.25 * plain["n_rows"].sum()


def test_funnel_hot_user_completes_and_counts_once():
    import numpy as np
    import pandas as pd

    from xpshacl_ray.stages.window import funnel_counts

    # one user owns 30k events (every type, shuffled order) + 50 normal
    # users: the hot user's rows all land in ONE bucket (documented
    # partitioning bound) — the per-bucket evaluation is vectorized, so
    # this must complete quickly and count the hot user exactly once
    rng = np.random.default_rng(9)
    n_hot = 30_000
    hot = pd.DataFrame({
        "user_id": np.full(n_hot, 777, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.permutation(n_hot), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], n_hot),
    })
    normal = pd.DataFrame({
        "user_id": np.arange(50, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01"),
        "event_type": ["view"] * 50,
    })
    df = pd.concat([hot, normal], ignore_index=True)
    out = funnel_counts(ray.data.from_pandas(df),
                        ["view", "click", "purchase"], n_buckets=8)
    assert list(out["n_users"])[0] == 51          # everyone viewed
    assert list(out["n_users"])[2] == 1           # only the hot user
