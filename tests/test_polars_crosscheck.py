"""Second-opinion oracle: cross-check engine results against Polars
implementations (independent of both Ray and the DuckDB oracle, so a
shared blind spot in one comparison can't hide a bug)."""

import polars as pl
import pytest
import ray.data


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_window_hourly_vs_polars(sf):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    got = e.q_window_hourly(sf).sort_values(
        ["event_type", "window_start"]).reset_index(drop=True)
    want = (
        pl.read_parquet(f"{sf}/events.parquet")
        .with_columns(pl.col("ts").dt.truncate("1h").alias("window_start"))
        .group_by(["event_type", "window_start"])
        .agg(n_events=pl.len(), sum_value=pl.col("value").sum().round(2))
        .sort(["event_type", "window_start"])
        .to_pandas()
    )
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (abs(got["sum_value"].to_numpy()
                - want["sum_value"].to_numpy()) < 1e-6).all()


def test_exact_dedup_vs_polars(sf):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    got = e.q_exact_dedup(sf).to_pandas()
    want = (
        pl.read_parquet(f"{sf}/documents.parquet")
        .group_by("text")
        .agg(keep_id=pl.col("doc_id").min(),
             n_dupes=pl.len() - 1)
        .to_pandas()
    )
    assert len(got) == len(want)
    assert sorted(got["keep_id"]) == sorted(want["keep_id"])
    assert got["n_dupes"].sum() == want["n_dupes"].sum()


def test_topk_users_vs_polars(sf):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    got = e.q_topk_users(sf)
    want = (
        pl.read_parquet(f"{sf}/events.parquet")
        .group_by("user_id")
        .agg(total_value=pl.col("value").sum().round(2))
        .sort(["total_value", "user_id"], descending=[True, False])
        .head(10)
        .to_pandas()
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert (abs(got["total_value"].to_numpy()
                - want["total_value"].to_numpy()) < 1e-6).all()


def test_violations_vs_polars(sf):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    got = e.q_violations_documents(sf).to_pandas()
    docs = pl.read_parquet(f"{sf}/documents.parquet")
    n_in = docs.filter(~pl.col("lang").is_in(["de", "en", "fr"])).height
    n_short = docs.filter(pl.col("text").str.len_chars() < 100).height
    n_long = docs.filter(pl.col("text").str.len_chars() > 400).height
    n_range = docs.filter(pl.col("n_chars") < 50).height
    by = got["constraint_id"].str.rsplit("#").str[-1].value_counts()
    assert by.get("InConstraintComponent", 0) == n_in
    assert by.get("MinLengthConstraintComponent", 0) == n_short
    assert by.get("MaxLengthConstraintComponent", 0) == n_long
    assert by.get("MinInclusiveConstraintComponent", 0) == n_range
