"""Join strategy tests: broadcast, bucketed hash join, as-of join."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.functions.joins import asof_join, broadcast_join, hash_join


@pytest.fixture(scope="module")
def orders(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])


@pytest.fixture(scope="module")
def cust_df(sf_dir):
    return pq.read_table(
        f"{sf_dir}/customer.parquet"
    ).select(["c_custkey", "c_mktsegment"]).to_pandas().rename(
        columns={"c_custkey": "o_custkey"})


def test_broadcast_join_matches_pandas(orders, cust_df, sf_dir):
    got = broadcast_join(orders, cust_df, "o_custkey").to_pandas()
    want = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas().merge(
        cust_df, on="o_custkey", how="left")
    g = got.sort_values("o_orderkey").reset_index(drop=True)
    w = want.sort_values("o_orderkey").reset_index(drop=True)
    assert (g["c_mktsegment"] == w["c_mktsegment"]).all()
    assert len(g) == len(w)


def test_broadcast_join_missing_keys_are_null(orders, cust_df):
    sub = cust_df[cust_df["o_custkey"] <= 10]
    got = broadcast_join(orders, sub, "o_custkey").to_pandas()
    hit = got["o_custkey"] <= 10
    assert got.loc[hit, "c_mktsegment"].notna().all()
    assert got.loc[~hit, "c_mktsegment"].isna().all()


def test_hash_join_matches_pandas(orders, cust_df, sf_dir):
    right = ray.data.from_pandas(cust_df)
    got = hash_join(orders, right, "o_custkey", n_buckets=8).to_pandas()
    want = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas().merge(
        cust_df, on="o_custkey", how="inner")
    key = ["o_orderkey"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["c_mktsegment"] == w["c_mktsegment"]).all()


def test_native_join_matches_pandas(orders, cust_df, sf_dir):
    from xpshacl_ray.functions.joins import native_join

    right = ray.data.from_pandas(cust_df)
    got = native_join(orders, right, "o_custkey", num_partitions=8).to_pandas()
    want = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas().merge(
        cust_df, on="o_custkey", how="inner")
    g = got.sort_values("o_orderkey").reset_index(drop=True)
    w = want[got.columns].sort_values("o_orderkey").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["c_mktsegment"] == w["c_mktsegment"]).all()


def test_asof_join_matches_merge_asof(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    purchases = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
    signups = ev[ev.event_type == "signup"][["user_id", "ts"]].assign(
        signup_ts=lambda d: d["ts"])
    want = pd.merge_asof(
        purchases.sort_values("ts"), signups.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    )
    got = asof_join(
        ray.data.from_pandas(purchases),
        ray.data.from_pandas(signups),
        key="user_id", ts="ts", n_buckets=8,
    ).to_pandas()
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    assert len(g) == len(w)
    matched = w["signup_ts"].notna()
    assert (g.loc[matched, "signup_ts"] == w.loc[matched, "signup_ts"]).all()
    assert g.loc[~matched, "signup_ts"].isna().all()


def test_interval_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    pts = pd.DataFrame({"pid": np.arange(400),
                        "x": rng.integers(0, 10_000, 400)})
    s = rng.integers(0, 10_000, 60)
    ivs = pd.DataFrame({"iid": np.arange(60), "s": s,
                        "e": s + rng.integers(0, 2_000, 60)})
    from xpshacl_ray.functions.joins import interval_join

    out = interval_join(ray.data.from_pandas(pts).repartition(4),
                        ray.data.from_pandas(ivs).repartition(3),
                        "x", "s", "e").to_pandas()
    want = pts.merge(ivs, how="cross")
    want = want[(want.x >= want.s) & (want.x <= want.e)]
    assert len(out) == len(want)
    assert set(map(tuple, out[["pid", "iid"]].values)) == \
        set(map(tuple, want[["pid", "iid"]].values))
    # explicit width must give identical pairs (width only repartitions)
    out_w = interval_join(ray.data.from_pandas(pts),
                          ray.data.from_pandas(ivs),
                          "x", "s", "e", bucket_width=100).to_pandas()
    assert set(map(tuple, out_w[["pid", "iid"]].values)) == \
        set(map(tuple, want[["pid", "iid"]].values))


def test_interval_join_timestamps_and_empty(ray_session):
    from xpshacl_ray.functions.joins import interval_join

    pts = pd.DataFrame({"pid": [1, 2],
                        "ts": pd.to_datetime(["2024-01-05", "2024-02-01"])})
    ivs = pd.DataFrame({"iid": [9],
                        "s": pd.to_datetime(["2024-01-01"]),
                        "e": pd.to_datetime(["2024-01-31"])})
    out = interval_join(ray.data.from_pandas(pts),
                        ray.data.from_pandas(ivs),
                        "ts", "s", "e").to_pandas()
    assert list(out["pid"]) == [1] and list(out["iid"]) == [9]
    # inverted interval (e < s) matches nothing; empty intervals side OK
    ivs_bad = pd.DataFrame({"iid": [1], "s": pd.to_datetime(["2024-03-01"]),
                            "e": pd.to_datetime(["2024-01-01"])})
    assert interval_join(ray.data.from_pandas(pts),
                         ray.data.from_pandas(ivs_bad),
                         "ts", "s", "e").count() == 0


def test_asof_forward_matches_duckdb():
    import duckdb

    from xpshacl_ray.functions.joins import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(["2026-01-01 00:00", "2026-01-01 02:00",
                              "2026-01-01 00:30"]),
        "lid": [10, 11, 20],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(["2026-01-01 01:00", "2026-01-01 03:00",
                              "2026-01-01 00:00"]),
        "rts": pd.to_datetime(["2026-01-01 01:00", "2026-01-01 03:00",
                               "2026-01-01 00:00"]),
    })
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right),
                    key="k", ts="ts", direction="forward").to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", left); con.register("r", right)
    want = con.execute("""
        SELECT l.k, l.ts, l.lid, r.rts FROM l
        ASOF LEFT JOIN r ON l.k = r.k AND l.ts <= r.ts
        ORDER BY lid
    """).df()
    assert got["rts"].astype("datetime64[us]").tolist() == \
        want["rts"].astype("datetime64[us]").tolist()
