"""Leakage-safe split: near-dup cluster members never straddle the
train/test boundary."""

import hashlib

import __ray_entry__ as entrymod


def test_cluster_members_share_split(sf_dir):
    df = entrymod.q_leakage_safe_split(sf_dir).to_pandas()
    # the whole corpus is assigned, exactly once
    assert df["doc_id"].is_unique and len(df) > 0
    # every cluster is entirely on one side — the leakage property
    assert (df.groupby("cluster")["split"].nunique() == 1).all()
    # at least one non-trivial cluster exists in the fixture corpus
    sizes = df.groupby("cluster").size()
    assert (sizes > 1).any()
    # label is the component minimum: never above the member id
    assert (df["cluster"] <= df["doc_id"]).all()
    # split comes from md5 of the CLUSTER label, not the doc id
    for _, r in df[df["cluster"] != df["doc_id"]].head(5).iterrows():
        h = int(hashlib.md5(str(r["cluster"]).encode())
                .hexdigest()[:8], 16)
        assert r["split"] == ("test" if h % 100 < 20 else "train")
