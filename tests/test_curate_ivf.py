"""Curation pipeline + persisted IVF index + new constraint aliases."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray import LanguageIn, NodeKind, UniqueLang, ValidationEngine, ValidationSpec
from xpshacl_ray.functions.similarity import (
    ivf_assign,
    knn_cosine_bruteforce,
    knn_cosine_ivf_persisted,
    persist_ivf_index,
    train_centroids,
)
from xpshacl_ray.pipelines.curate import CurationConfig, curate


@pytest.mark.slow
def test_curate_pipeline(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    # inject exact + near dupes
    rows = docs.take(4)
    dupes = [dict(r, doc_id=r["doc_id"] + 70_000) for r in rows]
    ds = docs.union(ray.data.from_items(dupes))
    curated, report = curate(
        ds,
        CurationConfig(allowed_langs=["en", "de", "fr", "es", "zh"],
                       min_quality=0.0, near_dup_jaccard=0.95),
    )
    assert report.n_input == 504
    assert report.dropped_exact_dupes == 4  # the injected exact copies
    assert report.n_after_near_dedup == report.n_after_exact_dedup - \
        report.dropped_near_dupes
    # survivors keep the lower id
    ids = set(r["doc_id"] for r in curated.select_columns(["doc_id"]).take_all())
    for r in rows:
        assert r["doc_id"] in ids
        assert r["doc_id"] + 70_000 not in ids
    # attrition accounting is complete (no silent caps)
    assert (report.n_input - report.dropped_low_quality_or_lang
            - report.dropped_exact_dupes - report.dropped_near_dupes
            ) == report.n_after_near_dedup


@pytest.mark.slow
def test_curate_join_strategy_matches_broadcast(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    rows = docs.take(3)
    dupes = [dict(r, doc_id=r["doc_id"] + 80_000) for r in rows]
    ds = docs.union(ray.data.from_items(dupes))
    cfg_b = CurationConfig(min_quality=0.0)
    cfg_j = CurationConfig(min_quality=0.0, dedup_strategy="join")
    out_b, rep_b = curate(ds, cfg_b)
    out_j, rep_j = curate(ds, cfg_j)
    ids_b = sorted(r["doc_id"] for r in out_b.select_columns(["doc_id"]).take_all())
    ids_j = sorted(r["doc_id"] for r in out_j.select_columns(["doc_id"]).take_all())
    assert ids_b == ids_j
    assert rep_b.dropped_exact_dupes == rep_j.dropped_exact_dupes == 3


@pytest.mark.slow
def test_curate_near_dup_anti_join_matches_broadcast(sf_dir):
    # near-dup prune via the no-broadcast anti-join path (strategy=join)
    # must keep exactly the same survivor set as the broadcast path
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    rows = docs.take(4)
    dupes = [dict(r, doc_id=r["doc_id"] + 90_000) for r in rows]
    ds = docs.union(ray.data.from_items(dupes))
    cfg_b = CurationConfig(min_quality=0.0, near_dup_jaccard=0.95)
    cfg_j = CurationConfig(min_quality=0.0, near_dup_jaccard=0.95,
                           dedup_strategy="join")
    out_b, rep_b = curate(ds, cfg_b)
    out_j, rep_j = curate(ds, cfg_j)
    ids_b = sorted(r["doc_id"] for r in
                   out_b.select_columns(["doc_id"]).take_all())
    ids_j = sorted(r["doc_id"] for r in
                   out_j.select_columns(["doc_id"]).take_all())
    assert ids_b == ids_j
    assert rep_b.n_after_near_dedup == rep_j.n_after_near_dedup
    # schema/dtypes survive the mixed-schema anti-join buckets
    sch = dict(zip(out_j.schema().names, out_j.schema().types))
    assert str(sch["doc_id"]) == "int64"


def test_curate_lang_filter(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    curated, report = curate(
        docs, CurationConfig(allowed_langs=["en"], min_quality=0.0))
    langs = {r["lang"] for r in curated.select_columns(["lang"]).take_all()}
    assert langs == {"en"}
    assert report.dropped_low_quality_or_lang > 0


def test_ivf_persisted_index(sf_dir, tmp_path):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    cent = train_centroids(emb, n_centroids=8, iters=5)
    indexed = ivf_assign(emb, cent)
    d = persist_ivf_index(indexed, cent, str(tmp_path / "ivf"))
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(t["embedding"].to_pylist()[3], dtype=np.float64)
    got = knn_cosine_ivf_persisted(d, q, k=10, nprobe=8)  # all lists = exact
    exact = knn_cosine_bruteforce(emb, q, k=10)
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()
    # pruned probe reads fewer partitions but still finds the query itself
    pruned = knn_cosine_ivf_persisted(d, q, k=3, nprobe=2)
    assert 3 in pruned["vec_id"].tolist()


def test_unique_lang_grouped(sf_dir):
    t = pa.table(
        {
            "k": [1, 1, 1, 2, 2],
            "lang": ["en", "en", "de", "en", "fr"],
            "v": ["a", "b", "c", "d", "e"],
        }
    )
    ds = ray.data.from_arrow(t)
    spec = ValidationSpec(
        constraints=[UniqueLang(column="v", group_by=["k"],
                                lang_column="lang")],
        id_columns=[],
        focus_template="g:{k}",
    )
    viol = ValidationEngine(spec).validate(ds).take_all()
    # only group k=1 has two 'en' values
    assert len(viol) == 1
    assert viol[0]["focus_node"] == "group:1/en"
    assert "UniqueLangConstraintComponent" in viol[0]["constraint_id"]


def test_nodekind_languagein_row_local(sf_dir):
    t = pa.table({"commit": ["a" * 40, "BAD", None],
                  "lang": ["en", "xx", None], "id": [1, 2, 3]})
    spec = ValidationSpec(
        constraints=[
            NodeKind(column="commit", pattern="^[0-9a-f]{40}$",
                     kind="CommitHash"),
            LanguageIn(column="lang", allowed=["en", "de"]),
        ],
        id_columns=["id"],
        focus_template="r:{id}",
    )
    viol = ValidationEngine(spec).validate(
        ray.data.from_arrow(t)).take_all()
    comps = sorted(v["constraint_id"].rsplit("#")[-1] for v in viol)
    assert comps == ["LanguageInConstraintComponent",
                     "NodeKindConstraintComponent"]
    types = {v["constraint_id"].rsplit("#")[-1]: v["violation_type"]
             for v in viol}
    assert types["NodeKindConstraintComponent"] == "value_type"
    assert types["LanguageInConstraintComponent"] == "other"


def test_distributed_kmeans_matches_independent_numpy_and_is_layout_stable():
    import sys

    import numpy as np

    from xpshacl_ray.functions.similarity import kmeans_assign, kmeans_fit

    sys.path.insert(0, "/root/repo/tools")
    from make_goldens import kmeans_clusters_golden

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = ray.data.read_parquet(emb_path)
    cents = kmeans_fit(emb, k=8, iters=5)
    got = kmeans_assign(emb, cents).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    want = kmeans_clusters_golden(emb_path, k=8, iters=5)
    assert list(got["cluster"]) == list(want["cluster"])
    assert np.allclose(got["cosine"], want["cosine"], atol=1e-6)
    # block layout must not change the result (sums merge via np.add.at
    # per batch + driver reduce; seeds are md5-deterministic)
    cents2 = kmeans_fit(emb.repartition(7), k=8, iters=5)
    assert np.abs(cents - cents2).max() < 1e-12


def test_kmeans_groupby_reduce_agrees_with_driver_reduce():
    import numpy as np

    from xpshacl_ray.functions.similarity import kmeans_fit

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet").repartition(5)
    a = kmeans_fit(emb, k=4, iters=3, reduce="driver")
    b = kmeans_fit(emb, k=4, iters=3, reduce="groupby")
    # same algorithm, different float-sum order: near-identical centroids
    assert np.abs(a - b).max() < 1e-9
