"""Training-data operator tests: text analysis, dedup, similarity, windows,
multimodal plumbing — over the driver-generated sf0.001 tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.functions.dedup import (
    MinHasher,
    cluster_labels,
    embedding_near_dups,
    estimate_jaccard,
    exact_dedup,
    hamming64,
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash_near_dups,
    verify_pairs_ngram,
)
from xpshacl_ray.functions.similarity import (
    ivf_assign,
    knn_cosine_bruteforce,
    knn_cosine_ivf,
    train_centroids,
)
from xpshacl_ray.functions.text import (
    LanguageId,
    QualityScorer,
    Tokenizer,
    md5_fingerprint,
    rolling_fingerprint,
    sha256_column,
    token_count_whitespace,
)
from xpshacl_ray.stages.multimodal import DecodeStub, decode_features, make_fake_media_table
from xpshacl_ray.stages.window import sessionize, tumbling_aggregate


@pytest.fixture(scope="module")
def docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def docs_table(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet")


# --- text ------------------------------------------------------------------


def test_token_count_matches_split(docs_table):
    out = token_count_whitespace(docs_table)
    for t, n in zip(out["text"].to_pylist()[:50], out["n_tokens"].to_pylist()[:50]):
        assert n == len(t.split(" "))


def test_bpeish_tokenizer(docs_table):
    out = Tokenizer()(docs_table.slice(0, 20))
    assert all(n > 0 for n in out["n_bpeish_tokens"].to_pylist())
    t = pa.table({"text": ["a b-c 12 !?", None]})
    got = Tokenizer()(t)["n_bpeish_tokens"].to_pylist()
    assert got == [7, None]  # a, b, -, c, 12, !, ?


def test_language_id_deterministic(docs_table):
    out1 = LanguageId()(docs_table.slice(0, 30))
    out2 = LanguageId()(docs_table.slice(0, 30))
    assert out1["lang_pred"].to_pylist() == out2["lang_pred"].to_pylist()
    t = pa.table({"text": ["the cat and the dog of the house",
                           "der hund und die katze ist ein tier", None]})
    preds = LanguageId()(t)["lang_pred"].to_pylist()
    assert preds[0] == "en" and preds[1] == "de" and preds[2] is None


def test_quality_scorer(docs_table):
    out = QualityScorer()(docs_table.slice(0, 20))
    scores = out["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    t = pa.table({"text": ["!!! ??? ... ###"]})
    assert QualityScorer()(t)["q_punct_ratio"].to_pylist()[0] > 0.5


def test_fingerprints(docs_table):
    out = md5_fingerprint(docs_table.slice(0, 5))
    import hashlib

    for t, f in zip(out["text"].to_pylist(), out["fingerprint_md5"].to_pylist()):
        assert f == hashlib.md5(t.encode()).hexdigest()
    sha = sha256_column(docs_table.slice(0, 3))
    for t, f in zip(sha["text"].to_pylist(), sha["content_sha256"].to_pylist()):
        assert f == hashlib.sha256(t.encode()).hexdigest()
    r = rolling_fingerprint(["abc", "abc", "abd", None])
    assert r[0] == r[1] and r[0] != r[2] and r[3] is None


# --- dedup -----------------------------------------------------------------


def test_exact_dedup_keeps_min_id(docs):
    # append a duplicate of doc 0 with a higher id
    first = docs.take(1)[0]
    dup = dict(first, doc_id=10_000)
    ds = docs.union(ray.data.from_items([dup]))
    out = exact_dedup(ds).to_pandas()
    assert len(out) == docs.count()  # one group per distinct text
    g = out[out.n_dupes > 0]
    assert len(g) == 1
    assert g.iloc[0]["keep_id"] == first["doc_id"]
    assert g.iloc[0]["n_dupes"] == 1


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    c = "completely different content with no overlap whatsoever"
    sab = estimate_jaccard(mh.signature(a), mh.signature(b))
    sac = estimate_jaccard(mh.signature(a), mh.signature(c))
    assert sab > 0.5
    assert sac < 0.2


def test_minhash_lsh_finds_injected_dups(docs):
    rows = docs.take(5)
    near = [dict(r, doc_id=r["doc_id"] + 20_000) for r in rows]  # exact copies
    ds = docs.union(ray.data.from_items(near))
    pairs = minhash_lsh_candidates(ds, jaccard_threshold=0.9).to_pandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    for r in rows:
        assert (r["doc_id"], r["doc_id"] + 20_000) in found
    labels = cluster_labels(list(found))
    for r in rows:
        assert labels[r["doc_id"] + 20_000] == labels[r["doc_id"]]


def test_simhash_near_dups(docs):
    rows = docs.take(3)
    near = [dict(r, doc_id=r["doc_id"] + 30_000) for r in rows]
    ds = docs.union(ray.data.from_items(near))
    pairs = simhash_near_dups(ds, max_hamming=3).to_pandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    for r in rows:
        assert (r["doc_id"], r["doc_id"] + 30_000) in found
    assert hamming64(0b1011, 0b0011) == 1


def test_ngram_jaccard_verification(docs):
    rows = docs.take(2)
    near = [dict(r, doc_id=r["doc_id"] + 40_000) for r in rows]
    ds = docs.union(ray.data.from_items(near))
    cand = minhash_lsh_candidates(ds, jaccard_threshold=0.9)
    verified = verify_pairs_ngram(ds, cand, threshold=0.99).to_pandas()
    assert len(verified) >= 2
    assert (verified["jaccard"] == 1.0).all()
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


# --- similarity ------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_knn_bruteforce_exact(emb, sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in
                    t["embedding"].to_pylist()])
    ids = np.asarray(t["vec_id"])
    q = mat[0]
    got = knn_cosine_bruteforce(emb, q, k=5)
    # numpy oracle
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ (q / np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:5]
    assert got[got.query_idx == 0]["vec_id"].tolist() == ids[order].tolist()
    assert got.iloc[0]["vec_id"] == 0 and got.iloc[0]["cosine"] == pytest.approx(1.0)


def test_knn_ivf_recall(emb, sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in
                    t["embedding"].to_pylist()])
    cent = train_centroids(emb, n_centroids=8, iters=5)
    indexed = ivf_assign(emb, cent)
    q = mat[7]
    exact = set(knn_cosine_bruteforce(emb, q, k=10)["vec_id"])
    approx = set(knn_cosine_ivf(indexed, cent, q, k=10, nprobe=4)["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.5  # nprobe=4 of 8 lists


def test_embedding_near_dups(emb):
    rows = emb.take(3)
    dups = [dict(r, vec_id=r["vec_id"] + 50_000) for r in rows]
    ds = emb.union(ray.data.from_items(dups))
    pairs = embedding_near_dups(ds, threshold=0.999).to_pandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    for r in rows:
        assert (r["vec_id"], r["vec_id"] + 50_000) in found
    assert (pairs.cosine >= 0.999).all()


# --- windows ---------------------------------------------------------------


def test_tumbling_aggregate_matches_pandas(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    got = tumbling_aggregate(ev, ["event_type"], "value", unit="hour").to_pandas()
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    pdf["window_start"] = pdf["ts"].dt.floor("h")
    exact = (
        pdf.groupby(["event_type", "window_start"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    merged = got.merge(exact, on=["event_type", "window_start"],
                       suffixes=("", "_exact"))
    assert len(merged) == len(exact) == len(got)
    assert (merged["n_events"] == merged["n_events_exact"]).all()
    assert np.allclose(merged["sum_value"], merged["sum_value_exact"])


def test_sessionize(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize(ev, "user_id", gap_seconds=3600).to_pandas()
    assert (sessions["session_end"] >= sessions["session_start"]).all()
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    assert sessions["n_events"].sum() == len(pdf)


# --- multimodal ------------------------------------------------------------


def test_multimodal_plumbing():
    t = make_fake_media_table(12)
    ds = ray.data.from_arrow(t)
    feats = decode_features(ds, fake=True, batch_size=4).to_pandas()
    assert len(feats) == 12
    assert all(len(f) == DecodeStub.FEATURE_DIM for f in feats["features"])
    # deterministic: same payload → same features
    again = decode_features(ray.data.from_arrow(t), fake=True).to_pandas()
    a = np.stack([np.asarray(x) for x in feats.sort_values("media_id")["features"]])
    b = np.stack([np.asarray(x) for x in again.sort_values("media_id")["features"]])
    assert np.array_equal(a, b)


def test_multimodal_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)._decode_one(b"bytes")


# --- term DF + stopword scrub ----------------------------------------------


def test_partial_doc_frequency_is_exact_across_batches():
    from xpshacl_ray.functions.text import (
        partial_doc_frequency,
        term_doc_frequency,
    )

    rows = [
        "alpha beta alpha",       # alpha counts ONCE for this doc
        "beta gamma",
        "alpha  beta",            # empty token from double space: dropped
        "delta",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(rows)})
    p = partial_doc_frequency(t)
    got = dict(zip(p["term"].to_pylist(), p["partial_df"].to_pylist()))
    assert got == {"alpha": 2, "beta": 3, "gamma": 1, "delta": 1}

    # split across two single-row-batch datasets: same totals (combiner
    # sums are exact because a doc is one row)
    ds = ray.data.from_arrow(t).repartition(4)
    out = term_doc_frequency(ds, k=10).to_pandas()
    assert dict(zip(out["term"], out["df"])) == got
    # deterministic tie-break: df desc, then term asc
    assert out.iloc[0]["term"] == "beta"
    assert list(out["term"][1:]) == ["alpha", "delta", "gamma"]


def test_remove_stopwords_edge_cases():
    from xpshacl_ray.functions.text import remove_stopwords

    t = pa.table({"text": pa.array(
        ["the cat sat on a  mat", "a a the", "", None, "no stops here"])})
    out = remove_stopwords(t)["text_clean"].to_pylist()
    #  - double space keeps the empty token (SQL list_filter parity)
    #  - all-stopword doc becomes empty string, null stays null
    assert out == ["cat sat on  mat", "", "", None, "no stops here"]


def test_tfidf_top_terms_broadcast_and_join_paths_agree():
    from xpshacl_ray.functions.text import tfidf_top_terms

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["cat cat dog", "dog fish",
                                    "cat fish fish bird"])})
    ds = ray.data.from_arrow(t)
    key = ["doc_id", "rank"]
    bc = tfidf_top_terms(ds, top_k=2).to_pandas().sort_values(
        key).reset_index(drop=True)
    jn = tfidf_top_terms(ds, top_k=2, vocab_broadcast_limit=0,
                         n_buckets=4).to_pandas().sort_values(
        key).reset_index(drop=True)
    assert bc.equals(jn)
    # doc 3's rarest term wins; ties broken by term ascending
    assert bc[bc.doc_id == 3].iloc[0]["term"] == "bird"
    d2 = bc[bc.doc_id == 2]
    assert list(d2["term"]) == ["dog", "fish"]  # equal tfidf → term order
    # tfidf = tf * ln(N/df), float64
    assert abs(bc[bc.doc_id == 1].iloc[0]["tfidf"]
               - 2 * np.log(3 / 2)) < 1e-12


def test_sample_stratified_deterministic_and_rate_bound():
    from xpshacl_ray.functions.sampling import md5_bucket, sample_stratified

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64()),
                  "lang": pa.array((["en"] * 600 + ["de"] * 300
                                    + ["xx"] * 100))})
    ds = ray.data.from_arrow(t)
    out = sample_stratified(ds, "doc_id", "lang",
                            {"en": 50, "de": 10}).to_pandas()
    # exact selection is the md5-bucket rule, stable across repartition
    again = sample_stratified(ds.repartition(8), "doc_id", "lang",
                              {"en": 50, "de": 10}).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
    by_lang = out.groupby("lang").size()
    assert 0.4 < by_lang.get("en", 0) / 600 < 0.6
    assert 0.05 < by_lang.get("de", 0) / 300 < 0.18
    assert by_lang.get("xx", 0) == 0  # default_percent=0 drops the rest
    # membership matches the hash rule row-for-row
    for _, r in out.head(20).iterrows():
        cut = {"en": 50, "de": 10}.get(r["lang"], 0)
        assert md5_bucket([str(r["doc_id"])])[0] < cut


def test_sample_stratified_rejects_fractional_rates_and_drops_null_ids():
    import pytest

    from xpshacl_ray.functions.sampling import sample_stratified

    t = pa.table({"doc_id": pa.array([1, None, 3], pa.int64()),
                  "lang": pa.array(["en", "en", "en"])})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="fraction"):
        sample_stratified(ds, "doc_id", "lang", {"en": 0.5})
    with pytest.raises(ValueError, match="outside"):
        sample_stratified(ds, "doc_id", "lang", {"en": 150})
    out = sample_stratified(ds, "doc_id", "lang", {"en": 100}).to_pandas()
    # NULL id rows drop even at 100% (SQL-oracle parity: md5(NULL)=NULL)
    assert sorted(out["doc_id"]) == [1, 3]


def test_funnel_excludes_null_users():
    import pandas as pd

    from xpshacl_ray.stages.window import funnel_counts

    df = pd.DataFrame({
        "user_id": pd.array([1, None, 2], dtype="Int64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-01"]),
        "event_type": ["view", "view", "view"],
    })
    out = funnel_counts(ray.data.from_pandas(df), ["view"], n_buckets=2)
    assert list(out["n_users"]) == [2]


def test_tfidf_min_df_prunes_rare_terms():
    from xpshacl_ray.functions.text import tfidf_top_terms

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["cat cat dog rareword", "dog fish",
                                    "cat fish fish bird"])})
    ds = ray.data.from_arrow(t)
    full = tfidf_top_terms(ds, top_k=2).to_pandas()
    # rareword (df=1, tf=1 in doc 1) ranks #1 for doc 1 in the full run
    assert full[full.doc_id == 1].iloc[0]["term"] == "rareword"
    pruned = tfidf_top_terms(ds, top_k=2, min_df=2).to_pandas()
    assert "rareword" not in set(pruned["term"])
    assert "bird" not in set(pruned["term"])  # also df=1
    # surviving terms keep the same scores as the unpruned run
    both = full.merge(pruned, on=["doc_id", "term"], suffixes=("", "_p"))
    assert (both["tfidf"] == both["tfidf_p"]).all()


def test_redact_pii_classes_and_counts():
    from xpshacl_ray.functions.text import redact_pii

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "mail a@b.io and c.d+x@e-f.org now",
            "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1",
            None,
            "plain text, no pii at all 1234",
        ],
    })
    out = redact_pii(t).to_pandas()
    assert out.loc[0, "text_redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[0, "pii_email_n"] == 2
    assert out.loc[1, "text_redacted"] == \
        "ssn <SSN> phone <PHONE> ip <IPV4>"
    assert (out.loc[1, ["pii_ssn_n", "pii_phone_n", "pii_ipv4_n"]]
            == 1).all()
    assert out.loc[2, "text_redacted"] is None
    assert out.loc[2, "pii_email_n"] == 0
    assert out.loc[3, "text_redacted"] == out.loc[3, "text"]


def test_redact_pii_ssn_phone_disjoint():
    # a phone (3-3-4) must not be half-eaten by the SSN (3-2-4) pattern
    from xpshacl_ray.functions.text import redact_pii

    t = pa.table({"text": ["call 555-867-5309 or ssn 078-05-1120"]})
    out = redact_pii(t).to_pandas()
    assert out.loc[0, "text_redacted"] == "call <PHONE> or ssn <SSN>"
    assert out.loc[0, "pii_phone_n"] == 1 and out.loc[0, "pii_ssn_n"] == 1


def test_inverted_index_band_filter_broadcast_and_join_paths_agree():
    from xpshacl_ray.functions.text import inverted_index

    docs = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["aa bb cc", "bb cc dd", "cc dd", "cc rare"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)

    def norm(out):
        rows = sorted(out.take_all(), key=lambda r: r["term"])
        return [(r["term"], r["df"], list(r["postings"])) for r in rows]

    # cc appears in every doc (df=4) — max_df=3 prunes it pre-shuffle
    got = norm(inverted_index(ds, max_df=3))
    want = [("aa", 1, [10]), ("bb", 2, [10, 11]),
            ("dd", 2, [11, 12]), ("rare", 1, [13])]
    assert got == want
    # forcing the bucketed-join band filter gives the identical index
    assert norm(inverted_index(ds, max_df=3, vocab_broadcast_limit=0,
                               n_buckets=4)) == want
    # unbanded index includes the hot term with a full posting list
    full = dict((t, (d, p)) for t, d, p in norm(inverted_index(ds)))
    assert full["cc"] == (4, [10, 11, 12, 13])


def test_zscore_outliers_population_stddev_and_degenerate_groups():
    from xpshacl_ray.stages.stats import zscore_outliers

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 2 + ["c"],
        "v": [10.0, 10.0, 10.0, 10.0, 100.0,   # a: one wild outlier
              5.0, 5.0,                        # b: zero spread -> nothing
              7.0],                            # c: single row -> nothing
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = zscore_outliers(ds, "v", ["g"], z_threshold=1.5).take_all()
    assert len(out) == 1 and out[0]["g"] == "a" and out[0]["v"] == 100.0
    # population stddev: mean=28, var=(4*18^2+72^2)/5=1296, sd=36, z=2
    assert abs(out[0]["zscore"] - 2.0) < 1e-12

    # null values never flag and don't poison the group moments
    df2 = pd.DataFrame({"g": ["a"] * 4, "v": [1.0, None, 1.0, 4.0]})
    got = zscore_outliers(ray.data.from_pandas(df2), "v", ["g"],
                          z_threshold=1.0).take_all()
    assert [r["v"] for r in got] == [4.0]


def test_unigram_logprob_matches_hand_computation():
    import math

    from xpshacl_ray.functions.text import unigram_logprob

    # corpus: 'x' appears 3 times, 'y' once -> T=4
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["x x", "x y", ""],
    })).repartition(2)
    got = {r["doc_id"]: r for r in unigram_logprob(ds).take_all()}
    assert got[1]["n_tokens"] == 2
    assert abs(got[1]["avg_logprob"] - math.log(3 / 4)) < 1e-12
    want2 = (math.log(3 / 4) + math.log(1 / 4)) / 2
    assert abs(got[2]["avg_logprob"] - want2) < 1e-12
    # empty doc: emitted with zero tokens (attrition-visible, score 0)
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logprob"] == 0.0


def test_throttle_events_lag_semantics_and_ties():
    from xpshacl_ray.stages.window import throttle_events

    ts = pd.to_datetime([
        "2026-01-01 00:00:00",   # u1/a kept (first)
        "2026-01-01 00:00:30",   # u1/a dropped (<60s after previous)
        "2026-01-01 00:00:50",   # u1/a dropped (lag vs PREVIOUS, not
                                 #   previous-KEPT: 20s < 60s)
        "2026-01-01 00:02:00",   # u1/a kept (70s gap)
        "2026-01-01 00:00:10",   # u1/b kept (different type)
        "2026-01-01 00:00:00",   # u2/a kept (tie ts, lower id first)
        "2026-01-01 00:00:00",   # u2/a dropped (0s gap, id tie-break)
    ])
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 1, 1, 2, 2],
        "event_type": ["a", "a", "a", "a", "b", "a", "a"],
        "ts": ts,
    })
    out = throttle_events(ray.data.from_pandas(df).repartition(3),
                          ["user_id", "event_type"], ts_col="ts",
                          min_gap_seconds=60.0, tie_col="event_id")
    kept = sorted(r["event_id"] for r in out.take_all())
    assert kept == [1, 4, 5, 6]


def test_normalize_text_kernels():
    from xpshacl_ray.functions.text import normalize_text

    t = pa.table({"text": ["  a\t\tb\x01c  ", "é", None, "", "x"]})
    out = normalize_text(t)["text_norm"].to_pylist()
    assert out[0] == "a b c"
    assert out[1] == "é"        # NFC composes e + combining acute
    assert out[2] is None and out[3] == "" and out[4] == "x"
    low = normalize_text(t, lowercase=True)["text_norm"].to_pylist()
    assert low[4] == "x"


def test_feature_hash_matches_md5_and_sums_collisions():
    import hashlib

    from xpshacl_ray.functions.text import feature_hash

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["a a b", "b"]}))
    rows = feature_hash(ds, n_buckets=4).take_all()
    def bkt(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4
    got = {(r["doc_id"], r["bucket"]): r["count"] for r in rows}
    ba, bb = bkt("a"), bkt("b")
    if ba == bb:
        assert got[(1, ba)] == 3       # collision sums
    else:
        assert got[(1, ba)] == 2 and got[(1, bb)] == 1
    assert got[(2, bb)] == 1


def test_quantized_knn_recall_vs_exact(sf_dir):
    from xpshacl_ray.functions.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_quantized,
        quantize_embeddings,
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    q0 = np.asarray(emb.take(1)[0]["embedding"], dtype=np.float64)
    exact = knn_cosine_bruteforce(emb, q0, k=10)
    qds = quantize_embeddings(emb)
    # int8 payload is 1 byte/dim in the Arrow schema
    qtype = dict(zip(qds.schema().names, qds.schema().types))["q"]
    assert pa.types.is_fixed_size_list(qtype)
    assert qtype.value_type == pa.int8()
    got = knn_cosine_quantized(qds, emb, q0, k=10, shortlist=50)
    # rerank is exact-precision: top-10 matches the float scan exactly
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(got["cosine"].to_numpy(),
                       exact["cosine"].to_numpy(), atol=1e-12)


def test_tumbling_distinct_counts_exactly():
    from xpshacl_ray.stages.window import tumbling_distinct

    ts = pd.to_datetime(["2026-01-01 10:05", "2026-01-01 10:55",
                         "2026-01-01 10:30", "2026-01-01 11:05",
                         "2026-01-01 10:10"])
    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b"],
        "ts": ts,
        "u": [1, 1, 2, 1, None],   # a@10h: users {1,2}; a@11h: {1};
    })                             # b@10h: null only -> dropped
    out = tumbling_distinct(ray.data.from_pandas(df).repartition(3),
                            ["k"], "u").take_all()
    got = {(r["k"], pd.Timestamp(r["window_start"]).hour): r["n_distinct"]
           for r in out}
    assert got == {("a", 10): 2, ("a", 11): 1}


def test_percentile_rank_multi_group_and_ties():
    from xpshacl_ray.stages.stats import percentile_rank

    df = pd.DataFrame({
        "g": ["x"] * 4 + ["y"],
        "v": [10, 10, 20, 30, 7],   # x: ranks 0,0,2/3,1; y singleton -> 0
    })
    out = percentile_rank(ray.data.from_pandas(df).repartition(2),
                          "v", ["g"]).take_all()
    got = sorted((r["g"], r["v"], round(r["pct_rank"], 6)) for r in out)
    assert got == [("x", 10, 0.0), ("x", 10, 0.0),
                   ("x", 20, round(2 / 3, 6)), ("x", 30, 1.0),
                   ("y", 7, 0.0)]


def test_filter_badwords_token_semantics():
    from xpshacl_ray.functions.text import filter_badwords

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["clean words here",
                 "contains BAD token",     # case-insensitive match
                 "badly is not bad-token", # substrings don't match
                 None,                     # null kept
                 "bad bad bad"],
    }))
    kept = sorted(r["doc_id"] for r in
                  filter_badwords(ds, ["bad"]).take_all())
    assert kept == [1, 3, 4]
    # max_hits tolerance
    kept2 = sorted(r["doc_id"] for r in
                   filter_badwords(ds, ["bad"], max_hits=1).take_all())
    assert kept2 == [1, 2, 3, 4]


def test_corpus_diff_content_not_id_based():
    from xpshacl_ray.functions.dedup import corpus_diff

    a = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha", "beta", "gamma", None],
    }))
    # previous snapshot holds the SAME content under different ids
    b = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [99, 98],
        "text": ["alpha", "delta"],
    }))
    new = sorted(r["doc_id"] for r in corpus_diff(a, b).take_all())
    # 'alpha' is old content (id differs — still old); null text is new
    assert new == [2, 3, 4]
    with pytest.raises(ValueError):
        corpus_diff(a, b, broadcast_limit=0)
