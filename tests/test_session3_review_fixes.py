"""Regression tests for the session-3 inline code-review findings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def test_histogram_all_null_block_survives():
    from xpshacl_ray.functions.analytics import histogram
    t = pa.table({"x": pa.array([None, None, 5.0, None], pa.float64())})
    # repartition(4) guarantees at least one all-NULL / empty block
    out = histogram(ray.data.from_arrow(t).repartition(4), "x",
                    width=1.0).take_all()
    assert len(out) == 1 and out[0]["bin"] == 5 and out[0]["n"] == 1


def test_bigram_logprob_string_ids():
    from xpshacl_ray.functions.text import bigram_logprob
    t = pa.table({"doc_id": pa.array(["doc-a", "doc-b"]),
                  "text": pa.array(["x y x y", "x y"])})
    out = {r["doc_id"]: r for r in bigram_logprob(
        ray.data.from_arrow(t)).take_all()}
    assert out["doc-a"]["n_bigrams"] == 3
    assert out["doc-b"]["n_bigrams"] == 1


def test_keyness_int_key_schema_stable():
    from xpshacl_ray.functions.text import keyness_by_key
    # int64 shard key + many partitions so some scoring batches filter
    # to zero rows: the empty block must keep the int64 key type
    t = pa.table({
        "shard": pa.array([1, 2] * 4, pa.int64()),
        "text": pa.array(["x x x x x x y y", "y y y y y y x x"] * 4),
    })
    out = keyness_by_key(ray.data.from_arrow(t).repartition(6),
                         key_col="shard", min_count=5).take_all()
    assert {r["shard"] for r in out} == {1, 2}


def test_verify_pairs_null_text_paths_agree():
    from xpshacl_ray.functions.dedup import verify_pairs_ngram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", None, "a b c"]),
    })
    prs = pa.table({"id_a": pa.array([1, 1], pa.int64()),
                    "id_b": pa.array([2, 3], pa.int64())})
    ds, p = ray.data.from_arrow(docs), ray.data.from_arrow(prs)
    for metric in ("jaccard", "edit_sim"):
        a = sorted(verify_pairs_ngram(ds, p, threshold=0.0,
                                      metric=metric).take_all(),
                   key=lambda r: r["id_b"])
        b = sorted(verify_pairs_ngram(ds, p, threshold=0.0,
                                      metric=metric,
                                      broadcast_limit=0).take_all(),
                   key=lambda r: r["id_b"])
        # NULL-text pair scored (as empty text) by BOTH paths
        assert len(a) == len(b) == 2, metric
        assert a == b, metric


def test_kfold_and_budget_reject_null_ids():
    from xpshacl_ray.functions.compaction import budget_sample, kfold_assign
    t = pa.table({"doc_id": pa.array([1, None], pa.int64()),
                  "cost": pa.array([5, 5], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        kfold_assign(ray.data.from_arrow(t), "doc_id").take_all()
    with pytest.raises(Exception, match="NULL"):
        budget_sample(ray.data.from_arrow(t), "doc_id", "cost",
                      budget=100)


def test_pivot_rejects_null_keys():
    from xpshacl_ray.functions.analytics import pivot_counts
    t = pa.table({"r": pa.array(["a", None]), "c": pa.array(["x", "x"])})
    with pytest.raises(ValueError, match="NULL"):
        pivot_counts(ray.data.from_arrow(t), "r", "c")


def test_flag_late_events_watermark():
    from xpshacl_ray.stages.window import flag_late_events
    # arrival a,b,c,d; ts: 100, 250, 50 (200s late), 240 (10s late)
    t = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "arr": pa.array(["a", "b", "c", "d"]),
        "ts": pa.array(
            pd.to_datetime([100, 250, 50, 240], unit="s")),
    })
    out = {r["arr"]: r for r in flag_late_events(
        ray.data.from_arrow(t).repartition(2), ["k"], ts_col="ts",
        arrival_col="arr", max_lateness_seconds=60.0).take_all()}
    assert out["a"]["is_late"] is False and out["a"]["lateness_sec"] == 0
    assert out["b"]["is_late"] is False
    assert out["c"]["is_late"] is True and out["c"]["lateness_sec"] == 200
    assert out["d"]["is_late"] is False and out["d"]["lateness_sec"] == 10


def test_ohlc_merges_across_batches():
    from xpshacl_ray.stages.window import ohlc
    # one user, one hour, events scattered over 4 partitions so open/
    # close must come from DIFFERENT partial rows; a ts tie at the close
    # is broken by event_id
    ts = pd.to_datetime([3600 + 10, 3600 + 5, 3600 + 50, 3600 + 50],
                        unit="s")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "value": pa.array([10.0, 20.0, 30.0, 40.0]),
    })
    out = ohlc(ray.data.from_arrow(t).repartition(4), ["user_id"],
               window_seconds=3600).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["open"] == 20.0   # earliest ts (3605)
    assert r["close"] == 40.0  # ts tie at 3650 -> larger event_id wins
    assert r["lo"] == 10.0 and r["hi"] == 40.0 and r["n"] == 4
    assert str(r["window_start"]).startswith("1970-01-01 01:00:00")


def test_ohlc_rejects_null_order_columns():
    from xpshacl_ray.stages.window import ohlc
    t = pa.table({"event_id": pa.array([1], pa.int64()),
                  "ts": pa.array(pd.to_datetime([None])),
                  "user_id": pa.array([1], pa.int64()),
                  "value": pa.array([1.0])})
    with pytest.raises(Exception, match="NULL"):
        ohlc(ray.data.from_arrow(t), ["user_id"]).take_all()
