"""The north-star operational loop, end-to-end: daily shard arrivals →
delta validation (only new/changed shards recompute) → incremental
reference-profile maintenance (sketch merge, no history re-scan) →
per-partition drift verdicts for the new day."""

import pytest

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from xpshacl_ray import MinInclusive, Required, ValidationEngine, ValidationSpec
from xpshacl_ray.stages.stats import (
    StatsConfig,
    drift_report,
    merge_sketch_tables,
    sketch_rows,
)


def _shard(path, ids, lang, mean_len, seed):
    rng = np.random.default_rng(seed)
    n = len(ids)
    lens = rng.normal(mean_len, 10, n).clip(10, None).astype("int64")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array([lang] * n, pa.string()),
        "n_chars": pa.array(lens),
    }), path)


def _engine():
    return ValidationEngine(ValidationSpec(
        constraints=[Required(column="lang"),
                     MinInclusive(column="n_chars", bound=20)],
        id_columns=["doc_id"], focus_template="doc:{doc_id}"))


@pytest.mark.slow
def test_daily_ops_loop(tmp_path):
    cfg = StatsConfig(group_keys=["lang"], numeric_cols=["n_chars"])
    out = str(tmp_path / "out")

    # --- day 1: two shards arrive
    s1 = str(tmp_path / "day1_en.parquet")
    s2 = str(tmp_path / "day1_de.parquet")
    _shard(s1, range(0, 300), "en", 100, 1)
    _shard(s2, range(300, 600), "de", 100, 2)
    eng = _engine()
    r1 = eng.validate_delta([s1, s2], out)
    assert len(r1["ran"]) == 2
    ref = sketch_rows(ray.data.read_parquet([s1, s2]), cfg,
                      concurrency=2).to_pandas()

    # --- day 2: one new shard (same distribution) + one drifted shard
    s3 = str(tmp_path / "day2_en.parquet")
    s4 = str(tmp_path / "day2_fr.parquet")
    _shard(s3, range(600, 900), "en", 102, 3)     # healthy
    _shard(s4, range(900, 1200), "fr", 100, 4)    # new partition (no ref)
    r2 = eng.validate_delta([s1, s2, s3, s4], out)
    # ONLY the new shards recompute; day-1 work is reused
    assert sorted(len(x) for x in (r2["ran"], r2["skipped"])) == [2, 2]

    today = sketch_rows(ray.data.read_parquet([s3, s4]), cfg,
                        concurrency=2).to_pandas()
    drift = drift_report(today, ref, cfg).set_index("lang")
    assert drift.loc["en", "verdict"] == "pass"      # same distribution
    assert drift.loc["fr", "verdict"] == "fail"      # no reference yet
    assert not drift.loc["fr", "reference_found"]

    # fold today into the rolling reference — NO re-scan of day 1
    ref = merge_sketch_tables([ref, today], cfg)
    assert set(ref["lang"]) == {"en", "de", "fr"}

    # --- day 3: a drifted en shard is caught against the rolling reference
    s5 = str(tmp_path / "day3_en.parquet")
    _shard(s5, range(1200, 1500), "en", 160, 5)      # mean shifted 100→160
    day3 = sketch_rows(ray.data.read_parquet([s5]), cfg,
                       concurrency=2).to_pandas()
    drift3 = drift_report(day3, ref, cfg).set_index("lang")
    assert drift3.loc["en", "verdict"] == "fail"
    assert drift3.loc["en", "n_chars_ks"] > 0.2

    # violations output stays queryable and schema-stable even when every
    # shard conforms (zero-row partitions write an empty parquet with the
    # violations schema — read via pyarrow: Ray's to_pandas drops columns
    # on fully-empty datasets)
    import pyarrow.dataset as pads

    dset = pads.dataset(r2["data_dir"])
    assert {"doc_id", "constraint_id", "message"} <= set(
        dset.schema.names)
    assert dset.count_rows() == 0  # all shards conform in this fixture
