"""Per-partition verdict tests: violations + drift combined per (repo, lang)."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.pipelines.code_files import build_engine
from xpshacl_ray.pipelines.verdicts import (
    VerdictConfig,
    partition_verdicts,
    violation_counts_by_partition,
)
from xpshacl_ray.sources.fixtures import generate_code_files
from xpshacl_ray.stages.stats import StatsConfig, sketch_rows


@pytest.fixture(scope="module")
def code_ds(tmp_path_factory):
    fx = generate_code_files(2000, seed=42)
    d = tmp_path_factory.mktemp("verdicts")
    pq.write_table(fx.table, d / "code.parquet")
    ds = ray.data.read_parquet(str(d / "code.parquet"))
    return ds.map_batches(
        lambda b: b.append_column("content_len",
                                  pc.utf8_length(b["content"])),
        batch_format="pyarrow",
    )


@pytest.fixture(scope="module")
def violations(code_ds):
    eng = build_engine()
    eng.compiled.referential.clear()
    # keep lang on violation rows so partitions are attributable
    eng.compiled.id_columns = ["repo", "lang"]
    return eng.validate(code_ds).materialize()


def test_violation_counts_by_partition(violations):
    counts = violation_counts_by_partition(violations, ["repo", "lang"])
    assert counts["n_violations"].sum() <= violations.count()
    assert (counts["n_violations"] > 0).all()


def test_partition_verdicts_violations_only(violations):
    v = partition_verdicts(
        violations, VerdictConfig(partition_keys=["repo", "lang"]))
    assert set(v["verdict"]) == {"fail"}  # every partition here has defects
    lenient = partition_verdicts(
        violations,
        VerdictConfig(partition_keys=["repo", "lang"],
                      max_violations=10**9))
    assert set(lenient["verdict"]) == {"pass"}


def test_partition_verdicts_with_drift(code_ds, violations):
    cfg = StatsConfig(group_keys=["repo", "lang"],
                      numeric_cols=["content_len"],
                      categorical_cols=["lang"])
    ref = sketch_rows(code_ds, cfg, concurrency=2).to_pandas()
    v = partition_verdicts(
        violations,
        VerdictConfig(partition_keys=["repo", "lang"], max_violations=10**9),
        current_sketches=ref, reference_sketches=ref, stats_cfg=cfg,
    )
    # no drift (self vs self) + violation budget satisfied → pass
    assert set(v["verdict"]) == {"pass"}
    strict = partition_verdicts(
        violations,
        VerdictConfig(partition_keys=["repo", "lang"], max_violations=0),
        current_sketches=ref, reference_sketches=ref, stats_cfg=cfg,
    )
    # same drift result but violation budget exceeded → fail
    assert (strict[strict["n_violations"] > 0]["verdict"] == "fail").all()


def test_funnel_counts_ordering_and_buckets():
    import pandas as pd

    import ray.data

    from xpshacl_ray.stages.window import funnel_counts

    rows = [
        # u1 completes the full ordered funnel
        (1, "2024-01-01 10:00", "view"),
        (1, "2024-01-01 10:05", "click"),
        (1, "2024-01-01 10:10", "purchase"),
        # u2 clicks BEFORE viewing: click doesn't count → depth 1
        (2, "2024-01-01 09:00", "click"),
        (2, "2024-01-01 09:30", "view"),
        # u3 view+click only → depth 2; purchase precedes click
        (3, "2024-01-01 08:00", "view"),
        (3, "2024-01-01 08:10", "purchase"),
        (3, "2024-01-01 08:20", "click"),
        # u4 never views → depth 0
        (4, "2024-01-01 07:00", "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = funnel_counts(ray.data.from_pandas(df),
                        ["view", "click", "purchase"], n_buckets=4)
    assert list(out["step_name"]) == ["view", "click", "purchase"]
    assert list(out["n_users"]) == [3, 2, 1]
