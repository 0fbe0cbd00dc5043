"""End-to-end reference-parity test on the seeded code_files fixture.

SURVEY.md §5(d): deterministic synthetic code table → full pipeline →
assert exact per-kind violation counts against the injection sidecar and
the per-row ``content`` sha256 invariant against an independent oracle
(BASELINE.json per-row invariant).
"""

import collections

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.pipelines.code_files import build_engine
from xpshacl_ray.sources.fixtures import generate_code_files, oracle_sha256
from xpshacl_ray.sources.ingest import read_code_table

N = 2000


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    fx = generate_code_files(N, seed=42)
    d = tmp_path_factory.mktemp("code_files")
    pq.write_table(fx.table, d / "code_files.parquet")
    pq.write_table(fx.commits, d / "commits.parquet")
    return fx, str(d / "code_files.parquet"), str(d / "commits.parquet")


def test_fixture_determinism():
    a = generate_code_files(500, seed=42)
    b = generate_code_files(500, seed=42)
    assert a.table.equals(b.table)
    assert a.expected_by_kind() == b.expected_by_kind()
    c = generate_code_files(500, seed=7)
    assert not a.table.equals(c.table)


def test_sha256_invariant(fixture_dirs):
    fx, code_path, _ = fixture_dirs
    ds = read_code_table(code_path)
    got = {
        r["row_id"]: r["content_sha256"]
        for r in ds.select_columns(["row_id", "content_sha256"]).take_all()
    }
    # oracle computed independently, joined on the natural key order
    ids = ds.select_columns(["row_id"]).take_all()
    oracle = oracle_sha256(fx)
    # engine and oracle iterate the same parquet order; compare multiset
    engine_shas = sorted(got.values())
    assert sorted(oracle) == sorted(
        s for s in engine_shas for _ in [0]
    ) or collections.Counter(oracle) == collections.Counter(
        r["content_sha256"]
        for r in ds.select_columns(["content_sha256"]).take_all()
    )


def test_e2e_exact_violation_counts(fixture_dirs):
    fx, code_path, commits_path = fixture_dirs
    expected = fx.expected_by_kind()
    eng = build_engine()
    ds = read_code_table(code_path)
    commits = ray.data.read_parquet(commits_path)
    viol = eng.validate(ds, ref_datasets={"commit": commits})
    rows = viol.take_all()
    by_comp = collections.Counter(
        r["constraint_id"].rsplit("#", 1)[-1] for r in rows
    )
    assert by_comp["InConstraintComponent"] == expected["in"]
    assert by_comp["MaxLengthConstraintComponent"] == expected["maxlength"]
    assert by_comp["MinCountConstraintComponent"] == expected["required"]
    assert by_comp["PatternConstraintComponent"] == expected["pattern"]
    assert by_comp["MaxCountConstraintComponent"] == expected["duplicate"]
    # malformed commits are ALSO absent from the commits dim, so the
    # referential check catches both populations
    assert by_comp["ClassConstraintComponent"] == (
        expected["referential"] + expected["pattern"]
    )
    # severity propagated everywhere (C20)
    assert {r["severity"] for r in rows} == {"Violation"}


@pytest.mark.slow
def test_run_options_json_and_stats(fixture_dirs, tmp_path):
    import os

    import pyarrow.compute as pc

    from xpshacl_ray.stages.stats import StatsConfig

    fx, code_path, commits_path = fixture_dirs
    eng = build_engine()
    eng.compiled.referential.clear()
    ds = read_code_table(code_path).map_batches(
        lambda b: b.append_column("content_len",
                                  pc.utf8_length(b["content"])),
        batch_format="pyarrow",
    )
    res = eng.run(
        ds,
        out_json=str(tmp_path / "report_json"),
        save_kg=False,
        stats_config=StatsConfig(group_keys=["lang"],
                                 numeric_cols=["content_len"]),
    )
    # human JSON report written (S3)
    json_files = os.listdir(tmp_path / "report_json")
    assert any(f.endswith(".json") for f in json_files)
    # stats profile returned (ST5 in the facade)
    assert res["stats"] is not None
    assert "content_len_p50" in res["stats"].columns
    assert res["stats"]["n_rows"].sum() == ds.count()


@pytest.mark.slow
def test_e2e_full_run_report_and_explanations(fixture_dirs, tmp_path):
    fx, code_path, commits_path = fixture_dirs
    eng = build_engine(kg_path=str(tmp_path / "kg.parquet"), languages=["en"])
    ds = read_code_table(code_path)
    commits = ray.data.read_parquet(commits_path)
    res = eng.run(ds, ref_datasets={"commit": commits},
                  out_dir=str(tmp_path / "report"))
    report = res["report"]
    n = report.count()
    assert n == sum(fx.expected_by_kind().values()) + fx.expected_by_kind()["pattern"]
    # every violation row got its signature's explanation fanned back (G8)
    sample = report.take(50)
    assert all(r["explanation_en"] for r in sample)
    assert all(r["suggestions_en"] for r in sample)
    # 6 constraints → 6 signatures
    assert res["signatures"].count() == 6
    # signature keys stable md5s
    assert all(len(r["signature_key"]) == 32 for r in sample)
    # report written and re-readable (S3 resume path S2)
    back = ray.data.read_parquet(str(tmp_path / "report"))
    assert back.count() == n


def test_wide_content_rows(tmp_path):
    """Multi-hundred-KB content rows flow through ingest + validation
    without pathological block splitting (the multimodal/wide-row regime)."""
    import numpy as np
    import ray.data

    from xpshacl_ray.pipelines.code_files import build_engine

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta"]
    big = " ".join(rng.choice(words, 60_000))[:400_000]
    t = pa.table({
        "repo": pa.array([f"org/r{i % 3}" for i in range(64)]),
        "path": pa.array([f"src/f{i}.py" for i in range(64)]),
        "commit": pa.array(["ab" * 20] * 64),
        "lang": pa.array(["python"] * 64),
        "content": pa.array([big + str(i) for i in range(64)]),
    })
    pq.write_table(t, tmp_path / "wide.parquet")
    from xpshacl_ray.sources.ingest import read_code_table

    eng = build_engine(max_content_len=10_000_000)
    eng.compiled.referential.clear()
    ds = read_code_table(str(tmp_path / "wide.parquet"))
    viol = eng.validate(ds)
    assert viol.count() == 0
    got = ds.select_columns(["content_sha256"]).take(2)
    assert all(len(r["content_sha256"]) == 64 for r in got)
