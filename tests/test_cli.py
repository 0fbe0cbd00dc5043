"""CLI `validate` subcommand end-to-end (the ray-job-submit surface)."""

import json
import os

import pyarrow.parquet as pq

from xpshacl_ray.cli import main
from xpshacl_ray.sources.fixtures import generate_code_files


def _fixture(tmp_path, n=400):
    fx = generate_code_files(n, seed=7)
    code = str(tmp_path / "code.parquet")
    commits = str(tmp_path / "commits.parquet")
    pq.write_table(fx.table, code)
    pq.write_table(fx.commits, commits)
    return code, commits


def test_cli_validate_full_run(tmp_path, capsys):
    code, commits = _fixture(tmp_path)
    out = str(tmp_path / "out")
    rc = main(["validate", "--input", code, "--commits", commits,
               "--out", out, "--languages", "en", "--stats"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_violations"] > 0
    assert summary["n_signatures"] > 0
    assert os.path.exists(summary["kg_path"])
    assert os.path.exists(summary["stats_path"])
    assert os.path.isdir(os.path.join(out, "report"))
    stats = pq.read_table(summary["stats_path"])
    assert stats.num_rows > 0 and "n_rows" in stats.column_names


def test_cli_validate_resumable_skips_on_rerun(tmp_path, capsys):
    code, commits = _fixture(tmp_path)
    out = str(tmp_path / "out_resume")
    rc = main(["validate", "--input", code, "--commits", commits,
               "--out", out, "--resumable"])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(s1["ran"]) == 1 and not s1["skipped"]
    rc = main(["validate", "--input", code, "--commits", commits,
               "--out", out, "--resumable"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not s2["ran"] and len(s2["skipped"]) == 1
    import ray.data

    viol = ray.data.read_parquet(s2["data_dir"])
    assert viol.count() > 0
