"""Resume test (SURVEY.md §5(e)): kill after a stage write, re-run, assert
no recomputation of manifested partitions and identical output."""

import os

import pyarrow.parquet as pq
import pytest
import ray.data

from xpshacl_ray.pipelines.code_files import build_engine
from xpshacl_ray.sources.fixtures import generate_code_files
from xpshacl_ray.sources.ingest import read_code_table
from xpshacl_ray.state.manifest import (
    ManifestStore,
    PartitionManifest,
    partition_input_files,
    run_resumable,
)


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    files = []
    for shard in range(4):
        fx = generate_code_files(300, seed=100 + shard)
        p = str(d / f"shard{shard}.parquet")
        pq.write_table(fx.table, p)
        files.append(p)
    return files


def _process(files):
    eng = build_engine()
    # row-local only here: referential needs the dim; grouped keys are
    # shard-local by construction
    ds = read_code_table(files)
    from xpshacl_ray.spec import CompiledSpec

    c = eng.compiled
    row_only = CompiledSpec(row_local=c.row_local, grouped=c.grouped,
                            referential=[], id_columns=c.id_columns,
                            focus_template=c.focus_template)
    from xpshacl_ray.stages.evaluate import evaluate_row_local

    return ds.map_batches(lambda b: evaluate_row_local(b, row_only),
                          batch_format="pyarrow")


def test_partition_ids_deterministic(sharded_input):
    a = partition_input_files(sharded_input, 2)
    b = partition_input_files(list(reversed(sharded_input)), 2)
    assert a == b  # sorted internally
    assert len(a) == 2


def test_resume_skips_completed(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    calls = []

    def counting_process(files):
        calls.append(tuple(files))
        return _process(files)

    # simulate a kill: only 2 of 4 partitions complete
    r1 = run_resumable(sharded_input, out, counting_process, max_partitions=2)
    assert len(r1["ran"]) == 2 and not r1["skipped"]
    assert len(calls) == 2

    # resume: completed partitions are skipped, the rest run
    r2 = run_resumable(sharded_input, out, counting_process)
    assert sorted(r2["skipped"]) == sorted(r1["ran"])
    assert len(r2["ran"]) == 2
    assert len(calls) == 4

    # a third run recomputes nothing
    r3 = run_resumable(sharded_input, out, counting_process)
    assert len(r3["ran"]) == 0 and len(r3["skipped"]) == 4
    assert len(calls) == 4

    # output identical to a fresh, uninterrupted run
    fresh_out = str(tmp_path / "fresh")
    run_resumable(sharded_input, fresh_out, _process)
    a = ray.data.read_parquet(r3["data_dir"]).to_pandas()
    b = ray.data.read_parquet(os.path.join(fresh_out, "data", "violations")).to_pandas()
    key = ["row_id", "constraint_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_manifest_detects_tampered_output(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    r = run_resumable(sharded_input[:1], out, _process)
    store = ManifestStore(os.path.join(out, "manifests"))
    pid = r["ran"][0]
    assert store.is_complete("violations", pid)
    # tamper with the output → partition no longer counts as complete
    part_dir = os.path.join(out, "data", "violations", pid)
    victim = os.path.join(part_dir, sorted(os.listdir(part_dir))[0])
    with open(victim, "ab") as f:
        f.write(b"corruption")
    assert not store.is_complete("violations", pid)
    # re-run repairs it
    r2 = run_resumable(sharded_input[:1], out, _process)
    assert r2["ran"] == [pid]
    assert store.is_complete("violations", pid)


def test_manifest_records_metrics(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    r = run_resumable(sharded_input[:1], out, _process)
    store = ManifestStore(os.path.join(out, "manifests"))
    m = store.load("violations", r["ran"][0])
    assert m.rows_out > 0
    assert m.wall_time_s > 0
    assert m.input_files == [sorted(sharded_input[:1])[0]]


def test_delta_prunes_stale_partitions(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(sharded_input, out, _process)
    # the input set shrinks (one shard removed / replaced) → the stale
    # partition's output and manifest must be pruned on the next run
    reduced = sharded_input[:-1]
    r = run_resumable(reduced, out, _process)
    assert len(r["pruned"]) == 1
    assert len(r["skipped"]) == len(reduced)
    # downstream read sees only live partitions
    live = ray.data.read_parquet(r["data_dir"]).count()
    fresh = str(tmp_path / "fresh")
    expected = run_resumable(reduced, fresh, _process)
    assert live == ray.data.read_parquet(expected["data_dir"]).count()
    # nothing pruned when the input set is unchanged
    r2 = run_resumable(reduced, out, _process)
    assert r2["pruned"] == [] and len(r2["skipped"]) == len(reduced)
