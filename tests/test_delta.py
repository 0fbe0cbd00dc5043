"""validate_delta: only changed shards recompute; unchanged skip; stale
outputs of rewritten shards are pruned."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from xpshacl_ray import MinInclusive, ValidationEngine, ValidationSpec


def _write_shard(path, ids, vals):
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "x": pa.array(vals, pa.int64())}), path)


def _engine():
    return ValidationEngine(ValidationSpec(
        constraints=[MinInclusive(column="x", bound=0)],
        id_columns=["id"], focus_template="row:{id}"))


def test_validate_delta_recomputes_only_changed(tmp_path):
    shards = []
    for i in range(3):
        p = str(tmp_path / f"shard{i}.parquet")
        _write_shard(p, [i * 10, i * 10 + 1], [5, -1])  # one violation each
        shards.append(p)
    out = str(tmp_path / "out")

    r1 = _engine().validate_delta(shards, out)
    assert len(r1["ran"]) == 3 and not r1["skipped"] and not r1["pruned"]
    v1 = ray.data.read_parquet(r1["data_dir"]).to_pandas()
    assert sorted(v1["id"]) == [1, 11, 21]

    # rerun untouched: everything skips
    r2 = _engine().validate_delta(shards, out)
    assert not r2["ran"] and len(r2["skipped"]) == 3 and not r2["pruned"]

    # rewrite shard1 in place (new content + mtime): only IT recomputes,
    # its stale partition output is pruned
    os.utime(shards[0])  # touch without content change → still skips? no:
    # mtime_ns changed → new id; document the stat-fingerprint semantics
    _write_shard(shards[1], [10, 11, 12], [-7, 3, -9])
    r3 = _engine().validate_delta(shards, out)
    assert len(r3["skipped"]) == 1  # shard2 untouched
    assert len(r3["ran"]) == 2      # shard0 (touched) + shard1 (rewritten)
    assert len(r3["pruned"]) == 2
    v3 = ray.data.read_parquet(r3["data_dir"]).to_pandas()
    assert sorted(v3["id"]) == [1, 10, 12, 21]

    # removing a shard prunes its partition from the output set
    removed = shards.pop()
    os.remove(removed)
    r4 = _engine().validate_delta(shards, out)
    assert not r4["ran"] and len(r4["skipped"]) == 2 and len(r4["pruned"]) == 1
    v4 = ray.data.read_parquet(r4["data_dir"]).to_pandas()
    assert sorted(v4["id"]) == [1, 10, 12]
