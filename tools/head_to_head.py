"""Head-to-head re-measurement at the reference's own workload size
(VERDICT r3 item 8): re-run the engine side of BASELINE.md's 10k-resource
table with the CURRENT binary so the published speedup claims stay
attributable.  The reference side is its PUBLISHED pyshacl numbers
(/root/reference/README.md:269-279 — pyshacl is not installed in this
sandbox), so only our side can drift.

Workload (identical to the round-1 measurement): seeded code_files
fixture, 10k base rows (+5% duplicate keys appended by the generator),
6 constraint families incl. grouped uniqueness + referential; 32 cpus.

    python tools/head_to_head.py [n_pairs]

Prints one JSON line: best + paired runs for validation-only, full
explainable run cold (fresh KG path) and warm (pre-populated KG).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from xpshacl_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import pyarrow.parquet as pq

    from xpshacl_ray.pipelines.code_files import build_engine
    from xpshacl_ray.sources.fixtures import generate_code_files
    from xpshacl_ray.sources.ingest import read_code_table

    work = tempfile.mkdtemp(prefix="xpshacl_h2h_")
    fx = generate_code_files(10_000, seed=42)
    code_path = os.path.join(work, "code.parquet")
    commits_path = os.path.join(work, "commits.parquet")
    pq.write_table(fx.table, code_path)
    pq.write_table(fx.commits, commits_path)
    n_rows = pq.ParquetFile(code_path).metadata.num_rows

    def validate_only() -> int:
        eng = build_engine()
        commits = ray.data.read_parquet(commits_path)
        ds = read_code_table(code_path)
        return eng.validate(ds, ref_datasets={"commit": commits}).count()

    warm_kg = os.path.join(work, "warm_kg.parquet")

    def full_run(kg_path: str) -> int:
        eng = build_engine(kg_path=kg_path)
        commits = ray.data.read_parquet(commits_path)
        ds = read_code_table(code_path)
        res = eng.run(ds, ref_datasets={"commit": commits}, save_kg=True)
        return res["report"].count()

    # one untimed warm-up spins up the worker pool, then populate the
    # warm KG once so every timed "warm" run starts cache-hit
    validate_only()
    full_run(warm_kg)

    runs: dict[str, list[float]] = {"validation_only": [],
                                    "full_cold": [], "full_warm": []}
    for _ in range(n_pairs):
        t0 = time.perf_counter()
        validate_only()
        runs["validation_only"].append(round(time.perf_counter() - t0, 3))

        cold_kg = os.path.join(work, f"cold_{time.monotonic_ns()}.parquet")
        t0 = time.perf_counter()
        full_run(cold_kg)
        runs["full_cold"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        full_run(warm_kg)
        runs["full_warm"].append(round(time.perf_counter() - t0, 3))

    published_ref = {"validation_only": 4.27, "full_cold": 65.8,
                     "full_warm": 20.9}
    out = {"n_rows": n_rows, "num_cpus": int(ray.cluster_resources()["CPU"]),
           "runs": runs}
    for k, v in runs.items():
        best = min(v)
        out[f"{k}_best"] = best
        out[f"{k}_ref_published"] = published_ref[k]
        out[f"{k}_speedup"] = round(published_ref[k] / best, 2)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
