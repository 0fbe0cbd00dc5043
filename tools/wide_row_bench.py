"""Wide-content shuffle experiment (BASELINE.md 'wide-row regime').

Quantifies the engine's never-shuffle-content design: exact dedup over
~400 KB rows via the (md5, id)-projection path vs a naive
groupby-on-the-text-column that drags every content byte through the
all-to-all.  Run:  python tools/wide_row_bench.py [n_rows] [row_kb]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SWEEP_ONLY = "--sweep-only" in sys.argv  # skip the slow naive groupby
N_ROWS = int(ARGS[0]) if len(ARGS) > 0 else 2048
ROW_KB = int(ARGS[1]) if len(ARGS) > 1 else 400
DIR = f"/tmp/xpshacl_wide_{N_ROWS}x{ROW_KB}"


def prepare():
    if os.path.exists(os.path.join(DIR, "READY")):
        return
    os.makedirs(DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    shards = 8
    per = N_ROWS // shards
    vocab = [f"tok{i}" for i in range(1000)]
    for s in range(shards):
        texts = []
        for i in range(per):
            if (s * per + i) % 10 == 0 and i > 0:  # 10% exact dupes
                texts.append(texts[-1])
            else:
                toks = rng.choice(vocab, size=ROW_KB * 1024 // 7)
                texts.append(" ".join(toks.tolist()))
        t = pa.table({
            "doc_id": pa.array(range(s * per, s * per + per), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(t, os.path.join(DIR, f"s{s}.parquet"))
    open(os.path.join(DIR, "READY"), "w").write("1")


def main():
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "16")), include_dashboard=False,
        logging_level="ERROR")
    import ray.data

    sys.path.insert(0, "/root/repo")
    from xpshacl_ray.functions.dedup import exact_dedup
    from xpshacl_ray.tuning import apply_recommended_context

    apply_recommended_context()
    prepare()
    gb = N_ROWS * ROW_KB / 1024 / 1024

    files = sorted(os.path.join(DIR, f) for f in os.listdir(DIR)
                   if f.endswith(".parquet"))

    def read():
        return ray.data.read_parquet(files)

    read().count()  # warm

    print(f"rows={N_ROWS} ({gb:.2f} GiB of ~{ROW_KB} KB content)")
    if not SWEEP_ONLY:
        t0 = time.perf_counter()
        n1 = exact_dedup(read()).count()
        t_hash = time.perf_counter() - t0

        from ray.data.aggregate import Count, Min

        t0 = time.perf_counter()
        n2 = (read().groupby("text")
              .aggregate(Min("doc_id", alias_name="keep_id"),
                         Count(alias_name="n"))
              .count())
        t_naive = time.perf_counter() - t0

        print(f"hash-projection dedup (engine): {t_hash:.2f}s -> {n1} groups")
        print(f"naive content-shuffling groupby: {t_naive:.2f}s -> {n2} groups")
        print(f"speedup: {t_naive / t_hash:.2f}x")

    # --- shuffle-bearing wide-row stage under varied block sizes --------
    # the engine's grouped uniqueness check (key-projected combiner +
    # groupby) and a full stats profile, swept over
    # target_max_block_size: quantifies whether block granularity
    # matters once payload bytes never enter the exchange
    from ray.data import DataContext

    from xpshacl_ray.spec import MaxCount, ValidationSpec
    from xpshacl_ray.pipelines.validate import ValidationEngine
    from xpshacl_ray.stages.stats import StatsConfig, profile

    spec = ValidationSpec(
        constraints=[MaxCount(column="text", group_by=["text_md5"],
                              max_count=1)],
        id_columns=["doc_id"], focus_template="doc:{doc_id}")
    eng = ValidationEngine(spec)

    import hashlib

    def add_md5(b: pa.Table) -> pa.Table:
        md5 = [hashlib.md5(t.encode()).hexdigest()
               for t in b["text"].to_pylist()]
        return b.append_column("text_md5", pa.array(md5, pa.string()))

    ctx = DataContext.get_current()
    default_target = ctx.target_max_block_size
    for label, target in [("8MiB", 8 << 20), ("32MiB", 32 << 20),
                          ("128MiB(default)", default_target)]:
        ctx.target_max_block_size = target
        src = read().map_batches(add_md5, batch_format="pyarrow")
        t0 = time.perf_counter()
        nv = eng.validate(src).count()
        t_grouped = time.perf_counter() - t0
        t0 = time.perf_counter()
        # batch_size sized for the payload width (apply_wide_content_context
        # guidance): 8192-row default would be a ~3 GiB batch here
        prof = profile(read(), StatsConfig(
            group_keys=[], numeric_cols=[], categorical_cols=[],
            distinct_cols=["text"]), batch_size=max(1, target // (ROW_KB << 10)))
        t_stats = time.perf_counter() - t0
        print(f"block={label}: grouped-uniqueness {t_grouped:.2f}s "
              f"({nv} violations), distinct-profile {t_stats:.2f}s")
    ctx.target_max_block_size = default_target
    ray.shutdown()


if __name__ == "__main__":
    main()
