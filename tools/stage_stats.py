"""Per-operator wall/CPU breakdown for the headline pipelines via
``ds.stats()`` — the measure-don't-guess loop. Usage:

    python tools/stage_stats.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or ["violations_documents", "window_hourly",
                            "exact_dedup"]
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    sys.path.insert(0, "/root/repo")
    from xpshacl_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import __ray_entry__ as entrymod

    ray.data.range(256, override_num_blocks=128).map_batches(
        lambda b: b).count()
    qs = entrymod.queries()
    for name in only:
        out = qs[name](sf_dir)
        if not hasattr(out, "stats"):
            print(f"== {name}: (materialized result, no Dataset stats)")
            continue
        out = out.materialize()  # count() uses a side plan with no stats
        print(f"== {name} ==")
        stats = out.stats()
        for line in stats.splitlines():
            if re.search(r"(Operator|Remote wall time|"
                         r"output rows per task|Ray Data throughput)", line):
                print("  " + line.strip())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
