"""Ray Data execution tuning applied by entry points (never by the library
at import time of core modules — callers opt in).

Shuffle strategy: measured on this engine's pipelines, Ray's HASH_SHUFFLE
was ~40% faster than the default sort shuffle for one warm repeated
groupby, but its per-shuffle aggregator-actor startup makes pipelines with
MANY small groupbys several times slower end-to-end (a 5-query oracle run
went from ~2 min to >9 min).  The default sort shuffle therefore stays;
set ``XPSHACL_HASH_SHUFFLE=1`` to opt in for long-running jobs whose
shuffles are large enough to amortize the aggregator startup.
"""

from __future__ import annotations

import os


def apply_wide_content_context(avg_row_bytes: int,
                               rows_per_batch: int = 64) -> int:
    """Block/batch sizing for multi-MB payload rows (wide ``content`` /
    multimodal binary columns).

    Ray splits blocks by BYTES (``target_max_block_size``, default
    128 MiB), so wide rows already get few-rows-per-block at the read —
    the real hazards are (a) ``map_batches`` with a row-count
    ``batch_size`` that multiplies to GBs per task heap
    (batch_size × row_bytes × concurrency), and (b) shuffle-bearing
    stages that carry the payload column (the engine's answer is to
    never do that — project to keys/hashes first; measured in
    tools/wide_row_bench.py).

    Sets ``target_max_block_size`` to hold ~``rows_per_batch`` rows
    (floored at 4 MiB, capped at the 128 MiB default) and returns the
    per-stage ``batch_size`` callers should pass to ``map_batches`` on
    payload-bearing stages so one batch ≈ one block (zero-copy slice,
    no concatenation of payload chunks)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    target = max(4 * 1024 * 1024,
                 min(128 * 1024 * 1024, avg_row_bytes * rows_per_batch))
    ctx.target_max_block_size = target
    return max(1, target // max(1, avg_row_bytes))


def apply_recommended_context() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    if os.environ.get("XPSHACL_HASH_SHUFFLE"):
        try:
            from ray.data.context import ShuffleStrategy

            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        except (ImportError, AttributeError):  # older Ray: keep default
            pass


def map_batches_maybe_pool(ds, cls, kwargs, concurrency, **map_opts):
    """Shared dispatch for combiner stages whose ``__init__`` is cheap:
    ``concurrency=None`` → STATELESS tasks (instance shipped in the task
    closure; no pool startup), else an actor pool with the given
    concurrency — one place for the rule so the three combiner stages
    (MinHasher, SimHasher, StatsActor) can't drift apart."""
    if concurrency is None:
        return ds.map_batches(cls(**kwargs), **map_opts)
    return ds.map_batches(cls, fn_constructor_kwargs=kwargs,
                          concurrency=concurrency, **map_opts)
