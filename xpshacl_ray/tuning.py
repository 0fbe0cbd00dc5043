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
