"""Per-partition pass/fail verdicts — the north-star output row.

Combines the two quality signals the engine computes per partition key
(e.g. ``(repo, lang)``):

- **constraint violations** counted per partition (from the violations
  Dataset, aggregated with a per-batch combiner), and
- **distribution drift** (KS over t-digests, PSI over histograms) vs a
  reference profile (``stages.stats.drift_report``).

A partition passes iff it has no violations above the allowed budget AND
no drifted column.  This generalizes the reference's per-ontology
``conforms`` + message counts (shark_tests.py:115-126) to keyed partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.arrowutil import agg_select
from ..stages.stats import DriftThresholds, StatsConfig, drift_report


@dataclass
class VerdictConfig:
    partition_keys: List[str]
    max_violations: int = 0
    drift: DriftThresholds = None  # None = skip drift checks

    def __post_init__(self):
        if self.drift is None:
            self.drift = DriftThresholds()


def violation_counts_by_partition(
    violations: "ray.data.Dataset", keys: Sequence[str]
) -> pd.DataFrame:
    """n_violations per partition key (combiner + tiny groupby)."""
    keys = list(keys)

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        missing = [k for k in keys if k not in b.column_names]
        for m in missing:
            b = b.append_column(m, pa.nulls(len(b), pa.string()))
        t = b.select(keys)
        # drop rows with null partition keys (group-level violations not
        # attributable to one partition) — null keys also break the
        # groupby sort downstream
        mask = None
        for k in keys:
            valid = pc.is_valid(t[k])
            mask = valid if mask is None else pc.and_(mask, valid)
        t = t.filter(mask)
        agg = t.group_by(keys).aggregate([([], "count_all")])
        return agg_select(agg, {**{k: k for k in keys},
                                "count_all": "p_n"})

    out = (
        violations.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("p_n", alias_name="n_violations"))
        .to_pandas()
    )
    out["n_violations"] = out["n_violations"].astype("int64")
    return out


def partition_verdicts(
    violations: "ray.data.Dataset",
    cfg: VerdictConfig,
    current_sketches: Optional[pd.DataFrame] = None,
    reference_sketches: Optional[pd.DataFrame] = None,
    stats_cfg: Optional[StatsConfig] = None,
) -> pd.DataFrame:
    """One row per partition: n_violations, per-column drift, verdict."""
    keys = list(cfg.partition_keys)
    counts = violation_counts_by_partition(violations, keys)
    counts = counts[counts[keys].notna().all(axis=1)]
    if current_sketches is not None and reference_sketches is not None:
        drift = drift_report(current_sketches, reference_sketches,
                             stats_cfg, cfg.drift)
        merged = drift.merge(counts, on=keys, how="left")
        merged["n_violations"] = (
            merged["n_violations"].fillna(0).astype("int64"))
        merged["verdict"] = [
            "pass" if (v == "pass" and n <= cfg.max_violations) else "fail"
            for v, n in zip(merged["verdict"], merged["n_violations"])
        ]
        return merged
    counts["verdict"] = [
        "pass" if n <= cfg.max_violations else "fail"
        for n in counts["n_violations"]
    ]
    return counts
