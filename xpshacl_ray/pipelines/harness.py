"""Batch conformance harness (SURVEY.md §3.3, S6/S7/G9).

Engine analog of the reference's ``data/shark_tests.py``: "shard inputs →
validate each shard → per-shard conforms verdict + violation-message
histogram → accumulate CSV rows + success/fail counters" — serial there,
parallel shards here, with count-and-continue error semantics (a failing
shard becomes an error row, never an abort — shark_tests.py:129-137).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from ..pipelines.validate import ValidationEngine


@dataclass
class ShardVerdict:
    shard: str
    conforms: bool
    n_rows: int
    n_violations: int
    message_histogram: Dict[str, int] = field(default_factory=dict)
    error: Optional[str] = None


def message_histogram(violations: "ray.data.Dataset") -> Dict[str, int]:
    """Violation count by message — the reference's only true aggregate
    (shark_tests.py:115-126, G9)."""
    rows = (
        violations.groupby("message").aggregate(Count(alias_name="n")).take_all()
    )
    return {r["message"]: r["n"] for r in rows}


def run_conformance_harness(
    shards: Dict[str, Sequence[str]],
    engine: ValidationEngine,
    out_csv: Optional[str] = None,
    reader: Optional[Callable[[List[str]], "ray.data.Dataset"]] = None,
) -> List[ShardVerdict]:
    """Validate every shard independently; errors are counted, not raised."""
    reader = reader or (lambda files: ray.data.read_parquet(files))
    verdicts: List[ShardVerdict] = []
    for name, files in shards.items():
        try:
            ds = reader(list(files))
            n_rows = ds.count()
            viol = engine.validate(ds)
            hist = message_histogram(viol)
            n_viol = sum(hist.values())
            verdicts.append(
                ShardVerdict(shard=name, conforms=n_viol == 0, n_rows=n_rows,
                             n_violations=n_viol, message_histogram=hist)
            )
        except Exception as e:  # count-and-continue (shark_tests.py:129-137)
            verdicts.append(
                ShardVerdict(shard=name, conforms=False, n_rows=-1,
                             n_violations=-1, error=f"{type(e).__name__}: {e}")
            )
    if out_csv:
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        rows = []
        for v in verdicts:
            if v.error:
                rows.append({"shard": v.shard, "size": v.n_rows,
                             "test": "error", "fail": 1})
            else:
                for msg, n in sorted(v.message_histogram.items()):
                    rows.append({"shard": v.shard, "size": v.n_rows,
                                 "test": msg, "fail": n})
                if not v.message_histogram:
                    rows.append({"shard": v.shard, "size": v.n_rows,
                                 "test": "conforms", "fail": 0})
        pd.DataFrame(rows).to_csv(out_csv, sep=";", index=False)
    return verdicts
