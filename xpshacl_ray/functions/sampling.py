"""Deterministic sampling / train-test splitting for corpus pipelines.

A split must be reproducible across runs, resumes and repartitioning, so it
hashes a stable id — never `random_sample` (which depends on block layout).
``md5(id) % buckets`` is engine-agnostic: the same assignment is computable
in SQL (DuckDB: ``('0x' || substr(md5(id),1,8))::BIGINT % buckets``), in a
resume, or by a downstream consumer.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def md5_bucket(values, buckets: int = 100, salt: str = "") -> np.ndarray:
    """Deterministic bucket in [0, buckets) from md5 of the id string."""
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:8]
        out[i] = int(h, 16) % buckets
    return out


def add_split_column(
    batch: pa.Table,
    id_col: str,
    test_percent: int = 20,
    salt: str = "",
    out_col: str = "split",
) -> pa.Table:
    ids = pc.cast(batch[id_col], pa.string()).to_pylist()
    buckets = md5_bucket(ids, 100, salt)
    split = np.where(buckets < test_percent, "test", "train")
    return batch.append_column(out_col, pa.array(split.tolist(), pa.string()))


def train_test_split(
    ds: "ray.data.Dataset",
    id_col: str,
    test_percent: int = 20,
    salt: str = "",
) -> Tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(train, test) datasets split deterministically by id hash."""
    tagged = ds.map_batches(
        lambda b: add_split_column(b, id_col, test_percent, salt),
        batch_format="pyarrow",
    )
    train = tagged.filter(expr="split == 'train'").drop_columns(["split"])
    test = tagged.filter(expr="split == 'test'").drop_columns(["split"])
    return train, test


def sample_stratified(
    ds: "ray.data.Dataset",
    id_col: str,
    strata_col: str,
    rates: dict,
    default_percent: int = 0,
    salt: str = "",
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling: keep ``rates[stratum]`` percent
    of each stratum's rows (e.g. downsample over-represented languages in
    a training corpus), selected by ``md5(id) % 100`` so the SAME rows
    survive any repartition, resume or re-run — and the selection is
    reproducible in SQL (the oracle uses the identical hash expression).

    Map-only (no shuffle): the rate table broadcasts inside the UDF
    closure.  Strata absent from ``rates`` keep ``default_percent``.
    Rates are integer PERCENTAGES in [0, 100] — a fractional rate like
    ``0.5`` (the "fraction" convention) raises instead of silently
    truncating to 0%.  Rows with a NULL id are dropped, matching the SQL
    oracle (``md5(CAST(NULL AS VARCHAR))`` is NULL, so the comparison
    never selects them)."""

    def _pct(v) -> int:
        if isinstance(v, float) and not float(v).is_integer():
            raise ValueError(
                f"rate {v!r} looks like a fraction — rates are integer "
                "percentages in [0, 100] (0.5 would truncate to 0%)")
        iv = int(v)
        if not 0 <= iv <= 100:
            raise ValueError(f"rate {v!r} outside [0, 100]")
        return iv

    rates = {str(k): _pct(v) for k, v in rates.items()}
    default_percent = _pct(default_percent)

    def keep(b: pa.Table) -> pa.Table:
        id_arr = b[id_col]
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        valid = np.asarray(pc.is_valid(id_arr))
        ids = pc.cast(id_arr, pa.string()).to_pylist()
        buckets = md5_bucket(["" if v is None else v for v in ids],
                             100, salt)
        strata = pc.cast(b[strata_col], pa.string()).to_pylist()
        cut = np.fromiter(
            (rates.get(s if s is not None else "", default_percent)
             for s in strata), dtype=np.int64, count=len(strata))
        return b.filter(pa.array((buckets < cut) & valid))

    return ds.map_batches(keep, batch_format="pyarrow")
