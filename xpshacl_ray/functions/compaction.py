"""State compaction and budgeted selection.

- :func:`latest_by_key` — upsert/CDC compaction: keep the most recent
  row per key (the "latest version wins" merge every incrementally-
  ingested corpus needs before training).
- :func:`budget_sample` — deterministic budget-constrained sampling:
  take documents in md5(id) order until a cost budget (tokens, chars,
  bytes) is exhausted — "give me 10B tokens of this corpus" as an
  exact, resume-stable operator.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _latest_partial(b: pa.Table, key_col: str, order_cols: List[str],
                    ) -> pa.Table:
    """One row per key per batch: the max of ``order_cols`` (lexicographic,
    later columns break ties).  Vectorized lexsort + last-of-run."""
    if len(b) == 0:
        return b
    if b[key_col].null_count:
        # a None among string keys would raise a cryptic TypeError inside
        # the object-dtype lexsort below — reject loudly like order_cols
        raise ValueError(
            f"latest_by_key: key column {key_col!r} contains NULLs")
    keys = np.asarray(b[key_col])
    sort_keys = [np.asarray(b[c]) for c in reversed(order_cols)] + [keys]
    order = np.lexsort(sort_keys)  # by key, then order_cols ascending
    k_s = keys[order]
    last = np.r_[k_s[1:] != k_s[:-1], True]  # last (= max) row per key run
    return b.take(pa.array(order[last]))


def latest_by_key(ds: "ray.data.Dataset", key_col: str,
                  order_cols: List[str]) -> "ray.data.Dataset":
    """Keep the single most recent row per ``key_col``, "recent" =
    lexicographic max of ``order_cols`` (e.g. ``["ts", "event_id"]`` —
    the id column makes the winner unique when timestamps tie).

    Scale shape: a per-batch combiner first collapses each batch to one
    row per key, so the key-bucket shuffle moves at most
    (distinct keys × batches) rows, then a per-group max finishes —
    the classic compaction two-step.  Order columns must be non-null
    (a null ordering value is meaningless for recency and raises)."""
    import ray.data  # noqa: F401

    def partial(b: pa.Table) -> pa.Table:
        for c in order_cols:
            if b[c].null_count:
                raise ValueError(
                    f"latest_by_key: order column {c!r} contains NULLs")
        return _latest_partial(b, key_col, order_cols)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return part.groupby(key_col).map_groups(
        lambda g: _latest_partial(g, key_col, order_cols),
        batch_format="pyarrow")


def kfold_assign(ds: "ray.data.Dataset", id_col: str, k: int = 5,
                 salt: str = "") -> "ray.data.Dataset":
    """Deterministic k-fold assignment: ``fold = md5(salt + id) % k`` —
    layout-stable, resume-safe, SQL-reproducible (the cross-validation
    generalization of the train/test split).  Map-only."""
    from xpshacl_ray.functions.sampling import md5_bucket

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def assign(b: pa.Table) -> pa.Table:
        if b[id_col].null_count:
            raise ValueError(
                f"kfold_assign: id column {id_col!r} contains NULLs — "
                "an unidentifiable row cannot be folded deterministically")
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        folds = md5_bucket(ids, k, salt)
        return b.append_column("fold", pa.array(folds, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _md5_hex(values) -> List[str]:
    return [hashlib.md5(f"{v}".encode("utf-8")).hexdigest()
            for v in values]


def budget_sample(ds: "ray.data.Dataset", id_col: str, cost_col: str,
                  budget: int, n_buckets: int = 256,
                  ) -> Tuple["ray.data.Dataset", dict]:
    """(selected, report) — keep documents in ``md5(id)`` order while the
    running sum of ``cost_col`` stays within ``budget`` (exact greedy
    prefix: a doc is kept iff cumulative cost through it ≤ budget).

    Two cheap passes instead of a global sort:

    1. per-batch partial cost sums per md5-prefix bucket (the shuffle
       carries ``n_buckets`` rows per batch); the driver's cumulative
       sum over the ordered buckets locates the BOUNDARY bucket.
    2. buckets before the boundary are kept outright (map-only filter);
       only the boundary bucket's (md5, cost) pairs — ~1/``n_buckets``
       of the data, raise ``n_buckets`` for bigger corpora — come to
       the driver to resolve the exact cutoff digest.

    NULL costs raise (an unpriced row can't be budgeted).  The report
    carries the spent budget and cutoff for audit."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    width = len(f"{n_buckets - 1:x}")
    scale = 16 ** width

    def to_bucket(md5s: List[str]) -> np.ndarray:
        return np.array([int(h[:width], 16) * n_buckets // scale
                         for h in md5s], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        if b[cost_col].null_count:
            raise ValueError(
                f"budget_sample: cost column {cost_col!r} contains NULLs")
        if b[id_col].null_count:
            raise ValueError(
                f"budget_sample: id column {id_col!r} contains NULLs — "
                "md5 order is undefined for an unidentifiable row")
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        buckets = to_bucket(_md5_hex(ids))
        costs = np.asarray(b[cost_col], dtype=np.int64)
        t = pa.table({"bucket": pa.array(buckets),
                      "cost": pa.array(costs)})
        g = t.group_by(["bucket"]).aggregate([("cost", "sum")])
        return pa.table({"bucket": g["bucket"],
                         "p_cost": pc.cast(g["cost_sum"], pa.int64())})

    totals = {r["bucket"]: r["total"] for r in
              ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("p_cost", alias_name="total"))
              .take_all()}

    spent = 0
    boundary = None
    for bkt in range(n_buckets):
        c = totals.get(bkt, 0)
        if spent + c > budget:
            boundary = bkt
            break
        spent += c
    if boundary is None:  # whole corpus fits the budget
        report = {"spent": spent, "boundary_bucket": None,
                  "cutoff_md5": None}
        return ds, report

    # resolve the exact cutoff inside the boundary bucket (bounded:
    # ~corpus/n_buckets rows of (md5, cost) — never text)
    def boundary_rows(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        md5s = _md5_hex(ids)
        mask = to_bucket(md5s) == boundary
        return pa.table({
            "md5": pa.array([m for m, k in zip(md5s, mask) if k]),
            "cost": pa.array(
                np.asarray(b[cost_col], dtype=np.int64)[mask]),
        })

    inner = (ds.map_batches(boundary_rows, batch_format="pyarrow")
             .to_pandas().sort_values("md5").reset_index(drop=True))
    cum = inner["cost"].cumsum() + spent
    fits = cum <= budget
    cutoff = inner.loc[fits, "md5"].max() if fits.any() else None
    spent_total = int(cum[fits].max()) if fits.any() else spent

    def keep(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        md5s = _md5_hex(ids)
        buckets = to_bucket(md5s)
        mask = buckets < boundary
        if cutoff is not None:
            mask |= (buckets == boundary) & (np.array(md5s) <= cutoff)
        return b.filter(pa.array(mask))

    report = {"spent": spent_total, "boundary_bucket": int(boundary),
              "cutoff_md5": cutoff}
    return ds.map_batches(keep, batch_format="pyarrow"), report
