"""Join strategies (SURVEY.md C4/X1 + custom-operator guidance).

Three tiers, picked by side sizes:

- **broadcast** (small right side): ``ray.put`` the keyed arrays once,
  probe per batch with ``np.searchsorted`` — no shuffle.  This is the
  engine's default for dimension tables (see ``stages/referential.py``).
- **bucketed hash join** (both sides large): add ``bucket = hash(key) % B``
  to both sides, co-group matching buckets, join pairwise inside the
  grouped task.  B is the explicit partitioning knob; salt hot keys by
  widening B.
- **as-of join**: sort both sides by (key, ts) within buckets, then
  ``pd.merge_asof`` per bucket — the standard composition for temporal
  enrichment (quotes→trades) on a batch engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .sketches import hash64


def schema_empty_pdf(sch) -> pd.DataFrame:
    """Empty pandas frame with the REAL dtypes of a Ray/Arrow schema.

    Ray Schema types are Arrow DataTypes for Arrow blocks but numpy
    dtypes for pandas blocks — handle both.  Used by every mixed-schema
    bucket task (hash_join, curate's anti-join): a bucket holding only
    one side must not emit object-dtype columns that poison the unioned
    block schema."""
    cols = {}
    for nm, t in zip(sch.names, sch.types):
        dt = t.to_pandas_dtype() if isinstance(t, pa.DataType) else t
        cols[nm] = pd.Series(dtype=dt)
    return pd.DataFrame(cols)


def restore_dtypes(df: pd.DataFrame, template: pd.DataFrame) -> pd.DataFrame:
    """Cast columns back to the template's dtypes where possible — group
    frames over a mixed-schema union widen int64 → float64 via NaN fill
    on the absent side's columns."""
    for c in df.columns:
        if c in template.columns and df[c].dtype != template[c].dtype:
            try:
                df[c] = df[c].astype(template[c].dtype)
            except (ValueError, TypeError):
                pass
    return df


def broadcast_join(
    left: "ray.data.Dataset",
    right_df: pd.DataFrame,
    key: str,
    columns: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Left join a small pandas right side onto a streaming left side.

    The right side must be UNIQUE on ``key`` (a dimension table):
    searchsorted probing finds one match per left row, so a duplicated
    right key would silently drop all but one match — rejected loudly
    instead."""
    if right_df[key].duplicated().any():
        dup = right_df[key][right_df[key].duplicated()].iloc[0]
        raise ValueError(
            f"broadcast_join right side has duplicate key {dup!r}: "
            "dedupe the dimension side or use hash_join for 1:N joins")
    right_df = right_df.sort_values(key)
    keys_ref = ray.put(right_df[key].to_numpy())
    cols = [c for c in (columns or right_df.columns) if c != key]
    col_refs = {c: ray.put(right_df[c].to_numpy()) for c in cols}

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        lk = b[key].to_numpy()
        idx = np.searchsorted(keys, lk)
        idx_clipped = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx_clipped] == lk
        for c in cols:
            vals = ray.get(col_refs[c])[idx_clipped]
            out = pd.Series(vals, index=b.index)
            out[~hit] = None
            b[c] = out
        return b

    return left.map_batches(probe, batch_format="pandas")


def _bucketize(ds: "ray.data.Dataset", key: str, n_buckets: int,
               side: str) -> "ray.data.Dataset":
    def tag(b: pa.Table) -> pa.Table:
        h = (hash64(b[key].to_pylist()) % n_buckets).astype(np.int32)
        return b.append_column("__bucket__", pa.array(h)).append_column(
            "__side__", pa.array(np.repeat(side, len(b)))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def native_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    how: str = "inner",
    num_partitions: int = 32,
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Ray's built-in hash-partitioned join (Ray >= 2.46) — the preferred
    big-big path; :func:`hash_join` is the explicit, portable equivalent
    (and the place to add salting when one key dominates)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(key,),
        right_suffix=right_suffix,
    )


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    n_buckets: int = 64,
    how: str = "inner",
    right_suffix: str = "_r",
) -> "ray.data.Dataset":
    """Partitioned hash join: both sides bucketed by key hash, matching
    buckets co-grouped, joined pairwise with pandas merge inside the task.

    One shuffle per side; ``n_buckets`` bounds per-task memory — widen it
    for skewed/huge keys (the explicit skew knob).
    """
    lt = _bucketize(left, key, n_buckets, "l")
    rt = _bucketize(right, key, n_buckets, "r")
    both = lt.union(rt)
    lsch, rsch = left.schema(), right.schema()
    lcols, rcols = lsch.names, rsch.names
    empty_out = schema_empty_pdf(lsch).merge(
        schema_empty_pdf(rsch), on=key, how="inner",
        suffixes=("", right_suffix))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g["__side__"] == "l"
        lpart, rpart = g[lmask], g[~lmask]
        if how == "inner" and (lpart.empty or rpart.empty):
            return empty_out.copy()
        lpart = lpart.reindex(columns=lcols)
        rpart = rpart.reindex(columns=rcols)
        out = lpart.merge(rpart, on=key, how=how, suffixes=("", right_suffix))
        if out.empty:
            return empty_out.copy()
        return restore_dtypes(out, empty_out)

    return both.groupby("__bucket__").map_groups(join_bucket,
                                                 batch_format="pandas")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    n_buckets: int = 64,
    right_suffix: str = "_r",
    direction: str = "backward",
) -> "ray.data.Dataset":
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` (direction='backward') per key.

    Partitioning assumption (documented per SURVEY custom-operator rule):
    all rows of one key land in one bucket, and a bucket's rows fit one
    task — the same per-key bound any windowed/as-of system needs.
    """
    lt = _bucketize(left, key, n_buckets, "l")
    rt = _bucketize(right, key, n_buckets, "r")
    both = lt.union(rt)
    lcols = left.schema().names
    rcols = right.schema().names

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # reindex, not strict selection: a bucket holding only one side's
        # rows lacks the other side's columns entirely (same guard as
        # hash_join's join_bucket)
        lpart = g[g["__side__"] == "l"].reindex(
            columns=lcols).sort_values(ts)
        rpart = g[g["__side__"] == "r"].reindex(
            columns=rcols).sort_values(ts)
        if lpart.empty:
            # merge_asof on an empty left frame upcasts int columns to
            # float64 and poisons the unioned block dtype — build the
            # empty output with the left side's own dtypes instead
            out = lpart.copy()
            for c in rcols:
                if c not in (key, ts):
                    name = c + right_suffix if c in lcols else c
                    out[name] = pd.Series(dtype=rpart[c].dtype)
            return out
        if rpart.empty:
            # keep the same output schema as pd.merge_asof: right columns
            # minus (key, ts); suffix only on collisions
            out = lpart.copy()
            for c in rcols:
                if c not in (key, ts):
                    out[c + right_suffix if c in lcols else c] = None
            return out
        out = pd.merge_asof(
            lpart, rpart, on=ts, by=key, direction=direction,
            suffixes=("", right_suffix),
        )
        return out

    return both.groupby("__bucket__").map_groups(join_bucket,
                                                 batch_format="pandas")
