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

from .sketches import hash64, key_hash64


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
        # key_hash64, not hash64-of-to_numpy: a null in the batch would
        # widen an int key column to float64 and re-bucket every key in
        # that batch away from its matches (ADVICE r4)
        h = (key_hash64(b[key]) % n_buckets).astype(np.int32)
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


def _to_i64(a: np.ndarray) -> np.ndarray:
    """Normalize a numeric/datetime array to int64 (ns for datetimes) so
    both join sides bucket on the same scale."""
    if a.dtype.kind == "M":
        return a.astype("datetime64[ns]").view(np.int64)
    if a.dtype.kind == "m":
        return a.astype("timedelta64[ns]").view(np.int64)
    return a.astype(np.int64, copy=False)


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: Optional[int] = None,
    n_buckets_hint: int = 256,
    right_suffix: str = "_iv",
) -> "ray.data.Dataset":
    """Point-in-interval (range) join: one output row per (point, interval)
    pair with ``start <= point <= end``.  Columns are numeric or
    timestamp (both sides normalized to int64 ns internally).

    Ray Data has no native range join; the scale composition here is the
    standard binned-replication plan: the domain is cut into fixed-width
    buckets, each interval is REPLICATED into every bucket it overlaps
    (cost ∝ interval_length/width + 1), each point lands in exactly ONE
    bucket — so every qualifying pair meets in exactly one task and no
    cross-bucket dedup is needed.  Inside a bucket the match is fully
    vectorized: points sorted once, per-interval [lo, hi) row ranges via
    ``np.searchsorted``, pair expansion by repeat/cumsum (no Python pair
    loop).

    ``bucket_width`` is the skew/memory knob.  Default: one streaming
    aggregate over the intervals side picks
    ``max(mean_interval_length, span/n_buckets_hint)`` — mean-length
    width caps replication at ~2× while keeping buckets fine enough to
    split the points.  Degenerate case to know about: ONE interval
    spanning the whole domain with millions of points in range produces
    that many output rows in one task — that's the join's true output
    size, not an artifact; cap it upstream if unwanted.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Min, Sum

    if bucket_width is None:
        def iv_stats(b: pa.Table) -> pa.Table:
            s = _to_i64(np.asarray(b[start_col]))
            e = _to_i64(np.asarray(b[end_col]))
            return pa.table({"s_min": [int(s.min()) if len(s) else 0],
                             "e_max": [int(e.max()) if len(e) else 0],
                             "len_sum": [int(np.maximum(e - s, 0).sum())],
                             "n": [len(s)]})

        parts = intervals.map_batches(iv_stats,
                                      batch_format="pyarrow").take_all()
        if not parts or sum(p["n"] for p in parts) == 0:
            # no intervals -> empty join with the right output schema
            parts = None
        if parts is None:
            n_iv, span, mean_len = 0, 1, 1
        else:
            n_iv = sum(p["n"] for p in parts)
            span = max(p["e_max"] for p in parts) - \
                min(p["s_min"] for p in parts)
            mean_len = sum(p["len_sum"] for p in parts) / max(n_iv, 1)
        bucket_width = int(max(mean_len, span / max(n_buckets_hint, 1), 1))
    w = int(bucket_width)

    def explode_iv(b: pa.Table) -> pa.Table:
        s = _to_i64(np.asarray(b[start_col]))
        e = _to_i64(np.asarray(b[end_col]))
        b0, b1 = s // w, e // w
        counts = np.maximum(b1 - b0 + 1, 0)   # e < s -> no buckets
        total = int(counts.sum())
        idx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        base = np.repeat(np.cumsum(counts) - counts, counts)
        bucket = b0[idx] + (np.arange(total, dtype=np.int64) - base)
        t = b.take(pa.array(idx))
        return t.append_column("__bucket__", pa.array(bucket)) \
                .append_column("__side__",
                               pa.array(np.repeat("i", total)))

    def tag_points(b: pa.Table) -> pa.Table:
        p = _to_i64(np.asarray(b[point_col]))
        return b.append_column("__bucket__", pa.array(p // w)) \
                .append_column("__side__", pa.array(np.repeat("p", len(b))))

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    it = intervals.map_batches(explode_iv, batch_format="pyarrow")
    both = pt.union(it)
    pcols = points.schema().names
    icols = intervals.schema().names
    out_icols = {c: (c + right_suffix if c in pcols else c) for c in icols}
    empty_out = pd.concat(
        [schema_empty_pdf(points.schema()),
         schema_empty_pdf(intervals.schema()).rename(columns=out_icols)],
        axis=1)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pp = g[g["__side__"] == "p"].reindex(columns=pcols)
        iv = g[g["__side__"] == "i"].reindex(columns=icols)
        if pp.empty or iv.empty:
            return empty_out.copy()
        pv = _to_i64(pp[point_col].to_numpy())
        order = np.argsort(pv, kind="stable")
        pvs = pv[order]
        s = _to_i64(iv[start_col].to_numpy())
        e = _to_i64(iv[end_col].to_numpy())
        lo = np.searchsorted(pvs, s, side="left")
        hi = np.searchsorted(pvs, e, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty_out.copy()
        ividx = np.repeat(np.arange(len(iv), dtype=np.int64), counts)
        base = np.repeat(np.cumsum(counts) - counts, counts)
        pidx = order[np.arange(total, dtype=np.int64) - base
                     + np.repeat(lo, counts)]
        out = pd.concat(
            [pp.iloc[pidx].reset_index(drop=True),
             iv.iloc[ividx].reset_index(drop=True).rename(
                 columns=out_icols)],
            axis=1)
        return restore_dtypes(out, empty_out)

    return both.groupby("__bucket__").map_groups(join_bucket,
                                                 batch_format="pandas")
