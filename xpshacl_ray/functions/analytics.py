"""Reporting-shape analytics operators: fixed-width histograms, wide
pivot (crosstab) tables, and ROLLUP-style hierarchical subtotals.

All three follow the same scale contract: the distributed work is a
per-batch combiner followed by ONE groupby whose exchange carries
aggregate rows only (bin/cell/finest-level keys — never input rows); the
final reshaping (wide pivot, subtotal fan-out) runs on the driver over
the aggregated result, which is bounded by the key-domain product, not
the data size.  That driver step is the documented smallness bound: a
pivot over 10^6 × 10^3 distinct key pairs is a misuse of a pivot, not a
missing scale path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def histogram(ds: "ray.data.Dataset", col: str, width: float,
              origin: float = 0.0) -> "ray.data.Dataset":
    """Fixed-width histogram of ``col``: ``bin = floor((x - origin) /
    width)`` → ``(bin, n, sum_value)`` per non-empty bin, plus the bin
    edges for plotting.  NULLs are dropped (unbinnable).

    Combiner collapses each batch to its local bins, so the groupby
    exchange is bounded by (batch count × occupied bins) — scale-safe
    for any data size at sane bin widths."""
    from ray.data.aggregate import Count, Sum

    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")

    def partial(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:  # all-NULL or empty block: no bins to emit
            return pa.table({"bin": pa.array([], pa.int64()),
                             "p_n": pa.array([], pa.int64()),
                             "p_sum": pa.array([], pa.float64())})
        bins = np.floor((x - origin) / width).astype(np.int64)
        order = np.argsort(bins, kind="stable")
        b_s, x_s = bins[order], x[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        return pa.table({
            "bin": pa.array(b_s[starts]),
            "p_n": pa.array(np.diff(np.append(starts, len(b_s)))
                            .astype(np.int64)),
            "p_sum": pa.array(np.add.reduceat(x_s, starts)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("p_n", alias_name="n"),
                      Sum("p_sum", alias_name="sum_value")))

    def finish(b: pa.Table) -> pa.Table:
        bins = b["bin"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": b["bin"],
            "lo": pa.array(origin + bins * width),
            "hi": pa.array(origin + (bins + 1) * width),
            "n": pc.cast(b["n"], pa.int64()),
            "sum_value": b["sum_value"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def pivot_counts(ds: "ray.data.Dataset", row_key: str, col_key: str,
                 col_values: Optional[Sequence[str]] = None,
                 value_col: Optional[str] = None) -> pa.Table:
    """Wide crosstab: one output row per ``row_key`` value, one ``n_<v>``
    column per ``col_key`` value (plus ``sum_<v>`` columns when
    ``value_col`` is given).  Missing cells are 0.

    ``col_values`` pins the column set (and order) so the output schema
    is stable regardless of which values appear in the data; by default
    the observed values, sorted, are used.  Distributed part: per-batch
    cell combiner → one groupby over (row, col) cells; the driver-side
    reshape sees only the aggregated cell table.  NULL keys raise (a
    crosstab silently dropping a NULL group loses mass — fill or filter
    them first, the same contract as :func:`rollup_sum`)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        cols = {row_key: b[row_key], col_key: b[col_key]}
        t = pa.table(cols)
        if value_col is not None:
            t = t.append_column("v", b[value_col])
            g = t.group_by([row_key, col_key]).aggregate(
                [("v", "count"), ("v", "sum")])
            return pa.table({
                row_key: g[row_key], col_key: g[col_key],
                "p_n": pc.cast(g["v_count"], pa.int64()),
                "p_sum": g["v_sum"],
            })
        g = t.group_by([row_key, col_key]).aggregate([([], "count_all")])
        return pa.table({row_key: g[row_key], col_key: g[col_key],
                         "p_n": pc.cast(g["count_all"], pa.int64())})

    aggs = [Sum("p_n", alias_name="n")]
    if value_col is not None:
        aggs.append(Sum("p_sum", alias_name="s"))
    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby([row_key, col_key]).aggregate(*aggs)
             .to_pandas())  # bounded: one row per distinct key pair

    if cells[row_key].isna().any() or cells[col_key].isna().any():
        raise ValueError(
            "pivot_counts: NULL pivot keys would silently drop mass "
            "from the crosstab; fill or filter them first")
    if col_values is None:
        col_values = sorted(v for v in cells[col_key].unique()
                            if v is not None)
    rows = sorted(v for v in cells[row_key].unique() if v is not None)
    out: dict = {row_key: rows}
    for v in col_values:
        sub = cells[cells[col_key] == v].set_index(row_key)
        out[f"n_{v}"] = [int(sub["n"].get(r, 0)) for r in rows]
        if value_col is not None:
            out[f"sum_{v}"] = [sub["s"].get(r, 0) or 0 for r in rows]
    return pa.table(out)


def correlation_matrix(ds: "ray.data.Dataset", cols: List[str],
                       ndigits: int = 6) -> pa.Table:
    """Pearson correlation for every pair of ``cols`` in ONE pass:
    per-batch sufficient statistics (n, Σx per column, Σxy per pair)
    summed on the driver — the exchange is one fixed-width moment row
    per batch regardless of data size; no shuffle at all.

    Rows containing a NULL in ANY of ``cols`` are dropped (listwise
    deletion) so the statistic matches SQL ``corr()`` over the same
    complete-rows subset.  Output: (col_a, col_b, corr) for a < b,
    rounded to ``ndigits``; a zero-variance column yields NULL."""
    k = len(cols)
    if k < 2:
        raise ValueError("correlation_matrix needs at least two columns")

    def partial(b: pa.Table) -> pa.Table:
        x = np.stack(
            [b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols], axis=1)
        ok = ~np.isnan(x).any(axis=1)
        x = x[ok]
        moments = np.concatenate(
            [[len(x)], x.sum(axis=0), (x.T @ x).ravel()])
        return pa.table({"m": pa.array([moments.tolist()],
                                       pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    tot = np.sum([np.asarray(p["m"]) for p in parts], axis=0)
    n, sums = tot[0], tot[1:1 + k]
    cross = tot[1 + k:].reshape(k, k)
    out_a, out_b, out_c = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            num = n * cross[i, j] - sums[i] * sums[j]
            var_i = n * cross[i, i] - sums[i] ** 2
            var_j = n * cross[j, j] - sums[j] ** 2
            c = (None if var_i <= 0 or var_j <= 0
                 else round(num / np.sqrt(var_i * var_j), ndigits))
            out_a.append(cols[i])
            out_b.append(cols[j])
            out_c.append(c)
    return pa.table({"col_a": pa.array(out_a), "col_b": pa.array(out_b),
                     "corr": pa.array(out_c, pa.float64())})


def rollup_sum(ds: "ray.data.Dataset", keys: List[str], value_col: str,
               ) -> pa.Table:
    """ROLLUP-style hierarchical subtotals: sums of ``value_col`` at
    every key prefix — ``(k1, k2, …)``, ``(k1, NULL, …)``, down to the
    grand total — like SQL ``GROUP BY ROLLUP(k1, k2, …)``.

    Only the FINEST level is computed distributed (per-batch combiner +
    one groupby); every coarser level is re-aggregated from that result
    on the driver, which holds one row per distinct finest key combo —
    the standard bound for a reporting rollup.  NULL key values in the
    input would be ambiguous with subtotal markers (the classic ROLLUP
    caveat) and raise."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(keys + [value_col])
        g = t.group_by(keys).aggregate([(value_col, "sum"),
                                        ([], "count_all")])
        return pa.table({
            **{k: g[k] for k in keys},
            "p_sum": g[f"{value_col}_sum"],
            "p_n": pc.cast(g["count_all"], pa.int64()),
        })

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys)
              .aggregate(Sum("p_sum", alias_name="total"),
                         Sum("p_n", alias_name="n"))
              .to_pandas())
    for k in keys:
        if finest[k].isna().any():
            raise ValueError(
                f"NULL values in rollup key {k!r} are ambiguous with "
                "subtotal markers; filter or fill them first")

    frames = [finest[keys + ["total", "n"]]]
    for depth in range(len(keys) - 1, -1, -1):
        prefix = keys[:depth]
        if prefix:
            lvl = (finest.groupby(prefix, as_index=False)
                   .agg(total=("total", "sum"), n=("n", "sum")))
        else:
            lvl = pd.DataFrame({"total": [finest["total"].sum()],
                                "n": [finest["n"].sum()]})
        for k in keys[depth:]:
            lvl[k] = None
        frames.append(lvl[keys + ["total", "n"]])
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)
