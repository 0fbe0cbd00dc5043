"""Windowed aggregates over event-log tables (streaming-shaped workloads).

Ray Data is a batch engine with no event-time watermarks; tumbling/sliding
windows become: vectorized window-key derivation (``pc.floor_temporal``)
inside ``map_batches`` + per-batch partial aggregation (combiner) + one
small ``groupby(keys + window)`` over the partials.  Ordering assumption:
none — tumbling aggregation is order-insensitive; session windows would
need per-key sorted ``map_groups`` (see ``sessionize``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def add_tumbling_window(
    batch: pa.Table,
    ts_col: str = "ts",
    unit: str = "hour",
    out_col: str = "window_start",
) -> pa.Table:
    """Vectorized tumbling window key: timestamp truncated to the unit."""
    w = pc.floor_temporal(batch[ts_col], unit=unit)
    return batch.append_column(out_col, w)


def tumbling_aggregate(
    ds: "ray.data.Dataset",
    key_cols: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
    unit: str = "hour",
) -> "ray.data.Dataset":
    """count + sum(value) per (key, window) with per-batch pre-aggregation.

    The shuffle moves one partial row per (key, window, batch) — bounded by
    windows × keys, not events.
    """
    keys = list(key_cols) + ["window_start"]

    def partial(batch: pa.Table) -> pa.Table:
        b = add_tumbling_window(batch, ts_col, unit)
        agg = b.select(keys + [value_col]).group_by(keys).aggregate(
            [(value_col, "sum"), (value_col, "count")]
        )
        return agg.rename_columns(keys + ["partial_sum", "partial_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(
        Sum("partial_n", alias_name="n_events"),
        Sum("partial_sum", alias_name="sum_value"),
    )


def sessionize(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> "ray.data.Dataset":
    """Session windows per key: sort-within-group + gap split.

    ``groupby(key).map_groups`` sorts each key's events by time (the only
    per-key state needed); emits one row per session with start/end/count.
    Assumes a single key's events fit in a worker — the same per-key bound
    any keyed-window system needs.
    """

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(0.0)
        session_id = (gap > gap_seconds).cumsum()
        out = (
            g.assign(__s=session_id)
            .groupby("__s")
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
