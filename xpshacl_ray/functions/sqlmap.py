"""Declarative SQL-on-batch projection — the map-stage generalization of
``SqlCheck`` (spec.py C19): a SQL SELECT evaluated zero-copy by DuckDB on
each Arrow batch, distributed by Ray Data.

Use for transforms that SQL expresses better than Arrow kernels — JSON
field extraction, CASE ladders, date arithmetic, string functions — while
keeping the pipeline streaming: each task holds a per-process DuckDB
connection (created once, reused across batches), the batch registers as
a zero-copy Arrow view, and the projected result replaces the batch.

Declarative like SqlCheck: the transform is pure data (a string), so it
can be stored in configs, audited and diffed — the tabular analog of the
reference's "SPARQL inside the shapes" property
(/root/reference/data/shark_shapes.ttl:48-149).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

import ray.data

_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
        _CON.execute("SET threads TO 1")  # Ray owns the parallelism
        _CON.execute("SET preserve_insertion_order = true")
    return _CON


def sql_project(
    ds: "ray.data.Dataset",
    select_sql: str,
    columns: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Project every batch through ``SELECT ... FROM batch``.

    ``select_sql`` must read from the table named ``batch`` and be a pure
    row-local projection/filter — per-batch evaluation is only equivalent
    to whole-table evaluation when the SQL has no cross-row state
    (no aggregates over ``batch``, no window functions, no ORDER/LIMIT).
    That property is the CALLER's contract, same as any map_batches fn;
    aggregates belong in a combiner + groupby, not here.

    ``columns`` (optional) prunes the input read before the SQL runs —
    declare what the SELECT touches, exactly like ``SqlCheck.columns``.
    """
    if columns:
        ds = ds.select_columns(list(columns))

    def project(b: pa.Table) -> pa.Table:
        con = _con()
        con.register("batch", b)
        try:
            out = con.execute(select_sql).arrow()
        finally:
            con.unregister("batch")
        return out if isinstance(out, pa.Table) else pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")
