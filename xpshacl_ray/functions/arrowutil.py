"""Small Arrow helpers shared across stages/functions."""

from __future__ import annotations

from typing import Dict

import pyarrow as pa


def agg_select(g: pa.Table, mapping: Dict[str, str]) -> pa.Table:
    """Select + rename a ``Table.group_by().aggregate()`` result BY NAME.

    pyarrow's aggregate output column ORDER (keys-first vs
    aggregates-first) is undocumented and has varied across versions; a
    positional ``rename_columns`` would silently scramble column
    semantics on a pyarrow upgrade.  The output NAMES are stable
    (``<col>_<agg>``, ``count_all``), so select by them.  ``mapping`` is
    an ordered ``{source_name: output_name}`` dict.
    """
    return pa.table({new: g[old] for old, new in mapping.items()})
