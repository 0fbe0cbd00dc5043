"""Referential / FK existence checks (C4) — broadcast anti-join.

The reference's ``sh:class`` check ("the FK value's referent has the
required type", SURVEY.md C4) becomes: broadcast the referenced key set once
via ``ray.put`` (zero-copy Arrow in the object store), then a vectorized
``pc.is_in`` anti-join inside ``map_batches``.  No shuffle: at 100 TB the
fact table streams while the dimension-key set is read from shared memory by
every task on a node.

For dimension sides too big to broadcast, callers can pass a pre-bucketed
key set per partition or fall back to a partitioned hash join (see
``xpshacl_ray.functions.joins``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..spec import CompiledSpec
from .evaluate import evaluate_row_local


def distinct_keys(ref_ds: "ray.data.Dataset", column: str) -> pa.Array:
    """Distinct key values of the referenced column (small-side only).

    Pre-aggregates per batch before the distinct shuffle so only unique
    values per block move.
    """
    uniq_per_batch = ref_ds.select_columns([column]).map_batches(
        lambda b: b.group_by([column]).aggregate([]),
        batch_format="pyarrow",
    )
    vals = uniq_per_batch.unique(column)
    return pa.array(sorted(v for v in vals if v is not None))


@dataclass
class _RefMask:
    """Row-local adapter: violation where column value ∉ broadcast key set.

    The broadcast payload is either the exact key array (``pc.is_in``) or a
    :class:`~xpshacl_ray.functions.sketches.BloomFilter` — the scale path
    for dimension sides too large to ship exactly (one-sided error: a
    Bloom "absent" is a certain violation; up to fp_rate of true
    violations are missed — quantified, documented trade-off).

    ``null_is_violation=False`` (the default) excuses NULL FKs, matching
    the engine-wide SHACL null policy and the ``NOT IN`` oracle semantics;
    missing values are ``Required``'s responsibility.
    """

    column: str
    keys_ref: "ray.ObjectRef"
    null_is_violation: bool = False

    def mask(self, batch: pa.Table):
        from ..functions.sketches import BloomFilter

        keys = ray.get(self.keys_ref)  # zero-copy from local object store
        col = batch[self.column]
        if isinstance(keys, BloomFilter):
            import numpy as np

            # vectorized rendering: Arrow cast-to-string (no per-value
            # Python str()), null slots probed as "" then masked out
            s = pc.cast(col, pa.string())
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            valid = np.asarray(pc.is_valid(s))
            rendered = pc.fill_null(s, "").to_numpy(zero_copy_only=False)
            present = keys.might_contain(rendered)
            if self.null_is_violation:
                return pa.array(~present | ~valid)
            return pa.array(~present & valid)
        # pc.is_in yields False (not null) for null inputs, so gate on
        # validity explicitly rather than via fill_null
        bad = pc.invert(pc.is_in(col, value_set=keys))
        if self.null_is_violation:
            return pc.fill_null(pc.or_(bad, pc.is_null(col)), True)
        return pc.fill_null(pc.and_(bad, pc.is_valid(col)), False)


def conforming_keys(dim_ds: "ray.data.Dataset", key_column: str,
                    constraints: list) -> pa.Array:
    """Distinct keys of dimension rows satisfying EVERY row-local
    constraint — the Parquet-scale half of sh:node.  The TTL path walks
    the graph driver-side (``sources/ttl._NodeChecker``); at table
    scale the referenced shape's facets are evaluated vectorized over
    the dimension table in one streamed pass and the CONFORMING key
    set is broadcast (``ray.put``) for the fact-table anti-join probe
    (:class:`_RefMask`) — no shuffle touches the fact side.

    Engine-wide SHACL null policy applies: a NULL facet value never
    violates a value constraint (zero-valued rows are minCount /
    Required's job), so such rows still conform.  Per-batch distinct
    pre-aggregation runs before the small ``unique()`` exchange — only
    unique keys per block move."""
    vals = dim_ds.map_batches(
        _conforming_filter(key_column, constraints),
        batch_format="pyarrow").unique(key_column)
    return pa.array(sorted(v for v in vals if v is not None))


def _conforming_filter(key_column: str, constraints: list):
    """Per-batch kernel shared by :func:`conforming_keys` and
    :func:`conforming_bloom`: keep rows with a valid key that no
    constraint flags, project to the key column, pre-dedup."""
    import numpy as np

    def passing(b: pa.Table) -> pa.Table:
        key = b[key_column]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        ok = np.asarray(pc.is_valid(key), dtype=bool)
        for c in constraints:
            m = c.mask(b)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            ok &= ~np.asarray(pc.fill_null(m, False), dtype=bool)
        return (b.filter(pa.array(ok)).select([key_column])
                .group_by([key_column]).aggregate([]))

    return passing


def conforming_bloom(dim_ds: "ray.data.Dataset", key_column: str,
                     constraints: list, expected_items: int,
                     fp_rate: float = 0.01):
    """Bloom-filter form of :func:`conforming_keys` — the scale path
    when even the CONFORMING key set is too large to broadcast exactly
    (same trade-off as :func:`bloom_keys`: a Bloom "absent" is a
    certain violation, up to ``fp_rate`` of true violations are
    missed; one-sided, quantified).  One streamed pass, per-batch
    partial filters OR-merge on the driver — no distinct exchange at
    all."""
    from ..functions.sketches import BloomFilter

    flt = _conforming_filter(key_column, constraints)

    def partial(b: pa.Table) -> pa.Table:
        f = BloomFilter(n_items=expected_items, fp_rate=fp_rate)
        keys = flt(b)[key_column]
        s = pc.cast(keys, pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        f.add(s.drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    blobs = dim_ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = None
    for r in blobs:
        f = BloomFilter.from_bytes(r["bloom"])
        out = f if out is None else out.merge(f)
    return out if out is not None else BloomFilter(n_items=expected_items,
                                                   fp_rate=fp_rate)


def bloom_keys(ref_ds: "ray.data.Dataset", column: str,
               expected_items: int, fp_rate: float = 0.01):
    """Mergeable Bloom filter of the referenced key set (one pass, no
    distinct shuffle: per-batch partial filters OR-merge on the driver)."""
    from ..functions.sketches import BloomFilter

    def partial(b: pa.Table) -> pa.Table:
        f = BloomFilter(n_items=expected_items, fp_rate=fp_rate)
        # Arrow cast-to-string rendering — must match the probe side
        # (_RefMask) exactly; both are vectorized, no per-value str()
        s = pc.cast(b[column], pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        f.add(s.drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    blobs = ref_ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    out = None
    for r in blobs:
        f = BloomFilter.from_bytes(r["bloom"])
        out = f if out is None else out.merge(f)
    return out if out is not None else BloomFilter(n_items=expected_items,
                                                   fp_rate=fp_rate)


def evaluate_referential(
    ds: "ray.data.Dataset",
    spec: CompiledSpec,
    ref_keys: dict,
) -> List["ray.data.Dataset"]:
    """Run every referential constraint as a broadcast anti-join stage.

    ``ref_keys`` maps constraint ``column`` → pa.Array | ray.ObjectRef of
    the allowed key set (call :func:`distinct_keys` to build one).
    """
    results = []
    for cc in spec.referential:
        c = cc.constraint
        keys = ref_keys[c.column]
        keys_ref = keys if isinstance(keys, ray.ObjectRef) else ray.put(keys)
        adapter = _RefMask(
            column=c.column,
            keys_ref=keys_ref,
            null_is_violation=getattr(c, "null_is_violation", False),
        )
        wrapped = replace(cc, constraint=adapter)  # reuse the fused emitter
        sub = CompiledSpec(
            row_local=[wrapped],
            grouped=[],
            referential=[],
            id_columns=spec.id_columns,
            focus_template=spec.focus_template,
        )
        results.append(
            ds.map_batches(
                lambda b, sub=sub: evaluate_row_local(b, sub),
                batch_format="pyarrow",
            )
        )
    return results
