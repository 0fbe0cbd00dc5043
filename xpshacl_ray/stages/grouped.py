"""Grouped cardinality / uniqueness checks (C1/C2/C11) — shuffle #1.

Strategy (SURVEY.md §2.2, §4): never shuffle full rows.  Each grouped
constraint projects to its key columns only, pre-aggregates counts
*within each batch* via ``pyarrow.Table.group_by`` (the combiner), then runs a
small ``groupby(keys).aggregate(Sum)`` over the per-batch partials.  The
shuffle therefore moves one row per (key, batch) — bounded by distinct keys,
not input rows.  At 100 TB the wide `content` column never enters the
exchange.

Violating groups are a tiny table; violation rows are built driver-side from
it, with dynamic ``actualCount`` context exactly as the reference enriches
cardinality context (extended_shacl_validator.py:292-318).

Considered and rejected — combiner-side early-violation emit: a batch whose
partial count already exceeds ``max_count`` proves the group violates, but
the violation row must still report the EXACT global ``actualCount`` (the
reference's enrichment contract), so its partial cannot be dropped from the
exchange; capping partials at ``max_count + 1`` preserves the violates/
not-violates decision but corrupts the reported count.  The exchange already
moves only one (key, partial) row per group per batch — there is nothing
sound left to prune without a second count-recovery pass, which is exactly
the ``hashed`` strategy below.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.arrowutil import agg_select
from ..spec import CompiledConstraint, CompiledSpec, MaxCount, MinCount
from .evaluate import violations_schema


def partial_group_counts(batch: pa.Table, keys: List[str],
                         value_col: Optional[str]) -> pa.Table:
    """Within-batch combiner: one row per key with a partial count."""
    cols = list(keys) + ([value_col] if value_col and value_col not in keys else [])
    t = batch.select(cols)
    if value_col and value_col not in keys:
        agg = t.group_by(keys).aggregate([(value_col, "count")])
        n = agg.column(f"{value_col}_count")
        agg = agg.drop_columns([f"{value_col}_count"]).append_column("partial_n", n)
    else:
        agg = t.group_by(keys).aggregate([([], "count_all")])
        n = agg.column("count_all")
        agg = agg.drop_columns(["count_all"]).append_column("partial_n", n)
    return agg


def group_counts(ds: "ray.data.Dataset", keys: List[str],
                 value_col: Optional[str]) -> "ray.data.Dataset":
    """count(value_col non-null) (or rows) per key group, pre-aggregated."""
    partial = ds.map_batches(
        lambda b: partial_group_counts(b, keys, value_col),
        batch_format="pyarrow",
    )
    out = partial.groupby(keys).aggregate(Sum("partial_n", alias_name="actual_count"))
    return out


def _grouped_violation_rows(
    groups: pa.Table,
    cc: CompiledConstraint,
    keys: List[str],
    spec: CompiledSpec,
    id_types: List[pa.DataType],
) -> pa.Table:
    """Build violation rows from violating groups — vectorized so a
    pathological spec (every group violating) still streams."""
    import numpy as np
    import pyarrow.compute as pc

    n = groups.num_rows
    params = json.loads(cc.context_json)
    schema = violations_schema(spec.id_columns, id_types)
    counts = groups["actual_count"]
    count_str = pc.cast(pc.cast(counts, pa.int64()), pa.string())

    # focus: "group:<k1>/<k2>/..."
    parts = [pa.array(np.repeat("group:", n))]
    for i, k in enumerate(keys):
        if i:
            parts.append(pa.array(np.repeat("/", n)))
        col = groups[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.cast(col, pa.string()))
    focus = pc.binary_join_element_wise(*parts, "")

    # context JSON with per-row actualCount (static params + dynamic count)
    prefix = json.dumps(params, sort_keys=True)[:-1]  # strip closing brace
    sep = ', "actualCount": ' if prefix.strip() != "{" else '"actualCount": '
    ctx = pc.binary_join_element_wise(
        pa.array(np.repeat(prefix + sep, n)), count_str,
        pa.array(np.repeat("}", n)), "",
    )

    cols = {}
    for c, t in zip(spec.id_columns, id_types):
        if c in groups.column_names:
            col = groups[c]
            cols[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        else:
            cols[c] = pa.nulls(n, t)
    static = {
        "shape_id": cc.shape_id, "constraint_id": cc.constraint_id,
        "violation_type": cc.violation_type,
        "property_path": cc.property_path, "message": cc.message,
        "severity": cc.severity, "signature": cc.signature,
        "signature_key": cc.sig_key,
    }
    cols["focus_node"] = focus
    cols["value"] = count_str
    cols["context"] = ctx
    for name, v in static.items():
        cols[name] = (pa.nulls(n, pa.string()) if v is None
                      else pa.array(np.repeat(v, n)))
    return pa.table({name: cols[name] for name in schema.names})


def _key_hashes(batch: pa.Table, keys: List[str]) -> np.ndarray:
    """64-bit hash of the composite key (vectorized)."""
    import pyarrow.compute as pc

    from ..functions.sketches import hash64

    parts = []
    for i, k in enumerate(keys):
        if i:
            parts.append(pa.array(np.repeat("\x1f", len(batch))))
        col = batch[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.fill_null(pc.cast(col, pa.string()), "\x00"))
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "")
    # object ndarray straight from Arrow (no Python list detour —
    # measured 6x on 500k string keys; hash values are identical)
    return hash64(joined.to_numpy(zero_copy_only=False)).astype(np.uint64)


def estimate_group_count(ds: "ray.data.Dataset", keys: List[str],
                         hll_p: int = 14) -> float:
    """Distinct-group estimate in ONE streaming pass with NO shuffle.

    Per-batch HLL sketches of the composite key hash (one ~16 KB row per
    batch) merge on the driver — the planning primitive for choosing the
    grouped exchange strategy / pre-sizing a shuffle ("Every Row Counts",
    CIDR 2019 motivates sketch-based group-by estimates).
    """
    from ..functions.sketches import HyperLogLog

    def partial(b: pa.Table) -> pa.Table:
        h = HyperLogLog(p=hll_p)
        h.add_hashes(_key_hashes(b, keys))
        return pa.table({"hll": pa.array([h.to_bytes()], pa.binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow").take_all()
    from ..functions.sketches import HyperLogLog as _H

    merged = _H.merge_many([r["hll"] for r in blobs])
    return merged.estimate() if blobs else 0.0


#: group-cardinality above which "auto" picks the hashed exchange — the
#: measured crossover is where shuffling key strings dominates (BASELINE.md
#: puts it far beyond bench scale; the default is deliberately high so
#: small/medium runs keep the pipelined keys strategy)
AUTO_HASHED_GROUPS = 50_000_000


def evaluate_grouped(
    ds: "ray.data.Dataset",
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
    strategy: str = "keys",
    auto_hashed_groups: float = AUTO_HASHED_GROUPS,
) -> List["ray.data.Dataset"]:
    """Run every grouped constraint; returns one violations Dataset each.

    Two exchange strategies (measured trade-off, see BASELINE.md):

    - ``"keys"`` (default): lazy pre-aggregated groupby on the key columns.
      Stays fully pipelined with the row-local scan (they execute
      concurrently inside one streaming execution) — fastest up to the
      point where shuffling the key strings dominates.
    - ``"hashed"``: the all-to-all moves one (64-bit key hash carried as
      its int64 view — Ray's shuffle pickles out-of-range uint64 — plus an
      int64 partial count) pair per (group, batch) — never key strings —
      then ONE broadcast-filtered scan recovers the key tuples of the
      (rare by design) violating groups.  ~6× fewer shuffle bytes for
      string keys; costs an execution barrier + a second input scan, so it
      wins only when the exchange itself is the bottleneck (10^9+ groups).
    - ``"auto"``: plans per constraint from a one-pass NO-shuffle HLL
      group-cardinality estimate (:func:`estimate_group_count` over the
      pruned key columns — the CIDR'19 sketch-planning pattern): hashed
      iff the estimate exceeds ``auto_hashed_groups``.  The planning pass
      costs one scan of the key columns; at scale that is small against
      the exchange it can shrink ~6×.
    """
    from ..spec import GroupedSparql

    sparql = [cc for cc in spec.grouped
              if isinstance(cc.constraint, GroupedSparql)]
    if sparql:
        counts_only = CompiledSpec(
            row_local=[], referential=[],
            grouped=[cc for cc in spec.grouped if cc not in sparql],
            id_columns=spec.id_columns, focus_template=spec.focus_template,
        )
        out = evaluate_grouped(ds, counts_only, id_types, strategy,
                               auto_hashed_groups) if counts_only.grouped else []
        for cc in sparql:
            out.append(_evaluate_grouped_sparql(ds, cc, spec, id_types))
        return out
    if strategy == "keys":
        return _evaluate_grouped_keys(ds, spec, id_types)
    if strategy == "hashed":
        return _evaluate_grouped_hashed(ds, spec, id_types)
    if strategy != "auto":
        raise ValueError(f"unknown grouped strategy {strategy!r}")
    results: List["ray.data.Dataset"] = []
    for cc in spec.grouped:
        keys = list(cc.constraint.group_by)
        est = estimate_group_count(ds.select_columns(keys), keys)
        sub = CompiledSpec(
            row_local=[], grouped=[cc], referential=[],
            id_columns=spec.id_columns,
            focus_template=spec.focus_template,
        )
        impl = (_evaluate_grouped_hashed if est > auto_hashed_groups
                else _evaluate_grouped_keys)
        results += impl(ds, sub, id_types)
    return results


def _evaluate_grouped_keys(
    ds: "ray.data.Dataset",
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
) -> List["ray.data.Dataset"]:
    if id_types is None:
        sch = ds.schema()
        tmap = dict(zip(sch.names, sch.types))
        id_types = [tmap[c] for c in spec.id_columns]
    results = []
    for cc in spec.grouped:
        c = cc.constraint
        keys = list(c.group_by)
        counts = group_counts(ds, keys,
                              c.column if c.column not in keys else None)
        if isinstance(c, MaxCount):
            bad = counts.filter(expr=f"actual_count > {int(c.max_count)}")
        elif isinstance(c, MinCount):
            bad = counts.filter(expr=f"actual_count < {int(c.min_count)}")
        else:  # pragma: no cover
            raise TypeError(f"not a grouped constraint: {c}")

        def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
            return _grouped_violation_rows(batch, cc, keys, spec, id_types)

        results.append(bad.map_batches(to_rows, batch_format="pyarrow"))
    return results


def _evaluate_grouped_sparql(
    ds: "ray.data.Dataset",
    cc: CompiledConstraint,
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
    force_map_groups: bool = False,
) -> "ray.data.Dataset":
    """C19 grouped form (GroupedSparql): one ``map_groups`` pass.

    The exchange ships only ``group_by`` + the fn's declared ``columns``
    (prune-at-the-read); each violating group emits ONE
    ``(keys, actual_count)`` row — SPARQL ``SELECT DISTINCT $this`` — then
    reuses the grouped violation-row builder so focus/value/context match
    the cardinality family byte-for-byte.

    A constraint carrying a declarative :class:`~xpshacl_ray.spec.
    GroupPredicate` instead routes to the fully vectorized bucket sweep
    (:func:`_evaluate_grouped_sparql_vectorized`) — no per-focus-group
    Python.  ``force_map_groups=True`` keeps such a constraint on the
    per-group path (via the predicate's derived fn) — the path-parity
    forcing knob, test-only."""
    if id_types is None:
        sch0 = ds.schema()
        tmap0 = dict(zip(sch0.names, sch0.types))
        id_types = [tmap0[c] for c in spec.id_columns]
    c = cc.constraint
    if getattr(c, "predicate", None) is not None and not force_map_groups:
        return _evaluate_grouped_sparql_vectorized(ds, cc, spec, id_types)
    keys = list(c.group_by)
    cols = keys + [x for x in _sparql_value_cols(c) if x not in keys]
    sub = ds.select_columns(cols)
    if (getattr(c, "path_rows_only", False) and c.path
            and "predicate" in cols):
        # contract: fn reads only predicate==path rows and a group
        # without them never violates — prune BEFORE the shuffle so
        # sparse-predicate groups do not shuffle at all
        path_iri = c.path

        def keep_path_rows(b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return b.filter(_pc.fill_null(
                _pc.equal(b["predicate"], path_iri), False))

        sub = sub.map_batches(keep_path_rows, batch_format="pyarrow")
    sch = ds.schema()
    tmap = dict(zip(sch.names, sch.types))
    out_schema = pa.schema([(k, tmap[k]) for k in keys]
                           + [("actual_count", pa.int64())])
    # predicate wins over fn when both are set ("fn is ignored when
    # predicate is given") — otherwise force_map_groups would compare
    # two DIFFERENT predicates in the path-parity test (ADVICE r4)
    pred = getattr(c, "predicate", None)
    fn = pred.fn if pred is not None else c.fn

    max_rows = getattr(c, "max_group_rows", 0) or 0

    def per_group(g: pa.Table) -> pa.Table:
        if max_rows and g.num_rows > max_rows:
            raise ValueError(
                f"GroupedSparql {c.name!r}: focus group of {g.num_rows} "
                f"rows exceeds max_group_rows={max_rows} — a skewed key "
                f"broke the rows-per-subject bound; cap or salt upstream")
        if g.num_rows and bool(fn(g)):
            row = {k: [g[k][0].as_py()] for k in keys}
            row["actual_count"] = [g.num_rows]
            return pa.table(row, schema=out_schema)
        return out_schema.empty_table()

    bad = sub.groupby(keys).map_groups(per_group, batch_format="pyarrow")

    def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
        return _grouped_violation_rows(batch, cc, keys, spec, id_types)

    return bad.map_batches(to_rows, batch_format="pyarrow")


def _sparql_value_cols(c) -> List[str]:
    """The non-key columns a GroupedSparql constraint reads: its
    declared ``columns`` plus whatever a declarative predicate needs."""
    cols = list(c.columns)
    p = getattr(c, "predicate", None)
    if p is not None:
        for extra in (p.agg_col, p.where_col, p.order_col):
            if extra and extra not in cols:
                cols.append(extra)
    return cols


def _monotone_metric_table(sel: pa.Table, keys: List[str], p) -> pa.Table:
    """(keys, __metric__) for ``agg='monotone'`` over ONE bucket: the
    count of violating order-runs per focus key, computed in one numpy
    segment sweep across ALL groups in the bucket — no per-group
    Python.  Mirrors :func:`xpshacl_ray.spec._monotone_violating_runs`
    run for run: a run of equal order values violates when its min
    value is below the max over strictly-smaller-order rows of the
    same key."""
    import pandas as pd
    import pyarrow.compute as pc

    empty = pa.table({**{k: sel[k].slice(0, 0) for k in keys},
                      "__metric__": pa.array([], pa.int64())})
    if sel.num_rows == 0:
        return empty
    # temporal → int64 keeps the numpy sweep on primitive kernels
    # (order-isomorphic, so the metric is unchanged)
    cast_cols = {}
    for cname in (p.order_col, p.agg_col):
        typ = sel.schema.field(cname).type
        if pa.types.is_temporal(typ):
            cast_cols[cname] = pc.cast(sel[cname], pa.int64())
    if cast_cols:
        for cname, arr in cast_cols.items():
            sel = sel.set_column(sel.schema.get_field_index(cname),
                                 cname, arr)
    df = sel.select(keys + [p.order_col, p.agg_col]).to_pandas()
    df = df.sort_values(keys + [p.order_col], kind="mergesort",
                        ignore_index=True)
    o = df[p.order_col].to_numpy()
    v = df[p.agg_col].to_numpy()
    if v.dtype.kind in ("O", "U", "S"):
        # strings → order-isomorphic int codes (np.unique sorts), so
        # reduceat/cummax stay on primitive C kernels
        _, v = np.unique(v, return_inverse=True)
    new_seg = np.zeros(len(df), dtype=bool)
    new_seg[0] = True
    for k in keys:
        col = df[k].to_numpy()
        new_seg[1:] |= col[1:] != col[:-1]
    new_run = new_seg.copy()
    new_run[1:] |= o[1:] != o[:-1]
    run_starts = np.flatnonzero(new_run)
    run_max = np.maximum.reduceat(v, run_starts)
    run_min = np.minimum.reduceat(v, run_starts)
    seg_id_row = np.cumsum(new_seg) - 1
    seg_of_run = seg_id_row[run_starts]
    # per-segment shifted prefix max over runs (pandas cummax is the
    # C-vectorized segmented cumulative max)
    s = pd.Series(run_max)
    prev = s.groupby(seg_of_run).cummax().groupby(seg_of_run).shift(1)
    with np.errstate(invalid="ignore"):
        viol = run_min < prev.to_numpy()  # NaN/NaT prev → False
    n_seg = int(seg_id_row[-1]) + 1
    metric = np.bincount(seg_of_run[viol],
                         minlength=n_seg).astype(np.int64)
    seg_starts = np.flatnonzero(new_seg)
    out = {}
    for k in keys:
        out[k] = pa.array(df[k].to_numpy()[seg_starts]).cast(
            empty.schema.field(k).type)
    out["__metric__"] = pa.array(metric, pa.int64())
    return pa.table(out)


def _evaluate_grouped_sparql_vectorized(
    ds: "ray.data.Dataset",
    cc: CompiledConstraint,
    spec: CompiledSpec,
    id_types: List[pa.DataType],
) -> "ray.data.Dataset":
    """Vectorized GroupedSparql for declarative predicates (VERDICT r3
    item 5) — the ``funnel_counts`` bucket pattern instead of
    Python-per-focus-group ``map_groups``:

    1. prune to keys + predicate columns, tag each row with
       ``hash(keys) % n_buckets`` (many focus groups per bucket);
    2. ONE shuffle co-locates each bucket; inside, everything is Arrow
       C kernels — per-key totals via ``group_by(keys).count_all``, the
       metric via count / distinct-pair-then-count, a left-outer join
       back to totals (absent-after-filter keys count 0, so ``< k``
       minCount-style ops stay correct), one comparison kernel;
    3. violating keys emit ``(keys, actual_count)`` rows into the same
       grouped violation-row builder as the map_groups path — outputs
       are row-for-row identical (pinned by the forcing test).

    Partitioning bound: a bucket holds rows/n_buckets of the PRUNED
    columns — the same per-task bound every bucketed stage in the
    engine documents; the per-focus-group Python floor is gone."""
    import ray  # noqa: F401

    from ..functions.sketches import key_hash64

    c = cc.constraint
    p = c.predicate
    keys = list(c.group_by)
    cols = keys + [x for x in _sparql_value_cols(c) if x not in keys]
    sub = ds.select_columns(cols)
    sch = ds.schema()
    tmap = dict(zip(sch.names, sch.types))

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_buckets = 4 * max(cpus, 1)

    def add_bucket(b: pa.Table) -> pa.Table:
        # key_hash64 (null-layout-independent): an int key column whose
        # batch holds any null would otherwise widen to float64 and
        # split one focus group across buckets (ADVICE r4 class of bug)
        h = key_hash64(b[keys[0]])
        for k in keys[1:]:
            h = h * np.uint64(0x9E3779B97F4A7C15) + key_hash64(b[k])
        bk = (h % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column("__bucket__", pa.array(bk))

    out_schema = pa.schema([(k, tmap[k]) for k in keys]
                           + [("actual_count", pa.int64())])

    def bucket_sweep(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.drop_columns(["__bucket__"])
        tot = g.group_by(keys).aggregate([([], "count_all")])
        sel = g
        if p.where_col is not None:
            sel = sel.filter(pc.equal(sel[p.where_col], p.where_val))
        if p.agg == "count":
            agg = sel.group_by(keys).aggregate([([], "count_all")])
            metric_col = "count_all"
        elif p.agg == "distinct":
            pairs = sel.group_by(keys + [p.agg_col]).aggregate([])
            agg = pairs.group_by(keys).aggregate([(p.agg_col, "count")])
            metric_col = f"{p.agg_col}_count"
        else:  # monotone: one numpy segment sweep over the whole bucket
            agg = _monotone_metric_table(sel, keys, p)
            metric_col = "__metric__"
        # rebuild by NAME (group_by output column order is an Arrow
        # implementation detail) and avoid a count_all name collision
        agg = pa.table({**{k: agg[k] for k in keys},
                        "__metric__": agg[metric_col]})
        j = tot.join(agg, keys=keys, join_type="left outer")
        metric = np.asarray(
            pc.fill_null(pc.cast(j["__metric__"], pa.int64()), 0))
        mask = np.asarray(p.compare(metric), dtype=bool)
        bad = j.filter(pa.array(mask))
        out = {k: bad[k] for k in keys}
        out["actual_count"] = pc.cast(bad["count_all"], pa.int64())
        return pa.table(out, schema=out_schema)

    bad = (sub.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__bucket__")
           .map_groups(bucket_sweep, batch_format="pyarrow"))

    def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
        return _grouped_violation_rows(batch, cc, keys, spec, id_types)

    return bad.map_batches(to_rows, batch_format="pyarrow")


#: violating-hash broadcast bound for the hashed strategy: ~8 MB of
#: int64 hash values; past this the join-recovery path takes over (the
#: "violations are rare by design" assumption no longer holds)
HASHED_BROADCAST_LIMIT = 1_000_000


def _recover_violations_join(ds, bad, n_bad, cc, keys, spec, id_types):
    """Key recovery for huge violating sets — ONE co-partitioned shuffle,
    violations stream out of the bucket tasks:

    - the input scan is PRUNED to the key columns, per-batch distinct
      (keys, kh) pairs are Bloom-prefiltered to ~violating groups before
      the exchange (≤ fp_rate false positives, dropped exactly in-bucket);
    - both sides ship with the SAME column layout (no mixed-schema
      frames, no pandas-merge suffix collisions with user column names);
    - equal-kh rows land in one bucket, so per-group dedup + violation-row
      construction happen in the bucket task — no second shuffle, no
      per-group Python UDF calls;
    - bucket count scales with the violating-set size so per-task frames
      stay bounded."""
    import ray as _ray

    from ..functions.sketches import BloomFilter, hash64

    if "__kh__" in keys or "__side__" in keys:
        raise ValueError("group_by keys may not be named __kh__/__side__")
    n_buckets = int(max(64, min(4096, n_bad // 50_000 + 1)))

    sch = ds.schema()
    key_types = [dict(zip(sch.names, sch.types))[k] for k in keys]

    # Bloom of the violating hashes (~1.2 MB per million at 1% fp):
    # prunes the all-groups left side down to ~violating before shuffling
    bloom = BloomFilter(n_items=max(1024, n_bad), fp_rate=0.01)
    for blk in bad.iter_batches(batch_format="pyarrow", batch_size=None):
        # int64 hashes go straight into the vectorized hasher — building
        # a Python str per value here cost more than the probe itself
        bloom.add(np.asarray(blk["kh"], dtype=np.int64))
    bloom_ref = _ray.put(bloom)

    def lhs_rows(b: pa.Table) -> pa.Table:
        f = _ray.get(bloom_ref)
        t = b.select(keys).append_column(
            "__kh__", pa.array(_key_hashes(b, keys).view(np.int64)))
        t = t.group_by(keys + ["__kh__"]).aggregate([])
        keep = f.might_contain(np.asarray(t["__kh__"], dtype=np.int64))
        t = t.filter(pa.array(keep))
        return t.append_column(
            "__cnt__", pa.nulls(t.num_rows, pa.int64())).append_column(
            "__side__", pa.array(np.repeat("l", t.num_rows))).append_column(
            "__bucket__", pa.array(
                (hash64(np.asarray(t["__kh__"], dtype=np.int64)) % n_buckets
                 ).astype(np.int32)))

    def rhs_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kh = pc.cast(b["kh"], pa.int64())
        cols = {k: pa.nulls(len(b), t) for k, t in zip(keys, key_types)}
        cols["__kh__"] = kh
        cols["__cnt__"] = pc.cast(b["actual_count"], pa.int64())
        cols["__side__"] = pa.array(np.repeat("r", len(b)))
        cols["__bucket__"] = pa.array(
            (hash64(np.asarray(kh, dtype=np.int64)) % n_buckets).astype(np.int32))
        return pa.table(cols)

    lhs = ds.select_columns(keys).map_batches(lhs_rows,
                                              batch_format="pyarrow")
    rhs = bad.map_batches(rhs_rows, batch_format="pyarrow")
    empty_viol = violations_schema(spec.id_columns, id_types).empty_table()

    def bucket_violations(g: pa.Table) -> pa.Table:
        # pure-Arrow bucket task: a pandas frame would NaN-fill the rhs's
        # null key columns and upcast int64 keys to float64, corrupting
        # keys >= 2^53 and changing output dtypes vs the other strategies
        import pyarrow.compute as pc

        is_r = pc.equal(g["__side__"], "r")
        rhs_g = g.filter(is_r)
        cmap = dict(zip(rhs_g["__kh__"].to_pylist(),
                        rhs_g["__cnt__"].to_pylist()))
        lhs_g = g.filter(pc.invert(is_r))
        if lhs_g.num_rows == 0 or not cmap:
            return empty_viol
        keep = pc.is_in(lhs_g["__kh__"], value_set=pa.array(
            sorted(cmap), pa.int64()))  # drops Bloom fps exactly
        lhs_g = lhs_g.filter(keep)
        if lhs_g.num_rows == 0:
            return empty_viol
        lhs_g = lhs_g.group_by(["__kh__"] + keys).aggregate([])  # dedupe
        groups_tbl = lhs_g.select(keys).append_column(
            "actual_count",
            pa.array([int(cmap[k]) for k in lhs_g["__kh__"].to_pylist()],
                     pa.int64()))
        return _grouped_violation_rows(groups_tbl, cc, keys, spec,
                                       id_types)

    return lhs.union(rhs).groupby("__bucket__").map_groups(
        bucket_violations, batch_format="pyarrow")


def _evaluate_grouped_hashed(
    ds: "ray.data.Dataset",
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
) -> List["ray.data.Dataset"]:
    import ray as _ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if id_types is None:
        sch = ds.schema()
        tmap = dict(zip(sch.names, sch.types))
        id_types = [tmap[c] for c in spec.id_columns]
    results = []
    for cc in spec.grouped:
        c = cc.constraint
        keys = list(c.group_by)
        value_col = c.column if c.column and c.column not in keys else None
        proj = keys + ([value_col] if value_col else [])

        def partial_hashed(b: pa.Table, keys=keys, value_col=value_col,
                           proj=proj) -> pa.Table:
            import pyarrow.compute as pc

            b = b.select(proj)
            kh = _key_hashes(b, keys)
            if value_col:
                cnt = np.asarray(
                    pc.is_valid(b[value_col]).combine_chunks()
                    if isinstance(b[value_col], pa.ChunkedArray)
                    else pc.is_valid(b[value_col])
                ).astype(np.int64)
            else:
                cnt = np.ones(len(b), dtype=np.int64)
            # int64 VIEW of the uint64 hash: Ray's shuffle pickles
            # uint64 values past int64 range into object extension
            # arrays (slow + opaque); the reinterpretation is lossless
            t = pa.table({"kh": pa.array(kh.view(np.int64)),
                          "partial_n": pa.array(cnt)})
            g = t.group_by(["kh"]).aggregate([("partial_n", "sum")])
            return agg_select(g, {"kh": "kh",
                                  "partial_n_sum": "partial_n"})

        counts = ds.map_batches(partial_hashed, batch_format="pyarrow") \
            .groupby("kh").aggregate(Sum("partial_n", alias_name="actual_count"))
        if isinstance(c, MaxCount):
            bad = counts.filter(expr=f"actual_count > {int(c.max_count)}")
        elif isinstance(c, MinCount):
            bad = counts.filter(expr=f"actual_count < {int(c.min_count)}")
        else:  # pragma: no cover
            raise TypeError(f"not a grouped constraint: {c}")

        # pin the (tiny) violating-hash table once: count + consumption
        # must not re-run the counting scan+shuffle
        bad = bad.materialize()
        n_bad = bad.count()
        if n_bad == 0:
            results.append(
                rd.from_arrow(
                    violations_schema(spec.id_columns, id_types).empty_table())
            )
            continue
        if n_bad > HASHED_BROADCAST_LIMIT:
            # pathological spec where MOST groups violate: the broadcast
            # set no longer fits — recover keys with a bucketed hash join
            # instead (streaming, no driver materialization)
            results.append(_recover_violations_join(
                ds, bad, n_bad, cc, keys, spec, id_types))
            continue

        # violating groups are small by design: collect (hash -> count),
        # broadcast, and recover the key tuples with one filtered scan
        bad_rows = bad.take_all()
        count_map = {int(r["kh"]): int(r["actual_count"])
                     for r in bad_rows}
        bad_set_ref = _ray.put(
            pa.array(np.array(sorted(count_map), dtype=np.int64)))

        def recover_keys(b: pa.Table, keys=keys) -> pa.Table:
            import pyarrow.compute as pc

            kh = pa.array(_key_hashes(b, keys).view(np.int64))
            mask = pc.is_in(kh, value_set=_ray.get(bad_set_ref))
            t = b.select(keys).append_column("kh", kh).filter(mask)
            return t.group_by(keys + ["kh"]).aggregate([])

        groups_tbl = pa.concat_tables(
            [b for b in ds.map_batches(recover_keys, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        # dedupe across batches, attach counts
        groups_tbl = groups_tbl.group_by(keys + ["kh"]).aggregate([])
        actual = pa.array(
            [count_map[int(h)] for h in groups_tbl["kh"].to_pylist()],
            pa.int64(),
        )
        groups_tbl = groups_tbl.drop_columns(["kh"]).append_column(
            "actual_count", actual)

        viol_rows = _grouped_violation_rows(groups_tbl, cc, keys, spec,
                                            id_types)
        results.append(rd.from_arrow(viol_rows))
    return results


# ---------------------------------------------------------------------------
# SiblingAntiJoin (C19 join form) — broadcast probe or bucketed anti-join
# ---------------------------------------------------------------------------

#: per-worker memo of ray.get'd edge-pair sets, keyed by ObjectRef hex —
#: one fetch per worker process, not one per focus group
_SIBLING_PAIRS_CACHE: dict = {}


def normalized_edge_pairs(edges: pa.Table) -> frozenset:
    """Undirected ``(lo, hi)`` pair set of an edge table with
    ``subject``/``object`` columns.  Direction-insensitive because
    :class:`~xpshacl_ray.spec.SiblingAntiJoin` applies its two NOT
    EXISTS filters in BOTH directions, so only unordered relatedness
    matters."""
    import pyarrow.compute as pc

    s, o = edges["subject"], edges["object"]
    lo = pc.min_element_wise(s, o).to_pylist()
    hi = pc.max_element_wise(s, o).to_pylist()
    return frozenset((a, b) for a, b in zip(lo, hi)
                     if a is not None and b is not None)


def _sibling_pairs(ref):
    if isinstance(ref, frozenset):  # driver-side / unit tests
        return ref
    key = ref.hex()
    if key not in _SIBLING_PAIRS_CACHE:
        import ray

        _SIBLING_PAIRS_CACHE[key] = ray.get(ref)
    return _SIBLING_PAIRS_CACHE[key]


def sibling_fn(pairs_ref, c):
    """Per-group violation fn for the BROADCAST plan of
    :class:`~xpshacl_ray.spec.SiblingAntiJoin`: True iff some normalized
    pair of the group's sibling set is absent from the edge-pair set.
    ``pairs_ref`` is a ``ray.ObjectRef`` of :func:`normalized_edge_pairs`
    output — ``ray.put`` ONCE on the driver, fetched once per worker
    (module memo), never re-shipped per batch."""

    def fn(g: pa.Table) -> bool:
        S = c.sibling_set(g)
        n = len(S)
        if n < 2:
            return False
        pairs = _sibling_pairs(pairs_ref)
        # S is sorted, so (S[i], S[j]) with i<j is already (lo, hi);
        # sibling sets are data-model-bounded (values per subject), so
        # the pair scan is tiny and early-exits on the first hit
        for i in range(n):
            for j in range(i + 1, n):
                if (S[i], S[j]) not in pairs:
                    return True
        return False

    return fn


def evaluate_sibling_join(
    ds: "ray.data.Dataset",
    edges,
    cc: CompiledConstraint,
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
) -> "ray.data.Dataset":
    """Bucketed anti-join plan for SiblingAntiJoin — the scale path when
    the edge relation exceeds ``edge_broadcast_limit`` (or ``=0`` forces
    it, the path-parity test knob).

    No driver-side edge set at any point: candidate (lo, hi) pairs are
    generated per focus group, unioned with the normalized edge pairs,
    and co-partitioned by ONE ``groupby(["lo", "hi"])`` — a pair bucket
    holding no edge row marks all its candidate subjects violating.  A
    final tiny ``groupby(subject)`` dedupes subjects that violate via
    several pairs.  Partitioning assumption: one (lo, hi) pair bucket
    fits in a worker (bounded by duplicate-edge multiplicity, not corpus
    size).  Per-bucket work is Python, so the broadcast plan stays the
    default whenever the edge relation is TBox-sized.

    ``edges``: Dataset or pa.Table of (subject, object) rows of
    ``edge_pred`` over the FULL graph (not target-scoped — NOT EXISTS
    consults the whole graph)."""
    import pyarrow.compute as pc

    c = cc.constraint
    keys = list(c.group_by)
    if id_types is None:
        sch0 = ds.schema()
        tmap0 = dict(zip(sch0.names, sch0.types))
        id_types = [tmap0[col] for col in spec.id_columns]

    pair_schema = pa.schema([
        ("lo", pa.string()), ("hi", pa.string()),
        ("subject", pa.string()), ("n_rows", pa.int64()),
        ("is_edge", pa.int64()),
    ])

    def pairs_of(g: pa.Table) -> pa.Table:
        S = c.sibling_set(g)
        n = len(S)
        if n < 2:
            return pair_schema.empty_table()
        subj = g["subject"][0].as_py()
        lo: List[str] = []
        hi: List[str] = []
        for i in range(n):
            for j in range(i + 1, n):
                lo.append(S[i])
                hi.append(S[j])
        k = len(lo)
        return pa.table(
            {"lo": lo, "hi": hi, "subject": [subj] * k,
             "n_rows": [g.num_rows] * k, "is_edge": [0] * k},
            schema=pair_schema)

    cand = (ds.select_columns(["subject", "predicate", "object"])
            .groupby("subject").map_groups(pairs_of, batch_format="pyarrow"))

    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    def edge_rows(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b["subject"]), pc.is_valid(b["object"]))
        b = b.filter(keep)
        k = b.num_rows
        return pa.table(
            {"lo": pc.min_element_wise(b["subject"], b["object"]),
             "hi": pc.max_element_wise(b["subject"], b["object"]),
             "subject": pa.array([""] * k, pa.string()),
             "n_rows": pa.array([0] * k, pa.int64()),
             "is_edge": pa.array([1] * k, pa.int64())},
            schema=pair_schema)

    edge_pairs = edges.map_batches(edge_rows, batch_format="pyarrow")

    bad_schema = pa.schema([("subject", pa.string()),
                            ("n_rows", pa.int64())])

    def bucket(g: pa.Table) -> pa.Table:
        if pc.any(pc.equal(g["is_edge"], 1)).as_py():
            return bad_schema.empty_table()
        return g.select(["subject", "n_rows"])

    viol_pairs = (cand.union(edge_pairs).groupby(["lo", "hi"])
                  .map_groups(bucket, batch_format="pyarrow"))

    out_schema = pa.schema([("subject", pa.string()),
                            ("actual_count", pa.int64())])

    def dedupe(g: pa.Table) -> pa.Table:
        return pa.table({"subject": [g["subject"][0].as_py()],
                         "actual_count": [g["n_rows"][0].as_py()]},
                        schema=out_schema)

    bad = viol_pairs.groupby("subject").map_groups(
        dedupe, batch_format="pyarrow")

    def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
        return _grouped_violation_rows(batch, cc, keys, spec, id_types)

    return bad.map_batches(to_rows, batch_format="pyarrow")


def evaluate_node_isolation(
    ds: "ray.data.Dataset",
    full,
    cc: CompiledConstraint,
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
) -> "ray.data.Dataset":
    """Anti-join plan for :class:`~xpshacl_ray.spec.NodeIsolation`:
    candidates (one slim row per focus node) union witness rows
    (subjects of ``outgoing`` / objects of ``incoming`` triples of the
    FULL graph) through ONE vectorized groupby — fully distributed, no
    broadcast, no per-group Python.

    ``ds``: the target-scoped triples Dataset (focus nodes' own rows);
    ``full``: Dataset or pa.Table of the FULL graph's
    (subject, predicate, object) rows (NOT EXISTS consults every
    triple)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    c = cc.constraint
    keys = list(c.group_by)
    if id_types is None:
        sch0 = ds.schema()
        tmap0 = dict(zip(sch0.names, sch0.types))
        id_types = [tmap0[col] for col in spec.id_columns]

    node_schema = pa.schema([("node", pa.string()),
                             ("n_rows", pa.int64()),
                             ("is_witness", pa.int64())])
    out_pred = pa.array(sorted(set(c.outgoing)), pa.string())
    in_pred = pa.array(sorted(set(c.incoming)), pa.string())

    def cand_rows(b: pa.Table) -> pa.Table:
        # per-batch combiner: one (node, partial_count) row per subject
        agg = b.select(["subject"]).group_by(["subject"]).aggregate(
            [([], "count_all")])
        k = agg.num_rows
        return pa.table(
            {"node": agg["subject"],
             "n_rows": pc.cast(agg["count_all"], pa.int64()),
             "is_witness": pa.array([0] * k, pa.int64())},
            schema=node_schema)

    cand = ds.select_columns(["subject"]).map_batches(
        cand_rows, batch_format="pyarrow")

    if isinstance(full, pa.Table):
        full = ray.data.from_arrow(full)

    def witness_rows(b: pa.Table) -> pa.Table:
        parts = []
        if len(out_pred):
            m = pc.is_in(b["predicate"], value_set=out_pred)
            parts.append(b.filter(pc.fill_null(m, False))["subject"])
        if len(in_pred):
            m = pc.is_in(b["predicate"], value_set=in_pred)
            parts.append(b.filter(pc.fill_null(m, False))["object"])
        nodes = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts]) if parts else pa.array([], pa.string())
        nodes = pc.drop_null(nodes)
        # batch-local dedup: the groupby needs one witness per node, not
        # one per occurrence — shrinks the exchange on dense graphs
        nodes = pc.unique(nodes)
        k = len(nodes)
        return pa.table(
            {"node": nodes, "n_rows": pa.array([0] * k, pa.int64()),
             "is_witness": pa.array([1] * k, pa.int64())},
            schema=node_schema)

    wit = full.select_columns(["subject", "predicate", "object"]) \
        .map_batches(witness_rows, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    agg = (cand.union(wit).groupby("node")
           .aggregate(Max("is_witness", alias_name="w"),
                      Sum("n_rows", alias_name="actual_count")))
    bad = agg.filter(expr="w == 0 and actual_count > 0").map_batches(
        lambda b: pa.table({"subject": b["node"],
                            "actual_count": pc.cast(b["actual_count"],
                                                    pa.int64())}),
        batch_format="pyarrow")

    def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
        return _grouped_violation_rows(batch, cc, keys, spec, id_types)

    return bad.map_batches(to_rows, batch_format="pyarrow")


def evaluate_membership(
    ds: "ray.data.Dataset",
    members,
    cc: CompiledConstraint,
    spec: CompiledSpec,
    id_types: Optional[List[pa.DataType]] = None,
) -> "ray.data.Dataset":
    """Mark the focus nodes of ``ds`` that appear in ``members`` (a
    Dataset/Table with one ``node`` column) — the mirror image of
    :func:`evaluate_node_isolation` (violation iff the witness IS
    present).  Used by :class:`~xpshacl_ray.spec.TransitiveCycle` to
    scope cycle membership back to the shape's target class.  One
    vectorized groupby; no broadcast, no per-group Python."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    c = cc.constraint
    keys = list(c.group_by)
    if id_types is None:
        sch0 = ds.schema()
        tmap0 = dict(zip(sch0.names, sch0.types))
        id_types = [tmap0[col] for col in spec.id_columns]

    node_schema = pa.schema([("node", pa.string()),
                             ("n_rows", pa.int64()),
                             ("is_witness", pa.int64())])

    def cand_rows(b: pa.Table) -> pa.Table:
        agg = b.select(["subject"]).group_by(["subject"]).aggregate(
            [([], "count_all")])
        k = agg.num_rows
        return pa.table(
            {"node": agg["subject"],
             "n_rows": pc.cast(agg["count_all"], pa.int64()),
             "is_witness": pa.array([0] * k, pa.int64())},
            schema=node_schema)

    cand = ds.select_columns(["subject"]).map_batches(
        cand_rows, batch_format="pyarrow")

    if isinstance(members, pa.Table):
        members = ray.data.from_arrow(members)

    def member_rows(b: pa.Table) -> pa.Table:
        nodes = b["node"]
        if not pa.types.is_string(nodes.type) and not \
                pa.types.is_large_string(nodes.type):
            nodes = pc.cast(nodes, pa.string())
        nodes = pc.drop_null(
            nodes.combine_chunks() if isinstance(nodes, pa.ChunkedArray)
            else nodes)
        k = len(nodes)
        return pa.table(
            {"node": nodes, "n_rows": pa.array([0] * k, pa.int64()),
             "is_witness": pa.array([1] * k, pa.int64())},
            schema=node_schema)

    wit = members.map_batches(member_rows, batch_format="pyarrow")
    agg = (cand.union(wit).groupby("node")
           .aggregate(Max("is_witness", alias_name="w"),
                      Sum("n_rows", alias_name="actual_count")))
    bad = agg.filter(expr="w == 1 and actual_count > 0").map_batches(
        lambda b: pa.table({"subject": b["node"],
                            "actual_count": pc.cast(b["actual_count"],
                                                    pa.int64())}),
        batch_format="pyarrow")

    def to_rows(batch: pa.Table, cc=cc, keys=keys) -> pa.Table:
        return _grouped_violation_rows(batch, cc, keys, spec, id_types)

    return bad.map_batches(to_rows, batch_format="pyarrow")
