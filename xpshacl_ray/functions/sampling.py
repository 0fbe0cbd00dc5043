"""Deterministic sampling / train-test splitting for corpus pipelines.

A split must be reproducible across runs, resumes and repartitioning, so it
hashes a stable id — never `random_sample` (which depends on block layout).
``md5(id) % buckets`` is engine-agnostic: the same assignment is computable
in SQL (DuckDB: ``('0x' || substr(md5(id),1,8))::BIGINT % buckets``), in a
resume, or by a downstream consumer.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence, Tuple

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


def exact_quantile_threshold(
    ds: "ray.data.Dataset",
    col: str,
    q_bp: int,
) -> Tuple[int, int]:
    """(threshold, n) — the exact type-1 (lower) ``q_bp``-basis-point
    quantile of ``col``: the smallest value v such that at least
    ``ceil(n * q_bp / 10000)`` non-null rows have ``col <= v``.

    Computed from the VALUE DISTRIBUTION, not a sort: one
    ``groupby(col).count()`` (the only shuffle, carrying (value, count)
    pairs) then a driver-side cumulative sum over the distinct values.
    Exact and scale-safe for bounded-cardinality columns (ints, scores
    rounded to fixed precision — distinct values ≪ rows at corpus scale);
    for genuinely continuous columns use the t-digest sketch path
    (``stages/stats``) which trades exactness for O(1) driver state.

    Integer basis points (2500 = P25) keep both sides in exact integer
    arithmetic — the SQL oracle reproduces the threshold with the same
    ``ceil`` expression, so there is no float-quantile-definition drift.
    """
    (thr,), n = exact_quantile_thresholds(ds, col, [q_bp])
    return thr, n


#: distinct-cardinality ceiling for the exact-quantile distribution pull:
#: the groupby(col).count().take_all() below materializes one (value,
#: count) row per DISTINCT value on the driver — fine for ints/fixed-
#: precision scores, a silent driver OOM for continuous floats at scale
EXACT_QUANTILE_DISTINCT_LIMIT = 5_000_000


def exact_quantile_thresholds(
    ds: "ray.data.Dataset",
    col: str,
    q_bps: Sequence[int],
    distinct_limit: int = EXACT_QUANTILE_DISTINCT_LIMIT,
) -> Tuple[list, int]:
    """(thresholds, n) — several exact type-1 quantiles from ONE value
    distribution pass (same contract as
    :func:`exact_quantile_threshold`, amortizing the groupby when a
    caller needs both tails, e.g. winsorization).

    The bounded-cardinality contract is ENFORCED at runtime: a no-shuffle
    HLL pre-estimate plans the pull, and a column whose distinct count
    exceeds ``distinct_limit`` raises instead of silently materializing
    every distinct value driver-side — route continuous columns to the
    t-digest sketch path (``stages.stats.profile`` quantiles) instead.
    """
    for q_bp in q_bps:
        if not 0 < q_bp <= 10000:
            raise ValueError(f"q_bp must be in (0, 10000], got {q_bp}")
    from ..stages.grouped import estimate_group_count

    # row count already bounds distincts: skip the HLL planning scan
    # when the count is METADATA-cheap (parquet/materialized inputs —
    # the profile_columns pattern, ADVICE r3).  For lazy mapped inputs
    # _meta_count() is None and ds.count() would execute the whole
    # upstream pipeline only to (possibly) run the HLL scan again — one
    # pass, not two, so fall through to the HLL estimate alone
    # (ADVICE r4).
    meta_n = ds._meta_count()
    if meta_n is not None and meta_n <= distinct_limit:
        est = 0
    else:
        est = estimate_group_count(ds.select_columns([col]), [col])
    if est > distinct_limit:
        raise ValueError(
            f"column {col!r} has ~{est:.0f} distinct values (> "
            f"distinct_limit={distinct_limit}); the exact-quantile path "
            f"would materialize them all on the driver — use the t-digest "
            f"quantile sketch (stages.stats.profile) for continuous "
            f"columns, or raise distinct_limit explicitly")
    dist = ds.groupby(col).count().take_all()
    rows = [(r[col], r["count()"]) for r in dist if r[col] is not None]
    if not rows:
        raise ValueError(f"no non-null values in column {col!r}")
    rows.sort(key=lambda r: r[0])
    n = sum(c for _, c in rows)
    cums = np.cumsum([c for _, c in rows])
    out = []
    for q_bp in q_bps:
        k = -(-n * q_bp // 10000)  # ceil(n * q_bp / 10000)
        i = int(np.searchsorted(cums, k))
        out.append(rows[min(i, len(rows) - 1)][0])
    return out, n


def winsorize(
    ds: "ray.data.Dataset",
    col: str,
    lo_bp: int = 500,
    hi_bp: int = 9500,
    out_col: Optional[str] = None,
) -> Tuple["ray.data.Dataset", tuple]:
    """(clipped, (lo, hi)) — winsorize ``col`` to its exact global
    [``lo_bp``, ``hi_bp``] basis-point quantile range (tail-robust
    feature clipping: P05/P95 by default).

    One distribution groupby computes BOTH thresholds (the only shuffle,
    (value, count) pairs only), then a map-only clamp against the two
    broadcast scalars.  NULLs pass through as NULL — clipping is
    value-wise, not a filter.  Same bounded-cardinality contract as
    :func:`exact_quantile_threshold`."""
    if lo_bp >= hi_bp:
        raise ValueError(f"lo_bp must be < hi_bp, got {lo_bp} >= {hi_bp}")
    (lo, hi), _n = exact_quantile_thresholds(ds, col, [lo_bp, hi_bp])
    dst = out_col or f"{col}_w"

    def clamp(b: pa.Table) -> pa.Table:
        # skip_nulls=False: NULL in → NULL out (default would substitute
        # the scalar bound for a null input)
        opts = pc.ElementWiseAggregateOptions(skip_nulls=False)
        clipped = pc.min_element_wise(
            pc.max_element_wise(b[col], lo, options=opts), hi, options=opts)
        return b.append_column(dst, clipped)

    return ds.map_batches(clamp, batch_format="pyarrow"), (lo, hi)


def quantile_filter(
    ds: "ray.data.Dataset",
    col: str,
    q_bp: int,
    keep: str = "upper",
) -> Tuple["ray.data.Dataset", int]:
    """(filtered, threshold) — drop the rows below (``keep='upper'``) or
    above (``keep='lower'``) the exact global ``q_bp``-basis-point
    quantile of ``col`` (e.g. quality-score percentile gating: keep the
    top 75% by score with ``q_bp=2500``).

    Two passes over the column only: the distribution groupby (value +
    count, nothing else moves) then a map-only filter against the
    broadcast scalar threshold.  NULL ``col`` rows are always dropped —
    they are unrankable, and the SQL oracle's comparison excludes them
    identically.  Threshold rows are KEPT on both tails (<= / >= would
    otherwise make q_bp=10000 drop the max value).
    """
    if keep not in ("upper", "lower"):
        raise ValueError(f"keep must be 'upper' or 'lower', got {keep!r}")
    thr, _n = exact_quantile_threshold(ds, col, q_bp)
    expr = f"{col} >= {thr!r}" if keep == "upper" else f"{col} <= {thr!r}"
    return ds.filter(expr=expr), thr


def rebalance_mixture(
    ds: "ray.data.Dataset",
    id_col: str,
    domain_col: str,
    target_bp: dict,
    salt: str = "",
) -> Tuple["ray.data.Dataset", dict]:
    """(rebalanced, report) — deterministically downsample each domain so
    the output matches a target mixture (basis points per domain, summing
    to 10000), as large as the data allows: the largest total T with
    ``target_s * T <= count_s`` for every domain, i.e.
    ``T = min_s(count_s * 10000 // target_bp_s)``.  Domain-mixture
    rebalancing is the standard final step of a pretraining corpus
    pipeline (fix web/books/code/wiki proportions before packing).

    All arithmetic is integer (per-domain keep rate
    ``rate_bp_s = target_bp_s * T // count_s``) and selection is
    ``md5(id) % 10000 < rate_bp`` — reproducible across re-runs, resumes
    and repartitionings, and mirrored exactly by the SQL oracle.

    Scale: the per-domain counts groupby is the only shuffle and its
    result is #domains rows (driver-tiny); the filter itself is map-only
    with the rate table broadcast in the closure.  Domains not in
    ``target_bp`` are dropped (rate 0); a target domain missing from the
    data raises (the requested mixture is unsatisfiable).
    """
    tgt = {str(k): int(v) for k, v in target_bp.items()}
    if any(v <= 0 for v in tgt.values()):
        raise ValueError("target_bp entries must be positive basis points")
    if sum(tgt.values()) != 10000:
        raise ValueError(
            f"target_bp must sum to 10000, got {sum(tgt.values())}")

    counts = {
        str(r[domain_col]): r["count()"]
        for r in ds.groupby(domain_col).count().take_all()
        if r[domain_col] is not None
    }
    missing = sorted(set(tgt) - set(counts))
    if missing:
        raise ValueError(f"target domains absent from data: {missing}")
    total = min(counts[s] * 10000 // bp for s, bp in tgt.items())
    rates = {s: bp * total // counts[s] for s, bp in tgt.items()}

    def keep(b: pa.Table) -> pa.Table:
        id_arr = b[id_col]
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        valid = np.asarray(pc.is_valid(id_arr))
        ids = pc.cast(id_arr, pa.string()).to_pylist()
        buckets = md5_bucket(["" if v is None else v for v in ids],
                             10000, salt)
        doms = pc.cast(b[domain_col], pa.string()).to_pylist()
        cut = np.fromiter((rates.get(d, 0) if d is not None else 0
                           for d in doms), dtype=np.int64, count=len(doms))
        return b.filter(pa.array((buckets < cut) & valid))

    report = {
        "counts": counts,
        "total_target": total,
        "rates_bp": rates,
        "expected_kept": {s: tgt[s] * total // 10000 for s in tgt},
    }
    return ds.map_batches(keep, batch_format="pyarrow"), report


def sample_weighted(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    scale_bp: int = 10_000,
    salt: str = "",
) -> "ray.data.Dataset":
    """Importance sampling: row kept iff
    ``md5(salt+id) % 10000 < round(weight * scale_bp)`` — acceptance
    probability proportional to the row's weight (clipped to [0, 1]
    after scaling by ``scale_bp`` basis points; weight 0 / null never
    keeps).

    Map-only and layout-stable like the other samplers: the SAME rows
    survive any re-run / resume / repartition, and the selection is
    reproducible in SQL with the identical hash + threshold expression
    (integer basis points, never a float compare).  The standard
    quality-weighted downsampling step of a curation pipeline."""
    if scale_bp < 0:
        raise ValueError("scale_bp must be >= 0")

    def keep(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        buckets = md5_bucket(["" if v is None else v for v in ids], 10_000,
                             salt)
        w = b[weight_col]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        wf = np.asarray(pc.fill_null(pc.cast(w, pa.float64()), 0.0))
        # integer half-up rounding of w*scale_bp, clipped to [0, 10000]
        thr = np.clip(np.floor(wf * scale_bp + 0.5), 0, 10_000)
        null_id = np.array([v is None for v in ids], dtype=bool)
        mask = (buckets < thr) & ~null_id
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def take_per_group(
    ds: "ray.data.Dataset",
    group_cols,
    id_col: str,
    n: int,
    salt: str = "",
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """Keep at most ``n`` rows per group, chosen DETERMINISTICALLY by
    ``md5(salt+id)`` order (id tie-break) — the per-domain cap of a
    mixture recipe ("no more than N docs per source"), stable across
    re-runs / resumes / repartitionings and reproducible in SQL as
    ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY md5(id), id)
    <= n``.  Hashing (not "first N seen") means the kept subset is an
    unbiased sample of the group, independent of input order.

    One hash shuffle on the group key co-locates each group, then a
    single vectorized sort + run-length head per partition (no per-group
    Python).  A partition must fit one task — same per-key bound as
    sessionize; raise ``n_parts`` for huge corpora."""
    import pandas as pd

    from .sketches import hash64

    if n < 0:
        raise ValueError("n must be >= 0")
    group_cols = list(group_cols)

    def tag(b: pa.Table) -> pa.Table:
        key = np.asarray(b[group_cols[0]].to_pylist(), dtype=object)
        part = (hash64(key) % n_parts).astype(np.int32)
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        import hashlib as _hl

        rank_key = [
            _hl.md5(f"{salt}{'' if v is None else v}".encode()).hexdigest()
            for v in ids
        ]
        return b.append_column("__part__", pa.array(part)) \
                .append_column("__rk__", pa.array(rank_key, pa.string()))

    def head_n(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(group_cols + ["__rk__", id_col])
        run = g.groupby(group_cols, sort=False, dropna=False).cumcount()
        return g.loc[run.to_numpy() < n].drop(
            columns=["__part__", "__rk__"])

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part__")
            .map_groups(head_n, batch_format="pandas"))


def sample_exact_k(
    ds: "ray.data.Dataset",
    id_col: str,
    k: int,
    salt: str = "",
) -> "ray.data.Dataset":
    """EXACTLY min(k, n) rows, selected globally by ``md5(salt+id)``
    order (id tie-break) — rate-based samplers (`sample_weighted`,
    `sample_stratified`) give a binomial count; this gives a fixed
    budget ("exactly 10k eval docs"), still deterministic,
    layout-stable, and SQL-reproducible as ``ORDER BY md5(id), id
    LIMIT k``.

    Distributed top-k, not a global sort: each batch keeps its k
    lowest-ranked rows (vectorized argpartition), a block-local combine
    re-tops between map tasks, and the driver merges the ≤ k × n_blocks
    survivors — the same partial/tree-merge shape as
    ``knn_cosine_bruteforce``.  Rows with a NULL id are dropped
    (unrankable; SQL's md5(NULL) sorts NULLS LAST and the LIMIT never
    reaches them at k < n)."""
    import hashlib as _hl

    import pandas as pd

    if k < 0:
        raise ValueError("k must be >= 0")

    def rank_partial(b: pa.Table) -> pa.Table:
        ids_arr = b[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        valid = np.asarray(pc.is_valid(ids_arr))
        ids = pc.cast(ids_arr, pa.string()).to_pylist()
        rk = np.array([
            "" if v is None else
            _hl.md5(f"{salt}{v}".encode()).hexdigest()
            for v in ids
        ], dtype=object)
        t = b.append_column("__rk__", pa.array(rk, pa.string()))
        t = t.filter(pa.array(valid))
        if t.num_rows <= k:
            return t
        rk_kept = np.asarray(t["__rk__"].to_pylist(), dtype=object)
        idx = np.argsort(rk_kept, kind="stable")[:k]
        return t.take(pa.array(np.sort(idx)))

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return df
        return df.sort_values(["__rk__", id_col]).head(k)

    merged = (ds.map_batches(rank_partial, batch_format="pyarrow")
              .map_batches(combine, batch_format="pandas")
              .to_pandas())
    if merged.empty:
        # build from the input schema — pa.array([]) would yield
        # null-typed columns and break schema-dependent unions/writes
        sch = ds.schema()
        return ray.data.from_arrow(
            pa.schema(list(zip(sch.names, sch.types))).empty_table())
    out = merged.sort_values(["__rk__", id_col]).head(k) \
                .drop(columns="__rk__")
    return ray.data.from_pandas(out.reset_index(drop=True))


def sample_weighted_k(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> "ray.data.Dataset":
    """EXACTLY min(k, n) rows sampled WITHOUT replacement with
    probability proportional to ``weight_col`` — Efraimidis–Spirakis
    priority sampling (key = -ln(u)/w, keep the k smallest) with the
    engine's deterministic md5 randomness: ``u = (md5_32(salt+id)+1) /
    (2^32+1)``, so the draw is layout-stable, resume-safe and exactly
    reproducible in SQL (same expression + ORDER BY + LIMIT).

    Complements :func:`sample_weighted` (rate-based, binomial count)
    and :func:`sample_exact_k` (uniform exact count).  Same distributed
    shape as the latter: per-batch partial top-k → block-local combine
    → driver merge of ≤ k × n_blocks survivors.  Rows with NULL or
    non-positive weight are dropped (zero probability mass); NULL ids
    raise (the draw would be undefined)."""
    import pandas as pd

    if k < 0:
        raise ValueError("k must be >= 0")
    _SCALE = float((1 << 32) + 1)

    def rank_partial(b: pa.Table) -> pa.Table:
        if b[id_col].null_count:
            raise ValueError(
                f"sample_weighted_k: id column {id_col!r} contains NULLs")
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(w) & (w > 0)
        ids = pc.cast(b[id_col], pa.string()).to_pylist()
        h32 = np.array([int(hashlib.md5(f"{salt}{v}".encode())
                            .hexdigest()[:8], 16) for v in ids],
                       dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = -np.log((h32 + 1.0) / _SCALE) / w
        # fixed-precision priorities: numpy and SQL ln() differ by ~1 ULP,
        # which could flip the ORDER BY boundary at the k-th row; rounding
        # collapses ULP noise and the id tie-break stays deterministic
        pri = np.round(pri, 9)
        t = b.append_column("__pri__", pa.array(pri, pa.float64()))
        t = t.filter(pa.array(ok))
        if t.num_rows <= k:
            return t
        p = np.asarray(t["__pri__"], dtype=np.float64)
        idx = np.argpartition(p, k - 1)[:k] if k else np.empty(0, np.int64)
        return t.take(pa.array(np.sort(idx)))

    def combine(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return df
        return df.sort_values(["__pri__", id_col]).head(k)

    merged = (ds.map_batches(rank_partial, batch_format="pyarrow")
              .map_batches(combine, batch_format="pandas")
              .to_pandas())
    if merged.empty:
        # schema-preserving empty result (see sample_exact_k)
        sch = ds.schema()
        return ray.data.from_arrow(
            pa.schema(list(zip(sch.names, sch.types))).empty_table())
    out = merged.sort_values(["__pri__", id_col]).head(k) \
                .drop(columns="__pri__")
    return ray.data.from_pandas(out.reset_index(drop=True))


# --- deterministic epoch shuffle ---------------------------------------------

#: Mersenne prime 2^31 - 1: the mixing modulus.  Keeping every
#: intermediate below 2^31 means products with < 2^31 multipliers stay
#: inside int64 — EXACTLY reproducible in ANSI SQL (the oracle), unlike
#: a hash whose implementation the two engines wouldn't share.
_SHUFFLE_P = 2_147_483_647


def _zigzag_mod_p(x: np.ndarray) -> np.ndarray:
    """zigzag(x) mod 2^31-1 for ANY int64 (VERDICT r4 item 8).

    zigzag (0,-1,1,-2,2,... → 0,1,2,3,4,...) makes the rank a pure
    function of SIGNED ids — signed-hash ids (e.g. ``hash64().view(
    int64)``) just work instead of raising.  Computed residue-side so
    nothing overflows (every intermediate < 2^32): with
    m = x mod P taken NON-NEGATIVE,

        x >= 0:  zigzag(x) = 2x       → (2m) % P
        x <  0:  zigzag(x) = -2x - 1  → (2P - 2m - 1) % P

    numpy's ``%`` is already non-negative for a positive modulus; the
    SQL oracle normalizes with ``((x % P) + P) % P`` — the two engines
    then agree on every int64, including INT64_MIN (where ``-x`` would
    overflow, which is why the residue form, not literal zigzag)."""
    m = np.asarray(x, dtype=np.int64) % _SHUFFLE_P
    return np.where(x >= 0, (2 * m) % _SHUFFLE_P,
                    (2 * _SHUFFLE_P - 2 * m - 1) % _SHUFFLE_P)


def epoch_shuffle_rank(ids: np.ndarray, seed: int, epoch: int) -> np.ndarray:
    """Deterministic per-epoch shuffle rank for int64 ids: two affine
    mixes mod 2^31-1 combined with XOR (the XOR breaks affinity, so the
    composition is not a simple stride).  Pure int64 vector ops, and the
    identical expression runs in SQL — see ``epoch_shuffle``.  Accepts
    the FULL int64 domain via :func:`_zigzag_mod_p` (negative /
    signed-hash ids fold into the residue ring the same way in both
    engines)."""
    a1 = (1_103_515_245 * (seed + 12_345 * epoch + 1)) % _SHUFFLE_P or 1
    b1 = (12_345 + 2_654_435_761 * epoch + seed) % _SHUFFLE_P
    a2 = (69_069 * (seed + 1) + 987_654_321 * (epoch + 1)) % _SHUFFLE_P or 1
    b2 = (362_437 * (epoch + 7) + seed) % _SHUFFLE_P
    x = _zigzag_mod_p(np.asarray(ids, dtype=np.int64))
    h1 = (a1 * x + b1) % _SHUFFLE_P
    h2 = (a2 * h1 + b2) % _SHUFFLE_P
    return ((h1 * 65_537) % _SHUFFLE_P) ^ h2


def epoch_shuffle(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    seed: int = 0,
    epoch: int = 0,
    limit: Optional[int] = None,
) -> "ray.data.Dataset":
    """Deterministic, RESUMABLE training-epoch shuffle: every row gets a
    pseudo-random ``shuffle_rank`` computed ONLY from (id, seed, epoch),
    then a distributed sort by (rank, id) fixes the epoch order.

    Why not ``ds.random_shuffle()``: a random shuffle is neither
    reproducible across retries (a re-executed block draws new randomness
    — exactly the failure mode a 100 TB multi-day epoch hits) nor
    resumable (restarting mid-epoch cannot recover the order).  Here the
    rank is a pure function of the row id, so any shard of the epoch
    order can be recomputed independently, epochs differ (``epoch`` is
    mixed into the multipliers), and the SAME expression evaluates in
    SQL for the oracle — no engine-specific hash.

    One distributed sort is the only wide step (rank is map-computed);
    ``limit`` optionally truncates to the head of the epoch order —
    verifying both the rank values and the ordering."""
    def rank(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        r = epoch_shuffle_rank(
            np.asarray(pc.cast(ids, pa.int64())), seed, epoch)
        return pa.table({id_col: ids,
                         "shuffle_rank": pa.array(r, pa.int64())})

    out = (ds.select_columns([id_col])
           .map_batches(rank, batch_format="pyarrow")
           .sort(key=["shuffle_rank", id_col]))
    return out.limit(limit) if limit else out


def epoch_shuffle_sql(table: str = "documents", id_col: str = "doc_id",
                      seed: int = 0, epoch: int = 0,
                      limit: Optional[int] = None) -> str:
    """The DuckDB-equivalent of :func:`epoch_shuffle` — same constants,
    same int64 arithmetic, same XOR combine."""
    P = _SHUFFLE_P
    a1 = (1_103_515_245 * (seed + 12_345 * epoch + 1)) % P or 1
    b1 = (12_345 + 2_654_435_761 * epoch + seed) % P
    a2 = (69_069 * (seed + 1) + 987_654_321 * (epoch + 1)) % P or 1
    b2 = (362_437 * (epoch + 7) + seed) % P
    lim = f" LIMIT {int(limit)}" if limit else ""
    # ((x % P) + P) % P = non-negative residue (SQL % takes the
    # dividend's sign); the CASE is the residue-side zigzag of
    # _zigzag_mod_p — byte-identical ranks for every int64 id
    return f"""
        WITH z AS (
            SELECT {id_col},
                   CASE WHEN {id_col} >= 0
                        THEN (2 * ((({id_col} % {P}) + {P}) % {P})) % {P}
                        ELSE ({2 * P} - 2 * ((({id_col} % {P}) + {P}) % {P})
                              - 1) % {P}
                   END AS zm
            FROM {table}
        ), h AS (
            SELECT {id_col}, ({a1} * zm + {b1}) % {P} AS h1 FROM z
        ), h2t AS (
            SELECT {id_col}, h1, ({a2} * h1 + {b2}) % {P} AS h2 FROM h
        )
        SELECT {id_col}, xor((h1 * 65537) % {P}, h2) AS shuffle_rank
        FROM h2t
        ORDER BY shuffle_rank, {id_col}{lim}
    """
