"""Training-data curation pipeline: the composition a 100 TB corpus run
actually needs — quality-score → language filter → exact dedup → near-dup
prune → partitioned write, all streaming.

Stages (each independently tested; this module is the composition):

1. ``QualityScorer`` / ``LanguageId`` actor pools score every document.
2. A vectorized filter keeps rows with ``quality_score >= min_quality``
   and predicted/declared language in the allow-list.
3. Exact dedup drops non-first rows per content hash (hash-partitioned,
   the text never shuffles — only (hash, id) pairs move).
4. Optional MinHash-LSH near-dup pruning removes the higher-id member of
   every candidate pair above the Jaccard threshold.
5. Output written as partitioned Parquet (resumable unit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.dedup import exact_dedup, minhash_lsh_candidates
from ..functions.text import LanguageId, QualityScorer


@dataclass
class CurationConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    allowed_langs: Optional[List[str]] = None
    min_quality: float = 0.3
    near_dup_jaccard: Optional[float] = None  # None = skip LSH stage
    concurrency: tuple = (1, 8)
    #: "broadcast" ships the surviving-id set to every task (fine while the
    #: survivor set fits memory); "join" co-partitions rows by content-hash
    #: bucket — the 10^12-row path with no broadcast at all; "auto" picks
    #: "join" once the filtered corpus exceeds auto_join_threshold rows
    dedup_strategy: str = "auto"
    auto_join_threshold: int = 2_000_000
    join_buckets: int = 64


@dataclass
class CurationReport:
    n_input: int
    n_after_filter: int
    n_after_exact_dedup: int
    n_after_near_dedup: int
    dropped_low_quality_or_lang: int = 0
    dropped_exact_dupes: int = 0
    dropped_near_dupes: int = 0


def _dedup_semi_join(ds: "ray.data.Dataset",
                     cfg: "CurationConfig") -> "ray.data.Dataset":
    """Exact dedup with NO broadcast: co-partition rows by content-hash
    bucket and keep the min-id row per hash within each bucket task."""
    import pandas as pd

    from ..functions.dedup import add_text_hash
    from ..functions.sketches import hash64

    def tag(b: pa.Table) -> pa.Table:
        h = add_text_hash(b, cfg.text_col)
        part = (hash64(h["text_md5"].to_numpy(zero_copy_only=False))
                % cfg.join_buckets).astype("int32")
        return h.append_column("__part__", pa.array(part))

    def keep_min_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(cfg.id_col)
        out = g.drop_duplicates(subset=["text_md5"], keep="first")
        return out.drop(columns=["text_md5", "__part__"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part__")
        .map_groups(keep_min_per_hash, batch_format="pandas")
    )


def _drop_ids_anti_join(ds: "ray.data.Dataset",
                        drop_ids: "ray.data.Dataset",
                        cfg: "CurationConfig") -> "ray.data.Dataset":
    """Drop every row whose id appears in ``drop_ids`` — WITHOUT
    broadcasting the id set: both sides co-partition by id-hash bucket and
    each bucket task filters locally (the 10^12-row path when the drop set
    itself is huge)."""
    import numpy as np
    import pandas as pd

    from ..functions.sketches import hash64

    def tag_rows(b: pa.Table) -> pa.Table:
        h = (hash64(b[cfg.id_col].to_numpy(zero_copy_only=False))
             % cfg.join_buckets).astype("int32")
        return b.append_column("__part__", pa.array(h)).append_column(
            "__drop__", pa.array(np.zeros(len(b), dtype=bool)))

    def tag_drops(b: pa.Table) -> pa.Table:
        ids = b["id_b"]
        h = (hash64(ids.to_numpy(zero_copy_only=False))
             % cfg.join_buckets).astype("int32")
        t = pa.table({cfg.id_col: ids})
        return t.append_column("__part__", pa.array(h)).append_column(
            "__drop__", pa.array(np.ones(len(b), dtype=bool)))

    from ..functions.joins import restore_dtypes, schema_empty_pdf

    sch = ds.schema()
    row_cols = sch.names
    # shared mixed-schema bucket machinery with hash_join: typed empty
    # frames + dtype restore (see joins.schema_empty_pdf docstring)
    empty_rows = schema_empty_pdf(sch)

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_drop = g["__drop__"].fillna(False).astype(bool)
        rows = g[~is_drop]
        if rows.empty:
            return empty_rows.copy()
        bad = set(g.loc[is_drop, cfg.id_col])
        keep = rows[~rows[cfg.id_col].isin(bad)].reindex(columns=row_cols)
        if keep.empty:
            return empty_rows.copy()
        return restore_dtypes(keep, empty_rows)

    tagged = ds.map_batches(tag_rows, batch_format="pyarrow").union(
        drop_ids.map_batches(tag_drops, batch_format="pyarrow"))
    return tagged.groupby("__part__").map_groups(filter_bucket,
                                                 batch_format="pandas")


def curate(
    ds: "ray.data.Dataset",
    cfg: CurationConfig = CurationConfig(),
) -> tuple["ray.data.Dataset", CurationReport]:
    """Returns (curated dataset, per-stage attrition report).

    No silent caps: every stage's drop count is reported.
    """
    n_input = ds.count()

    # cheap-init stages run as stateless tasks (instances in the closure);
    # swap to actor pools only when __init__ loads real models
    scored = ds.map_batches(
        QualityScorer(), batch_format="pyarrow"
    ).map_batches(
        LanguageId(), batch_format="pyarrow"
    )

    def keep_mask(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["quality_score"], cfg.min_quality)
        if cfg.allowed_langs is not None:
            m = pc.and_(
                m,
                pc.is_in(b[cfg.lang_col],
                         value_set=pa.array(cfg.allowed_langs)),
            )
        return b.filter(pc.fill_null(m, False))

    filtered = scored.map_batches(keep_mask, batch_format="pyarrow")
    n_filtered = filtered.count()

    strategy = cfg.dedup_strategy
    if strategy == "auto":
        strategy = ("join" if n_filtered > cfg.auto_join_threshold
                    else "broadcast")
    if strategy == "join":
        deduped = _dedup_semi_join(filtered, cfg)
    else:
        # broadcast the surviving-id set (ids only; survivor set must fit
        # worker memory — the "join" strategy removes that bound)
        groups = exact_dedup(filtered, text_col=cfg.text_col,
                             id_col=cfg.id_col)
        grows = groups.select_columns(["keep_id", "n_dupes"]).take_all()
        keep_ids = pa.array(sorted(r["keep_id"] for r in grows))
        # keeper ids whose text group HAD duplicates: with CONTENT-
        # ADDRESSED ids (sources.corpus — identical texts share an id)
        # the membership filter alone would keep every copy, so those
        # ids take a one-row-per-id pass (tiny: duplicate rows only);
        # unique-id keepers stream straight through
        dup_keep = pa.array(sorted(
            r["keep_id"] for r in grows if r["n_dupes"] > 0))
        keep_ref = ray.put(keep_ids)
        dup_ref = ray.put(dup_keep)

        def keep_unique(b: pa.Table) -> pa.Table:
            keep = pc.is_in(b[cfg.id_col], value_set=ray.get(keep_ref))
            not_dup = pc.invert(
                pc.is_in(b[cfg.id_col], value_set=ray.get(dup_ref)))
            return b.filter(pc.and_(keep, not_dup))

        deduped = filtered.map_batches(keep_unique, batch_format="pyarrow")
        if len(dup_keep):
            def only_dup(b: pa.Table) -> pa.Table:
                return b.filter(
                    pc.is_in(b[cfg.id_col], value_set=ray.get(dup_ref)))

            def first_row(g: pa.Table) -> pa.Table:
                return g.take(pa.array([0]))

            dup_part = (filtered.map_batches(only_dup,
                                             batch_format="pyarrow")
                        .groupby(cfg.id_col)
                        .map_groups(first_row, batch_format="pyarrow"))
            deduped = deduped.union(dup_part)
    n_exact = deduped.count()

    n_near = n_exact
    if cfg.near_dup_jaccard is not None:
        # pin the candidate pairs once: the count (strategy choice) and the
        # consumption below must not re-run the LSH signature+shuffle
        pairs = minhash_lsh_candidates(
            deduped, jaccard_threshold=cfg.near_dup_jaccard,
            id_col=cfg.id_col, text_col=cfg.text_col,
            concurrency=cfg.concurrency,
        ).materialize()
        n_pairs = pairs.count()
        if strategy == "join" or n_pairs > cfg.auto_join_threshold:
            # anti-join path: no broadcast — drop-ids co-partition with
            # the rows by id-hash bucket (the high-dup-corpus scale path,
            # mirroring the exact-dedup 'join' strategy)
            deduped = _drop_ids_anti_join(
                deduped, pairs.select_columns(["id_b"]), cfg)
        else:
            drop = pa.array(sorted(
                {r["id_b"] for r in pairs.take_all()}))
            drop_ref = ray.put(drop)

            def drop_near(b: pa.Table) -> pa.Table:
                return b.filter(
                    pc.invert(pc.is_in(b[cfg.id_col],
                                       value_set=ray.get(drop_ref)))
                )

            deduped = deduped.map_batches(drop_near, batch_format="pyarrow")
        n_near = deduped.count()

    report = CurationReport(
        n_input=n_input,
        n_after_filter=n_filtered,
        n_after_exact_dedup=n_exact,
        n_after_near_dedup=n_near,
        dropped_low_quality_or_lang=n_input - n_filtered,
        dropped_exact_dupes=n_filtered - n_exact,
        dropped_near_dupes=n_exact - n_near,
    )
    return deduped, report
