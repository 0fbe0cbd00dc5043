"""ValidationEngine — the library facade (SURVEY.md §3.1/§3.2).

Engine equivalent of the reference's ``main.py`` lifecycle::

    driver: compile constraint spec                       # ST1
    viol  = ds.map_batches(evaluate_row_local)            # C1..C20 fused (E1)
            ∪ grouped checks (C1/C2/C11, shuffle #1)
            ∪ referential checks (C4, broadcast anti-join)
    sigs  = viol.groupby(signature_key).first             # G2 exact dedup
    sigs  = sigs.map_batches(tree + context)              # E2-E7, X1-X5
    expl  = sigs.map_batches(ExplainerActor, concurrency) # G4/G5/N1-N3
    report= viol.map_batches(join_explanations(bcast))    # G8 fan-out join
    report.write_parquet(out); kg.save(kg_path)           # S3/S5

The per-signature expensive work (trees, context, explanation) runs on the
small deduped signature table — never per violation instance — exactly the
reference's "first instance is representative" semantics (main.py:139-211).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import pyarrow as pa

import ray
import ray.data

from ..context import ContextRetriever, DomainRule
from ..explain import DEFAULT_MODEL, ExplainerActor, ViolationKnowledgeGraph
from ..justify import tree_json_for_row
from ..spec import CompiledSpec, ValidationSpec, compile_spec
from ..stages.evaluate import evaluate_row_local
from ..stages.grouped import evaluate_grouped
from ..stages.referential import distinct_keys


@dataclass
class ValidationResult:
    """(conforms, report, stats) — the library-facade API the reference's
    ``ExplainableShaclSystem`` sketches (explanation_generator.py:166-210)."""

    violations: "ray.data.Dataset"
    _n_violations: Optional[int] = None

    @property
    def n_violations(self) -> int:
        if self._n_violations is None:
            self._n_violations = self.violations.count()
        return self._n_violations

    @property
    def conforms(self) -> bool:
        return self.n_violations == 0


class ValidationEngine:
    """Compile once on the driver; evaluate as streamed Arrow batches."""

    def __init__(
        self,
        spec: ValidationSpec,
        rules: Sequence[DomainRule] = (),
        kg_path: Optional[str] = None,
        languages: Sequence[str] = ("en",),
        model_name: str = DEFAULT_MODEL,
        inference: Optional[str] = None,
    ):
        # ``inference`` mirrors the reference's --inference rdfs/owlrl flag
        # (main.py:30-33): pyshacl-internal graph pre-processing with no
        # analog on a tabular engine — accepted and documented as a no-op
        # (SURVEY.md §2.8).
        self.inference = inference
        self.spec = spec
        self.compiled: CompiledSpec = compile_spec(spec)
        self.rules = list(rules)
        self.kg_path = kg_path
        self.languages = list(languages)
        self.model_name = model_name
        # constraint docs keyed by signature for context retrieval (X2)
        self.spec_docs = {
            cc.sig_key: {
                "name": getattr(cc.constraint, "name", None)
                if isinstance(getattr(cc.constraint, "name", None), str)
                else None,
                "description": cc.message,
            }
            for cc in self.compiled.all_compiled()
        }

    # -- validation ------------------------------------------------------

    def validate(
        self,
        ds: "ray.data.Dataset",
        ref_datasets: Optional[Dict[str, "ray.data.Dataset"]] = None,
        ref_keys: Optional[Dict[str, pa.Array]] = None,
        grouped_ds: Optional["ray.data.Dataset"] = None,
        grouped_strategy: str = "keys",
    ) -> "ray.data.Dataset":
        """Full violations Dataset: (row-local ∪ referential) ∪ grouped.

        Referential checks are FUSED into the row-local scan — their mask
        is row-local once the referenced key set is broadcast, so they cost
        no extra pass over the input.  Grouped constraints need their own
        (key-projected) pass; pass ``grouped_ds`` to run them over a
        cheaper source (e.g. a raw read without derived lineage columns)
        when ``ds`` carries expensive upstream transforms.
        """
        compiled = self.compiled
        missing = set(compiled.required_columns()) - set(ds.schema().names)
        if missing:
            raise ValueError(
                f"spec references columns absent from the dataset: "
                f"{sorted(missing)} (have: {ds.schema().names})"
            )
        parts: List[ray.data.Dataset] = []
        fused = list(compiled.row_local)
        if compiled.referential:
            from dataclasses import replace

            from ..stages.referential import _RefMask

            keys = dict(ref_keys or {})
            for cc in compiled.referential:
                col = cc.constraint.column
                if col not in keys:
                    ref_ds = (ref_datasets or {})[col]
                    keys[col] = distinct_keys(ref_ds, cc.constraint.ref_column)
                key_arr = keys[col]
                key_ref = (key_arr if isinstance(key_arr, ray.ObjectRef)
                           else ray.put(key_arr))
                fused.append(
                    replace(cc, constraint=_RefMask(
                        column=col,
                        keys_ref=key_ref,
                        null_is_violation=getattr(
                            cc.constraint, "null_is_violation", False),
                    ))
                )
        if fused:
            scan_spec = CompiledSpec(
                row_local=fused, grouped=[], referential=[],
                id_columns=compiled.id_columns,
                focus_template=compiled.focus_template,
            )
            parts.append(
                ds.map_batches(
                    lambda b, c=scan_spec: evaluate_row_local(b, c),
                    batch_format="pyarrow",
                )
            )
        if compiled.grouped:
            sch = ds.schema()
            tmap = dict(zip(sch.names, sch.types))
            id_types = [tmap[c] for c in compiled.id_columns]
            parts += evaluate_grouped(grouped_ds or ds, compiled, id_types,
                                      strategy=grouped_strategy)
        if not parts:
            raise ValueError("spec has no constraints")
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def validate_delta(
        self,
        input_files,
        out_dir: str,
        ref_keys=None,
        files_per_partition: int = 1,
        stage: str = "violations",
    ):
        """Incremental validation as a first-class API: re-validate ONLY
        the shards that changed since the last run.

        Partitions are content-addressed by (path, size, mtime_ns) of
        their input files, so an in-place rewritten shard gets a new
        partition id — its stale output is pruned and only it recomputes;
        unchanged shards are skipped end-to-end (their violation Parquet +
        manifest are reused untouched).  Returns the
        :func:`~xpshacl_ray.state.manifest.run_resumable` report dict
        (``ran`` / ``skipped`` / ``pruned`` / ``data_dir``) — read the
        combined violations from ``data_dir``.

        Partitioning assumption (same as ``run_resumable``): grouped
        constraints see one shard at a time, so shard boundaries must
        align with group keys.
        """
        from ..state.manifest import run_resumable

        cols = self.compiled.required_columns()

        def process(files):
            ds = ray.data.read_parquet(files, columns=cols)
            return self.validate(ds, ref_keys=ref_keys)

        return run_resumable(
            list(input_files), out_dir, process, stage=stage,
            files_per_partition=files_per_partition, fingerprint="stat",
        )

    # -- signature dedup + enrichment -----------------------------------

    def unique_signatures(self, violations: "ray.data.Dataset") -> "ray.data.Dataset":
        """G2: one representative row per signature (shuffle on a tiny key).

        The reference keeps the FIRST instance as representative
        (main.py:164); with unordered streaming we keep the representative
        with the smallest focus_node for determinism.
        """

        def first(group: pa.Table) -> pa.Table:
            idx = pa.compute.sort_indices(
                group, sort_keys=[("focus_node", "ascending")]
            )
            return group.take(idx[:1])

        return violations.groupby("signature_key").map_groups(
            first, batch_format="pyarrow"
        )

    def enrich(self, sigs: "ray.data.Dataset") -> "ray.data.Dataset":
        """E2-E7 + X1-X5 on the deduped signature table (small)."""
        retriever = ContextRetriever(self.rules, self.spec_docs)

        def add_enrichment(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            trees = [tree_json_for_row(r) for r in rows]
            ctxs = [retriever.retrieve(r).to_json() for r in rows]
            return batch.append_column(
                "justification_tree", pa.array(trees, pa.string())
            ).append_column("retrieved_context", pa.array(ctxs, pa.string()))

        return sigs.map_batches(add_enrichment, batch_format="pyarrow")

    # -- explanation -----------------------------------------------------

    def explain(self, sigs: "ray.data.Dataset",
                concurrency: int = 2) -> "ray.data.Dataset":
        """G4/G5/N1-N3: cache probe + template NLG per (signature, lang)."""
        return sigs.map_batches(
            ExplainerActor,
            fn_constructor_kwargs=dict(
                kg_path=self.kg_path,
                languages=self.languages,
                model_name=self.model_name,
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    # -- report reconstruction (G8) --------------------------------------

    def report(
        self,
        violations: "ray.data.Dataset",
        explanations: pa.Table,
    ) -> "ray.data.Dataset":
        """Fan explanations back onto every violation instance.

        Broadcast join: the per-signature explanation map is tiny, shipped
        once via ``ray.put`` and read zero-copy in every task
        (main.py:218-248 re-keys every instance by signature).
        """
        expl_map: Dict[tuple, Dict[str, str]] = {}
        for r in explanations.to_pylist():
            expl_map[(r["signature_key"], r["language"])] = r
        ref = ray.put(expl_map)
        languages = self.languages

        def join(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            keys = batch["signature_key"].to_pylist()
            for lang in languages:
                expl = [
                    (m.get((k, lang)) or {}).get("explanation") for k in keys
                ]
                sugg = [
                    (m.get((k, lang)) or {}).get("suggestions") for k in keys
                ]
                batch = batch.append_column(
                    f"explanation_{lang}", pa.array(expl, pa.string())
                ).append_column(f"suggestions_{lang}", pa.array(sugg, pa.string()))
            return batch

        return violations.map_batches(join, batch_format="pyarrow")

    # -- end-to-end ------------------------------------------------------

    def run(
        self,
        ds: "ray.data.Dataset",
        ref_datasets: Optional[Dict[str, "ray.data.Dataset"]] = None,
        out_dir: Optional[str] = None,
        out_json: Optional[str] = None,
        save_kg: bool = True,
        stats_config=None,
    ) -> Dict[str, object]:
        """Full explainable-validation pipeline (main.py:49-264 analog).

        ``out_dir`` → partitioned Parquet report (S3, the checkpoint unit);
        ``out_json`` → additional human-readable JSON report (main.py's
        ``json.dumps`` console/file output, :250-264);
        ``stats_config`` → also run the one-pass sketch profile (ST5) and
        return it as ``stats``.
        """
        # violations feed three consumers (dedup, report join, write);
        # materialize once so the input pipeline executes exactly once —
        # the violations table is small relative to the input by design
        violations = self.validate(ds, ref_datasets=ref_datasets).materialize()
        sigs = self.enrich(self.unique_signatures(violations))
        expl_ds = self.explain(sigs)
        expl_table = pa.Table.from_pylist(expl_ds.take_all())  # tiny
        report = self.report(violations, expl_table)
        kg_saved = None
        if save_kg and self.kg_path:
            kg = ViolationKnowledgeGraph(self.kg_path)
            from ..explain import merge_kg_updates

            merge_kg_updates(kg, expl_table)
            kg_saved = kg.save()
        stats = None
        if stats_config is not None:
            from ..stages.stats import profile

            stats = profile(ds, stats_config)
        if out_dir:
            report.write_parquet(out_dir)
            # a fully-conforming run emits ZERO rows and write_parquet
            # then writes nothing at all — keep the report location
            # readable and schema-stable (same guard as run_resumable)
            import os

            os.makedirs(out_dir, exist_ok=True)
            if not any(n.endswith(".parquet") for n in os.listdir(out_dir)):
                from ..state.manifest import write_empty_parquet

                sch = report.schema(fetch_if_missing=True)
                fields = (list(zip(sch.names, sch.types))
                          if sch is not None and sch.names else None)
                if not fields:
                    # Ray loses the schema of fully-empty datasets —
                    # reconstruct: violations columns + per-language
                    # explanation fan-out columns
                    vs = violations.schema(fetch_if_missing=True)
                    if vs is not None and vs.names:
                        fields = list(zip(vs.names, vs.types))
                        for lang in self.languages:
                            fields.append((f"explanation_{lang}",
                                           pa.string()))
                            fields.append((f"suggestions_{lang}",
                                           pa.string()))
                write_empty_parquet(out_dir, fields=fields)
        if out_json:
            report.write_json(out_json)
        return {
            "violations": violations,
            "signatures": sigs,
            "explanations": expl_table,
            "report": report,
            "kg_path": kg_saved,
            "stats": stats,
        }
