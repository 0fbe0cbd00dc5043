"""Domain-context retrieval (SURVEY.md X1–X5) over violation signatures.

Reference analog ``src/context_retriever.py:29-186``.  The four context
channels map to:

- **ontology fragments** (X1): the representative violating row's cells as
  pseudo-N3 lines — available in-batch at evaluation time, no re-scan.
- **shape documentation** (X2): compiled into the constraint spec
  (``description`` / ``name`` on constraint objects); the reference's
  ``"Shape Name: X"`` format is preserved
  (tests/test_context_retriever.py:79-83).
- **similar cases** (X3): a bounded anti-join sample — rows in the same
  cohort with a null/failing value for the violated column, computed ONCE
  per signature on the small deduped table, not per violation.
- **domain rules** (X4): lookup into a small user-supplied rules table keyed
  by column name; exact output format ``Rule <uri> (label): comment`` pinned
  by tests/test_context_retriever.py:114-119.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import pyarrow as pa

import ray.data


@dataclass
class DomainRule:
    """One row of the domain-rules table (FIXTURES.md §3)."""

    rule_id: str
    applies_to_column: str
    label: Optional[str] = None
    comment: Optional[str] = None

    def render(self) -> str:
        # exact reference format (context_retriever.py:170-180)
        text = f"Rule <{self.rule_id}>"
        if self.label:
            text += f" ({self.label})"
        if self.comment:
            text += f": {self.comment}"
        elif not self.label:
            text += ": Applies to this property."
        return text


@dataclass
class DomainContext:
    """Reference analog xpshacl_architecture.py:144-181."""

    ontology_fragments: List[str] = field(default_factory=list)
    shape_documentation: List[str] = field(default_factory=list)
    similar_cases: List[Dict[str, str]] = field(default_factory=list)
    domain_rules: List[str] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "ontology_fragments": self.ontology_fragments,
                "shape_documentation": self.shape_documentation,
                "similar_cases": self.similar_cases,
                "domain_rules": self.domain_rules,
            },
            default=str,
        )


def rules_for_column(rules: Sequence[DomainRule], column: Optional[str]) -> List[str]:
    if not column:
        return []
    return [r.render() for r in rules if r.applies_to_column == column]


def shape_documentation(description: Optional[str], name: Optional[str]) -> List[str]:
    docs: List[str] = []
    if description:
        docs.append(description)
    if name:
        docs.append(f"Shape Name: {name}")
    return docs


def ontology_fragments(row: Dict[str, Any], focus: str,
                       columns: Sequence[str]) -> List[str]:
    """The violating row's cells as pseudo-N3 (X1)."""
    frags = []
    for c in columns:
        if c in row and row[c] is not None:
            frags.append(f'{focus} {c} "{row[c]}" .')
    return frags


def similar_cases(
    ds: "ray.data.Dataset",
    column: str,
    cohort_filter: Optional[str] = None,
    k: int = 5,
    node_template: str = "{focus_node}",
) -> List[Dict[str, str]]:
    """Bounded sample of same-cohort rows *missing* the violated column (X3).

    ``limit(k)`` keeps this a streamed, early-terminating scan.
    """
    import pyarrow.compute as pc

    d = ds
    if cohort_filter:
        d = d.filter(expr=cohort_filter)
    d = d.map_batches(
        lambda b: b.filter(pc.is_null(b[column])), batch_format="pyarrow"
    )
    rows = d.limit(k).take(k)
    return [
        {"node": node_template.format(**r), "node_type": column} for r in rows
    ]


class ContextRetriever:
    """Facade (X5): bundles the four channels into a DomainContext.

    Stateless: rules + spec docs are tiny and ship in the closure.
    """

    def __init__(self, rules: Sequence[DomainRule] = (),
                 spec_docs: Optional[Dict[str, Dict[str, str]]] = None):
        self.rules = list(rules)
        # spec_docs: signature_key -> {"name":..., "description":...}
        self.spec_docs = spec_docs or {}

    def retrieve(self, violation: Dict[str, Any],
                 similar: Optional[List[Dict[str, str]]] = None) -> DomainContext:
        docs = self.spec_docs.get(violation.get("signature_key", ""), {})
        id_cols = [
            c
            for c in violation.keys()
            if c
            not in (
                "focus_node", "shape_id", "constraint_id", "violation_type",
                "property_path", "value", "message", "severity", "context",
                "signature", "signature_key",
            )
        ]
        row_cells = {c: violation.get(c) for c in id_cols}
        if violation.get("property_path"):
            row_cells[violation["property_path"]] = violation.get("value")
        return DomainContext(
            ontology_fragments=ontology_fragments(
                row_cells, violation.get("focus_node", ""), list(row_cells)
            ),
            shape_documentation=shape_documentation(
                docs.get("description"), docs.get("name")
            ),
            similar_cases=similar or [],
            domain_rules=rules_for_column(self.rules, violation.get("property_path")),
        )
