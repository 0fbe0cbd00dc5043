"""Core data model of the Ray-Data-native validation engine.

Re-expresses the reference's abstractions (xpSHACL) as flat Arrow-friendly
records:

- ``ViolationType``   — the 7-way taxonomy (reference:
  ``src/xpshacl_architecture.py:14-23``).
- violation rows      — fixed ``pyarrow.Schema`` instead of an RDF report
  graph (reference: ``src/xpshacl_architecture.py:32-80``).
- signatures          — canonical string + md5 key, byte-for-byte compatible
  with the reference's KG URIs (``src/violation_kg.py:88-102``) and the
  signature factory's empty-params convention
  (``src/violation_signature_factory.py:7-16``).
- ``JustificationNode`` / ``JustificationTree`` — bounded-depth explanation
  trees serialised to JSON string columns (reference:
  ``src/xpshacl_architecture.py:83-141``).

Everything here is pure Python / pyarrow — no Ray imports — so it is cheap
to ship inside task closures.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional

import pyarrow as pa

SH = "http://www.w3.org/ns/shacl#"
XSH = "http://xpshacl.org/#"


class ViolationType(Enum):
    """7-way violation taxonomy (reference: xpshacl_architecture.py:14-23)."""

    CARDINALITY = "cardinality"
    VALUE_TYPE = "value_type"
    VALUE_RANGE = "value_range"
    PATTERN = "pattern"
    PROPERTY_PAIR = "property_pair"
    LOGICAL = "logical"
    OTHER = "other"


# Regexes mirroring the reference's constraint-component classifier
# (extended_shacl_validator.py:260-285).  Order matters: first match wins.
_CLASSIFIER: List[tuple[re.Pattern, ViolationType]] = [
    (re.compile(r"(MinCount|MaxCount)Constraint"), ViolationType.CARDINALITY),
    (re.compile(r"(Datatype|Class|NodeKind)Constraint"), ViolationType.VALUE_TYPE),
    (
        re.compile(r"(MinExclusive|MinInclusive|MaxExclusive|MaxInclusive)Constraint"),
        ViolationType.VALUE_RANGE,
    ),
    (re.compile(r"PatternConstraint"), ViolationType.PATTERN),
    (
        re.compile(r"(Equals|Disjoint|LessThan|LessThanOrEquals)Constraint"),
        ViolationType.PROPERTY_PAIR,
    ),
    (re.compile(r"(Not|And|Or|Xone)Constraint"), ViolationType.LOGICAL),
]


def classify_violation_type(constraint_id: str) -> ViolationType:
    """Map a constraint-component IRI to a ViolationType.

    Same regex dispatch + OTHER fallback as the reference
    (extended_shacl_validator.py:260-285).
    """
    for pattern, vtype in _CLASSIFIER:
        if pattern.search(constraint_id):
            return vtype
    return ViolationType.OTHER


def signature_string(
    constraint_id: str,
    property_path: Optional[str],
    violation_type: Optional[ViolationType],
    constraint_params: Optional[Dict[str, str]] = None,
) -> str:
    """Canonical signature string.

    Byte-compatible with the reference's ``signature_to_uri``
    (violation_kg.py:88-102): ``{cid}|{path or 'None'}|{str(vtype) or
    'None'}|{sorted(params.items())}`` where the violation type is the
    *enum repr* (``ViolationType.CARDINALITY``) because the signature
    factory passes the enum itself (violation_signature_factory.py:7-16).
    """
    params = constraint_params or {}
    sorted_params = sorted(params.items())
    path_str = str(property_path) if property_path else "None"
    vtype_str = str(violation_type) if violation_type else "None"
    return f"{constraint_id}|{path_str}|{vtype_str}|{sorted_params}"


def signature_key(sig_string: str) -> str:
    """md5 hex of the canonical signature string (violation_kg.py:101)."""
    return hashlib.md5(sig_string.encode("utf-8")).hexdigest()


def signature_uri(sig_string: str) -> str:
    """Stable KG URI for a signature (violation_kg.py:102)."""
    return f"{XSH}sig_{signature_key(sig_string)}"


# ---------------------------------------------------------------------------
# Violations: a fixed Arrow schema instead of an RDF report graph.
# ---------------------------------------------------------------------------

#: Engine-owned violation columns.  Pipelines may append pass-through id
#: columns (row_id, repo, path, commit, doc_id, ...) in front of these.
VIOLATION_FIELDS: List[tuple[str, pa.DataType]] = [
    ("focus_node", pa.string()),
    ("shape_id", pa.string()),
    ("constraint_id", pa.string()),
    ("violation_type", pa.string()),
    ("property_path", pa.string()),
    ("value", pa.string()),
    ("message", pa.string()),
    ("severity", pa.string()),
    ("context", pa.string()),  # JSON object (minCount/maxCount/actualCount...)
    ("signature", pa.string()),
    ("signature_key", pa.string()),
]

VIOLATION_SCHEMA = pa.schema(VIOLATION_FIELDS)

SEVERITY_VIOLATION = "Violation"
SEVERITY_WARNING = "Warning"
SEVERITY_INFO = "Info"


# ---------------------------------------------------------------------------
# Justification trees (xpshacl_architecture.py:83-141).
# ---------------------------------------------------------------------------


@dataclass
class JustificationNode:
    """A node in a justification tree.

    ``type`` ∈ {conclusion, premise, observation, inference, error, unknown}
    (reference: xpshacl_architecture.py:83-103).
    """

    statement: str
    type: str
    evidence: Optional[str] = None
    children: List["JustificationNode"] = field(default_factory=list)

    def add_child(self, child: "JustificationNode") -> None:
        self.children.append(child)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "statement": self.statement,
            "type": self.type,
            "evidence": self.evidence,
            "children": [c.to_dict() for c in self.children],
        }


@dataclass
class JustificationTree:
    root: JustificationNode

    def to_dict(self) -> Dict[str, Any]:
        return {"justification": self.root.to_dict()}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str)
