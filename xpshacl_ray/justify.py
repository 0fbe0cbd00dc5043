"""Justification-tree builder — pure per-row formatter over violation rows.

Mirrors the reference's ``JustificationTreeBuilder``
(``src/justification_tree_builder.py:63-612``): same 7-way dispatch on
violation type, same node types (conclusion/premise/observation/inference/
error/unknown) and the same statement phrasing pinned by the reference's
tests (``tests/test_justification_tree_builder.py:87-88, 106-109, 125-129,
148-156, 173-179``):  ``"has {n} values"``, ``"{n} < at least {k}"``,
``"is not an instance"``, range value echoed, pattern + flags echoed.

NOTE: the reference defines ``_build_property_pair_justification`` twice;
the SECOND definition (``justification_tree_builder.py:475-545``) wins in
Python — we implement that version's semantics (SURVEY.md §7 hard part b).

Unlike the reference, no graph lookups happen here: every needed fact
(constraint params, actual counts, row evidence) is already a column on the
violation row by the time trees are built (SURVEY.md E3-E7), so this runs as
a stateless ``map_batches`` over the small deduped signature table.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from .model import JustificationNode, JustificationTree, ViolationType

# context keys that identify each component's primary constraint value,
# used for the premise text (reference: _get_shape_constraint_text,
# justification_tree_builder.py:623-640)
_PRIMARY_PARAM = {
    "MinCountConstraintComponent": "minCount",
    "MaxCountConstraintComponent": "maxCount",
    "DatatypeConstraintComponent": "datatype",
    "ClassConstraintComponent": "class",
    "PatternConstraintComponent": "pattern",
    "MinInclusiveConstraintComponent": "minInclusive",
    "MinExclusiveConstraintComponent": "minExclusive",
    "MaxInclusiveConstraintComponent": "maxInclusive",
    "MaxExclusiveConstraintComponent": "maxExclusive",
    "MinLengthConstraintComponent": "minLength",
    "MaxLengthConstraintComponent": "maxLength",
    "InConstraintComponent": "in",
    "EqualsConstraintComponent": "equals",
    "DisjointConstraintComponent": "disjoint",
    "LessThanConstraintComponent": "lessThan",
    "LessThanOrEqualsConstraintComponent": "lessThanOrEquals",
    "NotConstraintComponent": "not",
    "AndConstraintComponent": "and",
    "OrConstraintComponent": "or",
    "XoneConstraintComponent": "xone",
}


def format_uri(uri: Optional[str]) -> str:
    """Reference's ``_format_uri`` (justification_tree_builder.py:614-621)."""
    if uri is None:
        return "None"
    if uri.startswith("http://") or uri.startswith("https://"):
        return f"<{uri}>"
    return uri


def _ctx(violation: Dict[str, Any]) -> Dict[str, Any]:
    ctx = violation.get("context")
    if isinstance(ctx, str):
        try:
            return json.loads(ctx)
        except (json.JSONDecodeError, TypeError):
            return {}
    return ctx or {}


def shape_constraint_text(violation: Dict[str, Any]) -> str:
    """Premise text (reference: justification_tree_builder.py:623-640)."""
    shape = format_uri(violation.get("shape_id"))
    cid = format_uri(violation.get("constraint_id"))
    ctx = _ctx(violation)
    component = (violation.get("constraint_id") or "").rsplit("#", 1)[-1]
    key = _PRIMARY_PARAM.get(component)
    value = ctx.get(key) if key else None
    if value is not None:
        return f"The shape {shape} has a constraint {cid} with value {value}."
    return f"The shape {shape} has a constraint {cid}."


def data_evidence(violation: Dict[str, Any]) -> str:
    """Pseudo-N3 evidence line from the violating row's cells
    (analog of _generate_data_evidence, justification_tree_builder.py:654-664;
    the facts travel on the violation row instead of being re-scanned)."""
    focus = violation.get("focus_node")
    path = violation.get("property_path")
    value = violation.get("value")
    if path is None:
        return ""
    return f'{format_uri(focus)} {format_uri(path)} "{value}" .\n'


def _premise(violation: Dict[str, Any]) -> JustificationNode:
    return JustificationNode(
        statement=shape_constraint_text(violation),
        type="premise",
        evidence=f"From shape definition: {violation.get('shape_id')}",
    )


def build_justification_tree(violation: Dict[str, Any]) -> JustificationTree:
    """violation row (dict) → JustificationTree.

    Same dispatch as the reference's ``build_justification_tree``
    (justification_tree_builder.py:63-98).
    """
    focus = format_uri(violation.get("focus_node"))
    shape = format_uri(violation.get("shape_id"))
    root = JustificationNode(
        statement=f"Node {focus} fails to conform to shape {shape}",
        type="conclusion",
    )
    vtype = violation.get("violation_type")
    if vtype == ViolationType.CARDINALITY.value:
        _cardinality(violation, root)
    elif vtype == ViolationType.VALUE_TYPE.value:
        _value_type(violation, root)
    elif vtype == ViolationType.VALUE_RANGE.value:
        _value_range(violation, root)
    elif vtype == ViolationType.PATTERN.value:
        _pattern(violation, root)
    elif vtype == ViolationType.PROPERTY_PAIR.value:
        _property_pair(violation, root)
    elif vtype == ViolationType.LOGICAL.value:
        _logical(violation, root)
    else:
        _generic(violation, root)
    return JustificationTree(root=root)


def _cardinality(v: Dict[str, Any], root: JustificationNode) -> None:
    path = v.get("property_path")
    if not path:
        root.add_child(
            JustificationNode(
                statement="Missing property path information for cardinality constraint",
                type="error",
            )
        )
        return
    root.add_child(_premise(v))
    ctx = _ctx(v)
    cid = v.get("constraint_id") or ""
    actual = ctx.get("actualCount")
    if actual is None and v.get("value") is not None:
        try:
            actual = int(v["value"])
        except (TypeError, ValueError):
            actual = v.get("value")
    focus = format_uri(v.get("focus_node"))
    data_statement = (
        f"The data shows that node {focus} has {actual} values for "
        f"property {format_uri(path)}"
    )
    root.add_child(
        JustificationNode(
            statement=data_statement, type="observation", evidence=data_evidence(v)
        )
    )
    if "MinCountConstraintComponent" in cid:
        min_count = ctx.get("minCount", "at least 1")
        reasoning = (
            f"Since {actual} < at least {min_count}, the node violates the "
            f"minimum cardinality constraint of the shape"
        )
        root.add_child(JustificationNode(statement=reasoning, type="inference"))
    elif "MaxCountConstraintComponent" in cid:
        max_count = ctx.get("maxCount", "at most 1")
        reasoning = (
            f"Since {actual} > at most {max_count}, the node violates the "
            f"maximum cardinality constraint of the shape"
        )
        root.add_child(JustificationNode(statement=reasoning, type="inference"))


def _value_type(v: Dict[str, Any], root: JustificationNode) -> None:
    path = v.get("property_path") or "this node"
    root.add_child(_premise(v))
    cid = v.get("constraint_id") or ""
    value = v.get("value")
    focus = format_uri(v.get("focus_node"))
    if not value and "ClassConstraintComponent" in cid:
        data_statement = (
            f"The node {focus} is not an instance of the required class"
        )
        evidence = f"{focus} a ? .\n"
    else:
        data_statement = (
            f"The value {format_uri(value)} for property {format_uri(path)} "
            f"of node {focus} has an incompatible type"
        )
        evidence = data_evidence(v)
    root.add_child(
        JustificationNode(statement=data_statement, type="observation",
                          evidence=evidence)
    )
    ctx = _ctx(v)
    if "DatatypeConstraintComponent" in cid:
        dt = ctx.get("datatype")
        if dt:
            root.add_child(
                JustificationNode(
                    statement=(
                        f"The value does not match the required datatype "
                        f"{format_uri(str(dt))}"
                    ),
                    type="inference",
                )
            )
    elif "ClassConstraintComponent" in cid:
        klass = ctx.get("class")
        if klass:
            root.add_child(
                JustificationNode(
                    statement=(
                        f"The value is not an instance of the required class "
                        f"{format_uri(str(klass))}"
                    ),
                    type="inference",
                )
            )


def _value_range(v: Dict[str, Any], root: JustificationNode) -> None:
    path = v.get("property_path")
    if not path:
        root.add_child(
            JustificationNode(
                statement="Missing property path information for value range constraint",
                type="error",
            )
        )
        return
    root.add_child(_premise(v))
    focus = format_uri(v.get("focus_node"))
    data_statement = (
        f"The data shows that property {format_uri(path)} of node "
        f"{focus} has value {v.get('value')}"
    )
    root.add_child(
        JustificationNode(statement=data_statement, type="observation",
                          evidence=data_evidence(v))
    )
    ctx = _ctx(v)
    cid = v.get("constraint_id") or ""
    for comp, key, word in (
        ("MinExclusiveConstraintComponent", "minExclusive", "minimum"),
        ("MinInclusiveConstraintComponent", "minInclusive", "minimum"),
        ("MaxExclusiveConstraintComponent", "maxExclusive", "maximum"),
        ("MaxInclusiveConstraintComponent", "maxInclusive", "maximum"),
    ):
        if comp in cid:
            bound = ctx.get(key)
            if bound is not None:
                root.add_child(
                    JustificationNode(
                        statement=(
                            f"The value provided does not comply with the "
                            f"{word} value restriction {bound}"
                        ),
                        type="inference",
                    )
                )
            break


def _pattern(v: Dict[str, Any], root: JustificationNode) -> None:
    root.add_child(_premise(v))
    path, value = v.get("property_path"), v.get("value")
    if path and value:
        focus = format_uri(v.get("focus_node"))
        root.add_child(
            JustificationNode(
                statement=(
                    f"The data shows that node {focus} has value {value} for "
                    f"property {format_uri(path)}."
                ),
                type="observation",
                evidence=data_evidence(v),
            )
        )
    ctx = _ctx(v)
    cid = v.get("constraint_id") or ""
    if "PatternConstraintComponent" in cid:
        pattern = ctx.get("pattern")
        if pattern:
            root.add_child(
                JustificationNode(
                    statement=f"The value provided does not comply with the pattern {pattern}.",
                    type="inference",
                )
            )
        flags = ctx.get("flags")
        if flags:
            root.add_child(
                JustificationNode(
                    statement=f"The pattern uses flags {flags}.", type="inference"
                )
            )


def _property_pair(v: Dict[str, Any], root: JustificationNode) -> None:
    # Second-definition semantics (justification_tree_builder.py:475-545):
    # premise + observation + per-component inference; no data-graph lookups.
    root.add_child(_premise(v))
    path, value = v.get("property_path"), v.get("value")
    if path and value:
        focus = format_uri(v.get("focus_node"))
        root.add_child(
            JustificationNode(
                statement=(
                    f"The data shows that node {focus} has value {value} for "
                    f"property {format_uri(path)}."
                ),
                type="observation",
                evidence=data_evidence(v),
            )
        )
    ctx = _ctx(v)
    cid = v.get("constraint_id") or ""
    fpath = format_uri(path)
    if "EqualsConstraintComponent" in cid and ctx.get("equals"):
        root.add_child(
            JustificationNode(
                statement=(
                    f"The shape states that property {fpath} must have the "
                    f"same values as {format_uri(str(ctx['equals']))}."
                ),
                type="inference",
            )
        )
    elif "DisjointConstraintComponent" in cid and ctx.get("disjoint"):
        root.add_child(
            JustificationNode(
                statement=(
                    f"The shape states that property {fpath} must not have any "
                    f"of the same values as {format_uri(str(ctx['disjoint']))}."
                ),
                type="inference",
            )
        )
    elif "LessThanOrEqualsConstraintComponent" in cid and ctx.get("lessThanOrEquals"):
        root.add_child(
            JustificationNode(
                statement=(
                    f"The shape states that the value of property {fpath} must "
                    f"be less than or equal to the value of "
                    f"{format_uri(str(ctx['lessThanOrEquals']))}."
                ),
                type="inference",
            )
        )
    elif "LessThanConstraintComponent" in cid and ctx.get("lessThan"):
        root.add_child(
            JustificationNode(
                statement=(
                    f"The shape states that the value of property {fpath} must "
                    f"be less than the value of {format_uri(str(ctx['lessThan']))}."
                ),
                type="inference",
            )
        )


def _logical(v: Dict[str, Any], root: JustificationNode) -> None:
    root.add_child(_premise(v))
    ctx = _ctx(v)
    cid = v.get("constraint_id") or ""
    shape = format_uri(v.get("shape_id"))
    if "NotConstraintComponent" in cid:
        inner = format_uri(str(ctx.get("not")))
        reasoning = (
            f"The shape {shape} includes a negation of the shape {inner}. "
            f"This means that, for the resource to be valid, it cannot comply "
            f"with the rules of the shape {inner}"
        )
    elif "AndConstraintComponent" in cid:
        inner = format_uri(str(ctx.get("and")))
        reasoning = (
            f"The shape {shape} includes a conjunction of the shapes listed in "
            f"{inner}. This means that, for the resource to be valid, it must "
            f"comply with all rules of the shapes listed in {inner}"
        )
    elif "OrConstraintComponent" in cid:
        inner = format_uri(str(ctx.get("or")))
        reasoning = (
            f"The shape {shape} includes a disjunction of the shapes listed in "
            f"{inner}. This means that, for the resource to be valid, it must "
            f"comply with at least one of the shapes listed in {inner}"
        )
    elif "XoneConstraintComponent" in cid:
        inner = format_uri(str(ctx.get("xone")))
        reasoning = (
            f"The shape {shape} includes an exclusive disjunction of the shapes "
            f"listed in {inner}. This means that, for the resource to be valid, "
            f"it must comply with exactly one of the shapes listed in {inner}"
        )
    else:  # pragma: no cover
        reasoning = f"The shape {shape} has an unsatisfied logical constraint"
    root.add_child(JustificationNode(statement=reasoning, type="inference"))


def _generic(v: Dict[str, Any], root: JustificationNode) -> None:
    root.add_child(
        JustificationNode(
            statement=(
                f"Generic justification for violation: "
                f"{v.get('message') or 'Unknown violation'}"
            ),
            type="unknown",
            evidence=None,
        )
    )


def tree_json_for_row(violation: Dict[str, Any]) -> str:
    return build_justification_tree(violation).to_json()
