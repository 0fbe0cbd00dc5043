"""Justification-tree golden tests.

Statement substrings pinned to the reference's tree-builder tests
(tests/test_justification_tree_builder.py:49-179): `"has 1 values"`,
`"1 < at least 2"`, `"is not an instance"`, range value echoed, pattern +
flags echoed, not-shape echoed, generic → unknown node.
"""

import json

from xpshacl_ray.justify import build_justification_tree, format_uri
from xpshacl_ray.model import SH


def V(**kw):
    base = {
        "focus_node": "http://example.org/node1",
        "shape_id": "http://example.org/shape1",
        "constraint_id": f"{SH}MinCountConstraintComponent",
        "violation_type": "cardinality",
        "property_path": "http://example.org/prop1",
        "value": None,
        "message": "msg",
        "severity": "Violation",
        "context": "{}",
    }
    base.update(kw)
    return base


def types_of(tree):
    return [c.type for c in tree.root.children]


def test_root_conclusion():
    t = build_justification_tree(V())
    assert t.root.type == "conclusion"
    assert "fails to conform to" in t.root.statement
    assert "<http://example.org/node1>" in t.root.statement


def test_min_count_statements():
    t = build_justification_tree(
        V(context=json.dumps({"minCount": 2, "actualCount": 1}))
    )
    stmts = [c.statement for c in t.root.children]
    assert types_of(t) == ["premise", "observation", "inference"]
    assert any("has 1 values" in s for s in stmts)
    assert any("1 < at least 2" in s for s in stmts)
    assert any("minimum cardinality" in s for s in stmts)


def test_max_count_statements():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}MaxCountConstraintComponent",
            context=json.dumps({"maxCount": 1, "actualCount": 3}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("has 3 values" in s for s in stmts)
    assert any("3 > at most 1" in s for s in stmts)


def test_cardinality_missing_path_is_error_node():
    t = build_justification_tree(V(property_path=None))
    assert types_of(t) == ["error"]


def test_value_type_class_constraint():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}ClassConstraintComponent",
            violation_type="value_type",
            value=None,
            context=json.dumps({"class": "http://example.org/Person"}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("is not an instance" in s for s in stmts)
    assert any("required class <http://example.org/Person>" in s for s in stmts)


def test_value_type_datatype():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}DatatypeConstraintComponent",
            violation_type="value_type",
            value="abc",
            context=json.dumps({"datatype": "int64"}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("incompatible type" in s for s in stmts)
    assert any("required datatype int64" in s for s in stmts)


def test_value_range_echoes_value_and_bound():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}MinInclusiveConstraintComponent",
            violation_type="value_range",
            value="-5",
            context=json.dumps({"minInclusive": 0}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("has value -5" in s for s in stmts)
    assert any("minimum value restriction 0" in s for s in stmts)


def test_pattern_and_flags_echoed():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}PatternConstraintComponent",
            violation_type="pattern",
            value="BAD!",
            context=json.dumps({"pattern": "^[a-z]+$", "flags": "i"}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("does not comply with the pattern ^[a-z]+$." in s for s in stmts)
    assert any("uses flags i." in s for s in stmts)


def test_property_pair_second_definition_semantics():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}LessThanConstraintComponent",
            violation_type="property_pair",
            value="10",
            context=json.dumps({"lessThan": "http://example.org/end"}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("must be less than the value of <http://example.org/end>" in s
               for s in stmts)


def test_logical_not_echoes_shape():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}NotConstraintComponent",
            violation_type="logical",
            context=json.dumps({"not": "http://example.org/forbidden"}),
        )
    )
    stmts = [c.statement for c in t.root.children]
    assert any("negation of the shape <http://example.org/forbidden>" in s
               for s in stmts)
    assert any("cannot comply" in s for s in stmts)


def test_generic_unknown_node():
    t = build_justification_tree(
        V(
            constraint_id=f"{SH}MinLengthConstraintComponent",
            violation_type="other",
            message="String length is less than 3",
        )
    )
    assert types_of(t) == ["premise", "observation", "unknown"] or \
        types_of(t)[-1] == "unknown"
    assert "Generic justification for violation: String length is less than 3" \
        in t.root.children[-1].statement


def test_tree_serialization():
    t = build_justification_tree(V(context=json.dumps({"minCount": 2,
                                                       "actualCount": 1})))
    d = json.loads(t.to_json())
    assert "justification" in d
    assert d["justification"]["type"] == "conclusion"
    assert all(
        set(c) == {"statement", "type", "evidence", "children"}
        for c in d["justification"]["children"]
    )


def test_format_uri():
    assert format_uri("http://x.org/a") == "<http://x.org/a>"
    assert format_uri("plain") == "plain"
