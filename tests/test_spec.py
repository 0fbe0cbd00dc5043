"""Unit tests: constraint compilation + row-local masks on tiny Arrow tables.

Mirrors the reference's per-constraint pinning strategy (SURVEY.md §5) —
known-violating rows with exactly computable expected outputs.
"""

import numpy as np
import pyarrow as pa
import pytest

from xpshacl_ray.model import (
    ViolationType,
    classify_violation_type,
    signature_key,
    signature_string,
    signature_uri,
)
from xpshacl_ray.spec import (
    And,
    CustomConstraint,
    Datatype,
    Disjoint,
    Equals,
    InSet,
    LessThan,
    LessThanOrEquals,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinExclusive,
    MinInclusive,
    MinLength,
    Not,
    Or,
    Pattern,
    Required,
    ValidationSpec,
    Xone,
    compile_spec,
)
from xpshacl_ray.stages.evaluate import evaluate_row_local


def mask_list(constraint, table):
    m = constraint.mask(table)
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    return np.asarray(m, dtype=bool).tolist()


T = pa.table(
    {
        "s": ["abc", "x", None, "hello world", ""],
        "n": [1, -5, None, 100, 7],
        "m": [1, 2, None, 100, 6],
        "lang": ["en", "xx", "de", None, "en"],
    }
)


def test_required():
    assert mask_list(Required(column="s"), T) == [False, False, True, False, True]
    assert mask_list(
        Required(column="s", treat_empty_string_as_null=False), T
    ) == [False, False, True, False, False]


def test_length_bounds():
    assert mask_list(MinLength(column="s", min_length=2), T) == [
        False, True, False, False, True]
    assert mask_list(MaxLength(column="s", max_length=5), T) == [
        False, False, False, True, False]


def test_range_bounds():
    assert mask_list(MinInclusive(column="n", bound=0), T) == [
        False, True, False, False, False]
    assert mask_list(MinExclusive(column="n", bound=1), T) == [
        True, True, False, False, False]
    assert mask_list(MaxInclusive(column="n", bound=99), T) == [
        False, False, False, True, False]
    assert mask_list(MaxExclusive(column="n", bound=7), T) == [
        False, False, False, True, True]


def test_pattern_and_flags():
    assert mask_list(Pattern(column="s", pattern="^[a-z ]+$"), T) == [
        False, False, False, False, True]
    assert mask_list(Pattern(column="s", pattern="^ABC$", flags="i"), T) == [
        False, True, False, True, True]


def test_in_set_null_is_not_a_violation():
    assert mask_list(InSet(column="lang", allowed=["en", "de"]), T) == [
        False, True, False, False, False]


def test_datatype():
    t = pa.table({"v": ["1", "x", None, "2.5", "-3"]})
    assert mask_list(Datatype(column="v", datatype="int64"), t) == [
        False, True, False, True, False]
    assert mask_list(Datatype(column="v", datatype="float64"), t) == [
        False, True, False, False, False]


def test_property_pairs():
    assert mask_list(Equals(column="n", other_column="m"), T) == [
        False, True, False, False, True]
    assert mask_list(Disjoint(column="n", other_column="m"), T) == [
        True, False, False, True, False]
    assert mask_list(LessThan(column="n", other_column="m"), T) == [
        True, False, False, True, True]
    assert mask_list(LessThanOrEquals(column="n", other_column="m"), T) == [
        False, False, False, False, True]


def test_logical():
    inner = InSet(column="lang", allowed=["en"])
    # NULL lang "passes" sh:in (no value node) → under sh:not that pass is
    # itself the violation: nulls surface at index 3.
    assert mask_list(Not(column="lang", inner=inner), T) == [
        True, False, False, True, True]
    both = And(column="s", shapes=[MinLength(column="s", min_length=2),
                                   Pattern(column="s", pattern="^[a-z ]+$")])
    assert mask_list(both, T) == [False, True, False, False, True]
    either = Or(column="s", shapes=[MinLength(column="s", min_length=4),
                                    Pattern(column="s", pattern="^x$")])
    assert mask_list(either, T) == [True, False, False, False, True]
    one = Xone(column="s", shapes=[MinLength(column="s", min_length=4),
                                   Pattern(column="s", pattern="^x")])
    # 'abc': neither → 0 conform? minlen4 viol, pattern viol → 0 pass → viol
    assert mask_list(one, T)[0] is True or mask_list(one, T)[0] == True  # noqa: E712


def test_custom_constraint():
    even = CustomConstraint(
        column="n", name="even",
        fn=lambda b: pa.array(
            (np.nan_to_num(np.asarray(b["n"], dtype=float)) % 2) != 0),
    )
    assert mask_list(even, T) == [True, True, False, False, True]


def test_classifier_taxonomy():
    # regex classification parity (extended_shacl_validator.py:260-285)
    cases = {
        "MinCountConstraintComponent": ViolationType.CARDINALITY,
        "MaxCountConstraintComponent": ViolationType.CARDINALITY,
        "DatatypeConstraintComponent": ViolationType.VALUE_TYPE,
        "ClassConstraintComponent": ViolationType.VALUE_TYPE,
        "NodeKindConstraintComponent": ViolationType.VALUE_TYPE,
        "MinInclusiveConstraintComponent": ViolationType.VALUE_RANGE,
        "MaxExclusiveConstraintComponent": ViolationType.VALUE_RANGE,
        "PatternConstraintComponent": ViolationType.PATTERN,
        "EqualsConstraintComponent": ViolationType.PROPERTY_PAIR,
        "LessThanConstraintComponent": ViolationType.PROPERTY_PAIR,
        "NotConstraintComponent": ViolationType.LOGICAL,
        "XoneConstraintComponent": ViolationType.LOGICAL,
        "MinLengthConstraintComponent": ViolationType.OTHER,
        "SPARQLConstraintComponent": ViolationType.OTHER,
    }
    for local, expected in cases.items():
        assert classify_violation_type(f"http://www.w3.org/ns/shacl#{local}") == expected


def test_signature_derivation_parity():
    # byte-parity with violation_kg.py:88-102 (params empty per
    # violation_signature_factory.py:9-10)
    cid = "http://www.w3.org/ns/shacl#MinCountConstraintComponent"
    s = signature_string(cid, "text", ViolationType.CARDINALITY, {})
    assert s == f"{cid}|text|ViolationType.CARDINALITY|[]"
    assert signature_uri(s) == f"http://xpshacl.org/#sig_{signature_key(s)}"
    # None path renders as "None"
    s2 = signature_string(cid, None, None, {})
    assert s2 == f"{cid}|None|None|[]"
    # params sort deterministically
    s3 = signature_string(cid, "p", None, {"b": "2", "a": "1"})
    assert s3.endswith("[('a', '1'), ('b', '2')]")


def test_evaluate_row_local_shape_and_order():
    spec = ValidationSpec(
        constraints=[InSet(column="lang", allowed=["en", "de"]),
                     MinInclusive(column="n", bound=0)],
        id_columns=["n"],
        focus_template="row:{lang}",
    )
    out = evaluate_row_local(T, compile_spec(spec))
    assert out.column_names[:1] == ["n"]
    assert set(out.column_names) >= {
        "focus_node", "shape_id", "constraint_id", "violation_type",
        "property_path", "value", "message", "severity", "context",
        "signature", "signature_key"}
    d = out.to_pylist()
    assert {r["constraint_id"].rsplit("#")[-1] for r in d} == {
        "InConstraintComponent", "MinInclusiveConstraintComponent"}
    in_viol = [r for r in d if "InConstraint" in r["constraint_id"]]
    assert [r["value"] for r in in_viol] == ["xx"]
    assert in_viol[0]["severity"] == "Violation"


def test_required_columns_pruning():
    spec = ValidationSpec(
        constraints=[InSet(column="lang", allowed=["en"]),
                     Equals(column="n", other_column="m")],
        id_columns=["n"],
        focus_template="r:{lang}",
    )
    cols = compile_spec(spec).required_columns()
    assert cols == ["n", "lang", "m"]


def test_large_string_columns():
    # content at corpus scale may arrive as Arrow large_string — every
    # row-local kernel must handle it
    t = pa.table({
        "s": pa.array(["short", "x" * 50, None], pa.large_string()),
        "id": [1, 2, 3],
    })
    spec = ValidationSpec(
        constraints=[MaxLength(column="s", max_length=10),
                     Pattern(column="s", pattern="^[a-z]+$"),
                     Required(column="s")],
        id_columns=["id"],
        focus_template="r:{id}",
    )
    out = evaluate_row_local(t, compile_spec(spec))
    comps = sorted(r["constraint_id"].rsplit("#")[-1] for r in out.to_pylist())
    assert comps == ["MaxLengthConstraintComponent",
                     "MinCountConstraintComponent"]


def test_pattern_lookahead_python_fallback():
    # RE2 rejects lookarounds; the engine falls back to Python re so SHACL
    # (ECMA-style) patterns keep working
    t = pa.table({"s": ["password1", "nope", None]})
    p = Pattern(column="s", pattern=r"^(?=.*\d).+$")
    assert mask_list(p, t) == [False, True, False]
