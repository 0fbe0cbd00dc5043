"""Property-based engine-vs-DuckDB parity for the constraint families
added to the driver window in round 3 (C3/C5/C8/C12-C18): random small
tables (ints / strings / nulls), the compiled row-local masks must flag
exactly the rows the equivalent SQL predicate flags — the fuzz version
of the UNION-ALL oracles, run in-process via evaluate_row_local (no Ray
session, pure Arrow)."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xpshacl_ray.spec import (
    And,
    Datatype,
    Disjoint,
    Equals,
    InSet,
    LessThan,
    LessThanOrEquals,
    MinLength,
    NodeKind,
    Not,
    Or,
    Pattern,
    ValidationSpec,
    Xone,
    compile_spec,
)
from xpshacl_ray.stages.evaluate import evaluate_row_local


def _violating_ids(table: pa.Table, constraints) -> dict:
    """{constraint_id: sorted row ids} from the fused row-local scan."""
    spec = compile_spec(ValidationSpec(constraints=constraints,
                                       id_columns=["rid"]))
    viol = evaluate_row_local(table, spec)
    out = {}
    for cid, rid in zip(viol["constraint_id"].to_pylist(),
                        viol["rid"].to_pylist()):
        out.setdefault(cid, []).append(rid)
    return {k: sorted(v) for k, v in out.items()}


def _sql_ids(table: pa.Table, where: str) -> list:
    con = duckdb.connect()
    con.register("t", table)
    return sorted(r[0] for r in con.execute(
        f"SELECT rid FROM t WHERE {where}").fetchall())


texts = st.lists(
    st.one_of(st.none(), st.text(alphabet="ab c1.Z-", max_size=12)),
    min_size=0, max_size=60)
floats = st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
    min_size=0, max_size=60)
int_pairs = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
    min_size=0, max_size=60)


def _ttable(vals):
    return pa.table({"rid": pa.array(range(len(vals)), pa.int64()),
                     "s": pa.array(vals, pa.string())})


@settings(max_examples=30, deadline=None)
@given(texts)
def test_pattern_matches_sql(vals):
    t = _ttable(vals)
    got = _violating_ids(t, [Pattern(column="s", pattern="a.c")])
    want = _sql_ids(t, "NOT regexp_matches(s, 'a.c')")
    assert got.get("http://www.w3.org/ns/shacl#PatternConstraintComponent",
                   []) == want


@settings(max_examples=30, deadline=None)
@given(texts)
def test_pattern_flags_matches_sql(vals):
    t = _ttable(vals)
    got = _violating_ids(t, [Pattern(column="s", pattern="^Z", flags="i")])
    want = _sql_ids(t, "NOT regexp_matches(s, '(?i)^Z')")
    assert got.get("http://www.w3.org/ns/shacl#PatternConstraintComponent",
                   []) == want


@settings(max_examples=30, deadline=None)
@given(texts)
def test_nodekind_matches_sql(vals):
    t = _ttable(vals)
    got = _violating_ids(t, [NodeKind(column="s", pattern="^[a-z]+$",
                                      kind="IRI")])
    want = _sql_ids(t, "NOT regexp_matches(s, '^[a-z]+$')")
    assert got.get("http://www.w3.org/ns/shacl#NodeKindConstraintComponent",
                   []) == want


@settings(max_examples=30, deadline=None)
@given(floats)
def test_datatype_float_to_int_matches_sql(vals):
    t = pa.table({"rid": pa.array(range(len(vals)), pa.int64()),
                  "x": pa.array(vals, pa.float64())})
    got = _violating_ids(t, [Datatype(column="x", datatype="int64")])
    want = _sql_ids(t, "x IS NOT NULL AND x <> trunc(x)")
    assert got.get("http://www.w3.org/ns/shacl#DatatypeConstraintComponent",
                   []) == want


@settings(max_examples=30, deadline=None)
@given(int_pairs)
def test_property_pairs_match_sql(pairs):
    t = pa.table({"rid": pa.array(range(len(pairs)), pa.int64()),
                  "a": pa.array([p[0] for p in pairs], pa.int64()),
                  "b": pa.array([p[1] for p in pairs], pa.int64())})
    got = _violating_ids(t, [
        Equals(column="a", other_column="b"),
        Disjoint(column="a", other_column="b"),
        LessThan(column="a", other_column="b"),
        LessThanOrEquals(column="a", other_column="b"),
    ])
    sh = "http://www.w3.org/ns/shacl#"
    assert got.get(f"{sh}EqualsConstraintComponent", []) == \
        _sql_ids(t, "NOT (a = b)")
    assert got.get(f"{sh}DisjointConstraintComponent", []) == \
        _sql_ids(t, "a = b")
    assert got.get(f"{sh}LessThanConstraintComponent", []) == \
        _sql_ids(t, "NOT (a < b)")
    assert got.get(f"{sh}LessThanOrEqualsConstraintComponent", []) == \
        _sql_ids(t, "NOT (a <= b)")


@settings(max_examples=30, deadline=None)
@given(texts)
def test_logical_family_matches_sql(vals):
    t = _ttable(vals)
    sub_in = InSet(column="s", allowed=["a", "ab"])
    sub_len = MinLength(column="s", min_length=3)
    got = _violating_ids(t, [
        Not(column="s", inner=InSet(column="s", allowed=["a"])),
        And(column="s", shapes=[MinLength(column="s", min_length=3),
                                Pattern(column="s", pattern="a")]),
        Or(column="s", shapes=[sub_in, Pattern(column="s", pattern="Z")]),
        Xone(column="s", shapes=[sub_in, sub_len]),
    ])
    sh = "http://www.w3.org/ns/shacl#"
    # SHACL null semantics: a NULL never violates a value constraint,
    # so NOT(inner) flags nulls (inner conforms on null)
    assert got.get(f"{sh}NotConstraintComponent", []) == \
        _sql_ids(t, "s IS NULL OR s IN ('a')")
    assert got.get(f"{sh}AndConstraintComponent", []) == \
        _sql_ids(t, "(s IS NOT NULL AND length(s) < 3)"
                    " OR (s IS NOT NULL AND NOT regexp_matches(s, 'a'))")
    assert got.get(f"{sh}OrConstraintComponent", []) == \
        _sql_ids(t, "(s IS NOT NULL AND s NOT IN ('a','ab'))"
                    " AND (s IS NOT NULL AND NOT regexp_matches(s, 'Z'))")
    assert got.get(f"{sh}XoneConstraintComponent", []) == _sql_ids(
        t,
        "(CASE WHEN s IS NULL OR s IN ('a','ab') THEN 1 ELSE 0 END)"
        " + (CASE WHEN s IS NULL OR length(s) >= 3 THEN 1 ELSE 0 END)"
        " <> 1")


# --- grouped cardinality fuzz (needs the Ray session fixture) -------------


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s0", "s1", "s2"]),
                          st.sampled_from(["de", "en", "fr"])),
                min_size=1, max_size=80))
def test_uniquelang_grouped_matches_sql(pairs):
    import ray.data

    from xpshacl_ray.spec import UniqueLang, ValidationSpec
    from xpshacl_ray.pipelines.validate import ValidationEngine

    t = pa.table({"source": pa.array([p[0] for p in pairs]),
                  "lang": pa.array([p[1] for p in pairs])})
    spec = ValidationSpec(constraints=[UniqueLang(
        column="lang", group_by=["source"], lang_column="lang")])
    viol = (ValidationEngine(spec)
            .validate(ray.data.from_arrow(t)).to_pandas())
    got = sorted(viol["focus_node"]) if len(viol) else []
    con = duckdb.connect()
    con.register("t", t)
    want = sorted(r[0] for r in con.execute(
        "SELECT 'group:' || source || '/' || lang FROM t "
        "GROUP BY source, lang HAVING count(*) > 1").fetchall())
    assert got == want
