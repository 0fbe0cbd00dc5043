"""sh:deactivated / sh:hasValue / sh:closed + sh:ignoredProperties —
standard-SHACL surface the reference gets free from pyshacl
(/root/reference/src/xpshacl_engine.py delegates to pyshacl.validate)."""

from xpshacl_ray.sources.ttl import (
    closed_node_shapes,
    long_form_property_shapes,
    parse_turtle,
    shapes_to_specs,
    validate_ttl_long,
)

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _t(text):
    t, _ = parse_turtle(text)
    return t


DATA = """
@prefix ex: <http://example.org/> .

ex:a a ex:Thing ; ex:name "A" ; ex:status "active" .
ex:b a ex:Thing ; ex:name "B" ; ex:status "retired" ; ex:extra "oops" .
ex:c a ex:Thing ; ex:status "active" .
"""


def test_deactivated_node_shape_skipped(ray_session):
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:deactivated true ;
  sh:property [ sh:path ex:name ; sh:minCount 2 ] .
""")
    assert shapes_to_specs(shapes) == {}
    assert long_form_property_shapes(shapes) == []
    out = validate_ttl_long(_t(DATA), shapes)
    assert out is None


def test_deactivated_property_shape_skipped(ray_session):
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:name ; sh:minCount 2 ;
                sh:deactivated true ] ;
  sh:property [ sh:path ex:status ; sh:maxCount 1 ] .
""")
    lf = long_form_property_shapes(shapes)
    # only the active status shape survives
    assert len(lf) == 1 and lf[0][2] == EX + "status"
    out = validate_ttl_long(_t(DATA), shapes)
    assert out is None or out.count() == 0  # all pass maxCount 1


def test_has_value_grouped(ray_session):
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:status ; sh:hasValue "active" ;
                sh:message "must be active" ] .
""")
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    assert list(viol["focus_node"]) == ["group:" + EX + "b"]
    assert viol.iloc[0]["message"] == "must be active"
    assert viol.iloc[0]["constraint_id"].endswith(
        "HasValueConstraintComponent")
    # a subject with NO value of the path also violates hasValue
    data2 = _t("""
@prefix ex: <http://example.org/> .
ex:z a ex:Thing ; ex:name "Z" .
""")
    viol2 = validate_ttl_long(data2, shapes).to_pandas()
    assert list(viol2["focus_node"]) == ["group:" + EX + "z"]


def test_has_value_on_sequence_path(ray_session):
    # composes with the path walker: employer's name must include Acme
    data = _t("""
@prefix ex: <http://example.org/> .
ex:p a ex:Person ; ex:worksFor ex:f .
ex:q a ex:Person ; ex:worksFor ex:g .
ex:f ex:name "Acme" .
ex:g ex:name "Globex" .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:name ) ;
                sh:hasValue "Acme" ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    assert list(viol["focus_node"]) == ["group:" + EX + "q"]


def test_closed_shape(ray_session):
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:closed true ;
  sh:ignoredProperties ( rdf:type ) ;
  sh:property [ sh:path ex:name ; sh:minLength 1 ] ;
  sh:property [ sh:path ex:status ; sh:maxCount 1 ] .
""")
    walked = closed_node_shapes(shapes)
    assert len(walked) == 1
    target, shape, allowed, msg, sev = walked[0]
    assert set(allowed) == {RDF_TYPE, EX + "name", EX + "status"}
    assert sev == "Violation"
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    closed = viol[viol["constraint_id"].str.endswith(
        "ClosedConstraintComponent")]
    assert len(closed) == 1
    row = closed.iloc[0]
    assert row["focus_node"] == EX + "b"
    assert row["property_path"] == EX + "extra"
    assert row["value"] == "oops"


def test_severity_from_ttl(ray_session):
    # sh:severity on the property shape lands on the violation rows;
    # a node-shape-level severity is the fallback
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:severity sh:Info ;
  sh:property [ sh:path ex:status ; sh:maxCount 1 ;
                sh:severity sh:Warning ] ;
  sh:property [ sh:path ex:name ; sh:minCount 2 ] .
""")
    data = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Thing ; ex:status "x" ; ex:status "y" ; ex:name "A" .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    sev = dict(zip(viol["property_path"], viol["severity"]))
    assert sev[EX + "status"] == "Warning"   # pshape-level
    assert sev[EX + "name"] == "Info"        # node-shape fallback
    # entity pivot path: severity on a row-local facet
    from xpshacl_ray.sources.ttl import shapes_to_specs

    shapes2 = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:name ; sh:minLength 3 ;
                sh:severity sh:Warning ] .
""")
    specs = shapes2 and shapes_to_specs(shapes2)
    c = list(specs.values())[0].constraints[0]
    assert c.severity == "Warning"


def test_closed_without_ignoring_rdf_type_flags_it(ray_session):
    # pyshacl-consistent gotcha: rdf:type is NOT implicitly allowed
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:closed true ;
  sh:property [ sh:path ex:name ; sh:minLength 1 ] ;
  sh:property [ sh:path ex:status ; sh:maxCount 1 ] .
""")
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    closed = viol[viol["constraint_id"].str.endswith(
        "ClosedConstraintComponent")]
    # rdf:type on a, b, c + ex:extra on b
    assert len(closed) == 4
    assert set(closed["property_path"]) == {RDF_TYPE, EX + "extra"}


def test_sh_node_value_conformance(ray_session):
    # values of ex:worksFor must conform to CompanyShape (name with
    # uppercase start + numeric founded year); a literal value has no
    # properties and fails the inner Required
    data = _t("""
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:good .
ex:p2 a ex:Person ; ex:worksFor ex:bad .
ex:p3 a ex:Person ; ex:worksFor "not-a-company" .
ex:p4 a ex:Person .
ex:good ex:name "Acme" ; ex:founded 1999 .
ex:bad ex:name "lower" ; ex:founded 2001 .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ;
                sh:message "employer must be a proper company" ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:pattern "^[A-Z]" ] ;
  sh:property [ sh:path ex:founded ; sh:minCount 1 ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    node = viol[viol["constraint_id"].str.endswith(
        "NodeConstraintComponent")]
    got = sorted(zip(node["focus_node"], node["value"]))
    # p2's employer fails the pattern; p3's literal fails Required;
    # p1 conforms; p4 has no value (sh:node alone never fires on zero)
    assert got == [
        (EX + "p2", EX + "bad"),
        (EX + "p3", "not-a-company"),
    ]
    assert set(node["message"]) == {"employer must be a proper company"}


def test_sh_node_all_conforming_no_rows(ray_session):
    data = _t("""
@prefix ex: <http://example.org/> .
ex:p a ex:Person ; ex:worksFor ex:f .
ex:f ex:name "Acme" .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    out = validate_ttl_long(data, shapes)
    assert out is None or out.count() == 0


def test_sh_node_deactivated_inner_shape_conforms(ray_session):
    data = _t("""
@prefix ex: <http://example.org/> .
ex:p a ex:Person ; ex:worksFor ex:f .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ; sh:deactivated true ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    out = validate_ttl_long(data, shapes)
    assert out is None or out.count() == 0


def test_logical_operators_from_ttl(ray_session):
    """sh:not / sh:or / sh:xone parsed from Turtle over value facets,
    with SHACL value-node null semantics (absent property never
    violates a logical operator)."""
    data = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Thing ; ex:code "AB12" .
ex:b a ex:Thing ; ex:code "abcd" .
ex:c a ex:Thing ; ex:code "12" .
ex:d a ex:Thing .
""")
    # not(pattern ^[a-z]) : lowercase codes violate; d (no code) excused
    shapes_not = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:code ;
                sh:not [ sh:pattern "^[a-z]" ] ;
                sh:message "no lowercase codes" ] .
""")
    from xpshacl_ray.sources.ttl import validate_ttl
    import ray.data  # noqa: F401

    def run(shapes):
        from xpshacl_ray.pipelines.validate import ValidationEngine
        from xpshacl_ray.sources.ttl import entity_table, shapes_to_specs
        import ray.data as rd

        specs = shapes_to_specs(shapes)
        (target, spec), = specs.items()
        table = entity_table(data, target)
        eng = ValidationEngine(spec)
        return eng.validate(rd.from_arrow(table)).to_pandas()

    v = run(shapes_not)
    assert sorted(v["focus_node"]) == [EX + "b"]
    assert set(v["message"]) == {"no lowercase codes"}

    # or(pattern ^[A-Z], datatype int-ish): "abcd" matches neither
    shapes_or = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:code ;
                sh:or ( [ sh:pattern "^[A-Z]" ] [ sh:pattern "^[0-9]+$" ] ) ] .
""")
    v = run(shapes_or)
    assert sorted(v["focus_node"]) == [EX + "b"]

    # xone: exactly one of (starts uppercase, contains digits) —
    # "AB12" matches both (violation), "abcd" matches neither
    # (violation), "12" matches digits only (ok)
    shapes_xone = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:code ;
                sh:xone ( [ sh:pattern "^[A-Z]" ] [ sh:pattern "[0-9]" ] ) ] .
""")
    v = run(shapes_xone)
    assert sorted(v["focus_node"]) == [EX + "a", EX + "b"]

    # an operand with no recognizable value facet skips the operator
    shapes_bad = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:code ;
                sh:or ( [ sh:pattern "^[A-Z]" ] [ sh:minCount 1 ] ) ] .
""")
    from xpshacl_ray.sources.ttl import shapes_to_specs as s2s
    assert s2s(shapes_bad) == {}


def test_property_pair_constraints_from_ttl(ray_session, tmp_path):
    """sh:equals / sh:disjoint / sh:lessThan parsed from Turtle and
    evaluated over the entity pivot's first values."""
    from xpshacl_ray.sources.ttl import validate_ttl

    data = """
@prefix ex: <http://example.org/> .
ex:a a ex:Span ; ex:start 1 ; ex:end 5 ; ex:label "a" ; ex:alias "a" .
ex:b a ex:Span ; ex:start 7 ; ex:end 3 ; ex:label "b" ; ex:alias "c" .
ex:c a ex:Span ; ex:start 2 ; ex:end 2 ; ex:label "c" ; ex:alias "c" .
"""
    shapes = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Span ;
  sh:property [ sh:path ex:start ; sh:lessThan ex:end ;
                sh:message "start before end" ] ;
  sh:property [ sh:path ex:label ; sh:disjoint ex:alias ;
                sh:message "label must differ from alias" ] .
"""
    d, s = tmp_path / "d.ttl", tmp_path / "s.ttl"
    d.write_text(data)
    s.write_text(shapes)
    viol = validate_ttl(str(d), str(s)).to_pandas()
    got = sorted(zip(viol["focus_node"], viol["message"]))
    assert got == [
        (EX + "a", "label must differ from alias"),   # label == alias
        (EX + "b", "start before end"),               # 7 !< 3
        (EX + "c", "label must differ from alias"),   # label == alias
        (EX + "c", "start before end"),               # 2 !< 2
    ]
    comp = set(viol["constraint_id"].str.rsplit("#").str[-1])
    assert comp == {"LessThanConstraintComponent",
                    "DisjointConstraintComponent"}


def test_equals_pair_missing_other_column_padded(ray_session, tmp_path):
    # sh:equals against a predicate absent from the whole graph: the
    # pivot pads it with nulls and engine null semantics excuse rows
    from xpshacl_ray.sources.ttl import validate_ttl

    data = """
@prefix ex: <http://example.org/> .
ex:a a ex:Span ; ex:start 1 .
"""
    shapes = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Span ;
  sh:property [ sh:path ex:start ; sh:equals ex:mirror ] .
"""
    d, s = tmp_path / "d.ttl", tmp_path / "s.ttl"
    d.write_text(data)
    s.write_text(shapes)
    out = validate_ttl(str(d), str(s))
    assert out.count() == 0


def test_qualified_value_shape(ray_session):
    """sh:qualifiedValueShape + qualifiedMin/MaxCount over value-facet
    inner shapes, counted per focus on the GroupPredicate sweep."""
    data = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Team ; ex:member "senior-x" ; ex:member "junior-y" .
ex:b a ex:Team ; ex:member "junior-y" ; ex:member "junior-z" .
ex:c a ex:Team ; ex:member "senior-1" ; ex:member "senior-2" ;
  ex:member "senior-3" .
ex:d a ex:Team .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Team ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:pattern "^senior" ] ;
                sh:qualifiedMinCount 1 ; sh:qualifiedMaxCount 2 ;
                sh:message "need 1-2 seniors" ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    comp = viol["constraint_id"].str.rsplit("#").str[-1]
    got = sorted(zip(viol["focus_node"], comp))
    # b has 0 seniors (< 1), d has none at all (< 1), c has 3 (> 2)
    assert got == [
        ("group:" + EX + "b", "QualifiedMinCountConstraintComponent"),
        ("group:" + EX + "c", "QualifiedMaxCountConstraintComponent"),
        ("group:" + EX + "d", "QualifiedMinCountConstraintComponent"),
    ]
    assert set(viol["message"]) == {"need 1-2 seniors"}


def test_qualified_shape_with_structure_counts_via_checker(ray_session):
    # a qualified shape with STRUCTURE (sh:property inside) counts
    # through the full recursive _NodeChecker (it was skipped before
    # the checker existed — never a wrong count, but a missed one):
    # the literal member has no ex:q values, fails the inner minCount,
    # so zero members conform and qualifiedMinCount 1 violates
    data = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Team ; ex:member "x" .
ex:b a ex:Team ; ex:member ex:m1 .
ex:m1 ex:q "present" .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Team ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:property [ sh:path ex:q ;
                                          sh:minCount 1 ] ] ;
                sh:qualifiedMinCount 1 ] .
""")
    out = validate_ttl_long(data, shapes).to_pandas()
    q = out[out["constraint_id"].str.endswith(
        "QualifiedMinCountConstraintComponent")]
    assert list(q["focus_node"]) == ["group:" + EX + "a"]


def test_has_value_full_term_identity(ray_session):
    # "active"@en is a DIFFERENT RDF term than plain "active": it must
    # NOT satisfy sh:hasValue "active"
    data = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Thing ; ex:status "active" .
ex:b a ex:Thing ; ex:status "active"@en .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:status ; sh:hasValue "active" ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    assert list(viol["focus_node"]) == ["group:" + EX + "b"]
    # an IRI required value only matches IRI terms, not equal-lexical
    # literals
    data2 = _t("""
@prefix ex: <http://example.org/> .
ex:a a ex:Thing ; ex:ref ex:target .
ex:b a ex:Thing ; ex:ref "http://example.org/target" .
""")
    shapes2 = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:ref ; sh:hasValue ex:target ] .
""")
    viol2 = validate_ttl_long(data2, shapes2).to_pandas()
    assert list(viol2["focus_node"]) == ["group:" + EX + "b"]


def test_sh_flags_on_pattern(ray_session, tmp_path):
    # sh:flags "i": case-insensitive pattern from Turtle
    from xpshacl_ray.sources.ttl import validate_ttl

    data = """
@prefix ex: <http://example.org/> .
ex:a a ex:Thing ; ex:code "ABC" .
ex:b a ex:Thing ; ex:code "abc" .
ex:c a ex:Thing ; ex:code "xyz" .
"""
    shapes = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:code ; sh:pattern "^abc" ; sh:flags "i" ] .
"""
    d, s = tmp_path / "d.ttl", tmp_path / "s.ttl"
    d.write_text(data)
    s.write_text(shapes)
    viol = validate_ttl(str(d), str(s)).to_pandas()
    # both cases of abc match under "i"; only xyz violates
    assert list(viol["focus_node"]) == [EX + "c"]
