"""Extended SHACL target kinds: sh:targetNode, sh:targetSubjectsOf,
sh:targetObjectsOf — the reference gets all of these free from pyshacl
(/root/reference/src/xpshacl_engine.py delegates to pyshacl.validate);
here they resolve to explicit focus-node sets fed through the same
entity-pivot / long-form machinery as sh:targetClass."""

from xpshacl_ray.sources.ttl import (
    TARGET_NODE,
    TARGET_OBJECTS_OF,
    TARGET_SUBJECTS_OF,
    parse_turtle,
    target_subjects,
    validate_ttl,
    validate_ttl_long,
)

EX = "http://example.org/"


def _t(text):
    t, _ = parse_turtle(text)
    return t


DATA = """
@prefix ex: <http://example.org/> .

ex:a a ex:Thing ; ex:name "Alpha" ; ex:rated ex:b .
ex:b ex:name "beta" ; ex:rated ex:c .
ex:c ex:size 4 .
ex:d ex:rated ex:a ; ex:rated ex:c .
"""


def test_target_subjects_resolution():
    data = _t(DATA)
    assert target_subjects(data, TARGET_NODE + EX + "zzz") == [EX + "zzz"]
    assert target_subjects(data, TARGET_SUBJECTS_OF + EX + "rated") == [
        EX + "a", EX + "b", EX + "d"]
    assert target_subjects(data, TARGET_OBJECTS_OF + EX + "rated") == [
        EX + "b", EX + "c", EX + "a"]
    # plain class IRI keeps explicit-rdf:type-only semantics
    assert target_subjects(data, EX + "Thing") == [EX + "a"]


def test_target_node_entity_pivot(ray_session, tmp_path):
    # b has a lowercase name; zzz is ABSENT from the data graph but a
    # declared focus node — its missing name is a MinCount violation
    shapes = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetNode ex:b ; sh:targetNode ex:zzz ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ;
                sh:pattern "^[A-Z]" ; sh:message "bad name" ] .
"""
    d, s = tmp_path / "d.ttl", tmp_path / "s.ttl"
    d.write_text(DATA)
    s.write_text(shapes)
    viol = validate_ttl(str(d), str(s)).to_pandas()
    comp = viol["constraint_id"].str.rsplit("#").str[-1]
    got = sorted(zip(viol["focus_node"], comp))
    assert got == [
        (EX + "b", "PatternConstraintComponent"),
        (EX + "zzz", "MinCountConstraintComponent"),
    ]


def test_target_subjects_of_long_form(ray_session):
    # everything that RATES something must rate at most 1 thing
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:rated ;
  sh:property [ sh:path ex:rated ; sh:maxCount 1 ;
                sh:message "rates too much" ] .
""")
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    assert list(viol["focus_node"]) == ["group:" + EX + "d"]
    assert viol.iloc[0]["message"] == "rates too much"


def test_target_objects_of_long_form(ray_session):
    # everything that IS rated must have a name (a and b do, c does
    # not) — objects-of targeting with a grouped minCount
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetObjectsOf ex:rated ;
  sh:property [ sh:path ex:name ; sh:minCount 2 ;
                sh:message "unnamed rated thing" ] .
""")
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    # minCount 2: a and b have one name (violation), c has none
    assert sorted(viol["focus_node"]) == [
        "group:" + EX + "a", "group:" + EX + "b", "group:" + EX + "c"]


def test_extended_target_with_complex_path(ray_session):
    # target kinds compose with the path walker: subjects-of `rated`
    # whose rated things' names must be capitalized
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:rated ;
  sh:property [ sh:path ( ex:rated ex:name ) ; sh:pattern "^[A-Z]" ;
                sh:message "rated a badly-named thing" ] .
""")
    viol = validate_ttl_long(_t(DATA), shapes).to_pandas()
    # a rated b (name "beta" → violation); b rated c (no name → no
    # value, excused); d rated a ("Alpha" ok) and c (no name)
    assert sorted(viol["focus_node"]) == [EX + "a"]
    assert viol.iloc[0]["value"] == "beta"
