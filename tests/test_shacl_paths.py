"""SHACL property paths beyond a plain predicate: inverse paths and
sequence paths (with inverse elements), evaluated over the walked value
rows; unsupported operators surfaced as data, never mistranslated.

Reference analog: the reference delegates ALL path handling to pyshacl
(/root/reference/src/xpshacl_engine.py uses pyshacl.validate), which
evaluates the full SHACL path grammar; this covers the subset a
tabular walk expresses exactly and rejects the rest explicitly."""

import pyarrow as pa  # noqa: F401  (fixture parity with sibling tests)

from xpshacl_ray.sources.ttl import (
    _sp_index,
    long_form_property_shapes,
    parse_turtle,
    path_str,
    resolve_path,
    shapes_to_specs,
    unsupported_path_shapes,
    validate_ttl_long,
)

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"

PATH_SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .

ex:PopularShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:inversePath ex:knows ] ;
                sh:maxCount 1 ;
                sh:message "known by too many" ] .

ex:EmployerNameShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:name ) ;
                sh:minCount 1 ;
                sh:pattern "^[A-Z]" ;
                sh:message "employer must have a capitalized name" ] .

ex:ManagedAgeShape a sh:NodeShape ;
  sh:targetClass ex:Company ;
  sh:property [ sh:path ( [ sh:inversePath ex:worksFor ] ex:age ) ;
                sh:minInclusive 18 ;
                sh:message "employee under 18" ] .

ex:AltShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:alternativePath ( ex:a ex:b ) ] ;
                sh:minCount 1 ] .
"""

PATH_DATA = """
@prefix ex: <http://example.org/> .

ex:alice a ex:Person ; ex:knows ex:carol ; ex:worksFor ex:acme ;
  ex:age 34 .
ex:bob a ex:Person ; ex:knows ex:carol ; ex:knows ex:dave ;
  ex:worksFor ex:shadow ; ex:age 17 .
ex:carol a ex:Person ; ex:worksFor ex:acme ; ex:worksFor ex:lower ;
  ex:age 51 .
ex:dave a ex:Person .

ex:acme a ex:Company ; ex:name "Acme" .
ex:shadow a ex:Company .
ex:lower a ex:Company ; ex:name "lowercase inc" .
"""


def _t(text):
    t, _ = parse_turtle(text)
    return t


def test_resolve_path_forms():
    shapes = _t(PATH_SHAPES)
    obj = _sp_index(shapes)
    by_msg = {}
    for target, pshape, pred, facets in long_form_property_shapes(shapes):
        by_msg[facets.get("message")] = (pred, facets)
    inv_pred, inv_f = by_msg["known by too many"]
    assert inv_f["steps"] == [("inv", EX + "knows")]
    assert inv_pred == "^" + EX + "knows"
    seq_pred, seq_f = by_msg["employer must have a capitalized name"]
    assert seq_f["steps"] == [("fwd", EX + "worksFor"),
                              ("fwd", EX + "name")]
    assert seq_pred == EX + "worksFor" + "/" + EX + "name"
    # row-local facets collected for complex paths
    assert seq_f["min_count"] == 1 and seq_f["pattern"] == "^[A-Z]"
    mix_pred, mix_f = by_msg["employee under 18"]
    assert mix_f["steps"] == [("inv", EX + "worksFor"),
                              ("fwd", EX + "age")]
    assert mix_f["bounds"] == [("minInclusive", 18)]
    # alternativePath: not resolvable, not evaluated, surfaced as data
    assert None not in by_msg  # the AltShape entry (no message) is absent
    unsup = unsupported_path_shapes(shapes)
    assert [u["shape"] for u in unsup] == [EX + "AltShape"]
    # display helper round-trips
    assert path_str([("inv", "p"), ("fwd", "q")]) == "^p/q"
    # plain IRI resolves to a single forward step
    pt = [t for t in shapes if t.p == SH + "path"
          and t.kind == "iri"]
    assert pt == [] or all(
        resolve_path(obj, t) == [("fwd", t.o)] for t in pt)


def test_entity_pivot_never_sees_bnode_path_columns():
    specs = shapes_to_specs(_t(PATH_SHAPES))
    cols = {c.column for spec in specs.values()
            for c in spec.constraints}
    assert not any(c.startswith("_:") for c in cols)
    # nothing from the path-only shapes lands in the pivot at all
    assert cols == set()


def test_inverse_and_sequence_paths_end_to_end(ray_session):
    viol = validate_ttl_long(_t(PATH_DATA), _t(PATH_SHAPES)).to_pandas()
    comp = viol["constraint_id"].str.rsplit("#").str[-1]
    got = sorted(zip(viol["property_path"], viol["focus_node"], comp))
    inv = "^" + EX + "knows"
    seq = EX + "worksFor/" + EX + "name"
    mix = "^" + EX + "worksFor/" + EX + "age"
    assert got == sorted([
        # carol is known by alice AND bob → inverse maxCount 1
        (inv, "group:" + EX + "carol", "MaxCountConstraintComponent"),
        # bob's employer has no name; dave has no employer → seq minCount
        (seq, "group:" + EX + "bob", "MinCountConstraintComponent"),
        (seq, "group:" + EX + "dave", "MinCountConstraintComponent"),
        # carol's second employer's name is lowercase → pattern on values
        (seq, EX + "carol", "PatternConstraintComponent"),
        # shadow's one employee (bob) is 17 → bound over mixed-step path
        (mix, EX + "shadow", "MinInclusiveConstraintComponent"),
    ])
    # the pattern violation reports the offending walked VALUE
    pat = viol[comp == "PatternConstraintComponent"].iloc[0]
    assert pat["value"] == "lowercase inc"
    assert pat["message"] == "employer must have a capitalized name"


def test_path_values_are_distinct_nodes(ray_session):
    # two derivations reaching the SAME node count once (SHACL value
    # nodes are a set): x worksFor both firms, both named "Same" via
    # one shared literal node → maxCount 1 on (worksFor name) passes
    data = _t("""
@prefix ex: <http://example.org/> .
ex:x a ex:Person ; ex:worksFor ex:f1 ; ex:worksFor ex:f2 ; ex:age 30 .
ex:f1 a ex:Company ; ex:name "Same" .
ex:f2 a ex:Company ; ex:name "Same" .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:name ) ; sh:maxCount 1 ] .
""")
    out = validate_ttl_long(data, shapes)
    assert out is None or out.count() == 0


def test_lang_tagged_values_stay_distinct(ray_session):
    # "x"@en and "x"@fr are DIFFERENT value nodes → maxCount 1 violates
    data = _t("""
@prefix ex: <http://example.org/> .
ex:p a ex:Person ; ex:worksFor ex:f .
ex:f ex:name "x"@en ; ex:name "x"@fr .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:worksFor ex:name ) ; sh:maxCount 1 ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    assert len(viol) == 1
    assert viol.iloc[0]["focus_node"] == "group:" + EX + "p"
