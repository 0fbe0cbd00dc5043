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

ex:NestedShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:alternativePath ( ex:a ( ex:b ex:c ) ) ] ;
                sh:message "nested alt" ;
                sh:minCount 1 ] .

ex:MalformedShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ ex:notAPathPredicate ex:p ] ;
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

# nested-alt witnesses: alice via the ex:a branch, carol via ex:b/ex:c
ex:alice ex:a ex:anchor .
ex:carol ex:b ex:mid .
ex:mid ex:c "v" .
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
    # nested composite (alternative containing a sequence): resolves
    # recursively — the sequence operand becomes a ("seq", [...]) node
    nest_pred, nest_f = by_msg["nested alt"]
    assert nest_f["steps"] == [
        ("alt", [("fwd", EX + "a"),
                 ("seq", [("fwd", EX + "b"), ("fwd", EX + "c")])])]
    assert nest_pred == f"({EX}a|({EX}b/{EX}c))"
    # only a genuinely malformed path node (no path predicate at all)
    # is surfaced as data
    unsup = unsupported_path_shapes(shapes)
    assert [u["shape"] for u in unsup] == [EX + "MalformedShape"]
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
    nest = f"({EX}a|({EX}b/{EX}c))"
    assert got == sorted([
        # bob and dave reach nothing via (a | b/c) → nested-alt minCount
        (nest, "group:" + EX + "bob", "MinCountConstraintComponent"),
        (nest, "group:" + EX + "dave", "MinCountConstraintComponent"),
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


def test_alternative_and_closure_paths(ray_session):
    """alt / zeroOrMore / oneOrMore / zeroOrOne step semantics: value
    sets match the SHACL spec (star includes the focus node; closures
    are cycle-safe)."""
    data = _t("""
@prefix ex: <http://example.org/> .
ex:r a ex:Node ; ex:child ex:m .
ex:m ex:child ex:l1 ; ex:child ex:l2 .
ex:l2 ex:child ex:r .
ex:s a ex:Node2 ; ex:p "viaP" ; ex:q "viaQ" .
ex:t a ex:Node2 .
""")
    shapes_alt = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node2 ;
  sh:property [ sh:path [ sh:alternativePath ( ex:p ex:q ) ] ;
                sh:minCount 2 ; sh:message "needs p and q" ] .
""")
    viol = validate_ttl_long(data, shapes_alt).to_pandas()
    # s has both (2 values), t has none (0 < 2): only t violates
    assert list(viol["focus_node"]) == ["group:" + EX + "t"]
    assert viol.iloc[0]["property_path"] == \
        "(" + EX + "p|" + EX + "q)"

    # oneOrMorePath over a CYCLIC child relation: r+ reaches
    # {m, l1, l2, r} (cycle-safe, includes r itself via the loop)
    shapes_plus = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path [ sh:oneOrMorePath ex:child ] ;
                sh:maxCount 3 ; sh:message "too many descendants" ] .
""")
    viol = validate_ttl_long(data, shapes_plus).to_pandas()
    assert len(viol) == 1  # 4 > 3
    assert '"actualCount": 4' in viol.iloc[0]["context"]

    # on the CYCLE the star set equals the plus set (the loop already
    # re-reaches the focus node): 4 values → maxCount 4 passes
    shapes_star = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path [ sh:zeroOrMorePath ex:child ] ;
                sh:maxCount 4 ; sh:message "m" ] .
""")
    out = validate_ttl_long(data, shapes_star)
    assert out is None or out.count() == 0

    # ACYCLIC focus separates them: solo child+ = {x} (passes
    # maxCount 1) but child* = {solo, x} (violates, actualCount 2)
    data2 = _t("""
@prefix ex: <http://example.org/> .
ex:solo a ex:Node ; ex:child ex:x .
""")
    shapes_star1 = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path [ sh:zeroOrMorePath ex:child ] ;
                sh:maxCount 1 ; sh:message "m" ] .
""")
    viol = validate_ttl_long(data2, shapes_star1).to_pandas()
    assert len(viol) == 1
    assert '"actualCount": 2' in viol.iloc[0]["context"]
    shapes_plus1 = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path [ sh:oneOrMorePath ex:child ] ;
                sh:maxCount 1 ] .
""")
    out = validate_ttl_long(data2, shapes_plus1)
    assert out is None or out.count() == 0

    # zeroOrOnePath: focus node + direct children = {r, m} → 2, passes 2
    shapes_opt = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path [ sh:zeroOrOnePath ex:child ] ;
                sh:maxCount 2 ] .
""")
    out = validate_ttl_long(data, shapes_opt)
    assert out is None or out.count() == 0


def test_closure_inside_sequence(ray_session):
    # (child+ name): names of all strict descendants
    data = _t("""
@prefix ex: <http://example.org/> .
ex:root a ex:Node ; ex:child ex:a .
ex:a ex:child ex:b ; ex:name "A" .
ex:b ex:name "b-lower" .
""")
    shapes = _t("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:Node ;
  sh:property [ sh:path ( [ sh:oneOrMorePath ex:child ] ex:name ) ;
                sh:pattern "^[A-Z]" ; sh:message "bad name" ] .
""")
    viol = validate_ttl_long(data, shapes).to_pandas()
    assert len(viol) == 1 and viol.iloc[0]["value"] == "b-lower"


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
