"""End-to-end graph-pattern SPARQL shape routed from Turtle through the
`sparql_impls` escape hatch (VERDICT r2 missing item 3): a shark-style
multi-row ``sh:sparql`` block ("at most one superclass",
shark_shapes.ttl:48-67) that the FILTER-only translator cannot express
is implemented as a GroupedSparql over the triples table — one group per
focus subject, exactly the per-$this binding set the WHERE joins over."""

import numpy as np
import pyarrow as pa
import pytest

from xpshacl_ray.sources.ttl import sparql_sqlchecks, load_turtle, validate_ttl
from xpshacl_ray.spec import GroupedSparql

SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/> .

ex:ClassShape a sh:NodeShape ;
  sh:targetClass owl:Class ;
  sh:property [
    sh:path rdfs:label ;
    sh:minCount 1 ;
  ] ;
  sh:property [
    sh:message "Classes must have at most one superclass" ;
    sh:path rdfs:subClassOf ;
    sh:sparql [
      sh:message "Classes must have at most one superclass" ;
      sh:select "SELECT DISTINCT $this WHERE { $this rdfs:subClassOf ?v1 . $this rdfs:subClassOf ?v2 . FILTER(?v1 != ?v2) . }" ;
    ] ;
  ] .
"""

DATA = """
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/> .

ex:A a owl:Class ; rdfs:label "A" .
ex:B a owl:Class ; rdfs:label "B" ; rdfs:subClassOf ex:A .
ex:C a owl:Class ; rdfs:label "C" ; rdfs:subClassOf ex:A ; rdfs:subClassOf ex:B .
"""

RDFS = "http://www.w3.org/2000/01/rdf-schema#"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _multi_superclass_impl():
    def fn(g: pa.Table) -> bool:
        pred = np.asarray(g["predicate"].to_numpy(zero_copy_only=False))
        obj = np.asarray(g["object"].to_numpy(zero_copy_only=False))
        parents = obj[pred == f"{RDFS}subClassOf"]
        return len(set(parents)) >= 2

    return GroupedSparql(
        path=f"{RDFS}subClassOf",
        group_by=["subject"],
        columns=["predicate", "object"],
        name="at-most-one-superclass",
        fn=fn,
        message="Classes must have at most one superclass",
    )


def test_graph_pattern_block_is_surfaced_not_translated(tmp_path):
    shapes = _write(tmp_path, "shapes.ttl", SHAPES)
    triples, _ = load_turtle(shapes)
    checks, skipped = sparql_sqlchecks(triples)
    # the multi-row join query must NOT silently mistranslate
    assert not checks
    assert len(skipped) == 1
    assert skipped[0]["message"] == "Classes must have at most one superclass"


def test_sparql_impls_routes_skipped_block_end_to_end(tmp_path):
    shapes = _write(tmp_path, "shapes.ttl", SHAPES)
    data = _write(tmp_path, "data.ttl", DATA)
    impl = _multi_superclass_impl()
    viol = validate_ttl(
        data, shapes,
        sparql_impls={"Classes must have at most one superclass": impl},
    ).to_pandas()
    sparql_rows = viol[viol["message"]
                       == "Classes must have at most one superclass"]
    # only ex:C has two distinct superclasses
    assert list(sparql_rows["subject"]) == ["http://example.org/C"]
    assert (sparql_rows["violation_type"] == "other").all()
    # the rest of the shape still evaluates (minCount on label: none)
    assert (viol["message"] != "Less than 1 values on "
            f"{RDFS}label").all()


def test_unmatched_impl_key_leaves_block_as_data(tmp_path):
    shapes = _write(tmp_path, "shapes.ttl", SHAPES)
    data = _write(tmp_path, "data.ttl", DATA)
    viol = validate_ttl(data, shapes,
                        sparql_impls={"some other message":
                                      _multi_superclass_impl()}).to_pandas()
    # no impl matched -> the block stays data; with labels present the
    # remaining shape yields zero violations at all
    assert len(viol) == 0


DATA_NONTARGET = DATA + """
ex:D rdfs:label "not a class" ; rdfs:subClassOf ex:A ; rdfs:subClassOf ex:B .
ex:E a ex:Widget ; rdfs:subClassOf ex:A ; rdfs:subClassOf ex:B .
"""


def test_sparql_impls_scoped_to_target_class(tmp_path):
    """SHACL focus-node semantics (ADVICE r3): the impl only sees
    subjects typed as the holder shape's sh:targetClass — untyped ex:D
    and differently-typed ex:E match the pattern but must NOT emit."""
    shapes = _write(tmp_path, "shapes.ttl", SHAPES)
    data = _write(tmp_path, "data.ttl", DATA_NONTARGET)
    impl = _multi_superclass_impl()
    viol = validate_ttl(
        data, shapes,
        sparql_impls={"Classes must have at most one superclass": impl},
    ).to_pandas()
    sparql_rows = viol[viol["message"]
                       == "Classes must have at most one superclass"]
    assert list(sparql_rows["subject"]) == ["http://example.org/C"]


# ---------------------------------------------------------------------------
# VERDICT r3 item 6: auto-translation of the two-triple self-join subset.
# ---------------------------------------------------------------------------

SHARK_SUPERCLASS_FULL = """
PREFIX owl: <http://www.w3.org/2002/07/owl#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
SELECT DISTINCT $this
WHERE {
  $this rdf:type owl:Class .
  $this rdfs:subClassOf ?v1 .
  $this rdfs:subClassOf ?v2 .
  FILTER NOT EXISTS {?v1 rdfs:subClassOf ?v2 }.
  FILTER(?v1 != ?v2) .
}
"""


def test_parse_self_join_accepts_pure_form():
    from xpshacl_ray.sources.ttl import _parse_self_join_select

    sel = """
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT DISTINCT $this WHERE {
      $this rdfs:subClassOf ?v1 .
      $this rdfs:subClassOf ?v2 .
      FILTER(?v1 != ?v2) .
    }
    """
    out = _parse_self_join_select(sel, "http://www.w3.org/2002/07/owl#Class")
    assert out == {"kind": "self_join",
                   "path": "http://www.w3.org/2000/01/rdf-schema#subClassOf",
                   "guards": []}


def test_parse_self_join_rejects_not_exists():
    """The full shark superclass query carries FILTER NOT EXISTS — it
    must stay surfaced as data, never silently mistranslated."""
    from xpshacl_ray.sources.ttl import _parse_self_join_select

    assert _parse_self_join_select(
        SHARK_SUPERCLASS_FULL, "http://www.w3.org/2002/07/owl#Class") is None


def test_parse_self_ref_with_in_guard():
    from xpshacl_ray.sources.ttl import _parse_self_join_select

    sel = """
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    SELECT $this WHERE {
      $this a ?property .
      $this owl:inverseOf $this .
      FILTER(?property IN (rdf:Property, owl:DatatypeProperty, owl:ObjectProperty)) .
    }
    """
    target = "http://www.w3.org/2002/07/owl#ObjectProperty"
    out = _parse_self_join_select(sel, target)
    guard = sorted([
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#Property",
        "http://www.w3.org/2002/07/owl#DatatypeProperty",
        "http://www.w3.org/2002/07/owl#ObjectProperty"])
    assert out["kind"] == "self_ref"
    assert out["path"] == "http://www.w3.org/2002/07/owl#inverseOf"
    assert sorted(out["guards"][0]) == guard
    # target no longer gates translation: the IN list becomes a guard
    # the CONSUMER intersects the focus scope with (union-target model)
    other = _parse_self_join_select(sel, "http://example.org/Other")
    assert sorted(other["guards"][0]) == guard


def test_parse_type_guard_recorded_and_bind_rejected():
    from xpshacl_ray.sources.ttl import _parse_self_join_select

    sel = """
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    SELECT $this WHERE {
      $this a owl:Thing .
      $this rdfs:subClassOf ?v1 .
      $this rdfs:subClassOf ?v2 .
      FILTER(?v1 != ?v2) .
    }
    """
    # a type guard naming another class parses WITH the guard recorded
    # (the consumer intersects the scope; round-3 rejected this form)
    out = _parse_self_join_select(
        sel, "http://www.w3.org/2002/07/owl#Class")
    assert out["kind"] == "self_join"
    assert out["guards"] == [["http://www.w3.org/2002/07/owl#Thing"]]
    bind = "SELECT $this WHERE { BIND(STR($this) as ?s) . }"
    assert _parse_self_join_select(bind, "x") is None


def test_validate_ttl_sparql_auto_end_to_end(tmp_path):
    """sparql=True picks the auto-translated grouped constraints up with
    NO hand-bound sparql_impls; the engine matches the independently
    derived expected list."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __ray_entry__ import _ttl_auto_fixture
    from xpshacl_ray.sources.ttl import validate_ttl

    data_ttl, shapes_ttl, expected = _ttl_auto_fixture()
    dp = tmp_path / "data.ttl"
    sp = tmp_path / "shapes.ttl"
    dp.write_text(data_ttl)
    sp.write_text(shapes_ttl)
    viol = validate_ttl(str(dp), str(sp), sparql=True).to_pandas()
    got = sorted(zip(viol["subject"], viol["message"]))
    assert got == expected
