"""Recursive sh:node conformance (_NodeChecker) — unbounded nesting
depth, grouped facets / complex paths / logical operators / closed
inside the referenced shape, and a cycle-safe treatment of recursive
shape graphs.  The reference gets sh:node free from pyshacl
(/root/reference/src/xpshacl_engine.py delegates to pyshacl.validate);
pyshacl RAISES on recursive shapes — here they terminate with the
assume-conforming reading."""

from xpshacl_ray.sources.ttl import (
    _NodeChecker,
    _sp_index,
    parse_turtle,
    validate_ttl_long,
)

EX = "http://example.org/"
SH = "@prefix sh: <http://www.w3.org/ns/shacl#> .\n" \
     "@prefix ex: <http://example.org/> .\n"


def _t(text):
    t, _ = parse_turtle(text)
    return t


def _node_rows(data, shapes):
    out = validate_ttl_long(_t(data), _t(shapes))
    rows = out.take_all() if out is not None else []
    return sorted(
        (r["focus_node"], r["value"]) for r in rows
        if r["constraint_id"].endswith("NodeConstraintComponent"))


def test_nested_sh_node_depth_two(ray_session):
    # person -> company (CompanyShape) -> hq (AddressShape: city needed)
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:name "Acme" ; ex:hq ex:a1 .
ex:c2 ex:name "Evil" ; ex:hq ex:a2 .
ex:a1 ex:city "Berlin" .
ex:a2 ex:zip "10999" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:hq ; sh:node ex:AddressShape ] .
ex:AddressShape a sh:NodeShape ;
  sh:property [ sh:path ex:city ; sh:minCount 1 ] .
"""
    # c2 is nonconforming ONLY through the nested AddressShape (depth 2)
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_grouped_facet_inside_referenced_shape(ray_session):
    # maxCount inside the referenced shape: the depth-1 pivot could not
    # see multi-valued properties of the VALUE node
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:ceo ex:x .
ex:c2 ex:ceo ex:x ; ex:ceo ex:y .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:ceo ; sh:maxCount 1 ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_value_facet_checks_every_value_not_first(ray_session):
    # two names, the lexically LATER one violates the pattern — full
    # SHACL semantics check every value node of the referenced shape
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:c1 ex:name "Acme" ; ex:name "acme-lower" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:pattern "^[A-Z]" ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p1", EX + "c1")]


def test_complex_path_inside_referenced_shape(ray_session):
    # the referenced shape walks an INVERSE path from the value node
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:e1 ex:employedBy ex:c1 .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path [ sh:inversePath ex:employedBy ] ;
                sh:minCount 1 ] .
"""
    # c2 has no inverse-employedBy subject
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_logical_operator_inside_referenced_shape(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:code "AB12" .
ex:c2 ex:code "zz" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:code ;
                sh:or ( [ sh:pattern "^[A-Z]" ] [ sh:minLength 4 ] ) ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_closed_referenced_shape(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:name "Acme" .
ex:c2 ex:name "Evil" ; ex:secret "x" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ; sh:closed true ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_has_value_inside_referenced_shape(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:status "active" ; ex:status "audited" .
ex:c2 ex:status "retired" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:status ; sh:hasValue "active" ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_qualified_count_inside_referenced_shape(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:tag "v0" ; ex:tag "v1" .
ex:c2 ex:tag "v0" ; ex:tag "zz" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:tag ;
                sh:qualifiedValueShape [ sh:pattern "^v" ] ;
                sh:qualifiedMinCount 2 ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_recursive_shape_terminates_assume_conforming(ray_session):
    # shape references ITSELF through sh:node along a follower cycle;
    # pyshacl raises ShapeRecursionError — here the cycle terminates
    # with the (term, shape) pair under evaluation assumed conforming,
    # so only genuinely-violating nodes report
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:knows ex:p2 .
ex:p2 ex:knows ex:p1 ; ex:name "B" .
ex:p1 ex:name "A" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:node ex:PersonShape ] ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""
    assert _node_rows(data, shapes) == []

    # breaking the inner node's name makes the recursion REPORT it
    data_bad = data.replace('ex:p2 ex:knows ex:p1 ; ex:name "B" .',
                            "ex:p2 ex:knows ex:p1 .")
    assert _node_rows(data_bad, shapes) == [(EX + "p1", EX + "p2")]


def test_property_pair_full_set_semantics(ray_session):
    # sh:equals inside the referenced shape compares VALUE SETS
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:worksFor ex:c1 .
ex:p2 a ex:Person ; ex:worksFor ex:c2 .
ex:c1 ex:a "x" ; ex:a "y" ; ex:b "x" ; ex:b "y" .
ex:c2 ex:a "x" ; ex:a "y" ; ex:b "x" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] .
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:a ; sh:equals ex:b ] .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", EX + "c2")]


def test_node_level_facets_apply_to_the_value_itself(ray_session):
    # the referenced shape constrains the VALUE NODE directly
    # (node-level sh:nodeKind + sh:pattern), not just its properties
    data = """
@prefix ex: <http://example.org/> .
ex:p1 a ex:Person ; ex:ref ex:good_thing .
ex:p2 a ex:Person ; ex:ref "a literal" .
"""
    shapes = SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:ref ; sh:node ex:RefShape ] .
ex:RefShape a sh:NodeShape ;
  sh:nodeKind sh:IRI ; sh:pattern "good" .
"""
    assert _node_rows(data, shapes) == [(EX + "p2", "a literal")]


def test_checker_memoizes_per_term_shape(ray_session):
    data, _ = parse_turtle("""
@prefix ex: <http://example.org/> .
ex:c1 ex:name "Acme" .
""")
    shapes, _ = parse_turtle(SH + """
ex:CompanyShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    ck = _NodeChecker(data, _sp_index(shapes), {})
    t = (EX + "c1", "iri", "")
    assert ck.conforms(t, EX + "CompanyShape")
    assert ck.memo[(t, EX + "CompanyShape")] is True
    assert not ck.conforms((EX + "missing", "iri", ""),
                           EX + "CompanyShape")

# ---------------------------------------------------------------------------
# differential fuzz: random graphs x random (possibly nested) inner shapes
# vs an independent recursive evaluator written directly over the triples
# ---------------------------------------------------------------------------
import re as _re

import numpy as np


def _gen_graph(rng):
    lines = ["@prefix ex: <http://example.org/> ."]
    subs = [f"s{i}" for i in range(5)]
    others = [f"n{i}" for i in range(6)]
    for s in subs:
        lines.append(f"ex:{s} a ex:T .")
    for _ in range(int(rng.integers(10, 30))):
        s = (subs + others)[rng.integers(0, 11)]
        p = f"p{rng.integers(0, 3)}"
        r = rng.random()
        if r < 0.3:
            o = f'"v{rng.integers(0, 4)}"'
        else:
            o = f"ex:{(subs + others)[rng.integers(0, 11)]}"
        lines.append(f"ex:{s} ex:{p} {o} .")
    return "\n".join(lines)


def _fwd_terms(triples, node_term, pred):
    """Independent forward step: distinct (lexical, kind, lang) objects."""
    if node_term[1] == "literal":
        return set()
    return {(t.o, t.kind, t.lang or "") for t in triples
            if t.s == node_term[0] and t.p == pred}


def test_recursive_node_fuzz_vs_independent_evaluator(ray_session):
    rng = np.random.default_rng(123)
    P0, P1, P2 = EX + "p0", EX + "p1", EX + "p2"
    for trial in range(12):
        data_ttl = _gen_graph(rng)
        data, _ = parse_turtle(data_ttl)
        kind = int(rng.integers(0, 4))
        k = int(rng.integers(1, 3))
        inner_extra = ""
        if kind == 0:
            facet = f"sh:minCount {k}"
        elif kind == 1:
            facet = f"sh:maxCount {k}"
        elif kind == 2:
            facet = 'sh:pattern "^v[01]$"'
        else:
            facet = "sh:node ex:Inner2"
            inner_extra = ("ex:Inner2 a sh:NodeShape ;\n"
                           "  sh:property [ sh:path ex:p1 ; "
                           "sh:minCount 1 ] .\n")
        shapes, _ = parse_turtle(SH + f"""
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p0 ; sh:node ex:Inner ] .
ex:Inner a sh:NodeShape ;
  sh:property [ sh:path ex:{"p2" if kind == 3 else "p1"} ; {facet} ] .
{inner_extra}""")

        def conforms2(term):
            return len(_fwd_terms(data, term, P1)) >= 1

        def conforms1(term):
            vals = _fwd_terms(data, term, P2 if kind == 3 else P1)
            if kind == 0:
                return len(vals) >= k
            if kind == 1:
                return len(vals) <= k
            if kind == 2:
                return all(_re.search(r"^v[01]$", v[0]) for v in vals)
            return all(conforms2(v) for v in vals)

        # the NodeConformance contract matches object STRINGS — collapse
        # term-level verdicts to lexical strings exactly as production does
        bad_strings = set()
        focus = {f"{EX}s{i}" for i in range(5)}
        p0_rows = [(t.s, (t.o, t.kind, t.lang or "")) for t in data
                   if t.p == P0 and t.s in focus]
        for _s, term in p0_rows:
            if not conforms1(term):
                bad_strings.add(term[0])
        want = sorted({(s, term[0]) for s, term in p0_rows
                       if term[0] in bad_strings})

        out = validate_ttl_long(data, shapes)
        rows = out.take_all() if out is not None else []
        got = sorted({(r["focus_node"], r["value"]) for r in rows
                      if r["constraint_id"].endswith(
                          "NodeConstraintComponent")})
        assert got == want, (trial, kind, k, got, want, data_ttl)


def _step_terms(triples, nodes, step):
    """Independent one-step walk over (lexical, kind, lang) terms —
    datatype-less identity, mirroring the checker's contract."""
    out = set()
    for n in nodes:
        for t in triples:
            if step[0] == "fwd":
                if t.p == step[1] and n[1] != "literal" and t.s == n[0]:
                    out.add((t.o, t.kind, t.lang or ""))
            else:
                if t.p == step[1] and (t.o, t.kind, t.lang or "") == n:
                    out.add((t.s, "iri", ""))
    return out


def test_recursive_node_fuzz_complex_inner_paths(ray_session):
    """Inner shapes walking inverse / sequence paths from the value
    node, vs the independent evaluator."""
    rng = np.random.default_rng(321)
    P0, P1, P2 = EX + "p0", EX + "p1", EX + "p2"
    INNER_PATHS = [
        ("[ sh:inversePath ex:p1 ]", [("inv", P1)]),
        ("( ex:p1 ex:p2 )", [("fwd", P1), ("fwd", P2)]),
        ("( [ sh:inversePath ex:p2 ] ex:p1 )",
         [("inv", P2), ("fwd", P1)]),
    ]
    for trial in range(9):
        data_ttl = _gen_graph(rng)
        data, _ = parse_turtle(data_ttl)
        path_ttl, steps = INNER_PATHS[trial % len(INNER_PATHS)]
        k = int(rng.integers(1, 3))
        shapes, _ = parse_turtle(SH + f"""
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p0 ; sh:node ex:Inner ] .
ex:Inner a sh:NodeShape ;
  sh:property [ sh:path {path_ttl} ; sh:minCount {k} ] .
""")

        def conforms(term):
            nodes = {term}
            for st in steps:
                nodes = _step_terms(data, nodes, st)
            return len(nodes) >= k

        focus = {f"{EX}s{i}" for i in range(5)}
        p0_rows = [(t.s, (t.o, t.kind, t.lang or "")) for t in data
                   if t.p == P0 and t.s in focus]
        bad = {term[0] for _s, term in p0_rows if not conforms(term)}
        want = sorted({(s, term[0]) for s, term in p0_rows
                       if term[0] in bad})
        out = validate_ttl_long(data, shapes)
        rows = out.take_all() if out is not None else []
        got = sorted({(r["focus_node"], r["value"]) for r in rows
                      if r["constraint_id"].endswith(
                          "NodeConstraintComponent")})
        assert got == want, (trial, path_ttl, k, got, want, data_ttl)


def test_nested_sh_node_depth_three_fuzz(ray_session):
    """Three sh:node hops (Inner -> Inner2 -> Inner3) vs independent
    recursion — failures at the deepest level must surface at the top."""
    rng = np.random.default_rng(555)
    P0, P1, P2 = EX + "p0", EX + "p1", EX + "p2"
    for trial in range(6):
        data_ttl = _gen_graph(rng)
        data, _ = parse_turtle(data_ttl)
        shapes, _ = parse_turtle(SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p0 ; sh:node ex:Inner ] .
ex:Inner a sh:NodeShape ;
  sh:property [ sh:path ex:p1 ; sh:node ex:Inner2 ] .
ex:Inner2 a sh:NodeShape ;
  sh:property [ sh:path ex:p2 ; sh:node ex:Inner3 ] .
ex:Inner3 a sh:NodeShape ;
  sh:property [ sh:path ex:p1 ; sh:minCount 1 ] .
""")

        def c3(t):
            return len(_step_terms(data, {t}, ("fwd", P1))) >= 1

        def c2(t):
            return all(c3(v) for v in _step_terms(data, {t}, ("fwd", P2)))

        def c1(t):
            return all(c2(v) for v in _step_terms(data, {t}, ("fwd", P1)))

        focus = {f"{EX}s{i}" for i in range(5)}
        p0_rows = [(t.s, (t.o, t.kind, t.lang or "")) for t in data
                   if t.p == P0 and t.s in focus]
        bad = {term[0] for _s, term in p0_rows if not c1(term)}
        want = sorted({(s, term[0]) for s, term in p0_rows
                       if term[0] in bad})
        out = validate_ttl_long(data, shapes)
        rows = out.take_all() if out is not None else []
        got = sorted({(r["focus_node"], r["value"]) for r in rows
                      if r["constraint_id"].endswith(
                          "NodeConstraintComponent")})
        assert got == want, (trial, got, want, data_ttl)


# ---------------------------------------------------------------------------
# structural sh:qualifiedValueShape — counted through the checker
# ---------------------------------------------------------------------------
def _qualified_rows(data, shapes, component):
    out = validate_ttl_long(_t(data), _t(shapes))
    rows = out.take_all() if out is not None else []
    return sorted(r["focus_node"].replace("group:", "") for r in rows
                  if r["constraint_id"].endswith(component))


QDATA = """
@prefix ex: <http://example.org/> .
ex:s1 a ex:T ; ex:member ex:a1 ; ex:member ex:a2 .
ex:s2 a ex:T ; ex:member ex:a1 ; ex:member ex:b1 .
ex:s3 a ex:T ; ex:member ex:b1 ; ex:member ex:b2 .
ex:a1 a ex:Admin ; ex:email "a1@x" .
ex:a2 a ex:Admin ; ex:email "a2@x" .
ex:b1 a ex:User .
ex:b2 a ex:User ; ex:email "b2@x" .
"""


def test_qualified_with_class_operand(ray_session):
    # previously SKIPPED (sh:class is not a value facet): every T needs
    # >= 2 members of class Admin
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:class ex:Admin ] ;
                sh:qualifiedMinCount 2 ] .
"""
    got = _qualified_rows(QDATA, shapes,
                          "QualifiedMinCountConstraintComponent")
    assert got == [EX + "s2", EX + "s3"]


def test_qualified_with_property_structure(ray_session):
    # qualified shape has an sh:property (member must have an email)
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:property [
                    sh:path ex:email ; sh:minCount 1 ] ] ;
                sh:qualifiedMinCount 2 ] .
"""
    # s1: a1,a2 both have email (2) OK; s2: a1 only (1) FAIL;
    # s3: b2 only (1) FAIL
    got = _qualified_rows(QDATA, shapes,
                          "QualifiedMinCountConstraintComponent")
    assert got == [EX + "s2", EX + "s3"]


def test_qualified_mixed_facet_plus_class_counts_both(ray_session):
    # a MIXED qualified shape (value facet + class): the pure-facet
    # mask path would ignore sh:class and inflate the count
    data = """
@prefix ex: <http://example.org/> .
ex:sone a ex:T ; ex:member ex:adam ; ex:member ex:zz9 .
ex:adam a ex:Admin .
ex:zz9 a ex:User .
"""
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:pattern "[0-9]" ;
                                         sh:class ex:Admin ] ;
                sh:qualifiedMinCount 1 ] .
"""
    # zz9 matches the pattern but is not an Admin; adam is an Admin but
    # its IRI has no digit — NO member conforms to BOTH, so the focus
    # violates (the pure-facet mask path would have counted zz9)
    got = _qualified_rows(data, shapes,
                          "QualifiedMinCountConstraintComponent")
    assert got == [EX + "sone"]


def test_qualified_max_with_node_structure(ray_session):
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:member ;
                sh:qualifiedValueShape [ sh:node ex:AdminShape ] ;
                sh:qualifiedMaxCount 1 ] .
ex:AdminShape a sh:NodeShape ;
  sh:property [ sh:path ex:email ; sh:minCount 1 ] .
"""
    # conforming (has email): s1 -> a1,a2 (2 > 1 FAIL); s2 -> a1 (1 OK);
    # s3 -> b2 (1 OK)
    got = _qualified_rows(QDATA, shapes,
                          "QualifiedMaxCountConstraintComponent")
    assert got == [EX + "s1"]


def test_qualified_pure_value_facet_path_unchanged(ray_session):
    # the pure grammar stays on the vectorized mask path (no structural
    # predicate declared) and keeps its verdicts
    data = """
@prefix ex: <http://example.org/> .
ex:s1 a ex:T ; ex:tag "v0" ; ex:tag "v1" .
ex:s2 a ex:T ; ex:tag "v0" ; ex:tag "zz" .
"""
    shapes_t = _t(SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:tag ;
                sh:qualifiedValueShape [ sh:pattern "^v" ] ;
                sh:qualifiedMinCount 2 ] .
""")
    from xpshacl_ray.sources.ttl import long_form_property_shapes
    facets = [f for _t2, _p, _pred, f in
              long_form_property_shapes(shapes_t) if "qualified" in f]
    assert facets and facets[0]["qualified"]["checker"] is False
    out = validate_ttl_long(_t(data), shapes_t)
    got = sorted(r["focus_node"].replace("group:", "")
                 for r in out.take_all())
    assert got == [EX + "s2"]


def test_structural_qualified_fuzz_vs_independent(ray_session):
    rng = np.random.default_rng(777)
    P0, P1 = EX + "p0", EX + "p1"
    for trial in range(8):
        data_ttl = _gen_graph(rng)
        data, _ = parse_turtle(data_ttl)
        k = int(rng.integers(1, 3))
        shapes, _ = parse_turtle(SH + f"""
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p0 ;
                sh:qualifiedValueShape [ sh:property [
                    sh:path ex:p1 ; sh:minCount 1 ] ] ;
                sh:qualifiedMinCount {k} ] .
""")
        focus = {f"{EX}s{i}" for i in range(5)}
        want = []
        for i in range(5):
            s = f"{EX}s{i}"
            vals = {(t.o, t.kind, t.lang or "") for t in data
                    if t.p == P0 and t.s == s}
            n_ok = sum(
                1 for v in vals
                if len(_step_terms(data, {v}, ("fwd", P1))) >= 1)
            if n_ok < k:
                want.append(s)
        out = validate_ttl_long(data, shapes)
        rows = out.take_all() if out is not None else []
        got = sorted(set(
            r["focus_node"].replace("group:", "") for r in rows
            if r["constraint_id"].endswith(
                "QualifiedMinCountConstraintComponent")))
        assert got == sorted(want), (trial, k, got, want, data_ttl)


# ---------------------------------------------------------------------------
# structural-operand logical operators — evaluated through the checker
# ---------------------------------------------------------------------------
def _component_rows(data, shapes, component):
    out = validate_ttl_long(_t(data), _t(shapes))
    rows = out.take_all() if out is not None else []
    return sorted((r["focus_node"], r["value"]) for r in rows
                  if r["constraint_id"].endswith(component))


LDATA = """
@prefix ex: <http://example.org/> .
ex:s1 a ex:T ; ex:ref ex:adam .
ex:s2 a ex:T ; ex:ref ex:eve .
ex:s3 a ex:T ; ex:ref ex:bob .
ex:adam a ex:Admin .
ex:eve a ex:Editor .
ex:bob a ex:User .
"""


def test_or_of_classes(ray_session):
    # the classic idiom sh:or ( [sh:class A] [sh:class B] ) —
    # previously skipped (class is not a value facet)
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:ref ;
                sh:or ( [ sh:class ex:Admin ] [ sh:class ex:Editor ] ) ] .
"""
    got = _component_rows(LDATA, shapes, "OrConstraintComponent")
    assert got == [(EX + "s3", EX + "bob")]


def test_not_with_structural_operand(ray_session):
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:ref ; sh:not [ sh:class ex:User ] ] .
"""
    got = _component_rows(LDATA, shapes, "NotConstraintComponent")
    assert got == [(EX + "s3", EX + "bob")]


def test_xone_structural(ray_session):
    # eve is BOTH Editor and Admin -> xone (exactly one) violates
    data = LDATA + "ex:eve a ex:Admin .\n"
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:ref ;
                sh:xone ( [ sh:class ex:Admin ] [ sh:class ex:Editor ] ) ] .
"""
    got = _component_rows(data, shapes, "XoneConstraintComponent")
    # eve: 2 hits; bob: 0 hits — both violate xone
    assert got == [(EX + "s2", EX + "eve"), (EX + "s3", EX + "bob")]


def test_mixed_operand_reports_once_and_correctly(ray_session):
    # one operand mixes a value facet WITH sh:class: the row-local path
    # must NOT translate a truncated version (it skips), and the
    # long-form checker path must count BOTH facets
    data = """
@prefix ex: <http://example.org/> .
ex:sone a ex:T ; ex:ref ex:adam .
ex:stwo a ex:T ; ex:ref ex:digit9 .
ex:adam a ex:Admin .
ex:digit9 a ex:User .
"""
    shapes_t = _t(SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:ref ;
                sh:or ( [ sh:pattern "[0-9]" ; sh:class ex:Admin ]
                        [ sh:class ex:Admin ] ) ] .
""")
    from xpshacl_ray.sources.ttl import shapes_to_specs
    # row-local: skipped entirely (structural operands)
    specs = shapes_to_specs(shapes_t)
    n_logical = sum(
        1 for s in specs.values() for c in s.constraints
        if type(c).__name__ in ("Or", "And", "Not", "Xone"))
    assert n_logical == 0
    out = validate_ttl_long(_t(data), shapes_t).to_pandas()
    rows = out[out["constraint_id"].str.endswith("OrConstraintComponent")]
    # adam conforms via operand 2; digit9 matches the pattern but is no
    # Admin -> fails both operands -> exactly ONE violation row
    assert sorted(zip(rows["focus_node"], rows["value"])) == [
        (EX + "stwo", EX + "digit9")]


def test_pure_operand_logicals_stay_row_local(ray_session):
    # pure value-facet operands keep the row-local translation (no
    # long-form "logical" facet extracted)
    from xpshacl_ray.sources.ttl import long_form_property_shapes
    shapes_t = _t(SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:code ;
                sh:or ( [ sh:pattern "^[A-Z]" ] [ sh:minLength 4 ] ) ] .
""")
    assert all("logical" not in f
               for _t2, _p, _pred, f in
               long_form_property_shapes(shapes_t))
    from xpshacl_ray.sources.ttl import shapes_to_specs
    specs = shapes_to_specs(shapes_t)
    assert any(type(c).__name__ == "Or"
               for s in specs.values() for c in s.constraints)


# ---------------------------------------------------------------------------
# node-level constraints on TARGETED shapes (applied to the focus node)
# ---------------------------------------------------------------------------
def test_node_level_pattern_on_targeted_shape(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:GoodThing a ex:T .
ex:badthing a ex:T .
"""
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:pattern "/[A-Z]" .
"""
    got = _component_rows(data, shapes, "PatternConstraintComponent")
    assert got == [(EX + "badthing", EX + "badthing")]


def test_node_level_or_of_classes_on_focus(ray_session):
    # every focus must itself be Admin or Editor
    data = """
@prefix ex: <http://example.org/> .
ex:u1 a ex:Account ; a ex:Admin .
ex:u2 a ex:Account ; a ex:Editor .
ex:u3 a ex:Account .
"""
    shapes = SH + """
ex:AccountShape a sh:NodeShape ; sh:targetClass ex:Account ;
  sh:or ( [ sh:class ex:Admin ] [ sh:class ex:Editor ] ) .
"""
    got = _component_rows(data, shapes, "OrConstraintComponent")
    assert got == [(EX + "u3", EX + "u3")]


def test_node_level_sh_node_on_targeted_shape(ray_session):
    # the FOCUS node itself must conform to another shape
    data = """
@prefix ex: <http://example.org/> .
ex:c1 a ex:Company ; ex:name "Acme" .
ex:c2 a ex:Company .
"""
    shapes = SH + """
ex:CompanyShape a sh:NodeShape ; sh:targetClass ex:Company ;
  sh:node ex:NamedShape .
ex:NamedShape a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""
    got = _component_rows(data, shapes, "NodeConstraintComponent")
    assert got == [(EX + "c2", EX + "c2")]


def test_node_level_union_targets_evaluate_once(ray_session):
    # a focus matched by BOTH targets must report once (union scoping)
    data = """
@prefix ex: <http://example.org/> .
ex:x a ex:A ; a ex:B .
"""
    shapes = SH + """
ex:S a sh:NodeShape ; sh:targetClass ex:A ; sh:targetClass ex:B ;
  sh:pattern "nomatch" .
"""
    got = _component_rows(data, shapes, "PatternConstraintComponent")
    assert got == [(EX + "x", EX + "x")]


def test_node_level_severity_and_message(ray_session):
    data = """
@prefix ex: <http://example.org/> .
ex:low a ex:T .
"""
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:severity sh:Warning ; sh:message "focus must be uppercase" ;
  sh:pattern "/[A-Z]" .
"""
    out = validate_ttl_long(_t(data), _t(shapes)).to_pandas()
    r = out[out["constraint_id"].str.endswith(
        "PatternConstraintComponent")].iloc[0]
    assert r["severity"] == "Warning"
    assert r["message"] == "focus must be uppercase"


def test_property_only_targeted_shape_adds_no_node_level_rows(
        ray_session):
    # shapes with ONLY sh:property / sh:closed take their dedicated
    # paths — the node-level pass must not add or duplicate anything
    data = """
@prefix ex: <http://example.org/> .
ex:a a ex:T ; ex:name "ok" .
"""
    shapes = SH + """
ex:TShape a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""
    out = validate_ttl_long(_t(data), _t(shapes))
    assert out is None or out.count() == 0


def test_deep_acyclic_node_chain(ray_session):
    # a 1,500-hop follower chain exceeds CPython's default recursion
    # guard; the checker raises it proportional to the graph and
    # memoizes, so the walk is linear and terminates
    n = 1500
    lines = ["@prefix ex: <http://example.org/> ."]
    lines.append("ex:p0000 a ex:Person .")
    for i in range(n - 1):
        lines.append(f"ex:p{i:04d} ex:knows ex:p{i + 1:04d} .")
    for i in range(n):
        if i != n - 1:  # the LAST node lacks a name
            lines.append(f'ex:p{i:04d} ex:name "N{i}" .')
    data = _t("\n".join(lines))
    shapes = _t(SH + """
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:knows ; sh:node ex:PersonShape ] ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    out = validate_ttl_long(data, shapes).to_pandas()
    node = out[out["constraint_id"].str.endswith(
        "NodeConstraintComponent")]
    # the tail's missing name propagates up the whole chain: the single
    # TARGETED focus p0000 reports its direct value p0001 nonconforming
    assert sorted(zip(node["focus_node"], node["value"])) == [
        (EX + "p0000", EX + "p0001")]


def test_qualified_value_shapes_disjoint(ray_session):
    # the spec's hand example: thumbs and fingers counted disjointly —
    # a digit conforming to BOTH sibling shapes counts toward NEITHER
    data = """
@prefix ex: <http://example.org/> .
ex:hand a ex:Hand ;
  ex:digit ex:thumbA ; ex:digit ex:weird ;
  ex:digit ex:f1 ; ex:digit ex:f2 ; ex:digit ex:f3 .
ex:thumbA a ex:Thumb .
ex:weird a ex:Thumb ; a ex:Finger .
ex:f1 a ex:Finger . ex:f2 a ex:Finger . ex:f3 a ex:Finger .
"""
    shapes = SH + """
ex:HandShape a sh:NodeShape ; sh:targetClass ex:Hand ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape [ sh:class ex:Thumb ] ;
                sh:qualifiedValueShapesDisjoint true ;
                sh:qualifiedMinCount 2 ;
                sh:message "needs two pure thumbs" ] ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape [ sh:class ex:Finger ] ;
                sh:qualifiedValueShapesDisjoint true ;
                sh:qualifiedMinCount 4 ;
                sh:message "needs four pure fingers" ] .
"""
    out = validate_ttl_long(_t(data), _t(shapes)).to_pandas()
    q = out[out["constraint_id"].str.endswith(
        "QualifiedMinCountConstraintComponent")]
    # ex:weird is BOTH Thumb and Finger -> counts toward neither:
    # pure thumbs = 1 < 2 (violation), pure fingers = 3 < 4 (violation)
    assert sorted(q["message"]) == ["needs four pure fingers",
                                    "needs two pure thumbs"]


def test_qualified_disjoint_false_counts_normally(ray_session):
    # without the disjoint flag the shared digit counts toward both
    data = """
@prefix ex: <http://example.org/> .
ex:hand a ex:Hand ; ex:digit ex:thumbA ; ex:digit ex:weird .
ex:thumbA a ex:Thumb .
ex:weird a ex:Thumb ; a ex:Finger .
"""
    shapes = SH + """
ex:HandShape a sh:NodeShape ; sh:targetClass ex:Hand ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape [ sh:class ex:Thumb ] ;
                sh:qualifiedMinCount 2 ] ;
  sh:property [ sh:path ex:digit ;
                sh:qualifiedValueShape [ sh:class ex:Finger ] ;
                sh:qualifiedMinCount 1 ] .
"""
    out = validate_ttl_long(_t(data), _t(shapes))
    assert out is None or out.count() == 0
