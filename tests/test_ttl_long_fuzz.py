"""Differential fuzz for validate_ttl_long's grouped facets: random
data graphs × random (path, facet) shapes, compared against an
independent evaluator that implements SHACL value-node semantics
directly (its own path walk over RDF term identity — not the
production walker)."""

import numpy as np

from xpshacl_ray.sources.ttl import parse_turtle, validate_ttl_long

EX = "http://example.org/"


def _term(t):
    return (t.o, t.kind, t.lang, t.datatype)


def _values(triples, subject, steps):
    """Independent path evaluation: distinct value TERMS reached."""
    frontier = {(subject, "iri", None, None)}
    for d, p in steps:
        nxt = set()
        for node in frontier:
            for t in triples:
                if t.p != p:
                    continue
                if d == "fwd":
                    if node[1] != "literal" and t.s == node[0]:
                        nxt.add(_term(t))
                else:
                    if _term(t) == node:
                        nxt.add((t.s, "iri", None, None))
        frontier = nxt
    return frontier


def _gen_data(rng):
    lines = ["@prefix ex: <http://example.org/> ."]
    triples_desc = []
    subs = [f"s{i}" for i in range(5)]
    others = [f"n{i}" for i in range(4)]
    for s in subs:
        lines.append(f"ex:{s} a ex:T .")
    for _ in range(rng.integers(8, 26)):
        s = (subs + others)[rng.integers(0, 9)]
        p = f"p{rng.integers(0, 3)}"
        r = rng.random()
        if r < 0.35:
            o = f'"v{rng.integers(0, 4)}"'
        elif r < 0.5:
            o = f'"v{rng.integers(0, 4)}"@en'
        else:
            o = f"ex:{(subs + others)[rng.integers(0, 9)]}"
        lines.append(f"ex:{s} ex:{p} {o} .")
    return "\n".join(lines)


PATHS = [
    ("ex:p0", [("fwd", EX + "p0")]),
    ("[ sh:inversePath ex:p1 ]", [("inv", EX + "p1")]),
    ("( ex:p0 ex:p1 )", [("fwd", EX + "p0"), ("fwd", EX + "p1")]),
    ("( [ sh:inversePath ex:p2 ] ex:p0 )",
     [("inv", EX + "p2"), ("fwd", EX + "p0")]),
]


def test_grouped_facets_match_independent_evaluator(ray_session):
    rng = np.random.default_rng(77)
    for trial in range(14):
        data_ttl = _gen_data(rng)
        data, _ = parse_turtle(data_ttl)
        path_ttl, steps = PATHS[rng.integers(0, len(PATHS))]
        kind = ("maxCount", "minCount", "hasValue")[rng.integers(0, 3)]
        if kind == "maxCount":
            k = int(rng.integers(1, 3))
            facet = f"sh:maxCount {k}"
        elif kind == "minCount":
            k = int(rng.integers(2, 4))
            facet = f"sh:minCount {k}"
        else:
            if rng.random() < 0.5:
                hv_ttl, hv_term = '"v1"', ("v1", "literal", None, None)
            else:
                hv_ttl, hv_term = "ex:n1", (EX + "n1", "iri", None, None)
            facet = f"sh:hasValue {hv_ttl}"
        shapes, _ = parse_turtle(f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path {path_ttl} ; {facet} ] .
""")
        out = validate_ttl_long(data, shapes)
        got = sorted(set(
            r["focus_node"].replace("group:", "")
            for r in (out.take_all() if out is not None else [])))

        want = []
        for i in range(5):
            s = f"{EX}s{i}"
            vals = _values(data, s, steps)
            n = len(vals)
            if kind == "maxCount" and n > k:
                want.append(s)
            elif kind == "minCount" and n < k:
                want.append(s)
            elif kind == "hasValue":
                norm = {(v[0], v[1], v[2], None) for v in vals}
                if (hv_term[0], hv_term[1], hv_term[2], None) not in {
                        (v[0], v[1], v[2], None) for v in norm}:
                    want.append(s)
        assert got == sorted(want), (
            trial, kind, path_ttl, got, sorted(want), data_ttl)


def test_duplicate_statement_is_one_triple(ray_session):
    """RDF set semantics: a statement written twice must not double a
    maxCount tally (rdflib/pyshacl collapse it)."""
    data, _ = parse_turtle("""
@prefix ex: <http://example.org/> .
ex:a a ex:T .
ex:a ex:p0 ex:n1 .
ex:a ex:p0 ex:n1 .
ex:a ex:p0 ex:n2 .
""")
    assert len([t for t in data if t.p == EX + "p0"]) == 2
    shapes, _ = parse_turtle("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p0 ; sh:maxCount 2 ] .
""")
    out = validate_ttl_long(data, shapes)
    assert out is None or out.count() == 0


def test_closed_shapes_match_independent_evaluator(ray_session):
    rng = np.random.default_rng(99)
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    for trial in range(8):
        data_ttl = _gen_data(rng)
        data, _ = parse_turtle(data_ttl)
        declared = sorted({f"p{i}" for i in rng.integers(0, 3, 2)})
        ignore_type = bool(rng.random() < 0.7)
        props = " ;\n".join(
            f"  sh:property [ sh:path ex:{p} ; sh:minLength 0 ]"
            for p in declared)
        ig = ("  sh:ignoredProperties ( rdf:type ) ;\n"
              if ignore_type else "")
        shapes, _ = parse_turtle(f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:closed true ;
{ig}{props} .
""")
        out = validate_ttl_long(data, shapes)
        rows = out.take_all() if out is not None else []
        got = sorted(
            (r["focus_node"], r["property_path"]) for r in rows
            if r["constraint_id"].endswith("ClosedConstraintComponent"))
        allowed = {EX + p for p in declared}
        if ignore_type:
            allowed.add(RDF_TYPE)
        focus = {f"{EX}s{i}" for i in range(5)}
        want = sorted({(t.s, t.p) for t in data
                       if t.s in focus and t.p not in allowed}
                      | set())
        # production emits one row per offending TRIPLE; compare pairs
        got_pairs = sorted(set(got))
        want_pairs = sorted(want)
        assert got_pairs == want_pairs, (trial, declared, ignore_type)


def test_qualified_counts_match_independent_evaluator(ray_session):
    rng = np.random.default_rng(55)
    for trial in range(8):
        data_ttl = _gen_data(rng)
        data, _ = parse_turtle(data_ttl)
        path_ttl, steps = PATHS[rng.integers(0, len(PATHS))]
        qmin = int(rng.integers(1, 3))
        shapes, _ = parse_turtle(f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path {path_ttl} ;
                sh:qualifiedValueShape [ sh:pattern "^v[01]$" ] ;
                sh:qualifiedMinCount {qmin} ] .
""")
        out = validate_ttl_long(data, shapes)
        got = sorted(set(
            r["focus_node"].replace("group:", "")
            for r in (out.take_all() if out is not None else [])))
        import re as _re

        want = []
        for i in range(5):
            s = f"{EX}s{i}"
            vals = _values(data, s, steps)
            # conforming = value whose LEXICAL form matches the pattern
            # (engine pattern facets excuse nothing else here; IRIs are
            # full IRIs so ^v[01]$ never matches them)
            n_ok = sum(1 for v in vals
                       if v[0] is not None and _re.search(r"^v[01]$", v[0]))
            if n_ok < qmin:
                want.append(s)
        assert got == sorted(want), (trial, path_ttl, qmin, got, want)
