"""Differential fuzz for the SHACL path walker: `_walk_path_rows`
against an independently written recursive set-semantics evaluator,
over random small graphs and random step lists (forward / inverse /
alternative / closures, composed in sequences)."""

import numpy as np

from xpshacl_ray.sources.ttl import Triple, _walk_path_rows

PREDS = ["p0", "p1", "p2"]
NODES = [f"n{i}" for i in range(8)]
LITS = [("x", "literal", None, None), ("x", "literal", "en", None),
        ("7", "literal", None, "int")]


def _ref_succ(triples, node, d, p):
    """Reference one-step successor set (full RDF-term identity)."""
    out = set()
    for t in triples:
        if t.p != p:
            continue
        if d == "fwd":
            if node[1] != "literal" and t.s == node[0]:
                out.add((t.o, t.kind, t.lang, t.datatype))
        else:
            if (t.o, t.kind, t.lang, t.datatype) == node:
                out.add((t.s, "bnode" if t.s.startswith("_:") else "iri",
                         None, None))
    return out


def _ref_step(triples, frontier, st):
    d = st[0]
    if d in ("fwd", "inv"):
        return set().union(*(
            _ref_succ(triples, n, d, st[1]) for n in frontier)) \
            if frontier else set()
    if d == "alt":
        out = set()
        for b in st[1]:
            out |= _ref_step(triples, frontier, b)
        return out
    if d == "opt":
        return frontier | _ref_step(triples, frontier, st[1])
    # closures
    seen = set()
    cur = _ref_step(triples, frontier, st[1])
    while cur - seen:
        seen |= cur
        cur = _ref_step(triples, cur, st[1])
    return frontier | seen if d == "star" else seen


def _ref_walk(triples, subject, steps):
    frontier = {(subject, "iri", None, None)}
    for st in steps:
        frontier = _ref_step(triples, frontier, st)
    return sorted(((v, k, lg) for v, k, lg, _dt in frontier),
                  key=lambda t: (t[0], t[1], t[2] is not None,
                                 t[2] or ""))


def _random_graph(rng):
    triples = []
    for _ in range(rng.integers(5, 30)):
        s = NODES[rng.integers(0, len(NODES))]
        p = PREDS[rng.integers(0, len(PREDS))]
        if rng.random() < 0.3:
            o, kind, lang, dt = LITS[rng.integers(0, len(LITS))]
        else:
            o, kind, lang, dt = (NODES[rng.integers(0, len(NODES))],
                                 "iri", None, None)
        triples.append(Triple(s, p, o, kind, dt, lang))
    return triples


def _random_step(rng):
    atom = (("fwd", "inv")[rng.integers(0, 2)],
            PREDS[rng.integers(0, len(PREDS))])
    k = rng.integers(0, 6)
    if k <= 1:
        return atom
    if k == 2:
        return ("alt", [atom, (("fwd", "inv")[rng.integers(0, 2)],
                               PREDS[rng.integers(0, len(PREDS))])])
    return (("star", "plus", "opt")[k - 3], atom)


def test_walker_matches_reference_on_random_graphs():
    rng = np.random.default_rng(1234)
    for trial in range(150):
        triples = _random_graph(rng)
        steps = [_random_step(rng) for _ in range(rng.integers(1, 4))]
        subjects = sorted({t.s for t in triples})[:4]
        got = _walk_path_rows(triples, subjects, steps)
        for s in subjects:
            want = _ref_walk(triples, s, steps)
            assert got[s] == want, (trial, s, steps)


# ---------------------------------------------------------------------------
# Nested-composite fuzz: a SECOND independent evaluator with relation
# semantics (a path denotes a set of (from, to) term pairs; seq is
# composition, alt union, inv transpose, star/plus/opt Kleene forms).
# Deliberately different formulation from both the walker (frontier
# sets) and _ref_step above (recursive frontier) — and it computes
# inverse as a TRUE transpose, which independently checks
# invert_path's push-inverses-to-atoms normalization laws.
# ---------------------------------------------------------------------------

from xpshacl_ray.sources.ttl import invert_path  # noqa: E402


def _term_of_subject(s):
    return (s, "bnode" if s.startswith("_:") else "iri", None, None)


def _universe(triples, subjects):
    terms = {_term_of_subject(t.s) for t in triples}
    terms |= {(t.o, t.kind, t.lang, t.datatype) for t in triples}
    terms |= {_term_of_subject(s) for s in subjects}
    return terms


def _compose(r1, r2):
    by_from = {}
    for a, b in r2:
        by_from.setdefault(a, set()).add(b)
    return {(a, c) for a, b in r1 for c in by_from.get(b, ())}


def _rel(triples, node, uni):
    d = node[0]
    if d == "fwd":
        return {(_term_of_subject(t.s), (t.o, t.kind, t.lang, t.datatype))
                for t in triples if t.p == node[1]}
    if d == "inv":
        return {(b, a) for a, b in _rel(triples, ("fwd", node[1]), uni)}
    if d == "seq":
        r = _rel(triples, node[1][0], uni)
        for sub in node[1][1:]:
            r = _compose(r, _rel(triples, sub, uni))
        return r
    if d == "alt":
        out = set()
        for sub in node[1]:
            out |= _rel(triples, sub, uni)
        return out
    ident = {(t, t) for t in uni}
    r = _rel(triples, node[1], uni)
    if d == "opt":
        return ident | r
    # transitive closure by iteration to fixpoint
    clo = set(r)
    while True:
        nxt = clo | _compose(clo, r)
        if nxt == clo:
            break
        clo = nxt
    return ident | clo if d == "star" else clo


def _rel_walk(triples, subject, steps, uni):
    r = _rel(triples, steps[0], uni)
    for st in steps[1:]:
        r = _compose(r, _rel(triples, st, uni))
    start = _term_of_subject(subject)
    vals = {b for a, b in r if a == start}
    return sorted(((v, k, lg) for v, k, lg, _dt in vals),
                  key=lambda t: (t[0], t[1], t[2] is not None,
                                 t[2] or ""))


def _random_ast(rng, depth):
    if depth <= 0 or rng.random() < 0.35:
        return (("fwd", "inv")[rng.integers(0, 2)],
                PREDS[rng.integers(0, len(PREDS))])
    k = rng.integers(0, 5)
    if k == 0:
        return ("seq", [_random_ast(rng, depth - 1)
                        for _ in range(rng.integers(2, 4))])
    if k == 1:
        return ("alt", [_random_ast(rng, depth - 1)
                        for _ in range(rng.integers(2, 4))])
    return (("star", "plus", "opt")[k - 2], _random_ast(rng, depth - 1))


def test_walker_matches_relation_semantics_on_nested_asts():
    rng = np.random.default_rng(20260819)
    for trial in range(120):
        triples = _random_graph(rng)
        steps = [_random_ast(rng, 3)
                 for _ in range(rng.integers(1, 3))]
        subjects = sorted({t.s for t in triples})[:3]
        uni = _universe(triples, subjects)
        got = _walk_path_rows(triples, subjects, steps)
        for s in subjects:
            want = _rel_walk(triples, s, steps, uni)
            assert got[s] == want, (trial, s, steps)


def test_invert_path_is_relation_transpose():
    """invert_path's rewrite laws (^(a/b)=^b/^a, ^(a|b)=^a|^b,
    ^(a*)=(^a)*, ^^a=a) hold against the independent transpose."""
    rng = np.random.default_rng(777)
    for trial in range(120):
        triples = _random_graph(rng)
        ast = _random_ast(rng, 3)
        uni = _universe(triples, [])
        fwd = _rel(triples, ast, uni)
        want = {(b, a) for a, b in fwd}
        got = _rel(triples, invert_path(ast), uni)
        assert got == want, (trial, ast)
        # double inversion is identity on the denoted relation
        assert _rel(triples, invert_path(invert_path(ast)), uni) == fwd
