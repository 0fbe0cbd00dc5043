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
