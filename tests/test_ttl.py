"""Turtle ingestion shim: parser subset + head-to-head parity with the
reference's own example fixtures (README example: 4 violations —
resource1 minInclusive + minCount, resource2 minCount, resource3
minCount; the MinInclusive message is byte-identical to the reference's
pyshacl rendering)."""

import pyarrow as pa
import pytest

from xpshacl_ray.sources.ttl import (
    entity_table,
    load_turtle,
    parse_turtle,
    shapes_to_specs,
    triples_table,
    validate_ttl,
)

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"
REF_DATA = "/root/reference/data/example_data.ttl"
REF_SHAPES = "/root/reference/data/example_shapes.ttl"


def test_parser_subset():
    triples, prefixes = parse_turtle(
        """@prefix ex: <http://example.org/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:r1 a ex:Person ; ex:age "-20"^^xsd:integer ;
              ex:name "A \\"quoted\\" name"@en , "second" .
        ex:r2 ex:score 3.5 ; ex:n 7 .
        """)
    assert prefixes["ex"] == EX
    d = {(t.s, t.p, t.o) for t in triples}
    assert (EX + "r1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            EX + "Person") in d
    lit = [t for t in triples if t.p == EX + "age"][0]
    assert lit.o == "-20" and lit.datatype.endswith("integer")
    names = [t for t in triples if t.p == EX + "name"]
    assert len(names) == 2 and names[0].o == 'A "quoted" name'
    assert names[0].lang == "en"
    nums = {t.o: t.datatype for t in triples if t.s == EX + "r2"}
    assert nums["3.5"].endswith("decimal") and nums["7"].endswith("integer")


def test_entity_table_hydrates_numeric_datatypes():
    triples, _ = load_turtle(REF_DATA)
    t = entity_table(triples, EX + "Person")
    assert t.num_rows == 2
    age = t[EX + "hasAge"]
    assert pa.types.is_int64(age.type)
    assert sorted(x for x in age.to_pylist() if x is not None) == [-20]
    raw = triples_table(triples)
    assert raw.num_rows == len(triples)


def test_shapes_compile():
    triples, _ = load_turtle(REF_SHAPES)
    specs = shapes_to_specs(triples)
    assert set(specs) == {EX + "Person", EX + "Organization"}
    person = specs[EX + "Person"]
    comps = sorted(c.component for c in person.constraints)
    assert comps == ["DatatypeConstraintComponent",
                     "MaxInclusiveConstraintComponent",
                     "MinCountConstraintComponent",
                     "MinInclusiveConstraintComponent"]


def test_reference_example_parity():
    viol = validate_ttl(REF_DATA, REF_SHAPES).to_pandas()
    got = sorted(zip(viol["subject"], viol["constraint_id"],
                     viol["property_path"], viol["value"].fillna("")))
    want = sorted([
        (EX + "resource1", SH + "MinCountConstraintComponent",
         EX + "hasName", ""),
        (EX + "resource1", SH + "MinInclusiveConstraintComponent",
         EX + "hasAge", "-20"),
        (EX + "resource2", SH + "MinCountConstraintComponent",
         EX + "hasName", ""),
        (EX + "resource3", SH + "MinCountConstraintComponent",
         EX + "foundedOn", ""),
    ])
    assert got == want
    # byte-parity with the reference README's pyshacl message rendering
    msg = viol.loc[viol["constraint_id"] ==
                   SH + "MinInclusiveConstraintComponent", "message"].iloc[0]
    assert msg == 'Value is not >= Literal("0", datatype=xsd:integer)'


def test_run_ttl_explainable_end_to_end(tmp_path):
    from xpshacl_ray.sources.ttl import run_ttl

    res = run_ttl(REF_DATA, REF_SHAPES, languages=["en"],
                  kg_path=str(tmp_path / "kg.parquet"),
                  out_dir=str(tmp_path / "out"))
    report = res["report"].to_pandas()
    assert len(report) == 4
    # every instance got its signature's explanation fanned back on
    assert report["explanation_en"].notna().all()
    assert report["signature_key"].nunique() == 3  # minCount on
    # hasName / minCount on foundedOn / minInclusive on hasAge — the
    # signature carries the property path, like the reference KG key
    sigs = res["signatures"].to_pandas()
    assert set(sigs["language"]) == {"en"}
    assert (tmp_path / "out" / "report").exists()


def test_cli_validate_ttl(tmp_path, capsys):
    import json

    from xpshacl_ray.cli import main

    rc = main(["validate-ttl", "--data", REF_DATA, "--shapes", REF_SHAPES,
               "--out", str(tmp_path / "o"), "--language", "en"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_violations"] == 4
    assert summary["n_signatures"] == 3


def test_validate_ttl_rejects_shapeless_input(tmp_path):
    p = tmp_path / "empty_shapes.ttl"
    p.write_text("@prefix ex: <http://example.org/> .\n")
    with pytest.raises(ValueError, match="no applicable"):
        validate_ttl(REF_DATA, str(p))


def test_parser_handles_all_reference_fixtures():
    # shark_shapes.ttl exercises long literals ("""...""" SPARQL bodies),
    # boolean literals (sh:uniqueLang true) and 6 prefixes
    from xpshacl_ray.sources.ttl import load_turtle, sparql_constraints

    counts = {}
    for f in ["example_data", "example_shapes", "shark_shapes",
              "xpshacl_ontology"]:
        triples, prefixes = load_turtle(f"/root/reference/data/{f}.ttl")
        counts[f] = len(triples)
        assert len(triples) > 0 and len(prefixes) >= 2
    assert counts["shark_shapes"] == 95
    shark, _ = load_turtle("/root/reference/data/shark_shapes.ttl")
    sparqls = sparql_constraints(shark)
    assert len(sparqls) == 9
    for c in sparqls:
        assert "SELECT" in c["select"] and c["message"]
    # boolean literal captured with xsd:boolean datatype
    bools = [t for t in shark if t.datatype and t.datatype.endswith("boolean")]
    assert bools and all(t.o in ("true", "false") for t in bools)


def test_shark_shapes_against_reference_ontology(tmp_path):
    # the reference's own ontology conforms to its own guideline shapes
    # (every owl:Class/Property carries label + comment) — and a mutated
    # copy with a dropped comment is caught
    from xpshacl_ray.sources.ttl import load_turtle, shapes_to_specs

    sh, _ = load_turtle("/root/reference/data/shark_shapes.ttl")
    specs = shapes_to_specs(sh)
    # union-target keys since round 5: the ClassShape key carries
    # owl#Class inside its target:union= sentinel
    assert any("#Class" in t for t in specs)
    conf = validate_ttl("/root/reference/data/xpshacl_ontology.ttl",
                        "/root/reference/data/shark_shapes.ttl").to_pandas()
    assert len(conf) == 0

    src = open("/root/reference/data/xpshacl_ontology.ttl").read()
    # drop one class's rdfs:comment line (keep the statement valid)
    lines = src.splitlines()
    out, dropped = [], False
    for ln in lines:
        if not dropped and "rdfs:comment" in ln:
            dropped = True
            if ln.rstrip().endswith("."):
                # re-terminate the previous line's statement
                out[-1] = out[-1].rstrip().rstrip(";") + " ."
            continue
        out.append(ln)
    assert dropped
    mut = tmp_path / "mut.ttl"
    mut.write_text("\n".join(out))
    viol = validate_ttl(str(mut),
                        "/root/reference/data/shark_shapes.ttl").to_pandas()
    assert len(viol) >= 1
    assert (viol["property_path"] ==
            "http://www.w3.org/2000/01/rdf-schema#comment").any()


def test_unique_lang_over_triples(tmp_path):
    # shark shapes declare sh:uniqueLang true on rdfs:label/comment —
    # evaluated over the TRIPLES table (multi-valued lang-tagged literals)
    from xpshacl_ray.sources.ttl import (
        load_turtle,
        unique_lang_constraints,
        validate_unique_lang,
    )

    sh, _ = load_turtle("/root/reference/data/shark_shapes.ttl")
    pairs = unique_lang_constraints(sh)
    # the shark ClassShape declares targetClass owl:Class AND
    # targetSubjectsOf rdfs:subClassOf → its target key is the UNION
    assert any(
        p == "http://www.w3.org/2000/01/rdf-schema#label"
        and "http://www.w3.org/2002/07/owl#Class" in t
        for t, p in pairs)

    # the reference ontology itself conforms (one label per lang)
    ont, _ = load_turtle("/root/reference/data/xpshacl_ontology.ttl")
    viol = validate_unique_lang(ont, sh)
    assert viol is None or viol.count() == 0

    # a class with TWO @en labels is caught
    bad = tmp_path / "bad.ttl"
    bad.write_text("""@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:Thing a owl:Class ;
    rdfs:label "Thing"@en , "Thingy"@en , "Ding"@de ;
    rdfs:comment "A thing."@en .
""")
    bad_triples, _ = load_turtle(str(bad))
    viol = validate_unique_lang(bad_triples, sh)
    rows = viol.to_pandas()
    assert len(rows) == 1
    assert "UniqueLang" in rows["constraint_id"].iloc[0]
    assert "http://example.org/Thing" in rows["focus_node"].iloc[0]
