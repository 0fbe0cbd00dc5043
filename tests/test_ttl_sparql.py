"""SPARQL→SQL auto-translation for FILTER-only sh:sparql constraints
(reference analog: data/synthetic_data_generator.py:144-177 generates
exactly the `SELECT $this WHERE { FILTER (...) }` shape; pyshacl runs
them natively — here they compile to SqlCheck DuckDB predicates)."""

from xpshacl_ray.sources.ttl import (
    parse_turtle,
    sparql_filter_to_sql,
    sparql_sqlchecks,
    validate_ttl,
)

EX = "http://example.org/"

# mirrors the reference generator's even-value + strlen constraints,
# attached via the same nonstandard sh:PropertyConstraintComponent
SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:ResourceShape a sh:NodeShape ;
  sh:targetClass ex:Resource ;
  sh:property [ sh:path ex:integerValue ; sh:datatype xsd:integer ] ;
  sh:PropertyConstraintComponent ex:SparqlShapeEven ;
  sh:PropertyConstraintComponent ex:SparqlShapeLength ;
  sh:PropertyConstraintComponent ex:SparqlShapeGraph .

ex:SparqlShapeEven sh:path ex:integerValue ;
  sh:sparql ex:SparqlConstraintEven .
ex:SparqlConstraintEven sh:message "Integer value must be even." ;
  sh:select "SELECT $this WHERE { FILTER ( ($this % 2) != 0 ) }" .

ex:SparqlShapeLength sh:path ex:stringValue ;
  sh:sparql ex:SparqlConstraintLength .
ex:SparqlConstraintLength sh:message "String length must be greater than 5." ;
  sh:select "SELECT $this WHERE { FILTER ( STRLEN($this) <= 5 ) }" .

ex:SparqlShapeGraph sh:path ex:otherValue ;
  sh:sparql ex:SparqlConstraintGraph .
ex:SparqlConstraintGraph sh:message "needs a graph pattern" ;
  sh:select "SELECT $this WHERE { $this a ?c . FILTER ( ?c != 0 ) }" .
"""

DATA = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:r1 a ex:Resource ; ex:integerValue 4 ; ex:stringValue "longenough" .
ex:r2 a ex:Resource ; ex:integerValue 7 ; ex:stringValue "tiny" .
ex:r3 a ex:Resource ; ex:stringValue "also-long-enough" .
"""


def test_translator_covers_the_reference_generator_forms():
    assert sparql_filter_to_sql(
        "SELECT $this WHERE { FILTER ( ($this % 2) != 0 ) }", "c"
    ) == '("c" % 2) != 0'
    assert sparql_filter_to_sql(
        "SELECT $this WHERE { FILTER ( STRLEN($this) <= 5 ) }", "c"
    ) == 'length("c") <= 5'
    # boolean connectives, regex, string literal quoting
    sql = sparql_filter_to_sql(
        'SELECT $this WHERE { FILTER ( REGEX($this, "^x\'y$") || '
        "STRSTARTS($this, \"pre\") && !($this = \"no\") ) }", "c")
    assert "regexp_matches" in sql and "starts_with" in sql
    assert "'^x''y$'" in sql and " OR " in sql and "NOT (" in sql


def test_translator_rejects_out_of_subset():
    # graph pattern → regex mismatch
    assert sparql_filter_to_sql(
        "SELECT $this WHERE { $this a ?c . FILTER ( ?c != 0 ) }", "c"
    ) is None
    # unknown function
    assert sparql_filter_to_sql(
        "SELECT $this WHERE { FILTER ( BNODE($this) ) }", "c") is None
    # foreign variable inside the filter
    assert sparql_filter_to_sql(
        "SELECT $this WHERE { FILTER ( ?other > 1 ) }", "c") is None


def test_sparql_sqlchecks_partition():
    triples, _ = parse_turtle(SHAPES)
    checks, skipped = sparql_sqlchecks(triples)
    cs = checks[EX + "Resource"]
    assert {c.column for c in cs} == {EX + "integerValue", EX + "stringValue"}
    assert {c.message for c in cs} == {"Integer value must be even.",
                                       "String length must be greater than 5."}
    assert len(skipped) == 1 and "graph pattern" in skipped[0]["message"]


def test_validate_ttl_sparql_end_to_end(tmp_path, ray_session):
    d = tmp_path / "data.ttl"
    s = tmp_path / "shapes.ttl"
    d.write_text(DATA)
    s.write_text(SHAPES)
    viol = validate_ttl(str(d), str(s), sparql=True).to_pandas()
    sparql_viol = viol[viol["constraint_id"].str.endswith(
        "SPARQLConstraintComponent")]
    got = sorted(zip(sparql_viol["focus_node"], sparql_viol["message"]))
    # r2: 7 is odd AND "tiny" is too short; r3: null values are excused
    assert got == [
        (EX + "r2", "Integer value must be even."),
        (EX + "r2", "String length must be greater than 5."),
    ]
    # without the flag the SPARQL blocks stay data-only (the only entity
    # constraint is the integer datatype check, which the data satisfies)
    base = validate_ttl(str(d), str(s)).to_pandas()
    assert len(base) == 0
