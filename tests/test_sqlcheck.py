"""SqlCheck (C19 declarative): SQL-string constraints evaluated per Arrow
batch by DuckDB — constraint-as-data parity with the reference's
SPARQL-string shapes (shark_shapes.ttl)."""

import pyarrow as pa
import ray.data

from xpshacl_ray import SqlCheck, ValidationEngine, ValidationSpec


def _run(spec, table):
    eng = ValidationEngine(spec)
    return eng.validate(ray.data.from_arrow(table)).to_pandas()


def test_sqlcheck_flags_matching_rows():
    t = pa.table({"id": [1, 2, 3, 4],
                  "x": [10, 200, 30, None],
                  "cat": ["a", "b", "a", "a"]})
    spec = ValidationSpec(
        constraints=[SqlCheck(column="x", name="big_a",
                              where="cat = 'a' AND x > 20",
                              columns=["cat", "x"])],
        id_columns=["id"], focus_template="row:{id}")
    out = _run(spec, t)
    assert sorted(out["id"]) == [3]
    assert out["constraint_id"].iloc[0].endswith("SPARQLConstraintComponent")
    assert out["message"].iloc[0] == "SQL constraint 'big_a' failed"
    assert out["value"].iloc[0] == "30"


def test_sqlcheck_null_predicate_is_not_violation():
    # x IS NULL makes the expression NULL → coalesce(FALSE) → conforming
    t = pa.table({"id": [1, 2], "x": [None, 5]})
    spec = ValidationSpec(
        constraints=[SqlCheck(column="x", where="x > 1", columns=["x"])],
        id_columns=["id"], focus_template="row:{id}")
    assert sorted(_run(spec, t)["id"]) == [2]


def test_sqlcheck_row_alignment_across_batches():
    # many rows / multiple blocks: the mask must stay row-aligned
    n = 5000
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "x": pa.array([i % 7 for i in range(n)], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    spec = ValidationSpec(
        constraints=[SqlCheck(column="x", where="x = 3", columns=["x"])],
        id_columns=["id"], focus_template="row:{id}")
    out = ValidationEngine(spec).validate(ds).to_pandas()
    assert sorted(out["id"]) == [i for i in range(n) if i % 7 == 3]


def test_sqlcheck_required_columns_pruning():
    spec = ValidationSpec(
        constraints=[SqlCheck(column="x", where="cat = 'a' AND x > 20",
                              columns=["cat", "x"])],
        id_columns=["id"], focus_template="row:{id}")
    from xpshacl_ray import compile_spec

    cols = compile_spec(spec).required_columns()
    assert set(cols) == {"id", "x", "cat"}


def test_sql_project_rowlocal_and_partition_invariant():
    import pandas as pd

    from xpshacl_ray.functions.sqlmap import sql_project

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "props": ['{"k": 5}', '{"k": -2}', None, '{"other": 1}'],
    })
    sql = ("SELECT id, CAST(json_extract_string(props, '$.k') AS BIGINT)"
           " AS k FROM batch")
    a = sorted((r["id"], r["k"]) for r in
               sql_project(ray.data.from_pandas(df), sql).take_all())
    b = sorted((r["id"], r["k"]) for r in
               sql_project(ray.data.from_pandas(df).repartition(4),
                           sql).take_all())
    assert a == b == [(1, 5), (2, -2), (3, None), (4, None)]
