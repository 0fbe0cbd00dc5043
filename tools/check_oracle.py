"""Driver-style correctness harness: run every queries() entry and its
oracle SQL side-by-side, compare row count, schema and an
order-insensitive value hash.  Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With ``--json`` the per-query verdicts are also written as a JSON
artifact whose entries mirror the driver's ``CORRECTNESS_r*.json``
format (``rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err``), so a committed ``ORACLE_SWEEP_r{N}.json`` covers
ALL queries each round while the driver window covers ~50 (VERDICT r4
item 1).  ``_rotate_never_green_first`` in ``__ray_entry__.py`` reads
both artifact families when ordering the driver window.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    payload = canon(df).astype(str).to_csv(index=False)
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500]}
            continue
        if name not in sqls:
            print(f"rows  {name}: {len(got)} rows (rows-only check)")
            report[name] = {
                "rows_match": len(got) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": None}
            continue
        want = con.execute(sqls[name]).fetchdf()
        ok_rows = len(got) == len(want)
        sg, sw = sorted(got.columns), sorted(want.columns)
        ok_schema = sg == sw
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": len(got),
            "oracle_rows": len(want), "err": None}
        print(f"{status}  {name}: rows {len(got)}/{len(want)} "
              f"schema={'ok' if ok_schema else f'{sg} vs {sw}'} "
              f"hash={'ok' if ok_hash else 'MISMATCH'}")
        if not ok_hash and ok_rows and ok_schema and len(got):
            a, b = canon(got), canon(want)
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            print("   first diffs:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)],
                            keys=["got", "want"]).to_string()[:2000])
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {json_out}: {len(report)} queries, "
              f"{failures} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
