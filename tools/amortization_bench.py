"""10× amortization evidence for the round-4 winners (VERDICT r4 item 5).

Measures pagerank, dup_clusters, sparql_grouped and the LM-family
bucketed-join path (vocab_broadcast_limit=0) at 1× and 10× input size so
the "fixed shuffle floors amortize" claim is evidenced where it matters,
not just for minhash + validation.

Usage:
    python tools/amortization_bench.py prep           # build /tmp/amort
    python tools/amortization_bench.py run 1x         # one JSON line
    python tools/amortization_bench.py run 10x        # one JSON line

`run` owns a fresh Ray session (32 cpus unless RAY_GRAFT_CPUS is set) —
run each size in its own process so sessions never share state.

Inputs (replicated from /root/testdata/sf0.1, offsets keep keys unique):
    docs  1× = 60,000 rows (12× sf0.1 documents), 10× = 600,000
    lineitem/orders 1× = sf0.1 as-is (600k/150k), 10× = 6M/1.5M
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
OUT = "/tmp/amort"


def _prep_docs(reps: int, out_dir: str) -> None:
    t = pq.read_table(f"{SF}/documents.parquet")
    parts = []
    for k in range(reps):
        c = t.select([c for c in t.column_names])
        ids = pa.array(np.asarray(c["doc_id"]) + k * 10_000_000,
                       pa.int64())
        parts.append(c.set_column(c.column_names.index("doc_id"),
                                  "doc_id", ids))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")


def _prep_trade(reps: int, out_dir: str) -> None:
    li = pq.read_table(f"{SF}/lineitem.parquet")
    od = pq.read_table(f"{SF}/orders.parquet")
    li_parts, od_parts = [], []
    for k in range(reps):
        lk = pa.array(np.asarray(li["l_orderkey"]) + k * 1_000_000_000,
                      pa.int64())
        li_parts.append(li.set_column(
            li.column_names.index("l_orderkey"), "l_orderkey", lk))
        ok = pa.array(np.asarray(od["o_orderkey"]) + k * 1_000_000_000,
                      pa.int64())
        ck = pa.array(np.asarray(od["o_custkey"]) + k * 100_000_000,
                      pa.int64())
        t = od.set_column(od.column_names.index("o_orderkey"),
                          "o_orderkey", ok)
        od_parts.append(t.set_column(t.column_names.index("o_custkey"),
                                     "o_custkey", ck))
    pq.write_table(pa.concat_tables(li_parts), f"{out_dir}/lineitem.parquet")
    pq.write_table(pa.concat_tables(od_parts), f"{out_dir}/orders.parquet")


import string


def _prep_docs_salted(reps: int, out_dir: str) -> None:
    """Replicate documents through a per-replica CHARACTER-permutation
    cipher (alphanumerics rotated by the replica id; whitespace and
    punctuation untouched).  A bijection on the alphabet is a bijection
    on char shingles, so every within-replica pairwise Jaccard is
    EXACTLY the original corpus's, while cross-replica shingle sets are
    disjoint (any shingle containing a letter/digit differs) — the
    dup-rate-preserving scaling input for dup_clusters.  (Token
    suffixing is NOT enough: the engine shingles characters, and a
    shared per-copy suffix inflates within-copy similarity.)"""
    t = pq.read_table(f"{SF}/documents.parquet")
    texts = t["text"].to_pylist()
    alpha = string.ascii_lowercase
    upper = string.ascii_uppercase
    digits = string.digits
    parts = []
    for k in range(reps):
        # seeded PERMUTATION per replica (a rotation would repeat every
        # 26 replicas, re-creating identical cross-copy texts at 120×)
        rng = np.random.default_rng(10_000 + k)
        tr = str.maketrans(
            alpha + upper + digits,
            "".join(rng.permutation(list(alpha)))
            + "".join(rng.permutation(list(upper)))
            + "".join(rng.permutation(list(digits))))
        salted = pa.array(
            [None if x is None else x.translate(tr) for x in texts],
            pa.string())
        ids = pa.array(np.asarray(t["doc_id"]) + k * 10_000_000,
                       pa.int64())
        c = t.set_column(t.column_names.index("doc_id"), "doc_id", ids)
        parts.append(c.set_column(c.column_names.index("text"),
                                  "text", salted))
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/documents.parquet")


def prep() -> None:
    for name, doc_reps, trade_reps in (("1x", 12, 1), ("10x", 120, 10)):
        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        _prep_docs(doc_reps, d)
        _prep_trade(trade_reps, d)
        print(name, "ready:", {t: pq.read_metadata(
            f"{d}/{t}.parquet").num_rows
            for t in ("documents", "lineitem", "orders")})
    for name, doc_reps in (("1x_salted", 12), ("10x_salted", 120)):
        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        _prep_docs_salted(doc_reps, d)
        print(name, "ready:", pq.read_metadata(
            f"{d}/documents.parquet").num_rows)


def run(size: str) -> None:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry
    from xpshacl_ray.functions.text import bigram_logprob

    sf_dir = os.path.join(OUT, size)
    qs = entry.queries()

    def lm_bucketed(d):
        import ray.data

        docs = ray.data.read_parquet(f"{d}/documents.parquet",
                                     columns=["doc_id", "text"])
        return bigram_logprob(docs, vocab_broadcast_limit=0)

    if size.endswith("_salted"):
        jobs = {"dup_clusters": qs["dup_clusters"]}
        rows = {"documents": pq.read_metadata(
                    f"{sf_dir}/documents.parquet").num_rows}
    else:
        jobs = {
            "pagerank": qs["pagerank"],
            "dup_clusters": qs["dup_clusters"],
            "sparql_grouped": qs["sparql_grouped"],
            "bigram_logprob_bucketed": lm_bucketed,
        }
        rows = {"documents": pq.read_metadata(
                    f"{sf_dir}/documents.parquet").num_rows,
                "lineitem": pq.read_metadata(
                    f"{sf_dir}/lineitem.parquet").num_rows}
    out = {"size": size, "rows": rows, "queries": {}}
    for name, fn in jobs.items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        n = res.materialize().count() if hasattr(res, "materialize") \
            else len(res)
        out["queries"][name] = {"sec": round(time.perf_counter() - t0, 3),
                                "out_rows": int(n)}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    if sys.argv[1] == "prep":
        prep()
    else:
        run(sys.argv[2])
