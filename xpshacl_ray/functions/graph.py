"""Graph analytics over edge-list Datasets.

:func:`pagerank` — fixed-iteration PageRank: per round, the EDGE table
(the big side) is scanned distributed with the current rank vector
broadcast read-only, per-batch partial contributions are pre-summed per
destination, and one ``groupby(dst).sum`` finishes the round.  Node
state (rank + out-degree, one float per node) lives on the driver
between rounds — the Pregel-with-small-state regime, valid while
``N_nodes ≪ N_edges`` (entity graphs); past driver memory, swap the
broadcast for a ``hash_join`` of a rank Dataset against the edges
(same round structure, one more shuffle per round).

Semantics (mirrored exactly by the SQL-unrolled oracle):
``pr'(v) = (1-d)/N + d * Σ_{(u,v)∈E} pr(u)/outdeg(u)`` — dangling-node
mass is dropped, not redistributed (the common simplification; total
mass then decays slightly per round, which is fine for ranking).

Node ids should be NUMERIC where possible — the per-round broadcast
probe is a ``searchsorted``, vectorized for int ids but forced through
per-element Python comparisons for strings (encode composite ids as
ints, e.g. ``suppkey*2`` / ``custkey*2+1``).

Connected components live in :mod:`.dedup` (``cluster_labels_distributed``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _reject_null_endpoints(b: pa.Table, src: str, dst: str) -> None:
    """A NULL endpoint is a malformed edge, not a node — both distinct
    strategies reject it identically (a guard only in the packed path
    would make the failure mode depend on the ids' value range)."""
    if b[src].null_count or b[dst].null_count:
        raise ValueError("pagerank: edge endpoints contain NULLs")


def _distinct_edges(edges: "ray.data.Dataset", src: str, dst: str,
                    ) -> "ray.data.Dataset":
    """Distributed DISTINCT on (src, dst): per-batch dedup first, then
    one groupby — multi-edges would otherwise multiply contributions.

    When both endpoints are non-negative ints below 2^31 (checked by a
    narrow min/max pre-pass), the pair is PACKED into one int64
    (``src<<32 | dst``) so the distinct exchange sorts/ships half the
    key bytes; unpacking is two shifts after the shuffle."""
    sch = edges.schema()
    tmap = dict(zip(sch.names, sch.types))
    if pa.types.is_integer(tmap[src]) and pa.types.is_integer(tmap[dst]):
        from ray.data.aggregate import Max, Min

        st = edges.select_columns([src, dst]).aggregate(
            Min(src), Max(src), Min(dst), Max(dst))
        lo = min(st[f"min({src})"] or 0, st[f"min({dst})"] or 0)
        hi = max(st[f"max({src})"] or 0, st[f"max({dst})"] or 0)
        if st[f"min({src})"] is not None and lo >= 0 and hi < 2**31:
            def pack(b: pa.Table) -> pa.Table:
                _reject_null_endpoints(b, src, dst)
                s = np.asarray(b[src].combine_chunks().cast(pa.int64())
                               if isinstance(b[src], pa.ChunkedArray)
                               else b[src].cast(pa.int64()))
                d = np.asarray(b[dst].combine_chunks().cast(pa.int64())
                               if isinstance(b[dst], pa.ChunkedArray)
                               else b[dst].cast(pa.int64()))
                t = pa.table({"pk": pa.array((s << 32) | d)})
                return t.group_by(["pk"]).aggregate([])

            def unpack(b: pa.Table) -> pa.Table:
                pk = np.asarray(b["pk"])
                return pa.table({
                    src: pc.cast(pa.array(pk >> 32), tmap[src]),
                    dst: pc.cast(pa.array(pk & 0xFFFFFFFF), tmap[dst]),
                })

            return (edges.map_batches(pack, batch_format="pyarrow")
                    .groupby("pk").count()
                    .map_batches(unpack, batch_format="pyarrow"))

    def local(b: pa.Table) -> pa.Table:
        _reject_null_endpoints(b, src, dst)
        return b.select([src, dst]).group_by([src, dst]).aggregate([])

    # aggregate-count then drop the count: one shuffle, no per-group
    # Python (a map_groups here would invoke once PER DISTINCT EDGE)
    return (edges.map_batches(local, batch_format="pyarrow")
            .groupby([src, dst]).count()
            .map_batches(lambda b: b.select([src, dst]),
                         batch_format="pyarrow"))


#: node-count ceiling for the driver-state path: past this the node
#: universe / rank vector / out-degrees no longer fit one machine and
#: pagerank() auto-switches to the rank-as-Dataset join path
DRIVER_NODE_LIMIT = 50_000_000


def _node_type(e: "ray.data.Dataset", src: str, dst: str) -> pa.DataType:
    """Common Arrow type for the stacked node column: int64 when both
    endpoint columns are integers (any width), else string — mixed-width
    FK columns (int32 src, int64 dst) would otherwise crash
    ``pa.concat_arrays``."""
    sch = e.schema()
    tmap = dict(zip(sch.names, sch.types))
    if pa.types.is_integer(tmap[src]) and pa.types.is_integer(tmap[dst]):
        return pa.int64()
    return pa.string()


def _stack_nodes(b: pa.Table, src: str, dst: str,
                 typ: pa.DataType) -> pa.Table:
    s = b[src].combine_chunks() if isinstance(b[src], pa.ChunkedArray) \
        else b[src]
    d = b[dst].combine_chunks() if isinstance(b[dst], pa.ChunkedArray) \
        else b[dst]
    return pa.table({"node": pa.concat_arrays(
        [s.cast(typ), d.cast(typ)])})


def _estimate_nodes(e: "ray.data.Dataset", src: str, dst: str) -> float:
    """No-shuffle HLL estimate of |src ∪ dst| — the planning pass for
    choosing driver-state vs join-state (same sketch-planning pattern as
    the grouped-constraint strategy chooser)."""
    from ..stages.grouped import estimate_group_count

    typ = _node_type(e, src, dst)
    stacked = e.map_batches(
        lambda b: _stack_nodes(b, src, dst, typ), batch_format="pyarrow")
    return estimate_group_count(stacked, ["node"])


def _pagerank_join(e: "ray.data.Dataset", src: str, dst: str,
                   damping: float, iters: int, ndigits: int,
                   join_partitions: int = 32) -> pa.Table:
    """Rank-as-Dataset variant: NO per-node driver state — rank and
    out-degree live in Datasets and each round is two hash joins + one
    groupby-sum (all exchanges carry (node, float) pairs).  Costs ~3
    shuffles per round vs the driver path's 1, so it is only chosen when
    the node universe exceeds driver memory (billions of nodes)."""
    import ray.data  # noqa: F401  (Dataset ops)
    from ray.data.aggregate import Sum

    from .joins import native_join

    typ = _node_type(e, src, dst)
    # normalize BOTH endpoint columns to the common node type up front so
    # every downstream join key (edges ⋈ deg, edges ⋈ ranks) type-matches
    # the stacked node column (mixed-width FK ids: int32 src, int64 dst)
    e = e.map_batches(
        lambda b: pa.table({src: pc.cast(b[src], typ),
                            dst: pc.cast(b[dst], typ)}),
        batch_format="pyarrow")
    nodes = (e.map_batches(
                lambda b: _stack_nodes(b, src, dst, typ),
                batch_format="pyarrow")
             .groupby("node").count()
             .map_batches(lambda b: b.select(["node"]),
                          batch_format="pyarrow")
             .materialize())
    n = nodes.count()
    if n == 0:
        return pa.table({"node": pa.array([], typ),
                         "pr": pa.array([], pa.float64())})
    # fold out-degree into the edge table ONCE (degree is round-static):
    # per round only ONE join (edges ⋈ ranks) remains
    deg = (e.groupby(src).count()
           .map_batches(lambda b: pa.table({
               src: b[src],
               "outdeg": pc.cast(b["count()"], pa.float64())}),
               batch_format="pyarrow"))
    e2 = native_join(e, deg, src,
                     num_partitions=join_partitions).materialize()
    base = (1.0 - damping) / n
    pr0 = 1.0 / n
    ranks = nodes.map_batches(
        lambda b: b.append_column("pr", pa.array(np.full(len(b), pr0))),
        batch_format="pyarrow").materialize()
    # ghost zero-contributions: unioned into the per-round sum so
    # no-in-edge nodes get rank `base` WITHOUT a second (left) join
    zeros = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "w": pa.array(np.zeros(len(b)))}),
        batch_format="pyarrow")

    for _ in range(iters):
        st_src = ranks.map_batches(
            lambda b: pa.table({src: b["node"], "pr": b["pr"]}),
            batch_format="pyarrow")
        joined = native_join(e2, st_src, src,
                             num_partitions=join_partitions)

        def contrib(b: pa.Table) -> pa.Table:
            w = (np.asarray(b["pr"], dtype=np.float64)
                 / np.asarray(b["outdeg"], dtype=np.float64))
            t = pa.table({"node": b[dst], "w": pa.array(w)})
            g = t.group_by(["node"]).aggregate([("w", "sum")])
            return pa.table({"node": g["node"], "w": g["w_sum"]})

        ranks = (joined.map_batches(contrib, batch_format="pyarrow")
                 .union(zeros)
                 .groupby("node").aggregate(Sum(on="w", alias_name="w"))
                 .map_batches(lambda b: pa.table({
                     "node": b["node"],
                     "pr": pa.array(base + damping * np.asarray(
                         b["w"], dtype=np.float64))}),
                     batch_format="pyarrow")
                 .materialize())

    out = pa.concat_tables(
        list(ranks.iter_batches(batch_format="pyarrow", batch_size=None))).sort_by("node")
    return pa.table({"node": out["node"].combine_chunks(),
                     "pr": pa.array(np.round(
                         np.asarray(out["pr"], dtype=np.float64), ndigits))})


def pagerank(edges: "ray.data.Dataset", src: str = "src",
             dst: str = "dst", damping: float = 0.85, iters: int = 3,
             ndigits: int = 6, node_state: str = "auto",
             driver_node_limit: float = DRIVER_NODE_LIMIT,
             join_partitions: int = 32) -> pa.Table:
    """(node, pr) after ``iters`` synchronous rounds from a uniform
    start.  See module docstring for the scale contract; ``ndigits``
    rounds the published ranks (float-sum order differs from SQL's).

    ``node_state`` picks where per-node state lives: ``"driver"`` (rank
    vector broadcast, fastest while N_nodes ≪ N_edges), ``"join"``
    (rank as a Dataset, two hash joins + a groupby per round — no
    driver bound), or ``"auto"`` (default): a no-shuffle HLL node-count
    estimate routes to the join path past ``driver_node_limit``."""
    import ray as _ray

    # few wide blocks: per-round partials are (node, w) rows per block,
    # so block count × node count bounds the driver merge.  The distinct
    # aggregate already emits a bounded number of reduce partitions —
    # re-shuffling them to exactly 32 cost a second all-to-all (~4 s at
    # bench scale) for no per-round win, so coalesce only when the
    # block count is genuinely pathological
    e = _distinct_edges(edges, src, dst).materialize()
    if e.num_blocks() > 128:
        e = e.repartition(128).materialize()

    if node_state == "auto":
        # free upper bound first: nodes <= 2·edges, and count() on a
        # materialized dataset is metadata-only — small graphs skip the
        # HLL planning scan entirely (measured +15% on the bench graph)
        if 2 * e.count() <= driver_node_limit:
            node_state = "driver"
        else:
            node_state = ("join" if _estimate_nodes(e, src, dst)
                          > driver_node_limit else "driver")
    if node_state == "join":
        return _pagerank_join(e, src, dst, damping, iters, ndigits,
                              join_partitions)
    if node_state != "driver":
        raise ValueError(f"unknown node_state {node_state!r}")

    # node universe + out-degrees (driver state: one row per NODE) in
    # ONE streaming scan over the materialized edges — the previous two
    # groupby().count().take_all() calls each paid a full sort shuffle
    # (~4 s at bench scale) to produce tables the driver was going to
    # hold anyway; per-batch Arrow group_by partials merge vectorized
    import pandas as pd

    ks_list, vs_list, dst_list = [], [], []
    for b in e.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(b) == 0:
            continue
        g = b.group_by(src).aggregate([([], "count_all")])
        ks_list.append(np.asarray(
            g[src].to_numpy(zero_copy_only=False)))
        vs_list.append(np.asarray(g["count_all"], dtype=np.int64))
        darr = b[dst]
        if isinstance(darr, pa.ChunkedArray):
            darr = darr.combine_chunks()
        dst_list.append(np.asarray(
            pc.unique(darr).to_numpy(zero_copy_only=False)))
    if ks_list:
        kcat = np.concatenate(ks_list)
        vcat = np.concatenate(vs_list)
        outdeg: Dict = pd.Series(vcat).groupby(kcat).sum().to_dict()
        dst_nodes = set(np.concatenate(dst_list).tolist())
    else:
        outdeg, dst_nodes = {}, set()
    nodes = sorted(set(outdeg) | dst_nodes)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "pr": pa.array([], pa.float64())})
    try:  # int ids: vectorized searchsorted in the hot per-batch probe
        node_arr = np.array(nodes, dtype=np.int64)
    except (TypeError, ValueError, OverflowError):
        node_arr = np.array(nodes, dtype=object)
    idx_of = {v: i for i, v in enumerate(nodes)}
    deg_arr = np.zeros(n, np.float64)
    for k, v in outdeg.items():
        deg_arr[idx_of[k]] = v

    pr = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    nodes_ref = _ray.put(node_arr)

    for _ in range(iters):
        pr_ref = _ray.put(pr)
        deg_ref = _ray.put(deg_arr)

        def contrib(b: pa.Table, pr_ref=pr_ref, deg_ref=deg_ref
                    ) -> pa.Table:
            nd = _ray.get(nodes_ref)
            p, dg = _ray.get(pr_ref), _ray.get(deg_ref)
            s_idx = np.searchsorted(nd, np.asarray(b[src]))
            w = p[s_idx] / dg[s_idx]  # outdeg>0: src always has an edge
            t = pa.table({"node": b[dst], "w": pa.array(w)})
            g = t.group_by(["node"]).aggregate([("w", "sum")])
            return pa.table({"node": g["node"], "w": g["w_sum"]})

        # node state already lives on the driver, so merging the
        # per-block per-node partials here (streamed, vectorized) saves
        # a full sort-shuffle per round; the groupby(node).sum variant
        # is the swap for node-scale-exceeds-driver graphs
        acc = np.zeros(n)
        for b in (e.map_batches(contrib, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None)):
            if len(b) == 0:
                continue
            i = np.searchsorted(node_arr, np.asarray(b["node"]))
            np.add.at(acc, i, np.asarray(b["w"], dtype=np.float64))
        pr = base + damping * acc

    return pa.table({"node": pa.array(nodes),
                     "pr": pa.array(np.round(pr, ndigits))})


# ---------------------------------------------------------------------------
# Directed-cycle membership (the shark subClassOf+ hierarchy-cycle shape)
# ---------------------------------------------------------------------------


def _tarjan_cycle_nodes(edge_list) -> set:
    """Exact cycle membership on a driver-resident edge list: members of
    Tarjan SCCs of size ≥ 2, plus self-loop nodes.  Iterative (no
    recursion-depth bound)."""
    from collections import defaultdict

    adj = defaultdict(list)
    nodes = set()
    out = set()
    for s, d in edge_list:
        nodes.add(s)
        nodes.add(d)
        if s == d:
            out.add(s)  # self-loop: a 1-edge cycle
        else:
            adj[s].append(d)
    index: Dict = {}
    low: Dict = {}
    on = set()
    stack: list = []
    counter = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recursed = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                if len(comp) >= 2:
                    out.update(comp)
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def _scc_cycle_members_distributed(
    e: "ray.data.Dataset",
    src: str,
    dst: str,
    node_t: pa.DataType,
    set_broadcast_limit: int,
    max_outer_rounds: int = 0,
) -> "ray.data.Dataset":
    """Cycle membership WITHOUT collecting the edge table: the coloring
    SCC algorithm (forward max-color propagation → backward reachability
    from color roots → remove resolved SCCs → re-trim → repeat), the
    standard distributed-SCC scheme (FW-BW/coloring family).

    Scale contract: per-NODE state (color / reach / alive — a few int64
    + bool arrays) lives on the driver and is re-broadcast per round via
    ``ray.put`` (bounded by ``set_broadcast_limit``, the same contract
    the trim stage already carries); the EDGE table is unbounded — it is
    converted ONCE to index space ((int64, int64) pairs, nulls dropped)
    and every subsequent pass streams it distributed with pure-numpy
    per-batch kernels.  Per-batch partials are pre-reduced (group-max by
    dst / unique node sets) so driver merges see at most one row per
    (block, node).

    Round counts: trim ≤ longest dangling path, color propagation ≤
    longest simple path inside the cyclic core, backward BFS ≤ core
    diameter — each round is one streamed pass over the index edges.
    Real class hierarchies have short cycles; a single 10^6-node cycle
    would take 10^6 propagation rounds (the known cost of coloring
    without pointer doubling) — correct, but that is what
    ``edge_collect_limit``'s one-pass Tarjan fast path is for.
    """
    import ray as _ray
    import ray.data

    # -- node universe (distinct endpoints), bounded by the broadcast
    # contract; values collected via per-batch unique + driver union
    vals: set = set()
    for blk in e.map_batches(
            lambda b: pa.table({"n": pc.drop_null(pc.unique(
                _stack_nodes(b, src, dst, node_t)["node"]))}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        vals.update(blk["n"].to_pylist())
        if len(vals) > set_broadcast_limit:
            raise ValueError(
                f"cycle_members: {len(vals)}+ distinct nodes exceed "
                f"set_broadcast_limit={set_broadcast_limit}")
    if not vals:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], node_t)}))
    if pa.types.is_integer(node_t):
        nodes = np.array(sorted(vals), dtype=np.int64)
    else:
        nodes = np.array(sorted(vals), dtype=object)
    n = len(nodes)
    nodes_ref = _ray.put(nodes)

    # -- edges → index space ONCE (null endpoints dropped, the exchange
    # from here on is (int64, int64) regardless of id width/type)
    def to_idx(b: pa.Table, nref=nodes_ref) -> pa.Table:
        nd = _ray.get(nref)
        m = pc.and_(pc.is_valid(b[src]), pc.is_valid(b[dst]))
        b = b.filter(m)
        if len(b) == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        s = np.searchsorted(nd, pc.cast(
            b[src], node_t).to_numpy(zero_copy_only=False))
        d = np.searchsorted(nd, pc.cast(
            b[dst], node_t).to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array(s.astype(np.int64)),
                         "d": pa.array(d.astype(np.int64))})

    idx_e = e.map_batches(to_idx, batch_format="pyarrow").materialize()

    # -- self-loops are 1-edge cycles: fold them into the result up
    # front and exclude them from the SCC loop (a size-1 SCC would
    # otherwise be indistinguishable from a cycle-free node)
    result = np.zeros(n, dtype=bool)
    for blk in idx_e.map_batches(
            lambda b: pa.table({"u": pa.array(np.unique(
                np.asarray(b["s"])[np.asarray(b["s"])
                                   == np.asarray(b["d"])]))}),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
        result[np.asarray(blk["u"], dtype=np.int64)] = True
    idx_e = idx_e.map_batches(
        lambda b: b.filter(pc.not_equal(b["s"], b["d"])),
        batch_format="pyarrow").materialize()

    alive = np.ones(n, dtype=bool)
    arange = np.arange(n, dtype=np.int64)
    # every round resolves at least one color root (the max-index alive
    # node always has color == itself), so n rounds is a hard bound —
    # a chain of k SCCs with adversarial id order legitimately needs k
    # rounds, so no small fixed cap is safe
    if not max_outer_rounds:
        max_outer_rounds = n + 2
    for _ in range(max_outer_rounds):
        # trim to fixpoint: alive nodes need >=1 alive in- AND out-edge
        while True:
            has_out = np.zeros(n, dtype=bool)
            has_in = np.zeros(n, dtype=bool)
            aref = _ray.put(alive)

            def degs(b: pa.Table, aref=aref) -> pa.Table:
                a = _ray.get(aref)
                s = np.asarray(b["s"], dtype=np.int64)
                d = np.asarray(b["d"], dtype=np.int64)
                m = a[s] & a[d]
                us, ud = np.unique(s[m]), np.unique(d[m])
                return pa.table({
                    "u": pa.array(np.concatenate([us, ud])),
                    "f": pa.array(np.concatenate(
                        [np.zeros(len(us), np.int8),
                         np.ones(len(ud), np.int8)]))})

            for blk in idx_e.map_batches(
                    degs, batch_format="pyarrow").iter_batches(
                        batch_format="pyarrow", batch_size=None):
                u = np.asarray(blk["u"], dtype=np.int64)
                f = np.asarray(blk["f"], dtype=np.int8)
                has_out[u[f == 0]] = True
                has_in[u[f == 1]] = True
            new_alive = alive & has_out & has_in
            if (new_alive == alive).all():
                break
            alive = new_alive
        if not alive.any():
            break

        # forward coloring: color(v) = max node index that reaches v
        # inside the alive subgraph (fixpoint; converges in <= n rounds)
        colors = np.where(alive, arange, np.int64(-1))
        while True:
            cref = _ray.put(colors)
            aref = _ray.put(alive)

            def prop(b: pa.Table, cref=cref, aref=aref) -> pa.Table:
                c, a = _ray.get(cref), _ray.get(aref)
                s = np.asarray(b["s"], dtype=np.int64)
                d = np.asarray(b["d"], dtype=np.int64)
                m = a[s] & a[d]
                s, d = s[m], d[m]
                t = pa.table({"d": pa.array(d), "c": pa.array(c[s])})
                g = t.group_by(["d"]).aggregate([("c", "max")])
                return pa.table({"d": g["d"], "c": g["c_max"]})

            newc = colors.copy()
            for blk in idx_e.map_batches(
                    prop, batch_format="pyarrow").iter_batches(
                        batch_format="pyarrow", batch_size=None):
                np.maximum.at(newc, np.asarray(blk["d"], dtype=np.int64),
                              np.asarray(blk["c"], dtype=np.int64))
            if (newc == colors).all():
                break
            colors = newc

        # backward BFS from each color root within its color class:
        # reach[v] = v can reach its root; SCC(root) = its reach set
        reach = alive & (colors == arange)
        while True:
            rref = _ray.put(reach)
            cref = _ray.put(colors)
            aref = _ray.put(alive)

            def back(b: pa.Table, rref=rref, cref=cref,
                     aref=aref) -> pa.Table:
                r, c, a = (_ray.get(rref), _ray.get(cref),
                           _ray.get(aref))
                s = np.asarray(b["s"], dtype=np.int64)
                d = np.asarray(b["d"], dtype=np.int64)
                m = a[s] & a[d] & (c[s] == c[d]) & r[d] & ~r[s]
                return pa.table({"u": pa.array(np.unique(s[m]))})

            grew = False
            for blk in idx_e.map_batches(
                    back, batch_format="pyarrow").iter_batches(
                        batch_format="pyarrow", batch_size=None):
                u = np.asarray(blk["u"], dtype=np.int64)
                fresh = u[~reach[u]]
                if len(fresh):
                    reach[fresh] = True
                    grew = True
            if not grew:
                break

        # resolved this round: every reach node's SCC is final; members
        # of SCCs of size >= 2 are cycle members
        sizes = np.bincount(colors[reach], minlength=n)
        result |= reach & (sizes[np.clip(colors, 0, n - 1)] >= 2) & alive
        alive &= ~reach  # every color root resolves → guaranteed progress
        if not alive.any():
            break
    else:
        raise RuntimeError(
            "cycle_members: distributed SCC did not converge within "
            f"{max_outer_rounds} outer rounds")
    members = nodes[result]
    return ray.data.from_arrow(
        pa.table({"node": pa.array(members.tolist(), node_t)}))


def cycle_members(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    max_trim_rounds: int = 100,
    set_broadcast_limit: int = 10_000_000,
    core_limit: int = 5_000_000,
    edge_collect_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Nodes lying on at least one DIRECTED cycle — the distributed
    analog of the shark ``$this rdfs:subClassOf+ $this`` shape
    (``/root/reference/data/shark_shapes.ttl:128-137``), which needs
    transitive closure no single groupby can express.

    Plan, by size:

    0. **Small-relation fast path**: distinct edges are collected with
       per-batch dedup while they fit ``edge_collect_limit`` (class
       hierarchies are TBox-sized even under 100 TB of instance data)
       and resolved in ONE Tarjan pass — a deep trim tail costs
       driver-scan rounds the exact algorithm doesn't need.  ``=0``
       forces the distributed path (the parity-forcing knob).
    1. **Distributed TRIM to fixpoint** (past the limit): a node with
       in-degree 0 or out-degree 0 is on no cycle; removing its edges
       may expose more.  Each round broadcasts the distinct src / dst
       node sets (``ray.put`` once, ``pc.is_in`` probe per batch) and
       filters the edge Dataset distributed; the edge table shrinks
       monotonically and a DAG trims to EMPTY.  Contract: the distinct
       node set fits ``set_broadcast_limit``.
    2. **Exact SCC on the core**: whatever survives trimming is the
       cyclic core (cycles + paths between cycles) — collected while it
       fits ``core_limit`` and resolved with iterative Tarjan; members
       of SCCs of size ≥ 2 plus self-loops are the answer.
    3. **Distributed SCC past ``core_limit``** (``=0`` forces it): the
       coloring algorithm in :func:`_scc_cycle_members_distributed` —
       per-node state on the driver (bounded by the SAME
       ``set_broadcast_limit`` contract the trim carries), edges
       streamed distributed in (int64, int64) index space.  No edge
       collect anywhere, so a non-hierarchy-sized cyclic relation now
       resolves instead of raising.

    Returns a Dataset with one ``node`` column."""
    import ray as _ray
    import ray.data

    e = edges
    node_t = _node_type(e, src, dst)
    if edge_collect_limit:
        pair_set: set = set()
        over = False
        for blk in e.map_batches(
                lambda b: b.select([src, dst]).group_by(
                    [src, dst]).aggregate([]),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None):
            pair_set.update(
                (s, d) for s, d in zip(blk[src].to_pylist(),
                                       blk[dst].to_pylist())
                if s is not None and d is not None)
            if len(pair_set) > edge_collect_limit:
                over = True
                break
        if not over:
            members = sorted(_tarjan_cycle_nodes(pair_set))
            return ray.data.from_arrow(
                pa.table({"node": pa.array(members, node_t)}))
    prev = None
    for _ in range(max_trim_rounds):
        # distinct src / dst sets via per-batch unique + driver union —
        # bounded by the node-set contract, never by edge multiplicity
        src_set, dst_set = set(), set()

        def _uniq(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.drop_null(pc.unique(col))  # null endpoint ≠ node

        for blk in e.map_batches(
                lambda b: pa.table({"s": _uniq(b[src])}),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None):
            src_set.update(blk["s"].to_pylist())
        for blk in e.map_batches(
                lambda b: pa.table({"d": _uniq(b[dst])}),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None):
            dst_set.update(blk["d"].to_pylist())
        if len(src_set) + len(dst_set) > set_broadcast_limit:
            raise ValueError(
                f"cycle_members: {len(src_set) + len(dst_set)} distinct "
                f"endpoint nodes exceed set_broadcast_limit="
                f"{set_broadcast_limit} — not a TBox-sized relation")
        alive = src_set & dst_set  # has out-edge AND in-edge
        if not alive:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], node_t)}))
        alive_arr = pa.array(sorted(alive), node_t)
        ref = _ray.put(alive_arr)

        def keep(b: pa.Table, r=ref) -> pa.Table:
            a = _ray.get(r)
            m = pc.and_(
                pc.fill_null(pc.is_in(b[src], value_set=a), False),
                pc.fill_null(pc.is_in(b[dst], value_set=a), False))
            return b.filter(m)

        e = e.map_batches(keep, batch_format="pyarrow").materialize()
        n = e.count()
        if n == 0:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], node_t)}))
        if prev is not None and n == prev:
            break  # trim fixpoint: the cyclic core
        prev = n
    if prev is None or not core_limit or (prev or 0) > core_limit:
        # cyclic core too big to collect (or ``core_limit=0`` forcing):
        # resolve it with the distributed coloring SCC — node state on
        # the driver (same set_broadcast_limit contract as the trim),
        # edges streamed in index space, no edge collect anywhere
        return _scc_cycle_members_distributed(
            e, src, dst, node_t, set_broadcast_limit)
    pairs = []
    for blk in e.iter_batches(batch_format="pyarrow", batch_size=None):
        pairs.extend(zip(blk[src].to_pylist(), blk[dst].to_pylist()))
    members = sorted(_tarjan_cycle_nodes(pairs))
    return ray.data.from_arrow(pa.table({"node": pa.array(members,
                                                          node_t)}))
