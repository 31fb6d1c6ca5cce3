"""Distributed connected components — iterative min-label propagation.

The scale path for the union-find that corpus dedup runs driver-side
(pipelines/corpus.py:neardup_components — fine there because near-dup
PAIR lists are output-sized): when the edge list itself is too big for
one process (entity resolution over 10^10 candidate pairs, host-graph
clustering), components must come out of shuffles, not a driver loop.

Algorithm (published label-propagation / "hash-to-min" shape): every
node starts labeled with itself; each round, every node takes the MIN
label in its closed neighborhood; converges in O(diameter) rounds to
label == min node id of the component — the same keeper-is-min-id
contract as neardup_components. Each round is ONE edge-stream join (the
stages/joins auto planner: broadcast while the label table fits,
co-partition above) plus ONE per-node min groupby; the edge stream is
never materialized on the driver, and the driver-held state is exactly
the node→label table (output-sized — what a union-find keeps anyway),
updated by a vectorized sorted merge per round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..stages.joins import join


def connected_components(edges_ds, a_col: str = "doc_a", b_col: str = "doc_b", max_rounds: int = 64):
    """Components of an undirected edge Dataset → pa.Table(node, label)
    with label = min node id of the component (isolated nodes absent,
    matching the union-find's domain)."""

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(a_col).cast(pa.int64()).combine_chunks()
        bb = b.column(b_col).cast(pa.int64()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, bb]), "dst": pa.concat_arrays([bb, a])}
        )

    # symmetrized edges, re-consumed every round → materialize once
    sym_ds = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    # initial labels: distributed distinct of the endpoints; from here the
    # label state is two aligned arrays (sorted nodes, labels)
    parts = [
        b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in sym_ds.groupby("src").count().iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
    nodes = np.sort(np.concatenate(parts))
    labels = nodes.copy()

    def one_round(cur: np.ndarray) -> np.ndarray:
        lbl_t = pa.table({"src": pa.array(nodes), "src_label": pa.array(cur)})
        relabeled = join(sym_ds, lbl_t, on="src", how="inner")
        cand = relabeled.groupby("dst").min("src_label")
        nxt = cur.copy()
        for b in cand.iter_batches(batch_format="pyarrow"):
            d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            l = b.column("min(src_label)").to_numpy(zero_copy_only=False).astype(np.int64)
            np.minimum.at(nxt, np.searchsorted(nodes, d), l)
        # Pointer jumping (path compression): a label is always itself a
        # node id, so label←label[label] halves every pointer chain; this
        # turns the per-round hop distance from 1 into 2^k and makes the
        # outer loop converge in O(log diameter) joins instead of
        # O(diameter).  Pure driver-array work on the node→label state.
        while True:
            jumped = np.minimum(nxt, nxt[np.searchsorted(nodes, nxt)])
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        return nxt

    converged = False
    for _ in range(max_rounds):
        nxt = one_round(labels)
        if np.array_equal(nxt, labels):
            converged = True
            break
        labels = nxt
    if not converged:
        # Labels changed on the final allowed round — they may nonetheless
        # already be the fixpoint (convergence detection normally costs one
        # extra change-free round).  One verification round distinguishes
        # "settled exactly at max_rounds" from "still moving", so a correct
        # answer is never discarded.
        nxt = one_round(labels)
        if np.array_equal(nxt, labels):
            converged = True
        labels = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in max_rounds={max_rounds}; "
            "labels were still changing — raise max_rounds (each round is one "
            "edge join; with pointer jumping rounds needed ~ log2(diameter))"
        )
    return pa.table({"node": pa.array(nodes), "label": pa.array(labels)})


def components_match_unionfind(edges: pa.Table, a_col: str = "doc_a", b_col: str = "doc_b") -> bool:
    """Cross-check helper (used by tests): distributed labels ≡ the
    driver union-find's component partition."""
    from .corpus import neardup_components

    out = connected_components(ray.data.from_arrow(edges), a_col, b_col).to_pandas()
    a = edges.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    uf = neardup_components(a, b)
    # union-find reports drops (non-min members); labels report min per node
    drop_dist = np.sort(out.loc[out["node"] != out["label"], "node"].to_numpy())
    comp_dist = out["label"].nunique()
    return bool(np.array_equal(drop_dist, uf["drop"]) and comp_dist == uf["components"])


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    d: float = 0.85,
    max_iter: int = 60,
    tol: float = 1e-12,
):
    """Distributed PageRank (power iteration) over a directed int64 edge
    Dataset → pa.Table(node, rank), ranks summing to 1.

    Link analysis is the crawl-prioritization signal the reference's
    frontier ordering gestures at (SURVEY §2.1 S1 — DFS order vs.
    importance order); here it is the standard published formulation:
    rank' = (1-d)/N + d·(Σ_in rank/outdeg + dangling_mass/N).

    Scale posture mirrors connected_components: the edge stream is never
    on the driver; each iteration is ONE join of the edge stream against
    the (src → rank/outdeg) table through the auto planner plus ONE
    per-destination grouped float sum; driver state is exactly the
    node→rank table (output-sized).  Parallel edges act as weight-2
    links (no implicit dedup).
    """

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b.column(src_col).cast(pa.int64()),
                "dst": b.column(dst_col).cast(pa.int64()),
            }
        )

    # re-consumed every iteration → materialize once (edge-stream sized,
    # lives in the object store, not the driver)
    e = edges_ds.map_batches(slim, batch_format="pyarrow").materialize()

    # node table + outdegree: two tiny grouped counts
    deg = {}
    for b in e.groupby("src").count().iter_batches(batch_format="pyarrow"):
        for n, c in zip(
            b.column("src").to_numpy(zero_copy_only=False),
            b.column("count()").to_numpy(zero_copy_only=False),
        ):
            deg[int(n)] = int(c)
    dsts = [
        b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in e.groupby("dst").count().iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    all_nodes = set(deg)
    for arr in dsts:
        all_nodes.update(int(x) for x in arr)
    if not all_nodes:
        return pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
    nodes = np.array(sorted(all_nodes), dtype=np.int64)
    n = len(nodes)
    outdeg = np.array([deg.get(int(x), 0) for x in nodes], dtype=np.int64)
    rank = np.full(n, 1.0 / n)

    emitter = outdeg > 0
    for _ in range(max_iter):
        w = np.zeros(n)
        w[emitter] = rank[emitter] / outdeg[emitter]
        contrib_t = pa.table({"src": pa.array(nodes[emitter]), "w": pa.array(w[emitter])})
        summed = join(e, contrib_t, on="src", how="inner").groupby("dst").sum("w")
        nxt = np.zeros(n)
        for b in summed.iter_batches(batch_format="pyarrow"):
            dn = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            sv = b.column("sum(w)").to_numpy(zero_copy_only=False)
            nxt[np.searchsorted(nodes, dn)] += sv
        dangling = float(rank[~emitter].sum())
        nxt = (1.0 - d) / n + d * (nxt + dangling / n)
        delta = float(np.abs(nxt - rank).sum())
        rank = nxt
        if delta < tol:
            break
    return pa.table({"node": pa.array(nodes), "rank": pa.array(rank, pa.float64())})


def hits(edges_ds, src_col: str = "src", dst_col: str = "dst", iters: int = 8, scale: int = 1_000_000):
    """Integer-exact HITS (Kleinberg 1999) hubs & authorities over a
    directed edge Dataset → pa.Table(node, hub, authority) with int64
    scores in [0, scale].

    Link analysis beside :func:`pagerank` — the hub/authority split is
    the crawl-seed-quality signal (good hub pages point at many good
    content pages; reference analog: the frontier-ordering priority in
    SURVEY §2.1 S1).  Fixed ``iters`` mutual-reinforcement rounds with
    trunc-div max-normalization after each half step::

        a_k = floor(Σ_in  h_{k-1} · scale / max)   (authorities)
        h_k = floor(Σ_out a_k     · scale / max)   (hubs)

    so every intermediate is an exact integer a SQL engine replays
    bit-for-bit in HUGEINT (the host_pagerank_exact unrolled-CTE
    pattern, but with no floats anywhere — no rtol needed).

    Scale posture mirrors pagerank: the edge stream is materialized once
    in the object store and never reaches the driver; each half-step is
    ONE join of the edge stream against the node→score table (broadcast
    while small, co-partitioned above — the stages/joins auto planner)
    plus ONE per-endpoint grouped int sum.  Driver state is exactly the
    node→score table; its rescale uses Python bigints so the
    normalization can never overflow regardless of in-degree skew (the
    grouped sums themselves stay int64: scale·deg ≤ 2^63 up to ~9·10^12
    in-links per node).  Works over any node dtype (string hosts).

    Parallel edges count twice (weight-2 links), matching pagerank's
    no-implicit-dedup contract and the SQL twin's plain joins.
    """

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src_col), "dst": b.column(dst_col)})

    e = edges_ds.map_batches(slim, batch_format="pyarrow").materialize()

    # node universe: distinct endpoints via two grouped counts (never the
    # raw edge stream on the driver)
    universe: set = set()
    for col in ("src", "dst"):
        for b in e.groupby(col).count().iter_batches(batch_format="pyarrow"):
            universe.update(b.column(col).to_pylist())
    universe.discard(None)
    if not universe:
        empty = pa.array([], pa.int64())
        return pa.table({"node": pa.array([], pa.string()), "hub": empty, "authority": empty})
    nodes = sorted(universe)
    idx = {n: i for i, n in enumerate(nodes)}
    node_arr = pa.array(nodes)
    ntype = node_arr.type

    def half_step(score: list[int], probe_col: str, out_col: str) -> list[int]:
        """raw[out] = Σ over edges (probe→out) of score[probe], then
        trunc-div max-normalize — one join + one grouped sum."""
        nz = [i for i, s in enumerate(score) if s > 0]
        contrib = pa.table(
            {
                probe_col: pc.take(node_arr, pa.array(nz, pa.int64())),
                "w": pa.array([score[i] for i in nz], pa.int64()),
            }
        )
        summed = join(e, contrib, on=probe_col, how="inner").groupby(out_col).sum("w")
        raw = [0] * len(nodes)
        for b in summed.iter_batches(batch_format="pyarrow"):
            for n, s in zip(b.column(out_col).to_pylist(), b.column("sum(w)").to_pylist()):
                raw[idx[n]] = int(s)
        m = max(raw)
        if m == 0:
            return raw
        return [r * scale // m for r in raw]

    hub = [scale] * len(nodes)
    auth = [0] * len(nodes)
    for _ in range(iters):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")
    return pa.table(
        {
            "node": node_arr,
            "hub": pa.array(hub, pa.int64()),
            "authority": pa.array(auth, pa.int64()),
        }
    )


def hits_reference(edges: pa.Table, src_col: str = "src", dst_col: str = "dst", iters: int = 8, scale: int = 1_000_000) -> dict:
    """Driver-side adjacency-loop truth for tests: node → (hub, auth)
    with the exact same integer update rule."""
    src = edges.column(src_col).to_pylist()
    dst = edges.column(dst_col).to_pylist()
    nodes = sorted(set(src) | set(dst))
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw: dict) -> dict:
        m = max(raw.values()) if raw else 0
        if m == 0:
            return {n: 0 for n in nodes}
        return {n: raw.get(n, 0) * scale // m for n in nodes}

    for _ in range(iters):
        raw_a: dict = {}
        for s, t in zip(src, dst):
            raw_a[t] = raw_a.get(t, 0) + hub[s]
        auth = norm(raw_a)
        raw_h: dict = {}
        for s, t in zip(src, dst):
            raw_h[s] = raw_h.get(s, 0) + auth[t]
        hub = norm(raw_h)
    return {n: (hub[n], auth[n]) for n in nodes}


def kcore(edges_ds, k: int = 3, a_col: str = "src", b_col: str = "dst", rounds: int | None = None, max_rounds: int = 64):
    """k-core decomposition by iterative peeling: repeatedly delete every
    node whose degree in the surviving induced subgraph is < k; the
    fixpoint is the k-core (Seidman 1983; the standard crawl/spam-farm
    density signal over a host graph).  Returns pa.Table(node, deg) — the
    core members with their within-core degrees.

    Works over any node dtype (string hosts included).  Edges are
    canonicalized once (undirected, deduped, self-loops dropped) and
    symmetrized into a materialized edge stream; each peel round is ONE
    vectorized ``is_in`` filter of the edge stream against the broadcast
    live-node set plus ONE per-node degree groupby — the same
    node-table-sized driver state and edge-never-on-driver posture as
    connected_components/pagerank above.

    ``rounds=None`` peels until fixpoint (early exit).  ``rounds=R`` runs
    exactly R rounds with no early exit — the SQL-replay twin: DuckDB
    unrolls the same R filter+degree rounds as CTEs, and since extra
    rounds past the fixpoint are no-ops, parity holds whether or not R
    overshoots."""

    def canon(t: pa.Table) -> pa.Table:
        x, y = t.column(a_col), t.column(b_col)
        lo, hi = pc.min_element_wise(x, y), pc.max_element_wise(x, y)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": pc.filter(lo, keep), "b": pc.filter(hi, keep)})

    dedup = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table({"s": pa.concat_arrays([a, b]), "t": pa.concat_arrays([b, a])})

    e = dedup.map_batches(sym, batch_format="pyarrow").materialize()

    def degrees(live) -> tuple[list, np.ndarray]:
        """One peel round: degree of every live node within the live-
        induced subgraph (live=None → whole graph)."""
        if live is not None and not live:
            return [], np.empty(0, np.int64)
        if live is None:
            filt = e
        else:
            live_arr = pa.array(live)

            def f(t: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.is_in(t.column("s"), value_set=live_arr),
                    pc.is_in(t.column("t"), value_set=live_arr),
                )
                return t.filter(m)

            filt = e.map_batches(f, batch_format="pyarrow")
        nodes, degs = [], []
        for b in filt.groupby("s").count().iter_batches(batch_format="pyarrow"):
            nodes.extend(b.column("s").to_pylist())
            degs.append(b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64))
        return nodes, (np.concatenate(degs) if degs else np.empty(0, np.int64))

    live = None
    n_rounds = rounds if rounds is not None else max_rounds
    last_nodes: list = []
    last_degs = np.empty(0, np.int64)
    converged = False
    for _ in range(n_rounds):
        nodes, degs = degrees(live)
        m = degs >= k
        nxt = sorted(nd for nd, keep in zip(nodes, m) if keep)
        last_nodes, last_degs = nodes, degs
        if live is not None and nxt == live:
            converged = True
            if rounds is None:
                break
        live = nxt
    if rounds is None and not converged:
        raise RuntimeError(
            f"kcore did not converge in max_rounds={max_rounds}; parallel "
            "peeling needs O(peel-depth) rounds — raise max_rounds"
        )
    kept = sorted(
        (nd, int(dg)) for nd, dg, keep in zip(last_nodes, last_degs, last_degs >= k) if keep
    )
    # typed node column even when the core is empty (a null-typed empty
    # array reads back as object dtype and fails the strict dtype check)
    sch = e.schema()
    ntype = getattr(sch, "base_schema", sch).field("s").type
    return pa.table(
        {
            "node": pa.array([nd for nd, _ in kept], ntype),
            "deg": pa.array([dg for _, dg in kept], pa.int64()),
        }
    )


def kcore_reference(edges: pa.Table, k: int, a_col: str = "src", b_col: str = "dst") -> dict:
    """Driver-side peeling truth for tests: dict node → core degree."""
    import collections

    adj: dict = collections.defaultdict(set)
    for a, b in zip(edges.column(a_col).to_pylist(), edges.column(b_col).to_pylist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def triangles(edges_ds, a_col: str = "a", b_col: str = "b", chunk: int = 1024, assume_unique: bool = False):
    """Distributed triangle enumeration by WEDGE-CHECK: every node lists
    its ordered neighbor pairs (wedges), and a wedge (b, c) closes iff
    (b, c) is itself an edge — one semi-join of the wedge stream against
    the edge set (Suri & Vassilvitskii, "Counting Triangles and the Curse
    of the Last Reducer").

    The last-reducer curse itself is handled by SV's partitioned wedge
    generation: the per-pivot group task never emits wedges — it emits
    CHUNK-PAIR rows, the pivot's sorted neighbor list split into
    ``chunk``-sized slices paired (i ≤ j), so a degree-d hub leaves its
    group task as O(d²/chunk) bytes across (d/chunk)²/2 rows instead of
    d²/2 wedges from one task.  A downstream small-batch ``map_batches``
    expands each chunk pair into ≤ chunk² wedges AND probes the broadcast
    edge-key set in the same kernel, so per-task compute is bounded by
    batch_size × chunk² and the wedge stream never materializes — only
    triangles leave the stage.

    Input: undirected edges with a < b per row (dedup not required).
    Output: one row per triangle (a < b < c)."""
    import pandas as pd

    import ray as _ray

    def canon(t: pa.Table) -> pa.Table:
        x = t.column(a_col).cast(pa.int64())
        y = t.column(b_col).cast(pa.int64())
        lo, hi = pc.min_element_wise(x, y), pc.max_element_wise(x, y)
        return pa.table({"a": lo, "b": hi})

    edges = edges_ds.map_batches(canon, batch_format="pyarrow")
    # dedup the edge set once (pair-keyed groupby), reuse for both sides;
    # callers whose edge stream is unique by construction (the fuzzy-join
    # emits every pair exactly once) pass assume_unique=True and skip the
    # shuffle — at sandbox scale the two-key groupby costs more than the
    # whole wedge check
    if not assume_unique:
        edges = edges.groupby(["a", "b"]).count().map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        )
    edges = edges.materialize()

    def chunk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pivot = the SMALLER endpoint of both wedge legs (a < b and a < c),
        # so each triangle is generated by exactly one pivot: its min node.
        # Neighbor slices travel as little-endian int64 BINARY blobs, not
        # arrow lists — binary cells stay row-aligned through every block
        # coalesce/slice the batcher does downstream.
        nbrs = np.sort(g["b"].to_numpy(dtype=np.int64))
        if len(nbrs) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "nb_i": pd.Series([], dtype=object),
                    "nb_j": pd.Series([], dtype=object),
                    "same": pd.Series([], dtype=bool),
                    "w": pd.Series([], dtype=np.int64),
                }
            )
        parts = [nbrs[s : s + chunk].tobytes() for s in range(0, len(nbrs), chunk)]
        rows_i, rows_j, same, w = [], [], [], []
        for i in range(len(parts)):
            for j in range(i, len(parts)):
                rows_i.append(parts[i])
                rows_j.append(parts[j])
                same.append(i == j)
                w.append((len(parts[i]) // 8) * (len(parts[j]) // 8))
        return pd.DataFrame(
            {
                "a": np.full(len(rows_i), g["a"].iat[0], dtype=np.int64),
                "nb_i": pd.Series(rows_i, dtype=object),
                "nb_j": pd.Series(rows_j, dtype=object),
                "same": np.array(same, dtype=bool),
                "w": np.array(w, dtype=np.int64),
            }
        )

    pair_ds = edges.groupby("a").map_groups(chunk_pairs, batch_format="pandas")
    # closure check: wedge (b, c) closes iff it is an edge — broadcast the
    # (deduped, pair-hashed) edge key set when small, else a key-hash
    # co-partition; here the edge set is output-scale, so a sorted-key
    # broadcast probe suffices (the dedup family's standard filter shape)
    from ..functions.hashing import xxh64_u64

    def pair_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return xxh64_u64(x.view(np.uint64), seed=23) ^ xxh64_u64(y.view(np.uint64) + np.uint64(3), seed=29)

    keys = []
    for t in edges.iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            keys.append(pair_key(t.column("a").to_numpy(zero_copy_only=False).astype(np.int64),
                                 t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)))
    edge_keys = np.sort(np.concatenate(keys)) if keys else np.empty(0, np.uint64)
    keys_ref = _ray.put(edge_keys)

    def expand_and_close(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
        ks = _ray.get(keys_ref)
        if t.num_rows == 0 or len(ks) == 0:
            return empty
        out_a, out_b, out_c = [], [], []
        pivots = t.column("a").to_numpy(zero_copy_only=False)
        sames = t.column("same").to_numpy(zero_copy_only=False)
        col_i, col_j = t.column("nb_i"), t.column("nb_j")
        for r in range(t.num_rows):
            ni = np.frombuffer(col_i[r].as_py(), dtype=np.int64)
            nj = np.frombuffer(col_j[r].as_py(), dtype=np.int64)
            if sames[r]:
                ii, jj = np.triu_indices(len(ni), k=1)
                b, c = ni[ii], nj[jj]
            else:
                # neighbor list was sorted before chunking: all of nb_i <
                # all of nb_j, so the full cross product is already b < c
                b = np.repeat(ni, len(nj))
                c = np.tile(nj, len(ni))
            if not len(b):
                continue
            k = pair_key(b, c)
            pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
            m = ks[pos] == k
            if m.any():
                out_a.append(np.full(int(m.sum()), pivots[r], dtype=np.int64))
                out_b.append(b[m])
                out_c.append(c[m])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "c": pa.array(np.concatenate(out_c)),
            }
        )

    # Weight-aware two-tier batching: per-task wedge work is bounded by
    # batch_size × max-row-weight in BOTH tiers, but the LIGHT tier (the
    # overwhelming majority — pivots with small neighbor lists) rides in
    # big batches so a dense graph doesn't shatter into thousands of
    # 10 ms tasks (the fixed-batch_size=8 version spent 2× the wedge
    # compute on task overhead at sf0.1), while HEAVY chunk pairs (hub
    # pivots, weight up to chunk²) stay at batch_size=4 so no straggler
    # exceeds ~4·chunk² wedge checks.
    pair_ds = pair_ds.materialize()  # chunk-pair-row-sized, consumed twice
    light_thr = 65536

    def _light(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("w"), light_thr))

    def _heavy(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("w"), light_thr))

    light = pair_ds.map_batches(_light, batch_format="pyarrow").map_batches(
        expand_and_close, batch_format="pyarrow", batch_size=512
    )
    heavy = pair_ds.map_batches(_heavy, batch_format="pyarrow").map_batches(
        expand_and_close, batch_format="pyarrow", batch_size=4
    )
    return light.union(heavy)


def bfs_layers(edges_ds, source=None, src_col: str = "src", dst_col: str = "dst", max_rounds: int = 32):
    """Single-source BFS layers over a directed edge Dataset — the
    frontier-expansion primitive at the heart of the crawler itself,
    exposed as a graph query (layer = minimum hop distance).

    Shape: the edge table is materialized once; each round is ONE
    is_in-filtered streaming pass (the current frontier broadcast into
    every task — frontier and visited set are node-table-sized driver
    state, the same stance as kcore's peel and CC's label table).  Rounds
    = graph eccentricity from the source, each touching only edges out
    of the frontier.  Works for any node dtype (strings here).

    Returns pa.Table(node, dist) for every node reachable from
    ``source`` (default: the minimum src value, matching the SQL twin's
    deterministic seed)."""
    edges = edges_ds.materialize()
    if source is None:
        mins = [
            b
            for b in edges.map_batches(
                lambda b: pa.table({"m": pa.array([pc.min(b.column(src_col)).as_py()])}),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        cands = [m for t in mins for m in t.column("m").to_pylist() if m is not None]
        if not cands:
            return pa.table({"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())})
        source = min(cands)
    visited = {source: 0}
    frontier = [source]
    for r in range(1, max_rounds + 1):
        fr = pa.array(frontier)

        def step(b: pa.Table, fr=fr) -> pa.Table:
            hit = b.filter(pc.is_in(b.column(src_col), value_set=fr))
            return pa.table({"d": pc.unique(hit.column(dst_col))})

        nxt = set()
        for t in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            nxt.update(t.column("d").to_pylist())
        frontier = sorted(n for n in nxt if n not in visited)
        if not frontier:
            break
        for n in frontier:
            visited[n] = r
    nodes = sorted(visited)
    return pa.table(
        {
            "node": pa.array(nodes),
            "dist": pa.array([visited[n] for n in nodes], pa.int64()),
        }
    )


def personalized_pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 6,
    scale: int = 1_000_000,
    d_num: int = 85,
    d_den: int = 100,
    n_seeds: int = 4,
):
    """Integer-exact personalized PageRank (topic-sensitive PageRank,
    Haveliwala 2002) over a directed edge Dataset → pa.Table(node,
    score, is_seed).  The restart vector concentrates on ``n_seeds``
    trusted seed nodes — deterministically the top-``n_seeds`` by
    (out-degree DESC, node ASC), the "good hub" seed rule — making this
    the focused-crawl priority signal (reference analog: the frontier
    ordering gestured at in SURVEY §2.1 S1, but importance-directed).

    Update rule, every intermediate an exact integer (trunc division)
    so a SQL engine replays it bit-for-bit in HUGEINT::

        w_k[u]   = r_k[u] * d_num // (d_den * outdeg[u])
        raw[v]   = Σ_in w_k[u]
        r_{k+1}[v] = bonus[v] + raw[v]
        bonus[v] = (d_den - d_num) * scale // (d_den * n_seeds)  (seeds)
        r_0 = bonus

    Dangling mass is dropped, not redistributed (documented contract:
    scores are a lower bound that preserves ranking among reachable
    nodes; redistribution would make every step data-dependent float
    division).

    Scale posture mirrors :func:`hits`: the edge stream materializes
    once in the object store and never reaches the driver; each
    iteration is ONE join of the edge stream against the node→share
    table plus ONE per-destination grouped int sum; driver state is the
    node-table only.
    """

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src_col), "dst": b.column(dst_col)})

    e = edges_ds.map_batches(slim, batch_format="pyarrow").materialize()

    deg: dict = {}
    universe: set = set()
    for b in e.groupby("src").count().iter_batches(batch_format="pyarrow"):
        for n, c in zip(b.column("src").to_pylist(), b.column("count()").to_pylist()):
            deg[n] = int(c)
            universe.add(n)
    for b in e.groupby("dst").count().iter_batches(batch_format="pyarrow"):
        universe.update(b.column("dst").to_pylist())
    universe.discard(None)
    if not universe:
        empty = pa.array([], pa.int64())
        return pa.table({"node": pa.array([], pa.string()), "score": empty, "is_seed": empty})
    nodes = sorted(universe)
    idx = {n: i for i, n in enumerate(nodes)}
    node_arr = pa.array(nodes)

    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:n_seeds]
    bonus = (d_den - d_num) * scale // (d_den * len(seeds))
    is_seed = [1 if n in set(seeds) else 0 for n in nodes]
    r = [bonus * s for s in is_seed]

    for _ in range(iters):
        nz = [i for i in range(len(nodes)) if r[i] > 0 and deg.get(nodes[i], 0) > 0]
        if nz:
            contrib = pa.table(
                {
                    "src": pc.take(node_arr, pa.array(nz, pa.int64())),
                    "w": pa.array(
                        [r[i] * d_num // (d_den * deg[nodes[i]]) for i in nz], pa.int64()
                    ),
                }
            )
            summed = join(e, contrib, on="src", how="inner").groupby("dst").sum("w")
            raw = [0] * len(nodes)
            for b in summed.iter_batches(batch_format="pyarrow"):
                for n, s in zip(b.column("dst").to_pylist(), b.column("sum(w)").to_pylist()):
                    raw[idx[n]] = int(s)
        else:
            raw = [0] * len(nodes)
        r = [bonus * s + w for s, w in zip(is_seed, raw)]

    return pa.table(
        {
            "node": node_arr,
            "score": pa.array(r, pa.int64()),
            "is_seed": pa.array(is_seed, pa.int64()),
        }
    )


def reciprocity(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """Directed-graph reciprocity over the host link graph — the
    link-economy health metric (what fraction of host→host links are
    mutual; near-0 suggests scraped/spam link farms, near-1 a
    syndication clique).  One row: (n_edges, n_self_loops,
    n_reciprocal, reciprocity_micro), where n_edges counts DISTINCT
    non-self directed edges and n_reciprocal those whose reverse edge
    exists.

    Shape: distinct edges via ONE composite-key groupby; the reverse
    probe is a key-partitioned self-join on the flipped key through the
    size-aware join front door — the edge set never folds on the
    driver."""
    sep = "\x1f"

    def kern(b: pa.Table) -> pa.Table:
        s = b.column(src_col)
        t = b.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return pa.table(
            {
                "key": pc.binary_join_element_wise(s, pa.scalar(sep), t, ""),
                "rkey": pc.binary_join_element_wise(t, pa.scalar(sep), s, ""),
                "is_loop": pc.cast(pc.equal(s, t), pa.int64()),
            }
        )

    d = (
        edges_ds.map_batches(kern, batch_format="pyarrow")
        .groupby(["key", "rkey", "is_loop"])
        .count()
    )

    def strip(b: pa.Table) -> pa.Table:
        return pa.table(
            {"key": b.column("key"), "rkey": b.column("rkey"), "is_loop": b.column("is_loop")}
        )

    d = d.map_batches(strip, batch_format="pyarrow").materialize()

    def only(v: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("is_loop"), v))

        return f

    n_loops = d.map_batches(only(1), batch_format="pyarrow").count()
    nonloop = d.map_batches(only(0), batch_format="pyarrow").materialize()
    n_edges = nonloop.count()

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("key")})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("rkey")})

    n_rec = join(
        nonloop.map_batches(fwd, batch_format="pyarrow"),
        nonloop.map_batches(rev, batch_format="pyarrow"),
        on="key",
        how="inner",
    ).count()

    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_self_loops": pa.array([n_loops], pa.int64()),
            "n_reciprocal": pa.array([n_rec], pa.int64()),
            "reciprocity_micro": pa.array(
                [n_rec * 1_000_000 // max(n_edges, 1)], pa.int64()
            ),
        }
    )


def opic(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 6,
    scale: int = 1_000_000,
):
    """Integer-exact OPIC — On-line Page Importance Computation
    (Abiteboul, Preda & Cobena, WWW 2003), the importance estimator
    designed to drive ADAPTIVE CRAWL ORDERING: unlike PageRank it
    converges while the crawl is still running, so the frontier can be
    prioritized by it mid-flight (reference analog: the priority the
    reference's DFS ordering gestures at, SURVEY §2.1 S1 — here made
    importance-directed the way a web-scale frontier actually is).

    Synchronous integer variant, every intermediate exact (trunc
    division) so a SQL engine replays it bit-for-bit in HUGEINT::

        C_0[u] = scale                      (every node starts with cash)
        H_0[u] = 0
        w_k[u]   = C_k[u] // outdeg[u]      (u with outdeg>0, C>0)
        raw[v]   = Σ_in w_k[u]
        H_{k+1}[u] = H_k[u] + C_k[u]        (bank the full cash held)
        C_{k+1}[v] = raw[v]

    score = H + C after ``iters`` rounds.  Trunc-div remainders and
    dangling-node cash are dropped, not redistributed (same documented
    contract as :func:`personalized_pagerank`: scores are a lower bound
    preserving relative order among linked nodes; redistribution would
    make every step data-dependent float division).

    Scale posture mirrors :func:`personalized_pagerank`: the edge
    stream materializes ONCE in the object store and never reaches the
    driver; each round is ONE join of the edge stream against the
    node→share table plus ONE per-destination grouped int sum; driver
    state is the node-bounded cash/history table only (the host graph —
    metadata-scale next to the crawl itself).
    """

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src_col), "dst": b.column(dst_col)})

    e = edges_ds.map_batches(slim, batch_format="pyarrow").materialize()

    deg: dict = {}
    universe: set = set()
    for b in e.groupby("src").count().iter_batches(batch_format="pyarrow"):
        for n, c in zip(b.column("src").to_pylist(), b.column("count()").to_pylist()):
            deg[n] = int(c)
            universe.add(n)
    for b in e.groupby("dst").count().iter_batches(batch_format="pyarrow"):
        universe.update(b.column("dst").to_pylist())
    universe.discard(None)
    if not universe:
        empty = pa.array([], pa.int64())
        return pa.table(
            {"node": pa.array([], pa.string()), "cash": empty, "history": empty, "score": empty}
        )
    nodes = sorted(universe)
    idx = {n: i for i, n in enumerate(nodes)}
    node_arr = pa.array(nodes)

    cash = [scale] * len(nodes)
    hist = [0] * len(nodes)

    for _ in range(iters):
        nz = [i for i in range(len(nodes)) if cash[i] > 0 and deg.get(nodes[i], 0) > 0]
        if nz:
            contrib = pa.table(
                {
                    "src": pc.take(node_arr, pa.array(nz, pa.int64())),
                    "w": pa.array([cash[i] // deg[nodes[i]] for i in nz], pa.int64()),
                }
            )
            summed = join(e, contrib, on="src", how="inner").groupby("dst").sum("w")
            raw = [0] * len(nodes)
            for b in summed.iter_batches(batch_format="pyarrow"):
                for n, s in zip(b.column("dst").to_pylist(), b.column("sum(w)").to_pylist()):
                    raw[idx[n]] = int(s)
        else:
            raw = [0] * len(nodes)
        hist = [h + c for h, c in zip(hist, cash)]
        cash = raw

    return pa.table(
        {
            "node": node_arr,
            "cash": pa.array(cash, pa.int64()),
            "history": pa.array(hist, pa.int64()),
            "score": pa.array([h + c for h, c in zip(hist, cash)], pa.int64()),
        }
    )


def label_propagation(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
):
    """Deterministic synchronous label-propagation community detection
    (Raghavan et al. 2007, made exact): labels start as own node id;
    each round every node adopts the label with the greatest total
    incident edge weight among its neighbors, ties broken by MIN label
    — integer weights and a total tie order make every round
    bit-replayable by a SQL engine (no randomized visit order).  The
    crawl use: host communities = candidate mirror farms / link cliques
    for the spam-gate and budget governor (finer than connected
    components, which merge everything touching a bridge).

    Graph contract: symmetrized, self-loops dropped, weight = parallel
    edge multiplicity (both directions summed).  Fixed ``iters`` rounds
    (no convergence test — iteration count must not be data-dependent
    for the oracle).

    Scale posture mirrors :func:`personalized_pagerank`: the
    symmetrized weighted edge table is built by ONE composite groupby
    and materializes once in the object store; each round is ONE join
    of that stream against the node→label table plus ONE (node, label)
    grouped weight sum; driver state is node-bounded (the host-graph
    label table), grouped rows are edge-bounded.
    """

    def sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col)
        t = b.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        keep = pc.invert(pc.equal(s, t))
        s, t = s.filter(keep), t.filter(keep)
        return pa.table(
            {
                "u": pa.concat_arrays([s.cast(pa.string()), t.cast(pa.string())]),
                "v": pa.concat_arrays([t.cast(pa.string()), s.cast(pa.string())]),
            }
        )

    pairs = edges_ds.map_batches(sym, batch_format="pyarrow").groupby(["u", "v"]).count()

    def wcol(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": b.column("u"),
                "v": b.column("v"),
                "w": pc.cast(b.column("count()"), pa.int64()),
            }
        )

    e = pairs.map_batches(wcol, batch_format="pyarrow").materialize()

    universe: set = set()
    for b in e.iter_batches(batch_format="pyarrow"):
        universe.update(b.column("u").to_pylist())
    universe.discard(None)
    if not universe:
        return pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())})
    nodes = sorted(universe)
    idx = {n: i for i, n in enumerate(nodes)}
    node_arr = pa.array(nodes)
    label = list(nodes)

    for _ in range(iters):
        contrib = pa.table({"u": node_arr, "lab": pa.array(label)})
        summed = (
            join(e, contrib, on="u", how="inner").groupby(["v", "lab"]).sum("w")
        )
        # per-node argmax with (weight DESC, label ASC) total order
        best: dict = {}
        for b in summed.iter_batches(batch_format="pyarrow"):
            for v, lab, w in zip(
                b.column("v").to_pylist(),
                b.column("lab").to_pylist(),
                b.column("sum(w)").to_pylist(),
            ):
                w = int(w)
                cur = best.get(v)
                if cur is None or (w, _neg_str(lab)) > (cur[0], _neg_str(cur[1])):
                    best[v] = (w, lab)
        label = [best[n][1] if n in best else label[idx[n]] for n in nodes]

    return pa.table({"node": node_arr, "label": pa.array(label)})


class _neg_str:
    """Reverses string comparison so (w, _neg_str(lab)) sorts by weight
    DESC then label ASC under Python's natural tuple max()."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other: "_neg_str") -> bool:
        return self.s > other.s

    def __gt__(self, other: "_neg_str") -> bool:
        return self.s < other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _neg_str) and self.s == other.s


def modularity(edges_ds, labels: pa.Table, src_col: str = "src", dst_col: str = "dst"):
    """Exact-integer Newman modularity of a node partition over the
    symmetrized simple graph (the quality score for
    :func:`label_propagation`'s communities — Q near 0 means the
    partition explains nothing, Q ≳ 0.3 genuine structure):

        Q = Σ_c [ e_c/m − (d_c / 2m)² ]
        Q_micro = 10⁶ · Σ_c (4·m·e_c − d_c²) // (4·m²)

    with e_c = intra-community edge count, d_c = total degree of the
    community, m = total edge count — ONE trunc division at the very
    end, every intermediate an exact integer, so a SQL engine replays
    it in HUGEINT.

    Graph contract matches label_propagation: symmetrized, self-loops
    dropped, parallel edges collapsed (simple graph).  Output one row:
    (m, n_communities, q_micro).

    Shape: the (u, v) dedup groupby builds the simple edge set once;
    intra flags and degrees come from TWO label joins against the
    node-bounded label table; the per-community fold is
    community-bounded."""
    lab = {
        n: l
        for n, l in zip(labels.column("node").to_pylist(), labels.column("label").to_pylist())
    }

    def sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col)
        t = b.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        keep = pc.invert(pc.equal(s, t))
        s, t = s.filter(keep), t.filter(keep)
        lo = pc.min_element_wise(s.cast(pa.string()), t.cast(pa.string()))
        hi = pc.max_element_wise(s.cast(pa.string()), t.cast(pa.string()))
        return pa.table({"u": lo, "v": hi})

    simple = edges_ds.map_batches(sym, batch_format="pyarrow").groupby(["u", "v"]).count()

    m = 0
    e_c: dict = {}
    d_c: dict = {}
    for b in simple.iter_batches(batch_format="pyarrow"):
        for u, v in zip(b.column("u").to_pylist(), b.column("v").to_pylist()):
            m += 1
            lu, lv = lab.get(u), lab.get(v)
            d_c[lu] = d_c.get(lu, 0) + 1
            d_c[lv] = d_c.get(lv, 0) + 1
            if lu == lv:
                e_c[lu] = e_c.get(lu, 0) + 1
    if m == 0:
        return pa.table(
            {
                "m": pa.array([0], pa.int64()),
                "n_communities": pa.array([0], pa.int64()),
                "q_micro": pa.array([0], pa.int64()),
            }
        )
    num = sum(4 * m * e_c.get(c, 0) - d * d for c, d in d_c.items())
    q_micro = 1_000_000 * num // (4 * m * m)
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "n_communities": pa.array([len(d_c)], pa.int64()),
            "q_micro": pa.array([q_micro], pa.int64()),
        }
    )
