"""Distributed connected components (min-label propagation) vs the
driver union-find — identical component partition on chains, stars,
cliques, self-loops, duplicate edges, and random graphs."""

import numpy as np
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.graph import components_match_unionfind, connected_components


def _edges(pairs):
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


def test_cc_basic_shapes():
    # chain (diameter > 1 forces multiple propagation rounds), star,
    # clique, self-loop, duplicate edge, two components
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),        # chain → label 1
             (10, 11), (10, 12), (10, 13),          # star → label 10
             (20, 21), (21, 20), (20, 20),          # dup + self-loop → 20
             (30, 31), (31, 32), (30, 32)]          # triangle → 30
    out = connected_components(ray.data.from_arrow(_edges(pairs))).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert all(got[n] == 1 for n in (1, 2, 3, 4, 5))
    assert all(got[n] == 10 for n in (10, 11, 12, 13))
    assert all(got[n] == 20 for n in (20, 21))
    assert all(got[n] == 30 for n in (30, 31, 32))
    assert components_match_unionfind(_edges(pairs))


def test_cc_long_chain_converges():
    # 300-node chain — diameter far above the default max_rounds=64, so
    # this only passes because pointer jumping makes each join round
    # cover 2^k hops (plain one-hop min propagation would silently stop
    # at 64 hops and mislabel the tail)
    pairs = [(i, i + 1) for i in range(300)]
    out = connected_components(ray.data.from_arrow(_edges(pairs))).to_pandas()
    assert (out["label"] == 0).all() and len(out) == 301


def test_cc_raises_on_round_exhaustion():
    import pytest

    # A PERMUTED path: with ids shuffled, labels don't form chains the
    # pointer-jumping can collapse in one round (the sequential path
    # [(i, i+1)] DOES converge in round 1 via jumping, so it no longer
    # raises — that's the settled-at-max_rounds fix working).  Verified
    # by simulation: this graph still changes labels through round 4.
    perm = np.random.default_rng(0).permutation(40)
    pairs = list(zip(perm[:-1].tolist(), perm[1:].tolist()))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ray.data.from_arrow(_edges(pairs)), max_rounds=1)


def test_cc_settled_exactly_at_max_rounds_returns():
    # A graph whose labels settle in EXACTLY max_rounds must return the
    # correct answer, not raise: convergence detection normally costs one
    # extra change-free round, and the post-loop verification round saves
    # the result (review finding r3).
    pairs = [(0, 1)]
    out = connected_components(ray.data.from_arrow(_edges(pairs)), max_rounds=1).to_pandas()
    assert dict(zip(out["node"], out["label"])) == {0: 0, 1: 0}


def test_cc_random_graphs_match_unionfind():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(10, 120))
        m = int(rng.integers(5, 200))
        pairs = list(zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()))
        assert components_match_unionfind(_edges(pairs)), (trial, n, m)


def test_cc_on_minhash_pairs():
    """End-to-end: components of the real near-dup pair output match the
    union-find the corpus dedup uses."""
    from fscrawler_ray.pipelines.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs("/root/testdata/sf0.001")
    if pairs.num_rows:
        assert components_match_unionfind(pairs)


def _ref_pagerank(src, dst, d=0.85, max_iter=60):
    import numpy as np

    nodes = sorted(set(src) | set(dst))
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s in src:
        outdeg[ix[s]] += 1
    M = np.zeros((n, n))
    for s, t in zip(src, dst):
        M[ix[t], ix[s]] += 1.0 / outdeg[ix[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return nodes, r


def test_pagerank_matches_dense_reference():
    import numpy as np
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(5)
    src = rng.integers(0, 30, 150).tolist()
    dst = rng.integers(0, 30, 150).tolist()
    # a dangling node (only incoming) and an isolated-emitter pattern
    src += [100]
    dst += [101]
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(5)
    got = pagerank(e, max_iter=60).to_pandas()
    nodes, want = _ref_pagerank(src, dst, max_iter=60)
    assert got["node"].tolist() == nodes
    assert np.allclose(got["rank"].to_numpy(), want, atol=1e-9)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_star_center_wins():
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import pagerank

    # spokes all point at the center
    e = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 2, 3, 4, 5], pa.int64()), "dst": pa.array([0] * 5, pa.int64())})
    )
    r = pagerank(e).to_pandas().set_index("node")["rank"]
    assert r[0] > r[1] * 3


def test_triangles_wedge_check(ray_session):
    import ray as _ray

    from fscrawler_ray.pipelines.graph import triangles

    # K4 on {1,2,3,4} (4 triangles) + a dangling path 4-5-6 (none) +
    # duplicate and reversed edges that must dedup/canonicalize away
    edges = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, 2, 3, 4, 5, 3, 2], pa.int64()),
            "b": pa.array([2, 3, 4, 3, 4, 4, 5, 6, 1, 1], pa.int64()),
        }
    )
    out = triangles(_ray.data.from_arrow(edges)).to_pandas()
    got = sorted(map(tuple, out[["a", "b", "c"]].itertuples(index=False)))
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_triangles_hub_pivot_partitioned(ray_session):
    """The curse-of-the-last-reducer fixture: one hub adjacent to 4,000
    leaves. With chunk=256 the hub's group task emits only chunk-pair
    rows (16×17/2 = 136 rows of ≤256 ids), never the 8M wedges; planted
    leaf-leaf edges close exactly the expected triangles."""
    import ray as _ray

    from fscrawler_ray.pipelines.graph import triangles

    n = 4000
    hub_edges = [(0, i) for i in range(1, n + 1)]
    # close a few wedges, incl. ones that straddle chunk boundaries
    closers = [(1, 2), (255, 258), (1024, 3999), (5, 3000)]
    a, b = zip(*(hub_edges + closers))
    edges = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    out = triangles(_ray.data.from_arrow(edges), chunk=256).to_pandas()
    got = sorted(map(tuple, out[["a", "b", "c"]].itertuples(index=False)))
    assert got == sorted((0,) + c for c in closers)


def test_kcore_matches_reference_peeling(ray_session):
    """Distributed peel ≡ driver-side peeling truth on random graphs,
    including string node ids; fixed-rounds twin ≡ fixpoint path."""
    import pandas as pd

    from fscrawler_ray.pipelines.graph import kcore, kcore_reference

    rng = np.random.default_rng(7)
    for trial in range(3):
        n, m = 60, 150
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        edges = pa.table(
            {
                "src": pa.array([f"n{x}" for x in a]),
                "dst": pa.array([f"n{x}" for x in b]),
            }
        )
        for k in (2, 3, 4):
            got = kcore(ray.data.from_arrow(edges), k=k).to_pandas()
            ref = kcore_reference(edges, k)
            assert dict(zip(got["node"], got["deg"])) == ref, (trial, k)
            fixed = kcore(ray.data.from_arrow(edges), k=k, rounds=16).to_pandas()
            pd.testing.assert_frame_equal(got, fixed)


def test_kcore_peels_pendant_chain_from_clique(ray_session):
    """K5 with a long pendant chain: the chain peels away over many
    rounds, the clique survives with degree 4."""
    from fscrawler_ray.pipelines.graph import kcore

    kq = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("c0", "p0")] + [(f"p{i}", f"p{i+1}") for i in range(20)]
    edges = pa.table(
        {
            "src": pa.array([x for x, _ in kq + chain]),
            "dst": pa.array([y for _, y in kq + chain]),
        }
    )
    got = kcore(ray.data.from_arrow(edges), k=2).to_pandas()
    assert sorted(got["node"]) == [f"c{i}" for i in range(5)]
    assert (got["deg"] == 4).all()
    # empty core comes back typed, not null
    empty = kcore(ray.data.from_arrow(edges), k=5).to_pandas()
    assert len(empty) == 0 and empty["deg"].dtype == np.int64


def test_bfs_layers_planted():
    """BFS layers match hand-computed hop distances on a planted digraph;
    unreachable nodes are absent; cycles terminate."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.pipelines.graph import bfs_layers

    edges = pa.table(
        {
            "src": pa.array(["a", "a", "b", "c", "d", "z"]),
            "dst": pa.array(["b", "c", "d", "d", "a", "q"]),  # cycle a-b-d-a
        }
    )
    out = bfs_layers(ray.data.from_arrow(edges), source="a").to_pandas().set_index("node")["dist"]
    assert out.to_dict() == {"a": 0, "b": 1, "c": 1, "d": 2}
    # default source = min src value ("a") gives the same layers
    out2 = bfs_layers(ray.data.from_arrow(edges)).to_pandas().set_index("node")["dist"]
    assert out2.to_dict() == out.to_dict()


def test_hits_bipartite_hubs_vs_authorities():
    """Planted hub/authority structure: pure hubs (only out-links) must
    end with authority 0; pure authorities (only in-links) with hub 0;
    the best-connected node of each side holds the max score (scale)."""
    from fscrawler_ray.pipelines.graph import hits, hits_reference

    # hubs h1..h3 point at authorities a1..a2; h1 points at both (best
    # hub), a1 is cited by all three (best authority)
    pairs = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a1")]
    edges = pa.table(
        {
            "src": pa.array([p[0] for p in pairs]),
            "dst": pa.array([p[1] for p in pairs]),
        }
    )
    out = hits(ray.data.from_arrow(edges)).to_pandas()
    got = {r["node"]: (r["hub"], r["authority"]) for _, r in out.iterrows()}
    assert got == hits_reference(edges)
    assert got["h1"][0] == 1_000_000 and got["h1"][1] == 0
    assert got["a1"][1] == 1_000_000 and got["a1"][0] == 0
    assert got["h2"][0] < got["h1"][0]
    assert got["a2"][1] < got["a1"][1]


def test_hits_random_digraph_matches_reference_and_block_split():
    """Random digraphs: distributed == adjacency-loop reference with the
    same integer rule, and invariant to how edge blocks are split."""
    from fscrawler_ray.pipelines.graph import hits, hits_reference

    rng = np.random.default_rng(7)
    src = rng.integers(0, 25, 160)
    dst = rng.integers(0, 25, 160)
    edges = pa.table(
        {
            "src": pa.array([f"n{int(s)}" for s in src]),
            "dst": pa.array([f"n{int(d)}" for d in dst]),
        }
    )
    ref = hits_reference(edges)
    for blocks in (1, 4):
        ds = ray.data.from_arrow(edges)
        if blocks > 1:
            ds = ds.repartition(blocks)
        out = hits(ds).to_pandas()
        got = {r["node"]: (r["hub"], r["authority"]) for _, r in out.iterrows()}
        assert got == ref


def test_personalized_pagerank_integer_exact_and_seed_locality():
    """PPR: (1) the distributed run matches a driver-side replay of the
    exact integer recurrence; (2) restart mass keeps nodes near the seed
    ranked above structurally similar nodes far from it."""
    import numpy as np
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import personalized_pagerank

    # a 4-cycle (a0..a3) bridged into a second 4-cycle (b0..b3) from a3 —
    # three hops downstream of the seed; the seed rule (top out-degree,
    # name asc) lands on a0 (outdeg 2, ties with a3 broken by name)
    edges = [
        ("a0", "a1"), ("a0", "a2"), ("a1", "a2"), ("a2", "a3"), ("a3", "a0"),
        ("a3", "b0"),
        ("b0", "b1"), ("b1", "b2"), ("b2", "b3"), ("b3", "b0"),
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    out = personalized_pagerank(
        ray.data.from_arrow(t), iters=6, n_seeds=1
    ).to_pandas().set_index("node")

    assert out.loc["a0", "is_seed"] == 1 and out["is_seed"].sum() == 1

    # driver replay of the same integer recurrence
    nodes = sorted(set(s for s, _ in edges) | set(d for _, d in edges))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    bonus = 15 * 1_000_000 // 100
    r = {n: bonus if n == "a0" else 0 for n in nodes}
    for _ in range(6):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            if r[s] > 0:
                raw[d] += r[s] * 85 // (100 * deg[s])
        r = {n: (bonus if n == "a0" else 0) + raw[n] for n in nodes}
    for n in nodes:
        assert int(out.loc[n, "score"]) == r[n], n

    # locality: the a-cycle (seed side) outranks the b-cycle mirror nodes
    assert out.loc["a1", "score"] > out.loc["b1", "score"]
    assert out.loc["a0", "score"] > out.loc["b0", "score"]


def test_opic_integer_exact_and_hub_importance():
    """OPIC: (1) the distributed run matches a driver-side replay of the
    exact integer recurrence (cash/history/score); (2) a node every
    other node links to accumulates the most history (importance);
    (3) total banked+held mass never exceeds the injected mass
    (trunc-div drops are one-directional)."""
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import opic

    # hub h receives a link from every spoke; spokes form a ring so
    # nobody dangles except the hub (its cash drains by design)
    spokes = [f"s{i}" for i in range(5)]
    edges = [(s, "h") for s in spokes] + [
        (spokes[i], spokes[(i + 1) % 5]) for i in range(5)
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t)
        if blocks > 1:
            ds = ds.repartition(blocks)
        out = opic(ds, iters=6).to_pandas().set_index("node")

        # driver replay of the same integer recurrence
        nodes = sorted(set(s for s, _ in edges) | set(d for _, d in edges))
        deg: dict = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        cash = {n: 1_000_000 for n in nodes}
        hist = {n: 0 for n in nodes}
        for _ in range(6):
            raw = {n: 0 for n in nodes}
            for s, d in edges:
                if cash[s] > 0 and deg.get(s, 0) > 0:
                    raw[d] += cash[s] // deg[s]
            hist = {n: hist[n] + cash[n] for n in nodes}
            cash = raw
        for n in nodes:
            assert int(out.loc[n, "cash"]) == cash[n], n
            assert int(out.loc[n, "history"]) == hist[n], n
            assert int(out.loc[n, "score"]) == hist[n] + cash[n], n

        # the universally-linked hub outranks every spoke
        assert all(out.loc["h", "score"] > out.loc[s, "score"] for s in spokes)
        # mass conservation upper bound: nothing is created
        assert int(out["score"].sum()) <= 1_000_000 * len(nodes) * 7


def test_label_propagation_two_cliques_and_replay():
    """Label propagation: (1) two 4-cliques joined by one bridge edge
    resolve to exactly two communities split along the bridge; (2) the
    distributed run matches a driver-side replay of the deterministic
    (weight DESC, label ASC) argmax recurrence; (3) block-count
    invariant."""
    import itertools

    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import label_propagation

    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a0", "b0")]
        + [("a1", "a1")]  # self-loop must be ignored
    )
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )

    # driver replay of the exact recurrence
    sym: dict = {}
    for s, d in edges:
        if s == d:
            continue
        sym[(s, d)] = sym.get((s, d), 0) + 1
        sym[(d, s)] = sym.get((d, s), 0) + 1
    nodes = sorted(set(u for u, _ in sym))
    lab = {n: n for n in nodes}
    for _ in range(4):
        nxt = {}
        for v in nodes:
            acc: dict = {}
            for (u, vv), w in sym.items():
                if vv == v:
                    acc[lab[u]] = acc.get(lab[u], 0) + w
            best = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        lab = nxt

    for blocks in (1, 3):
        ds = ray.data.from_arrow(t)
        if blocks > 1:
            ds = ds.repartition(blocks)
        out = label_propagation(ds, iters=4).to_pandas().set_index("node")
        got = {n: out.loc[n, "label"] for n in out.index}
        assert got == lab
        # the planted structure: each clique is one community
        assert len({got[n] for n in a}) == 1
        assert len({got[n] for n in b}) == 1
        assert got["a1"] != got["b1"]


def test_opic_budget_conservation_and_proportionality():
    """Largest-remainder apportionment: Σ quota == budget exactly; at
    most one bonus slot per host; quotas track score proportions; ties
    in remainder break by host name."""
    import pyarrow as pa

    from fscrawler_ray.pipelines.crawl_report import opic_budget

    scores = pa.table(
        {
            "host": pa.array(["a", "b", "c", "d"]),
            "score": pa.array([3, 3, 3, 1], pa.int64()),
        }
    )
    out = opic_budget(scores, budget=7).to_pandas().set_index("host")
    assert int(out["quota"].sum()) == 7
    assert out["bonus"].isin([0, 1]).all()
    # floors: a,b,c -> 21//10=2, d -> 7//10=0; extra = 7-6 = 1 slot;
    # remainders a,b,c = 1, d = 7 -> d gets the bonus
    assert out.loc["d", "quota"] == 1 and out.loc["d", "bonus"] == 1
    assert all(out.loc[h, "quota"] == 2 for h in "abc")

    # remainder tie broken by host ASC: equal scores, budget not divisible
    scores2 = pa.table(
        {"host": pa.array(["x", "y", "z"]), "score": pa.array([1, 1, 1], pa.int64())}
    )
    out2 = opic_budget(scores2, budget=5).to_pandas().set_index("host")
    assert int(out2["quota"].sum()) == 5
    assert out2.loc["x", "quota"] == 2 and out2.loc["y", "quota"] == 2
    assert out2.loc["z", "quota"] == 1


def test_anchor_text_planted_terms():
    """Anchor aggregation: planted link targets produce the expected
    per-host top-3 (count DESC, term ASC), trailing-segment terms only,
    multi-edges counted per occurrence."""
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.crawl_report import anchor_text

    dst = (
        ["http://a.example/x/cats.jpg"] * 3
        + ["http://a.example/y/dogs.png"] * 2
        + ["http://a.example/z/cats.png"]  # cats again, png again
        + ["http://b.example/only/one_page.html"]
    )
    ds = ray.data.from_arrow(pa.table({"dst": pa.array(dst, pa.string())}))
    out = anchor_text(ds).to_pandas()
    a = out[out["host"] == "a.example"].set_index("rnk")
    # counts: cats 4, png 3, jpg 3, dogs 2 -> top3 = cats, jpg, png
    assert (a.loc[1, "term"], int(a.loc[1, "cnt"])) == ("cats", 4)
    assert (a.loc[2, "term"], int(a.loc[2, "cnt"])) == ("jpg", 3)
    assert (a.loc[3, "term"], int(a.loc[3, "cnt"])) == ("png", 3)
    # path-interior segments (x, y, z, only) never count as anchors
    assert not set(a["term"]) & {"x", "y", "z", "only"}
    b = out[out["host"] == "b.example"].set_index("rnk")
    assert set(b["term"]) == {"html", "one", "page"}
    assert (b["cnt"] == 1).all()


def test_modularity_known_partitions():
    """Modularity: two disjoint triangles labeled by their components
    give the known Q = 1/2 (in micros); merging everything into one
    community gives Q = 0; integer trunc semantics."""
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.graph import modularity

    tri = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
           ("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in tri], pa.string()),
            "dst": pa.array([e[1] for e in tri], pa.string()),
        }
    )
    good = pa.table(
        {
            "node": pa.array(["a1", "a2", "a3", "b1", "b2", "b3"]),
            "label": pa.array(["A", "A", "A", "B", "B", "B"]),
        }
    )
    out = modularity(ray.data.from_arrow(t), good).to_pandas().iloc[0]
    # m=6, per community: e_c=3, d_c=6 -> num = 2*(4*6*3-36) = 72;
    # Q = 72/(4*36) = 0.5
    assert out["m"] == 6 and out["n_communities"] == 2
    assert out["q_micro"] == 500_000

    allone = good.set_column(1, "label", pa.array(["X"] * 6))
    out2 = modularity(ray.data.from_arrow(t), allone).to_pandas().iloc[0]
    assert out2["q_micro"] == 0 and out2["n_communities"] == 1
