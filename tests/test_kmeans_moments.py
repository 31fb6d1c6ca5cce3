"""Integer-exact k-means + embedding moment/Gram passes (similarity.py).

Reference analog: FsCrawler has no clustering or linear-algebra passes —
these are the LLM-curation building blocks (SemDeDup coarse quantizer,
normalization/whitening prep) required by the brief's training-data
extensions.  The SQL oracle replays every k-means iteration bit-for-bit;
these tests cover what the oracle shares with the engine: a slow pure-
numpy reimplementation of the whole algorithm, block-partitioning
invariance of the partial folds, and the trunc-div corner cases.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from fscrawler_ray.pipelines import similarity as sim

SF = "/root/testdata/sf0.001"


def _micro_all():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = sim._micro_vecs(t.column("embedding"))
    return ids, m


def _slow_kmeans(ids: np.ndarray, m: np.ndarray, k: int, iters: int):
    """Independent scalar reimplementation: same seeds, argmin, trunc-div."""
    order = np.argsort(ids)
    cent = m[order][:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            sel = m[a == c]
            if len(sel):
                s = sel.sum(axis=0)
                cent[c] = np.sign(s) * (np.abs(s) // len(sel))
    d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def test_trunc_div_matches_duckdb_semantics():
    s = np.array([-7, 7, -1, 1, 0, -100], np.int64)
    n = np.array([2, 2, 3, 3, 5, 7], np.int64)
    assert sim._trunc_div(s, n).tolist() == [-3, 3, 0, 0, 0, -14]


def test_kmeans_exact_matches_slow_reference(ray_session):
    ids, m = _micro_all()
    want_a, want_d = _slow_kmeans(ids, m, sim.KMEANS_K, sim.KMEANS_ITERS)
    got = sim.kmeans_exact(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    order = np.argsort(ids)
    assert got["vec_id"].to_numpy().tolist() == np.sort(ids).tolist()
    assert got["cluster"].to_numpy().tolist() == want_a[order].tolist()
    assert got["dist_sq"].to_numpy().tolist() == want_d[order].tolist()
    # every seed cluster index appears (seeds are their own nearest at it=0
    # and the table is non-degenerate at this scale)
    assert set(got["cluster"]) == set(range(sim.KMEANS_K))


def test_kmeans_partials_block_invariant(ray_session):
    """Folding per-block partials by cluster column must be independent of
    how Ray splits the input into blocks — the fold keys on `cluster`."""
    ids, m = _micro_all()
    order = np.argsort(ids)
    cent = m[order][: sim.KMEANS_K].copy()
    counts, sums = sim._kmeans_partials(SF, cent, sim.KMEANS_K)
    d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    for c in range(sim.KMEANS_K):
        assert counts[c] == int((a == c).sum())
        assert sums[c].tolist() == m[a == c].sum(axis=0).tolist()


def test_embedding_moments_and_gram_match_numpy(ray_session):
    _, m = _micro_all()
    mom = sim.embedding_moments(SF)
    assert mom["dim"].tolist() == list(range(1, m.shape[1] + 1))
    assert mom["n"].tolist() == [len(m)] * m.shape[1]
    assert mom["sum_micro"].tolist() == m.sum(axis=0).tolist()
    assert mom["sumsq_micro"].tolist() == (m * m).sum(axis=0).tolist()
    assert mom["min_micro"].tolist() == m.min(axis=0).tolist()
    assert mom["max_micro"].tolist() == m.max(axis=0).tolist()

    g = sim.embedding_gram(SF)
    full = m.T @ m
    iu = np.triu_indices(m.shape[1])
    assert len(g) == len(iu[0])
    got = {(r.i, r.j): r.sum_prod for r in g.itertuples()}
    for i, j in zip(*iu):
        assert got[(i + 1, j + 1)] == full[i, j]


def test_power_vec_aligns_with_float_eigenvector():
    """The integer power iterate should point (anti)parallel to the true
    dominant eigenvector of the Gram matrix within quantization error."""
    rng = np.random.default_rng(7)
    u = rng.normal(size=16)
    u /= np.linalg.norm(u)
    # planted rank-1 spike so the top eigenvalue is well separated — iid
    # gaussian data alone has a near-degenerate spectrum that no fixed
    # iteration count can resolve
    m = (rng.normal(size=(200, 16)) * 1e6 + np.outer(rng.choice([-1.0, 1.0], 200), u) * 4e6).astype(np.int64)
    G = (m.T @ m).tolist()
    v = np.asarray(sim._power_vec([[int(x) for x in row] for row in G], iters=8), np.float64)
    w, vec = np.linalg.eigh(np.asarray(G, np.float64))
    top = vec[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999


def test_pca_scores_match_driver_matvec(ray_session):
    ids, m = _micro_all()
    comp = sim.pca_power_component(SF)
    v = comp["v"].to_numpy()
    want = dict(zip(ids.tolist(), (m @ v).tolist()))
    got = sim.pca_scores(SF).to_pandas()
    assert len(got) == len(ids)
    for r in got.itertuples():
        assert want[r.vec_id] == r.score


def test_kmeans_outliers_are_cluster_maxima(ray_session):
    ids, m = _micro_all()
    a, d = _slow_kmeans(ids, m, sim.KMEANS_K, sim.KMEANS_ITERS)
    out = sim.kmeans_outliers(SF)
    for c in range(sim.KMEANS_K):
        members = sorted(
            zip(-d[a == c], ids[a == c])
        )[: sim.KMEANS_OUTLIER_TOPK]
        want = [(int(i), int(-nd)) for nd, i in members]
        sub = out[out["cluster"] == c].sort_values("rnk")
        assert list(zip(sub["vec_id"], sub["dist_sq"])) == want
        assert sub["rnk"].tolist() == list(range(1, len(want) + 1))


def test_cluster_balanced_sample_matches_bruteforce(ray_session):
    from fscrawler_ray.pipelines.sampling import _mix32

    ids, m = _micro_all()
    a, _ = _slow_kmeans(ids, m, sim.KMEANS_K, sim.KMEANS_ITERS)
    out = sim.cluster_balanced_sample(SF)
    h = _mix32(ids.astype(np.int64))
    for c in range(sim.KMEANS_K):
        mem = sorted(zip(h[a == c], ids[a == c]))[: sim.CLUSTER_SAMPLE_K]
        want = [int(i) for _, i in mem]
        sub = out[out["cluster"] == c].sort_values("rnk")
        assert sub["vec_id"].tolist() == want
        assert sub["rnk"].tolist() == list(range(1, len(want) + 1))
