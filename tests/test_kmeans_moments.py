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
