"""Random-hyperplane LSH ANN (similarity.knn_lsh / lsh_ann_recall).

Reference analog: FsCrawler has no ANN at all — this is one of the
brief's required similarity-search scale paths (LSH-bucketed variant
beside IVF).  The SQL oracle replays bucket assignment exactly; these
tests cover what SQL can't: the planted-duplicate bucket guarantee,
signature parity against a slow per-element reimplementation, and the
recall eval's internal consistency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.pipelines import similarity as sim

SF = "/root/testdata/sf0.001"


def test_lsh_masks_deterministic_and_signs_pm1():
    m1, m2 = sim.lsh_masks(), sim.lsh_masks()
    assert np.array_equal(m1, m2)
    assert m1.shape == (sim.LSH_TABLES, sim.LSH_BITS)
    s = sim._lsh_signs(m1)
    assert s.shape == (sim.LSH_TABLES * sim.LSH_BITS, 64)
    assert set(np.unique(s)) == {-1, 1}


def test_lsh_signature_matches_slow_reference():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(17, 64)).astype(np.float32)
    masks = sim.lsh_masks()
    signs = sim._lsh_signs(masks)
    fast = sim.lsh_signatures(v, signs, sim.LSH_TABLES, sim.LSH_BITS)
    for i in range(len(v)):
        micro = [int(np.floor(float(np.float64(x)) * 1e6)) for x in v[i]]
        for t in range(sim.LSH_TABLES):
            sig = 0
            for b in range(sim.LSH_BITS):
                mask = int(masks[t, b])
                p = sum(
                    mu if (mask >> d) & 1 else -mu for d, mu in enumerate(micro)
                )
                if p >= 0:
                    sig |= 1 << b
            assert sig == int(fast[i, t]), (i, t)


def test_lsh_planted_duplicate_always_retrieved(ray_session, tmp_path):
    # an exact copy of a query vector has the identical signature in every
    # table — LSH must retrieve it, and the exact re-rank must put it first
    rng = np.random.default_rng(11)
    n, d = 48, 64
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = list(range(n))
    vecs = np.vstack([vecs, vecs[0:1]])  # vec 100 == vec 0
    ids.append(100)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = sim.knn_lsh(str(tmp_path), n_queries=1, k=5).to_pandas()
    first = got[(got["query_id"] == 0) & (got["rnk"] == 1)]
    assert len(first) == 1 and int(first["vec_id"].iloc[0]) == 100


def test_lsh_recall_consistency(ray_session):
    df = sim.lsh_ann_recall(SF).to_pandas()
    assert len(df) == 4
    assert (df["hits"] <= df["n_true"]).all()
    assert (df["hits"] <= df["n_lsh"]).all()
    assert (df["recall_micro"] == df["hits"] * 1_000_000 // df["n_true"]).all()
    # LSH results are a subset of candidates re-ranked exactly: every hit
    # it does return must also be a true top-k member by construction of
    # the recall join; and on this fixture the buckets are non-degenerate
    assert df["n_lsh"].sum() > 0


def test_multiprobe_hits_superset(ray_session):
    # candidates(probe) ⊇ candidates(exact) ⇒ per-query true-top-k hits
    # can only grow: a probe-found candidate that displaces an exact-bucket
    # hit from the top-k must itself rank higher, hence also be true
    bt = sim.knn_bruteforce(SF).to_pandas()
    ex = sim.knn_lsh(SF).to_pandas()
    pr = sim.knn_lsh_probe(SF).to_pandas()
    for qid in bt["query_id"].unique():
        tv = set(bt.loc[bt["query_id"] == qid, "vec_id"])
        he = len(tv & set(ex.loc[ex["query_id"] == qid, "vec_id"]))
        hp = len(tv & set(pr.loc[pr["query_id"] == qid, "vec_id"]))
        assert hp >= he, (qid, he, hp)


def test_embedding_neardup_lsh_planted_and_exact(ray_session, tmp_path):
    # a planted exact duplicate shares every bucket and has cosine 1 ≥ τ —
    # it MUST appear as a pair; and the full pair set must equal a local
    # brute-force replay of bucket candidates + exact integer verify
    rng = np.random.default_rng(23)
    n = 60
    vecs = rng.normal(size=(n, 64)).astype(np.float32)
    ids = list(range(n)) + [500]
    vecs = np.vstack([vecs, vecs[7:8]])  # 500 duplicates 7
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = sim.embedding_neardup_lsh(str(tmp_path)).to_pandas()
    assert ((got["vec_id_a"] == 7) & (got["vec_id_b"] == 500)).any()

    # local replay: same buckets, same integer verify
    signs = sim._lsh_signs(sim.lsh_masks())
    sigs = sim.lsh_signatures(vecs, signs, sim.LSH_TABLES, sim.LSH_BITS)
    micro = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    tau2 = sim.EMB_NEARDUP_TAU_PERMILLE**2
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if not (sigs[i] == sigs[j]).any():
                continue
            dot = int(micro[i] @ micro[j])
            na2 = int(micro[i] @ micro[i])
            nb2 = int(micro[j] @ micro[j])
            if dot >= 0 and dot * dot * 1_000_000 >= tau2 * na2 * nb2:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == want


def test_embedding_neardup_groups_closure(ray_session, tmp_path):
    # chain 0≈1≈2 (via planted duplicates) must collapse to one component
    rng = np.random.default_rng(31)
    base = rng.normal(size=(30, 64)).astype(np.float32)
    # vec 100 == vec 0, vec 101 == vec 100 (transitively 0-100-101)
    vecs = np.vstack([base, base[0:1], base[0:1]])
    ids = list(range(30)) + [100, 101]
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = sim.embedding_neardup_groups(str(tmp_path))
    df = got.to_pandas().set_index("vec_id")["canonical_id"]
    assert df.loc[0] == 0 and df.loc[100] == 0 and df.loc[101] == 0


def test_embedding_dedup_clean_keeps_canonicals(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    base = rng.normal(size=(30, 64)).astype(np.float32)
    vecs = np.vstack([base, base[0:1], base[3:4]])
    ids = list(range(30)) + [100, 101]  # 100≈0, 101≈3
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    kept = set(sim.embedding_dedup_clean(str(tmp_path)).to_pandas()["vec_id"])
    assert 0 in kept and 3 in kept
    assert 100 not in kept and 101 not in kept
    # non-duplicated vectors all survive (modulo incidental same-bucket
    # near-dups among random vectors, which τ=0.35 may legitimately pair:
    # recompute the expected drop set from the groups themselves)
    grp = sim.embedding_neardup_groups(str(tmp_path)).to_pandas()
    drops = set(grp.loc[grp["vec_id"] != grp["canonical_id"], "vec_id"])
    assert kept == set(ids) - drops


def _ivf_index_ids(index_dir):
    import glob as g

    import pyarrow.parquet as pqt

    files = sorted(g.glob(f"{index_dir}/centroid=*/*.parquet"))
    out = []
    for f in files:
        out.extend(pqt.read_table(f, columns=["vec_id"]).column("vec_id").to_pylist())
    return out


def test_ivf_incremental_maintenance(ray_session, tmp_path):
    import ray as _ray

    idx = str(tmp_path / "ivf")
    got = sim.knn_ivf_incremental(SF, index_dir=idx).to_pandas()
    ids = _ivf_index_ids(idx)
    # no deleted id survives; every id unique (no double-written partition)
    assert all(i % sim.IVF_DEL_MOD != 0 for i in ids if i < sim.IVF_INS_OFFSET)
    assert len(ids) == len(set(ids))
    # every expected inserted twin is present
    import pyarrow.parquet as pqt

    src = pqt.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"]).column("vec_id").to_pylist()
    want_ins = {
        i + sim.IVF_INS_OFFSET
        for i in src
        if i % sim.IVF_DEL_MOD != 0 and i % sim.IVF_INS_MOD == 0
    }
    assert want_ins <= set(ids)
    # re-running the SAME maintenance is idempotent (crash-recovery story:
    # purge is a no-op, inserts rewrite their content-hash-named parts)
    srcds = _ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    deleted = [i for i in src if i % sim.IVF_DEL_MOD == 0]
    sim.update_ivf_index(idx, sim._edited_inserts(srcds), deleted)
    assert sorted(_ivf_index_ids(idx)) == sorted(ids)
    # and the kNN over the on-disk index is deterministic
    got2 = sim.knn_ivf_incremental(SF, index_dir=str(tmp_path / "ivf2")).to_pandas()
    assert got.equals(got2)


def test_ndcg_eval_perfect_and_bounds():
    """nDCG eval: the brute-force system against itself scores exactly
    1e6 per query (perfect ordering); the LSH system's score is bounded
    [0, 1e6]; idcg is the same constant everywhere."""
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_ndcg_eval

    sf = "/root/testdata/sf0.001"
    perfect = knn_ndcg_eval(sf, system=knn_bruteforce).to_pandas()
    assert (perfect["ndcg_micro"] == 1_000_000).all()
    assert perfect["idcg"].nunique() == 1

    lsh = knn_ndcg_eval(sf).to_pandas()
    assert ((lsh["ndcg_micro"] >= 0) & (lsh["ndcg_micro"] <= 1_000_000)).all()
    assert (lsh["idcg"] == perfect["idcg"].iat[0]).all()


def test_mrr_eval_perfect_and_bounds():
    """MRR: brute force against itself has first_hit_rank 1 / rr 1e6
    everywhere; the LSH system's rr is within [0, 1e6]."""
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_mrr_eval

    sf = "/root/testdata/sf0.001"
    perfect = knn_mrr_eval(sf, system=knn_bruteforce).to_pandas()
    assert (perfect["first_hit_rank"] == 1).all()
    assert (perfect["rr_micro"] == 1_000_000).all()
    lsh = knn_mrr_eval(sf).to_pandas()
    assert ((lsh["rr_micro"] >= 0) & (lsh["rr_micro"] <= 1_000_000)).all()
