"""Embedding-cosine near-dup: LSH recall vs brute-force ground truth."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_embedding_lsh_recall():
    from fscrawler_ray.pipelines.dedup import embedding_neardup_pairs

    got = embedding_neardup_pairs(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    v = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = v @ v.T
    np.fill_diagonal(s, -1)
    ids = t.column("vec_id").to_numpy()
    ia, ib = np.nonzero(np.triu(s >= 0.4, k=1))
    truth = set(zip(ids[ia], ids[ib]))
    found = set(zip(got["vec_a"], got["vec_b"]))
    # no false positives (every reported pair verified ≥ threshold)
    assert found <= truth
    if truth:
        recall = len(found & truth) / len(truth)
        assert recall >= 0.5, recall


def test_embedding_clusters_cover_and_cohere():
    from fscrawler_ray.pipelines.similarity import embedding_clusters

    df = embedding_clusters(SF, n_clusters=6).to_pandas()
    assert len(df) > 0 and df["cluster"].nunique() > 1
    assert df["cluster"].between(0, 5).all()
    # each vector's assigned centroid is its best one: re-run deterministic
    df2 = embedding_clusters(SF, n_clusters=6).to_pandas()
    assert df.sort_values("vec_id").reset_index(drop=True).equals(
        df2.sort_values("vec_id").reset_index(drop=True))
