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


def test_semantic_neardup_equals_within_cluster_bruteforce(tmp_path):
    """SemDeDup finds EXACTLY the within-cluster cosine>=t pairs — compare
    against a brute-force reference using the same centroid assignment."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.dedup import semantic_neardup_pairs
    from fscrawler_ray.pipelines.similarity import train_centroids

    rng = np.random.default_rng(4)
    base = rng.normal(size=(40, 64)).astype(np.float32)
    # planted near-dups: 10 noisy copies
    dups = base[:10] + rng.normal(scale=0.05, size=(10, 64)).astype(np.float32)
    vecs = np.vstack([base, dups])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")

    thr, k, seed = 0.8, 6, 9
    got = semantic_neardup_pairs(str(tmp_path), threshold=thr, n_clusters=k, seed=seed).to_pandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))

    cent = train_centroids(str(tmp_path), k, seed=seed)
    v = vecs.astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    assign = (v @ cent.T).argmax(axis=1)
    want = set()
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if assign[i] == assign[j] and float(v[i] @ v[j]) >= thr:
                want.add((i, j))
    assert got_pairs == want
    assert len(want) >= 8  # the planted copies land in their base's cluster


def test_knn_pq_recall_and_determinism(ray_session):
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_pq

    sf = "/root/testdata/sf0.001"
    bf = knn_bruteforce(sf).to_pandas()
    a = knn_pq(sf).to_pandas()
    b = knn_pq(sf).to_pandas()
    # deterministic end to end (sampling, codebooks, shortlist, re-rank)
    assert a.equals(b)
    recalls = []
    for qid, g in bf.groupby("query_id"):
        truth, got = set(g["vec_id"]), set(a[a["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    # exact re-rank over an 8x shortlist: high recall even on
    # near-uniform synthetic vectors
    assert sum(recalls) / len(recalls) >= 0.7


def test_dedup_provenance_planted(tmp_path):
    """Provenance: planted byte-identical copies report 'exact' with the
    min-id keeper; an exact-removed doc never re-reports as 'near'
    (precedence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.dedup import dedup_provenance

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            # 1 and 2 byte-identical (exact); 3 near-identical to them
            # (one word changed); 4 unrelated
            "text": pa.array(
                [base, base, base.replace("lazy", "sleepy"), "completely different words only here"]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(base)] * 2 + [len(base), 20], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = dedup_provenance(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[2, "reason"] == "exact" and out.loc[2, "keeper"] == 1
    # doc 3 is a near-dup of the 1/2 component, keeper is component min
    assert out.loc[3, "reason"] == "near" and out.loc[3, "keeper"] == 1
    assert 4 not in out.index  # unique doc never reported
    assert out.index.is_unique  # precedence: one verdict per removed doc


def test_dedup_rate_by_source_planted(tmp_path):
    """Per-source removal rates: a mirror-heavy source reports its exact
    removals; a clean source reports zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.dedup import dedup_rate_by_source

    base = "identical mirrored page content here " * 6
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([base, base, "unique text one alpha beta", "unique text two gamma delta"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["mirror.example", "mirror.example", "clean.example", "clean.example"]),
            "n_chars": pa.array([len(base), len(base), 26, 26], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = dedup_rate_by_source(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["mirror.example", "exact_removed"] == 1
    assert out.loc["mirror.example", "removal_rate_micro"] == 500_000
    assert out.loc["clean.example", "exact_removed"] == 0
    assert out.loc["clean.example", "near_removed"] == 0
    assert out.loc["clean.example", "removal_rate_micro"] == 0
