"""Driver-side equivalence baselines for the distributed dedup pipelines.

These are TEST HELPERS, deliberately outside the package: each one
materializes a corpus-sized table on the driver (``to_pandas()`` /
``pq.read_table``), which is exactly the anti-pattern the package paths
exist to avoid at 10^10-row scale.  They share the SAME sketch/bucket
builders as the shipped pipelines (minhash_buckets / simhash_buckets /
embedding_buckets), so an equivalence test proves the distributed
expansion+verification — not a reimplementation of the sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.pipelines.dedup import (
    _collision_pairs,
    _docs,
    embedding_buckets,
    minhash_buckets,
    simhash_buckets,
)


def verify_jaccard_driver(sf_dir: str, pairs: pd.DataFrame, threshold: float) -> pa.Table:
    """Exact 3-token-shingle Jaccard for candidate pairs, one driver pass
    over the documents table (broadcast-style; test-scale only)."""
    from fscrawler_ray.functions.text import shingle_hashes

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    h, doc = shingle_hashes(t.column("text"), 3)
    doc_ids = t.column("doc_id").to_numpy()
    seg: dict[int, np.ndarray] = {}
    if len(h):
        starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
        bounds = np.append(starts, len(doc))
        for k, row in enumerate(doc[starts]):
            seg[int(doc_ids[row])] = np.unique(h[bounds[k] : bounds[k + 1]])
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        sa, sb = seg.get(a), seg.get(b)
        if sa is None or sb is None or not len(sa) or not len(sb):
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def minhash_pairs_driver(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 64,
) -> pa.Table:
    buckets = minhash_buckets(_docs(sf_dir), num_perm=num_perm, bands=bands)
    cand = _collision_pairs(buckets.to_pandas(), ["band", "bucket"], "doc_id", max_bucket)
    if len(cand) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()), "jaccard": pa.array([], pa.float64())}
        )
    return verify_jaccard_driver(sf_dir, cand, jaccard_threshold)


def simhash_pairs_driver(sf_dir: str, max_hamming: int = 3, max_bucket: int = 64) -> pa.Table:
    from fscrawler_ray.functions.phash import hamming64

    buckets = simhash_buckets(_docs(sf_dir)).to_pandas()
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())}
    )
    cand = _collision_pairs(buckets.drop(columns=["simhash"]), ["band", "bucket"], "doc_id", max_bucket)
    if len(cand) == 0:
        return empty
    sk = buckets.drop_duplicates(subset=["doc_id"]).set_index("doc_id")["simhash"]
    sa = sk.loc[cand["doc_a"].astype(int)].to_numpy().astype(np.int64)
    sb = sk.loc[cand["doc_b"].astype(int)].to_numpy().astype(np.int64)
    d = hamming64(sa, sb)
    keep = d <= max_hamming
    out = pd.DataFrame(
        {"doc_a": cand["doc_a"][keep].astype(np.int64), "doc_b": cand["doc_b"][keep].astype(np.int64), "hamming": d[keep]}
    )
    if len(out) == 0:
        return empty
    return pa.Table.from_pandas(out.sort_values(["doc_a", "doc_b"]), preserve_index=False)


def embedding_pairs_driver(
    sf_dir: str,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 5,
    max_bucket: int = 128,
) -> pa.Table:
    import ray

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    buckets = embedding_buckets(emb, n_planes=n_planes, n_tables=n_tables, seed=seed, with_vec=False)
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
    )
    cand = _collision_pairs(buckets.to_pandas(), ["band", "bucket"], "doc_id", max_bucket)
    if len(cand) == 0:
        return empty
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    v = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    row_of = {int(i): k for k, i in enumerate(ids)}
    ra = np.array([row_of[int(a)] for a in cand["doc_a"]])
    rb = np.array([row_of[int(b)] for b in cand["doc_b"]])
    cos = (v[ra] * v[rb]).sum(axis=1)
    keep = cos >= threshold
    if not keep.any():
        return empty
    out = pd.DataFrame(
        {
            "vec_a": cand["doc_a"][keep].astype(np.int64),
            "vec_b": cand["doc_b"][keep].astype(np.int64),
            "cosine": np.round(cos[keep], 6),
        }
    )
    return pa.Table.from_pandas(out.sort_values(["vec_a", "vec_b"]), preserve_index=False)
