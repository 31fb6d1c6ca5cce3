"""Similarity search over the embeddings table.

- :func:`knn_bruteforce` — exact top-k cosine: the query matrix is
  broadcast once (``ray.put``); each ``map_batches`` task computes one
  matmul against its batch and emits only its local top-k candidates; the
  tiny candidate union is reduced at the end. Shuffle-free.
- :func:`knn_ivf` — the scale path: coarse quantization (k-means-style
  centroids trained on a sample), vectors partitioned by nearest centroid,
  queries probe only ``nprobe`` partitions. Approximate; recall vs
  brute-force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _norm(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)[:n_queries]
    q = np.stack(t.column("embedding").to_pylist())[order].astype(np.float64)
    return ids[order], _norm(q)


class _BatchTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, q_ref, qid_ref, k: int):
        self.q_ref = q_ref
        self.qid_ref = qid_ref
        self.k = k
        self.q = None
        self.qids = None

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.q is None:
            self.q = ray.get(self.q_ref)
            self.qids = ray.get(self.qid_ref)
        v = np.stack(b.column("embedding").to_pylist()).astype(np.float64)
        v = _norm(v)
        ids = b.column("vec_id").to_numpy()
        sims = self.q @ v.T  # (nq, batch)
        out_q, out_v, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.append(np.full(len(idx), self.qids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(sims[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def _final_topk(cand: pd.DataFrame, k: int) -> pa.Table:
    cand = cand[cand["query_id"] != cand["vec_id"]]
    cand = cand.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).copy()
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top[["query_id", "vec_id", "rnk"]].astype(np.int64), preserve_index=False)


def knn_bruteforce(sf_dir: str, n_queries: int = 4, k: int = 10):
    """Exact top-k neighbors (query_id, vec_id, rnk) for the first
    ``n_queries`` vec_ids, excluding self."""
    qids, q = _load_queries(sf_dir, n_queries)
    q_ref, qid_ref = ray.put(q), ray.put(qids)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cand = emb.map_batches(_BatchTopK(q_ref, qid_ref, k), batch_format="pyarrow", batch_size=2048)
    return _final_topk(cand.to_pandas(), k)


def train_centroids(sf_dir: str, n_centroids: int = 16, iters: int = 5, sample: int = 2048, seed: int = 9) -> np.ndarray:
    """Mini k-means on a driver-side sample (the IVF coarse quantizer).
    At scale: train on ds.random_sample, broadcast the codebook."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    v = _norm(np.stack(t.column("embedding").to_pylist()).astype(np.float64))
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = rng.choice(len(v), size=min(sample, len(v)), replace=False)
    x = v[idx]
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = _norm(x[m].mean(axis=0))
    return c


def knn_ivf(sf_dir: str, n_queries: int = 4, k: int = 10, n_centroids: int = 16, nprobe: int = 4):
    """IVF top-k: assign vectors to centroid partitions (map_batches),
    probe the ``nprobe`` nearest partitions per query."""
    qids, q = _load_queries(sf_dir, n_queries)
    cent = train_centroids(sf_dir, n_centroids)
    cent_ref = ray.put(cent)
    probe = (q @ cent.T).argsort(axis=1)[:, ::-1][:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(row.tolist()) for row in probe]
    q_ref, qid_ref = ray.put(q), ray.put(qids)
    probe_ref = ray.put(probe_sets)

    class IvfTopK:
        def __init__(self):
            self.c = ray.get(cent_ref)
            self.q = ray.get(q_ref)
            self.qids = ray.get(qid_ref)
            self.probe = ray.get(probe_ref)
            self.k = k

        def __call__(self, b: pa.Table) -> pa.Table:
            v = _norm(np.stack(b.column("embedding").to_pylist()).astype(np.float64))
            ids = b.column("vec_id").to_numpy()
            assign = (v @ self.c.T).argmax(axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.q)):
                mask = np.isin(assign, list(self.probe[qi]))
                if not mask.any():
                    continue
                sims = self.q[qi] @ v[mask].T
                kk = min(self.k + 1, len(sims))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                out_q.append(np.full(len(idx), self.qids[qi], dtype=np.int64))
                out_v.append(ids[mask][idx])
                out_s.append(sims[idx])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "vec_id": pa.array(np.concatenate(out_v)),
                    "cosine": pa.array(np.concatenate(out_s)),
                }
            )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cand = emb.map_batches(IvfTopK, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4))
    return _final_topk(cand.to_pandas(), k)
