"""Text-analysis pipelines over the documents table (rows-only checks —
heuristic outputs with no SQL equivalent; deterministic, so row counts and
values are stable)."""

from __future__ import annotations

import pyarrow as pa

import ray

from ..functions.text import fingerprint64, langid_batch, quality_features, simhash64


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def q_langid_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "pred_lang": langid_batch(b.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_quality_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        q = quality_features(b.column("text"))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "quality_score": q.column("quality_score"),
                "mean_token_len": q.column("mean_token_len"),
                "punct_ratio": q.column("punct_ratio"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "simhash": pa.array(simhash64(b.column("text")))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_fingerprint_docs(sf_dir: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "fingerprint": pa.array(fingerprint64(b.column("text")))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")
