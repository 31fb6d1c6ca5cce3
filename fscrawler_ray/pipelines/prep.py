"""The composed training-corpus preparation flagship.

One pipeline chaining the engine's LLM-data families end to end, the way
a production pretraining-prep job runs them (C4/CCNet → Gopher → GPT-3
App. C shapes in sequence):

  documents
    → per-row quality + language filters (vectorized, stateless)
    → exact-dup removal        (global text-hash groupby → drop set)
    → near-dup removal         (MinHash+LSH pairs → union-find → drop set)
    → benchmark decontamination (shared-gram probe → contaminated set)
    → sliding-window chunking   (sequence prep)
    → greedy token-budget packing (two-level prefix scan → bin ids)

Scale posture: the TEXT stream is read once and flows through
map_batches only; every cross-document decision arrives as a broadcast
drop-set that is duplicate-/contamination-proportional (never
corpus-proportional), and the packing scan's driver state is the range
table.  A per-stage tally comes from the same streamed pass (partial
counts per batch — the clean_text_corpus discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.text import langid_batch, quality_features


def prepare_training_corpus(
    sf_dir: str,
    allowed_langs: tuple = ("en", "fr", "de", "es"),
    min_quality: float = 0.25,
    min_chars: int = 40,
    jaccard_threshold: float = 0.5,
    decontam_w: int = 8,
    chunk_tokens: int = 64,
    overlap: int = 16,
    pack_budget: int = 512,
    range_width: int = 64,
):
    """Returns (packed_chunks_dataset, tally dict).

    The dataset streams (doc_id, chunk_id, chunk_tokens, bin) for every
    chunk of every surviving document; ``tally`` counts docs per
    rejection rule plus survivors/chunks (exactly one pass over text).
    """
    from .analytics import grouped_sum
    from .corpus import _exact_dup_drop_set, neardup_components
    from .decontam import benchmark_gram_hashes, decontaminate
    from .dedup import minhash_lsh_pairs
    from .textops import chunk_documents

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # --- broadcast drop-state (all output-proportional) ---
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
    comp = neardup_components(
        pairs.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64),
        pairs.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64),
    )
    near_drop = comp["drop"].astype(np.int64)
    exact_drop = _exact_dup_drop_set(sf_dir).astype(np.int64)
    bench = benchmark_gram_hashes(sf_dir, w=decontam_w)
    contam_tbl = decontaminate(docs, bench, w=decontam_w)
    contam_parts = [
        b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in contam_tbl.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    contam = np.sort(np.concatenate(contam_parts)) if contam_parts else np.empty(0, np.int64)
    drops_ref = ray.put((np.sort(near_drop), np.sort(exact_drop), contam))
    langs = set(allowed_langs)

    def _in(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
        if len(sorted_arr) == 0:
            return np.zeros(len(keys), dtype=bool)
        i = np.minimum(np.searchsorted(sorted_arr, keys), len(sorted_arr) - 1)
        return sorted_arr[i] == keys

    audit_cols = ["kept", "rej_lang", "rej_quality", "rej_short", "rej_exact", "rej_neardup", "rej_contam"]

    def survivors(b: pa.Table) -> pa.Table:
        nd, xd, ct = ray.get(drops_ref)
        t = b.column("text")
        q = quality_features(t)
        pred = langid_batch(t)
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lang_ok = np.isin(np.array(pred.to_pylist(), dtype=object), list(langs))
        qual = q.column("quality_score").to_numpy(zero_copy_only=False)
        chars = q.column("n_chars").to_numpy(zero_copy_only=False)
        r_exact = _in(xd, did)
        r_near = _in(nd, did)
        r_contam = _in(ct, did)
        keep = lang_ok & (qual >= min_quality) & (chars >= min_chars) & ~r_exact & ~r_near & ~r_contam
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": t,
                "kept": pa.array(keep),
                "rej_lang": pa.array(~lang_ok),
                "rej_quality": pa.array(qual < min_quality),
                "rej_short": pa.array(chars < min_chars),
                "rej_exact": pa.array(r_exact),
                "rej_neardup": pa.array(r_near),
                "rej_contam": pa.array(r_contam),
            }
        )

    audited = docs.map_batches(survivors, batch_format="pyarrow")

    # streamed per-rule tally (partial counts per batch, never pinned)
    def partial_tally(b: pa.Table) -> pa.Table:
        cols = {"total": pa.array([b.num_rows], pa.int64())}
        for k in audit_cols:
            cols[k] = pa.array([int(pc.sum(b.column(k)).as_py() or 0)], pa.int64())
        return pa.table(cols)

    tally = {k: 0 for k in ["total", *audit_cols]}
    for b in audited.map_batches(partial_tally, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k in tally:
            tally[k] += int(pc.sum(b.column(k)).as_py() or 0)
    tally["neardup_components"] = comp["components"]

    kept = audited.map_batches(
        lambda b: b.filter(b.column("kept")).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    chunks = chunk_documents(kept, chunk_tokens=chunk_tokens, overlap=overlap)
    # consumed by the range-totals pass AND the packing groupby
    slim = chunks.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "chunk_id": b.column("chunk_id"),
                "chunk_tokens": b.column("chunk_tokens"),
                "rng": pc.divide(b.column("doc_id").cast(pa.int64()), range_width),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    totals = grouped_sum(slim, ["rng"], {"chunk_tokens": "tot"}).to_pandas().sort_values("rng")
    offs = dict(zip(totals["rng"], np.concatenate([[0], totals["tot"].cumsum().to_numpy()[:-1]])))

    import pandas as pd

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_id"])
        n = g["chunk_tokens"].to_numpy()
        prefix = int(offs[g["rng"].iloc[0]]) + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "chunk_id": g["chunk_id"].to_numpy(),
                "chunk_tokens": n,
                "bin": (prefix // pack_budget).astype(np.int64),
            }
        )

    packed = slim.groupby("rng").map_groups(pack, batch_format="pandas")
    tally["chunks"] = int(slim.count())
    return packed, tally


def q_corpus_prep(sf_dir: str):
    """queries() surface: the packed chunk table of the full pipeline."""
    packed, _ = prepare_training_corpus(sf_dir)
    return packed
