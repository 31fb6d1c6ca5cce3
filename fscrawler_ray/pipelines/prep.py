"""The composed training-corpus preparation flagship.

One pipeline chaining the engine's LLM-data families end to end, the way
a production pretraining-prep job runs them (C4/CCNet → Gopher → GPT-3
App. C shapes in sequence):

  documents
    → clean_text_corpus            (quality/lang filters, exact- and
                                    near-dup removal, per-rule tally)
      + benchmark decontamination  (shared-gram probe → extra drop set)
    → sliding-window chunking      (sequence prep)
    → greedy token-budget packing  (two-level prefix scan → bin ids)

Scale posture: every cross-document decision arrives as a broadcast
drop-set that is duplicate-/contamination-proportional (never
corpus-proportional); the packing scan's driver state is the range
table.  The text stream is consumed twice — once for the streamed
per-rule tally, once by the chunker — the same documented pin-nothing /
re-compute trade clean_text_corpus makes (materializing the corpus
mid-pipeline is the alternative it deliberately rejects); the chunk
table IS materialized (metadata-sized) because packing consumes it
twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


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
    rejection rule (incl. ``rej_contam``) plus survivors/chunks.
    """
    from .corpus import clean_text_corpus
    from .decontam import benchmark_gram_hashes, decontaminate
    from .textops import chunk_documents, pack_by_budget

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # decontamination drop-set (contamination-proportional broadcast)
    bench = benchmark_gram_hashes(sf_dir, w=decontam_w)
    contam_parts = [
        b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in decontaminate(docs, bench, w=decontam_w).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    contam = np.concatenate(contam_parts) if contam_parts else np.empty(0, np.int64)

    kept, tally = clean_text_corpus(
        sf_dir,
        allowed_langs=allowed_langs,
        min_quality=min_quality,
        min_chars=min_chars,
        jaccard_threshold=jaccard_threshold,
        extra_drop={"contam": contam},
        keep_text=True,
    )

    chunks = chunk_documents(
        kept.map_batches(lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow"),
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )
    # metadata-sized (ids + counts, no text); consumed by the packing
    # totals pass AND the packing groupby — materialize once
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

    packed = pack_by_budget(slim, "chunk_tokens", pack_budget, ["doc_id", "chunk_id"])
    tally["chunks"] = int(slim.count())
    return packed, tally


def q_corpus_prep(sf_dir: str):
    """queries() surface: the packed chunk table of the full pipeline."""
    packed, _ = prepare_training_corpus(sf_dir)
    return packed
