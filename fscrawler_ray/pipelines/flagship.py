"""Flagship pipeline: enrich the input_hint image table end-to-end.

read/synthesize → attrs (sniff+size) → content hash → decode+phash verify
(actor pool) → caption features → [optional thumbnails] — all streaming
``map_batches`` over Arrow; no full materialization. The Ray-native
composition of the reference's processor list
(/root/reference/app/crawler_entry_point.py:110-122).
"""

from __future__ import annotations

from ..sources.images import images_dataset, rows_for_sf
from ..stages.image_stages import (
    DecodePhashVerify,
    ThumbnailStage,
    attrs_batch,
    caption_features_batch,
    content_hash_batch,
)

NON_PAYLOAD_COLUMNS = [
    "image_id",
    "w",
    "h",
    "fmt",
    "caption",
    "phash",
    "size",
    "sniffed_fmt",
    "content_family",
    "content_category",
    "content_min_age",
    "hash",
    "decode_ok",
    "verify_ok",
    "phash_computed",
    "phash_dist",
    "phash_match",
    "keywords",
    "rating",
    "caption_tokens",
    "caption_quality",
    "caption_lang",
]


def _pool_size() -> tuple:
    """Actor-pool bounds sized to the cluster (min 1, max = CPUs) so the
    decode stage never caps parallelism below the machine."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(4, cpus))


def enrich_images(ds, decode_concurrency: int | tuple | None = None, batch_size: int = 128, thumbnails: bool = False):
    """Full enrichment chain over an input_hint Dataset."""
    ds = ds.map_batches(attrs_batch, batch_format="pyarrow")
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
    # decode+verify holds no per-worker state → elastic task pool (no actor
    # spin-up); pass decode_concurrency to force an actor pool instead
    from ..stages.image_stages import decode_phash_verify_batch

    if decode_concurrency is not None:
        ds = ds.map_batches(
            DecodePhashVerify, batch_format="pyarrow", batch_size=batch_size, concurrency=decode_concurrency
        )
    else:
        ds = ds.map_batches(decode_phash_verify_batch, batch_format="pyarrow")
    ds = ds.map_batches(caption_features_batch, batch_format="pyarrow")
    if thumbnails:
        ds = ds.map_batches(
            ThumbnailStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=decode_concurrency or _pool_size(),
        )
    return ds


def flagship(sf_dir: str = "/root/testdata/sf0.001", n_rows: int | None = None, seed: int = 42):
    """Synthesize the image table at sf-proportional size and enrich it.
    Returns the enriched Dataset with payload bytes dropped (stable schema)."""
    n = n_rows if n_rows is not None else rows_for_sf(sf_dir)
    ds = images_dataset(n, seed=seed)
    out = enrich_images(ds)
    return out.select_columns(NON_PAYLOAD_COLUMNS)
