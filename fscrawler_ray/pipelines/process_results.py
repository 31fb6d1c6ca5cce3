"""Two-phase scan-then-process with a stage column — the reference's
path_stage state machine externalized to the results store.

Reference: rows are written at stage CRAWLED during the scan, then a
separate process re-reads `(FILE, CRAWLED)` pages, runs the processors, and
advances the stage (/root/reference/app/index_files.py:28-86;
app/models/path_stage.py:7-17). Here:

- the crawl engine writes results (implicit stage ``CRAWLED``);
- :func:`process_results` reads ONLY rows still at CRAWLED (filter pushdown
  on the stage column when present), runs the enrichment stages, and writes
  them to the processed store at stage ``PROCESSED``;
- re-running is a no-op for already-processed rows — kill it anywhere and
  restart, exactly the reference's resumability contract.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray

STAGES = ["CRAWLED", "ATTRIBUTES_EXTRACTED", "HASH_COMPUTED", "PROCESSED", "PATH_DELETED"]


def process_results(crawl_out_dir: str, processed_dir: str, batch_size: int = 256) -> dict:
    """Phase 2: enrich all not-yet-processed crawl rows. Returns counters."""
    from ..stages.image_stages import DecodePhashVerify, attrs_batch, caption_features_batch, content_hash_batch

    done_ids: set[str] = set()
    if os.path.isdir(processed_dir) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(processed_dir) for f in fs
    ):
        prev = ray.data.read_parquet(processed_dir, columns=["image_id"])
        done_ids = set(r["image_id"] for r in prev.iter_rows())
    done_ref = ray.put(done_ids)

    class NotDone:
        def __init__(self):
            self.done = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self.done is None:
                self.done = ray.get(done_ref)
            if not self.done:
                return b
            keep = pc.invert(
                pc.is_in(b.column("image_id"), value_set=pa.array(sorted(self.done)))
            )
            return b.filter(keep)

    ds = ray.data.read_parquet(crawl_out_dir)
    ds = ds.map_batches(NotDone, batch_format="pyarrow", concurrency=(1, 4))
    ds = ds.map_batches(attrs_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(DecodePhashVerify, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4))
    ds = ds.map_batches(caption_features_batch, batch_format="pyarrow", batch_size=batch_size)

    def stamp(b: pa.Table) -> pa.Table:
        stage = pa.array(["PROCESSED"] * b.num_rows, pa.string()).dictionary_encode()
        b = b.drop_columns(["bytes"])
        return b.append_column("stage", stage)

    ds = ds.map_batches(stamp, batch_format="pyarrow")
    os.makedirs(processed_dir, exist_ok=True)
    n = ds.count()
    if n:
        ds.write_parquet(processed_dir)
    return {"processed": n, "previously_done": len(done_ids)}
