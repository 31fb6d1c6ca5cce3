"""Broadcast joins + semi/anti joins for Ray Data.

Ray Data has no built-in join; at this scale the right pattern for
dimension tables is a broadcast hash join: ``ray.put`` the small side ONCE,
each ``map_batches`` worker reads the plasma object zero-copy and probes it
per batch (no shuffle, no per-batch reshipping). The analog of the
reference's keyed point lookups against Postgres
(/root/reference/app/database/data_manager.py:89-167), batched.

For big-big joins use ``groupby`` co-partitioning instead (see
pipelines/dedup.py); this module is deliberately broadcast-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class _BroadcastProbe:
    """map_batches callable holding only the ObjectRef; the dict is fetched
    once per worker process (zero-copy plasma read), not per batch."""

    def __init__(self, ref, on: str, how: str, suffix: str):
        self.ref = ref
        self.on = on
        self.how = how
        self.suffix = suffix
        self._small: pd.DataFrame | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            small = ray.get(self.ref)
            self._small = small.to_pandas() if isinstance(small, pa.Table) else small
        left = batch.to_pandas()
        if self.how in ("inner", "left"):
            out = left.merge(self._small, on=self.on, how=self.how, suffixes=("", self.suffix))
        elif self.how == "semi":
            out = left[left[self.on].isin(self._small[self.on].to_numpy())]
        elif self.how == "anti":
            out = left[~left[self.on].isin(self._small[self.on].to_numpy())]
        else:  # pragma: no cover
            raise ValueError(self.how)
        return pa.Table.from_pandas(out, preserve_index=False)


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner", suffix: str = "_r"):
    """Join a Dataset with a small in-memory table without a shuffle.

    ``how``: inner | left | semi | anti. The small side is placed in the
    object store once and shared by every task.
    """
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastProbe(ref, on, how, suffix),
        batch_format="pyarrow",
        batch_size=8192,
    )


def broadcast_lookup_mask(values: np.ndarray, lookup: set | np.ndarray) -> np.ndarray:
    """Vectorized membership for probe-style filters."""
    arr = np.asarray(lookup if not isinstance(lookup, set) else list(lookup))
    return np.isin(values, arr)
