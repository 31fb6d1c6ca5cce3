"""The partitioned URL-seen set: Bloom (fast negative) → cuckoo (deletable,
low-FP) → exact uint64 store (authority).

Analog of the reference's unique-key upsert + existence probe
(/root/reference/app/database/data_manager.py:393-411, DDL
create_tables_postgres.sql:138) and the skip-if-unchanged incremental check
(app/crawling_queue_consumer.py:110-115). One shard lives inside each
frontier shard; keys are ``xxh64(canonical_url)`` and each shard only ever
sees the keys of its own host partition.

Exactness: the trace contract ("matching … final URL-seen set") cannot
tolerate cuckoo false positives silently dropping URLs, so Bloom/cuckoo act
as the scale-path probes and a per-shard exact uint64 set settles Bloom
hits. At 10^10 URLs the exact store is the per-partition sorted-run spill
(documented in the checkpoint manifest); in-sandbox it is an in-memory
hash set. ``strict`` therefore defaults to True.
"""

from __future__ import annotations

import numpy as np

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


class SeenSet:
    def __init__(self, capacity: int = 1 << 16, fp_rate: float = 1e-3, strict: bool = True, seed: int = 7):
        self.bloom = BloomFilter(capacity, fp_rate)
        self.cuckoo = CuckooFilter(capacity, seed=seed)
        self.strict = strict
        self._exact: set[int] = set()

    def __len__(self) -> int:
        return len(self._exact) if self.strict else self.cuckoo.count

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized test-and-set: returns a bool mask of keys that were
        NEW (first occurrence wins, duplicates within the batch are marked
        seen). This is the frontier's hot-path call."""
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.bloom.contains_many(keys)  # False ⇒ definitely new
        new = ~maybe
        if maybe.any():
            hit = np.flatnonzero(maybe)
            if self.strict:
                confirmed = np.fromiter((int(k) in self._exact for k in keys[hit]), bool, len(hit))
            else:
                confirmed = self.cuckoo.contains_many(keys[hit])
            new[hit] = ~confirmed
        # first-occurrence-wins within the batch
        if new.any():
            idx = np.flatnonzero(new)
            _, first = np.unique(keys[idx], return_index=True)
            keep = np.zeros(len(idx), dtype=bool)
            keep[first] = True
            new[idx] = keep
            fresh = keys[new]
            self.bloom.add_many(fresh)
            self.cuckoo.add_many(fresh)
            if self.strict:
                self._exact.update(int(k) for k in fresh)
        return new

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.strict:
            return np.fromiter((int(k) in self._exact for k in keys), bool, len(keys))
        maybe = self.bloom.contains_many(keys)
        out = maybe.copy()
        if maybe.any():
            hit = np.flatnonzero(maybe)
            out[hit] = self.cuckoo.contains_many(keys[hit])
        return out

    def delete_many(self, keys: np.ndarray) -> int:
        """Tombstone support (cuckoo + exact; Bloom bits stay — it is a
        one-sided structure, which is exactly why the cuckoo exists)."""
        keys = np.asarray(keys, dtype=np.uint64)
        removed = self.cuckoo.delete_many(keys)
        if self.strict:
            for k in keys:
                self._exact.discard(int(k))
        return removed

    def keys_array(self) -> np.ndarray:
        return np.fromiter(self._exact, dtype=np.uint64, count=len(self._exact))

    def state(self) -> dict:
        return {
            "strict": self.strict,
            "bloom": self.bloom.state(),
            "cuckoo": self.cuckoo.state(),
            "exact": self.keys_array(),
        }

    @classmethod
    def from_state(cls, st: dict) -> "SeenSet":
        s = cls.__new__(cls)
        s.strict = bool(st["strict"])
        s.bloom = BloomFilter.from_state(st["bloom"])
        s.cuckoo = CuckooFilter.from_state(st["cuckoo"])
        s._exact = set(int(k) for k in np.asarray(st["exact"], dtype=np.uint64))
        return s
