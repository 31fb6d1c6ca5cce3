"""Partitioned Bloom filter over uint64 keys — the fast-negative membership
half of the URL-seen set (north rule: "partitioned Bloom-filter + cuckoo-
filter URL-seen set keyed by canonicalized-URL xxhash64").

Keys are already ``xxh64(canonical_url)`` values; the k probe positions are
derived by double hashing (Kirsch-Mitzenmacher): ``pos_i = h1 + i*h2 mod m``
with ``h1 = key`` and ``h2 = xxh64_u64(key, seed=1) | 1``. All operations
are numpy-vectorized over key batches; state is one bit array serializable
into checkpoints.

Analog of the reference's DB unique-key existence probe
(/root/reference/app/database/data_manager.py:85-87 ``path_exists``) as a
false-positive-tolerant pre-check.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import xxh64_u64


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 1e-3, num_bits: int | None = None, k: int | None = None):
        if num_bits is None:
            num_bits = int(max(64, -capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        if k is None:
            k = max(1, int(round(num_bits / max(capacity, 1) * np.log(2))))
        self.num_bits = int(num_bits)
        self.k = int(min(k, 16))
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = xxh64_u64(h1, seed=1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys, dtype=np.uint64)).ravel()
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, word.astype(np.int64), np.uint64(1) << bit)
        self.count += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys, dtype=np.uint64))
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        hit = (self.bits[word.astype(np.int64)] >> bit) & np.uint64(1)
        return hit.all(axis=0)

    # -- checkpoint serialization -------------------------------------------

    def state(self) -> dict:
        return {"num_bits": self.num_bits, "k": self.k, "count": self.count, "bits": self.bits}

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        b = cls.__new__(cls)
        b.num_bits = int(st["num_bits"])
        b.k = int(st["k"])
        b.count = int(st["count"])
        b.bits = np.asarray(st["bits"], dtype=np.uint64).copy()
        return b
