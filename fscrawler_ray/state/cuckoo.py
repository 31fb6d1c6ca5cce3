"""Cuckoo filter over uint64 keys — the deletable, low-FP half of the
URL-seen set (north rule pairing with the Bloom filter).

Partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT'14 — public paper): 16-bit fingerprints, 4-slot buckets,
alternate bucket ``i2 = i1 XOR hash(fp)``. Lookup/delete are vectorized over
key batches; insert walks keys in Python but each eviction step is O(1)
numpy (insert volume per round is bounded by newly-seen URLs).

Supports delete (the reference's DELETED/tombstone status analog,
/root/reference/app/models/path.py:75-82) which a Bloom filter cannot.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import xxh64_u64

_EMPTY = np.uint16(0)


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4, max_kicks: int = 500, seed: int = 7):
        nb = 1
        while nb * bucket_size < capacity * 1.10:  # ~0.95 load ceiling w/ headroom
            nb <<= 1
        self.n_buckets = nb
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.seed = seed
        self.table = np.zeros((nb, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))

    # fingerprints are 16-bit, never 0 (0 marks an empty slot)
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (xxh64_u64(keys, seed=self.seed) >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = xxh64_u64(fp.astype(np.uint64), seed=self.seed + 1)
        return ((i.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)).astype(np.int64)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def add_many(self, keys: np.ndarray) -> int:
        """Insert keys (idempotent per fingerprint/bucket pair); returns the
        number inserted. Raises RuntimeError when the filter is full.

        Vectorized: hashes/alt-buckets once for the whole batch, dedups on
        the (home bucket, fp) identity, drops already-present fingerprints,
        then scatters into empty slots two passes (home bucket, alt bucket)
        with a per-bucket rank so same-bucket keys take distinct slots.
        Only keys whose both buckets filled in-batch fall back to the
        scalar cuckoo eviction walk (rare below the load ceiling).  Slot
        placement may differ from one-at-a-time insertion, but membership
        semantics are exact on (bucket-pair, fp) either way."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return 0
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._alt(i1s, fps)
        # batch-dedup on the filter's TRUE identity — the UNORDERED bucket
        # pair + fp (alt() is an involution, so two keys with the same fp
        # and swapped home/alt buckets are membership-identical; keying on
        # home bucket alone would insert both and break idempotence)
        lo = np.minimum(i1s, i2s)
        hi = np.maximum(i1s, i2s)
        order = np.lexsort((fps, hi, lo))
        lo_s, hi_s, fp_s = lo[order], hi[order], fps[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1]) | (fp_s[1:] != fp_s[:-1])
        sel = np.sort(order[first])
        fps, i1s, i2s = fps[sel], i1s[sel], i2s[sel]
        present = (self.table[i1s] == fps[:, None]).any(axis=1) | (
            self.table[i2s] == fps[:, None]
        ).any(axis=1)
        fps, i1s, i2s = fps[~present], i1s[~present], i2s[~present]
        inserted = 0
        pending = np.arange(len(fps))
        for target in (i1s, i2s):
            if not len(pending):
                break
            t = target[pending]
            order = np.argsort(t, kind="stable")
            ts = t[order]
            # rank of each key among batch keys aiming at the same bucket
            starts = np.r_[0, 1 + np.flatnonzero(ts[1:] != ts[:-1])]
            sizes = np.diff(np.r_[starts, len(ts)])
            rank = np.arange(len(ts)) - np.repeat(starts, sizes)
            empt = self.table[ts] == _EMPTY
            can = rank < empt.sum(axis=1)
            # slot for rank r = column index of the (r+1)-th empty slot
            slot = np.argmax(np.cumsum(empt, axis=1) == (rank + 1)[:, None], axis=1)
            self.table[ts[can], slot[can]] = fps[pending][order][can]
            inserted += int(can.sum())
            pending = pending[order][~can]
        self.count += inserted
        for j in pending:  # eviction walk for the stragglers
            if self._insert_one(np.uint16(fps[j]), int(i1s[j]), int(i2s[j])):
                inserted += 1
        return inserted

    def _insert_one(self, fp: np.uint16, i1: int, i2: int | None = None) -> bool:
        if i2 is None:
            i2 = int(self._alt(np.array([i1]), np.array([fp]))[0])
        for i in (i1, i2):
            row = self.table[i]
            if (row == fp).any():
                return False  # already present (fingerprint-identical)
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        i = i1 if self._rng.integers(0, 2) else i2
        cur = fp
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(0, self.bucket_size))
            cur, self.table[i, slot] = self.table[i, slot], cur
            i = int(self._alt(np.array([i]), np.array([cur]))[0])
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        raise RuntimeError("cuckoo filter full — grow capacity")

    def delete_many(self, keys: np.ndarray) -> int:
        keys = np.asarray(keys, dtype=np.uint64)
        removed = 0
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._alt(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (int(i1), int(i2)):
                row = self.table[i]
                hit = np.flatnonzero(row == fp)
                if len(hit):
                    row[hit[0]] = _EMPTY
                    self.count -= 1
                    removed += 1
                    break
        return removed

    def state(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "bucket_size": self.bucket_size,
            "max_kicks": self.max_kicks,
            "seed": self.seed,
            "count": self.count,
            "table": self.table,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        c = cls.__new__(cls)
        c.n_buckets = int(st["n_buckets"])
        c.bucket_size = int(st["bucket_size"])
        c.max_kicks = int(st["max_kicks"])
        c.seed = int(st["seed"])
        c.count = int(st["count"])
        c.table = np.asarray(st["table"], dtype=np.uint16).copy()
        c._rng = np.random.Generator(np.random.PCG64(c.seed))
        return c
