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
hits. The exact store (:class:`ExactStore`) spills to immutable sorted
runs past a memory bound — the per-partition sorted-run design SCALE.md
describes. ``strict`` therefore defaults to True.
"""

from __future__ import annotations

import numpy as np

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


class ExactStore:
    """Exact uint64 membership with bounded memory: an in-RAM set that
    spills to immutable sorted runs (numpy arrays; at real scale these are
    mmapped files per partition) once ``max_inmem`` is exceeded. Lookup =
    set probe + binary search per run; runs are compacted by merging when
    their count grows. This is the per-partition sorted-run spill the
    SCALE.md seen-set section describes, in-process."""

    def __init__(self, max_inmem: int = 1 << 22, max_runs: int = 8, spill_dir: str | None = None):
        self.max_inmem = max_inmem
        self.max_runs = max_runs
        # spill_dir backs sorted runs with memory-mapped .npy files — the
        # per-partition on-disk runs SCALE.md describes; None keeps runs
        # in RAM (the test-scale default)
        self.spill_dir = spill_dir
        if spill_dir:
            import os

            os.makedirs(spill_dir, exist_ok=True)
        self._hot: set[int] = set()
        self._runs: list[np.ndarray] = []
        self._run_files: list[str] = []
        self._run_seq = 0

    def _persist_run(self, run: np.ndarray) -> np.ndarray:
        """RAM or mmapped-file backing for one sorted run."""
        if not self.spill_dir:
            return run
        import os

        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.npy")
        self._run_seq += 1
        np.save(path, run)
        self._run_files.append(path)
        return np.load(path, mmap_mode="r")

    def _drop_run_files(self) -> None:
        import os

        for p in self._run_files:
            try:
                os.remove(p)
            except OSError:
                pass
        self._run_files = []

    def __len__(self) -> int:
        return len(self._hot) + sum(len(r) for r in self._runs)

    def _spill(self) -> None:
        run = np.fromiter(self._hot, dtype=np.uint64, count=len(self._hot))
        run.sort()
        self._hot = set()
        self._runs.append(self._persist_run(run))
        if len(self._runs) > self.max_runs:
            merged = np.concatenate([np.asarray(r) for r in self._runs])
            merged.sort()
            self._runs = []
            self._drop_run_files()
            self._runs = [self._persist_run(merged)]

    def add_array(self, keys: np.ndarray) -> None:
        self._hot.update(int(k) for k in keys)
        if len(self._hot) > self.max_inmem:
            self._spill()

    def contains_array(self, keys: np.ndarray) -> np.ndarray:
        out = np.fromiter((int(k) in self._hot for k in keys), bool, len(keys))
        for run in self._runs:
            if not len(run):
                continue
            miss = ~out
            if not miss.any():
                break
            sub = keys[miss]
            pos = np.searchsorted(run, sub)
            pos = np.minimum(pos, len(run) - 1)
            out[miss] = run[pos] == sub
        return out

    def discard(self, key: int) -> None:
        self._hot.discard(key)
        for i, run in enumerate(self._runs):
            pos = int(np.searchsorted(run, np.uint64(key)))
            if pos < len(run) and run[pos] == np.uint64(key):
                # keep the tombstoned run in RAM rather than re-persisting
                # the whole file per delete (tombstones are rare; the next
                # compaction re-spills it)
                self._runs[i] = np.delete(np.asarray(run), pos)
                return

    def to_array(self) -> np.ndarray:
        parts = [np.fromiter(self._hot, dtype=np.uint64, count=len(self._hot))] + self._runs
        return np.concatenate(parts) if parts else np.empty(0, np.uint64)


class SeenSet:
    def __init__(
        self,
        capacity: int = 1 << 16,
        fp_rate: float = 1e-3,
        strict: bool = True,
        seed: int = 7,
        exact_max_inmem: int = 1 << 22,
        exact_spill_dir: str | None = None,
    ):
        self.bloom = BloomFilter(capacity, fp_rate)
        self.cuckoo = CuckooFilter(capacity, seed=seed)
        self.strict = strict
        self._exact = ExactStore(max_inmem=exact_max_inmem, spill_dir=exact_spill_dir)
        # set when a non-strict seen-set's cuckoo overflowed: membership
        # degrades to bloom-only (one-sided, extra FPs, never a crash)
        self._cuckoo_degraded = False

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
                confirmed = self._exact.contains_array(keys[hit])
            elif self._cuckoo_degraded:
                # bloom is the only authority left: treat every maybe as seen
                confirmed = np.ones(len(hit), dtype=bool)
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
            if self.strict:
                self._exact.add_array(fresh)
            self._feed_cuckoo(fresh)
        return new

    def _feed_cuckoo(self, fresh: np.ndarray) -> None:
        """Insert into the cuckoo, surviving overflow: in strict mode the
        exact store is the authority, so rebuild the cuckoo at 2× capacity
        from the full key set (doubling until it fits); in non-strict mode
        stop feeding it and degrade membership to bloom-only. Either way a
        crawl never dies because a shard saw more unique URLs than the
        filter was sized for (ADVICE r01)."""
        if self._cuckoo_degraded:
            return
        try:
            self.cuckoo.add_many(fresh)
            return
        except RuntimeError:
            pass
        if not self.strict:
            self._cuckoo_degraded = True
            return
        keys = self._exact.to_array()  # includes `fresh` (added just above)
        cap = self.cuckoo.n_buckets * self.cuckoo.bucket_size
        while True:
            cap *= 2
            rebuilt = CuckooFilter(cap, seed=self.cuckoo.seed)
            try:
                rebuilt.add_many(keys)
                self.cuckoo = rebuilt
                return
            except RuntimeError:
                continue

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.strict:
            return self._exact.contains_array(keys)
        maybe = self.bloom.contains_many(keys)
        if self._cuckoo_degraded:
            return maybe  # bloom-only: one-sided, never a false negative
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
        return self._exact.to_array()

    def state(self) -> dict:
        return {
            "strict": self.strict,
            "bloom": self.bloom.state(),
            "cuckoo": self.cuckoo.state(),
            "exact": self.keys_array(),
            "cuckoo_degraded": self._cuckoo_degraded,
            # the exact store's memory/spill config must survive resume
            # (a resumed shard losing its spill dir would blow RAM exactly
            # when spilling was needed)
            "exact_cfg": {
                "max_inmem": self._exact.max_inmem,
                "max_runs": self._exact.max_runs,
                "spill_dir": self._exact.spill_dir,
            },
        }

    @classmethod
    def from_state(cls, st: dict) -> "SeenSet":
        s = cls.__new__(cls)
        s.strict = bool(st["strict"])
        s.bloom = BloomFilter.from_state(st["bloom"])
        s.cuckoo = CuckooFilter.from_state(st["cuckoo"])
        s._cuckoo_degraded = bool(st.get("cuckoo_degraded", False))
        ec = st.get("exact_cfg", {})
        spill = ec.get("spill_dir")
        if spill:
            # fresh rebuild: clear run files a dead actor left behind
            import glob as _glob
            import os as _os

            for f in _glob.glob(_os.path.join(spill, "run-*.npy")):
                try:
                    _os.remove(f)
                except OSError:
                    pass
        s._exact = ExactStore(
            max_inmem=int(ec.get("max_inmem", 1 << 22)),
            max_runs=int(ec.get("max_runs", 8)),
            spill_dir=spill,
        )
        keys = np.asarray(st["exact"], dtype=np.uint64)
        if len(keys):
            s._exact.add_array(keys)
        return s
