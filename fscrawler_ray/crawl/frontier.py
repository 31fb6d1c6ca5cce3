"""FrontierShard — the distributed frontier's per-partition state machine.

One shard owns the hosts with ``xxhash64(host) % n_shards == shard_id``:
their FIFO politeness queues, the partition's Bloom+cuckoo(+exact) seen-set
shard, a robots cache, the compiled filter chain, and per-shard counters
(the analog of the reference crawler's stats block,
/root/reference/app/crawler/file_system_crawler.py:59-79). The shard is a
plain class; ``crawl.engine`` wraps it in a Ray actor.

Protocol per round (see crawl/semantics.md):

- ``pop_round()`` → Arrow table of this shard's emissions, each keyed by
  ``(host, host_idx)`` for the driver's deterministic global merge. Feature
  computation and filter evaluation are vectorized per popped host batch.
- fetch tasks call ``buffer_children(parent_seq, child_idx, urls)``
  (delivery order irrelevant);
- ``end_round()`` sorts the buffer by ``(parent_seq, child_idx)``, runs the
  vectorized seen-set test-and-set in that order, and enqueues survivors.

Seen-set ownership is decoupled from politeness routing (VERDICT r02 #8):
when the engine passes ``seen_shards`` (a :class:`SeenService` actor per
partition), a URL's seen entry lives at ``xxh64(canonical_url) % n_seen``
— a pure function of the URL, INDEPENDENT of the salt-aware route key —
so salting/re-salting a host between runs never moves seen entries and a
checkpoint can be resumed under a DIFFERENT salt plan (the auto-salting
loop). The seen check inside ``end_round`` partitions the batch's keys by
owner and issues one vectorized ``check_and_add`` per owner; determinism
holds because all duplicates of a URL buffer at ONE route shard (route
key is a pure function of the URL), so first-occurrence-wins is decided
entirely by this shard's sorted buffer order, which each owner preserves.
Without ``seen_shards`` the shard keeps a private SeenSet (single-process
oracle/unit-test mode; ownership == routing, the round-2 behavior).

Checkpoint: ``state()``/``from_state`` snapshot queues + seen-set + counters
(+ round lineage), the distributed analog of the reference's ``path_stage``
resume column (app/index_files.py:53-79).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import xxh64, xxh64_batch
from ..functions.urls import ext_of, name_of
from ..sources.base import is_container_batch, make_source, metadata_batch, robots_batch
from ..sources.synthweb import WebConfig
from ..state.seen import SeenSet

EMIT_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("host_idx", pa.int32()),
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("is_dir", pa.bool_()),
        ("size", pa.int64()),
        ("root_id", pa.int32()),
        ("shard", pa.int32()),
    ]
)


class SeenService:
    """One seen-set partition, owning keys with ``key % n_seen == shard_id``
    (key = xxh64(canonical url)). Deployed as a zero-CPU Ray actor by the
    engine; frontier shards call ``check_and_add`` at their round barrier.
    Kept SEPARATE from the frontier shards so that (a) politeness
    re-sharding — salting a hot host — never migrates seen entries, making
    salt plans changeable across checkpoint/resume, and (b) the
    memory-heavy membership structures (bloom + cuckoo + exact runs) scale
    independently of the queue actors at 10^10-URL scale."""

    def __init__(
        self,
        shard_id: int,
        capacity: int = 1 << 17,
        spill_dir: str | None = None,
        exact_max_inmem: int = 1 << 22,
    ):
        spill = None
        if spill_dir:
            import os

            spill = os.path.join(spill_dir, f"seen{shard_id:04d}")
        self.shard_id = shard_id
        self.seen = SeenSet(capacity=capacity, exact_spill_dir=spill, exact_max_inmem=exact_max_inmem)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        return self.seen.check_and_add(keys)

    def keys_array(self) -> np.ndarray:
        return self.seen.keys_array()

    def count(self) -> int:
        return len(self.seen)

    def state(self) -> dict:
        return self.seen.state()

    def load_state(self, st: dict) -> None:
        self.seen = SeenSet.from_state(st)


class FrontierShard:
    def __init__(
        self,
        shard_id: int,
        web_cfg: WebConfig,
        chain_spec: dict | None = None,
        politeness_budget: int = 4,
        seen_capacity: int = 1 << 17,
        politeness_capacity: int | None = None,
        salt_hosts: dict | None = None,
        seen_spill_dir: str | None = None,
        seen_exact_max_inmem: int = 1 << 22,
        seen_shards: list | None = None,
        host_priorities: dict | None = None,
        max_urls_per_host: int | None = None,
    ):
        self.shard_id = shard_id
        self.web = make_source(web_cfg)  # any Source spec (SURVEY E1 gap fix)
        from ..filters.factory import build_chain_from_spec

        self.chain = build_chain_from_spec(chain_spec or {})
        self.budget = politeness_budget
        # token bucket: refill = budget per round, cap = capacity (tokens
        # accumulate while a host is idle — logical clock, no wall time).
        # Default capacity == refill reproduces plain per-round budgets.
        self.capacity = politeness_capacity if politeness_capacity is not None else politeness_budget
        self.salt_hosts = dict(salt_hosts or {})
        # frontier prioritization (the pagerank feedback loop): true-host →
        # weight in (0, 1] scaling the token-bucket REFILL RATE. Priorities
        # only ever lower a host below its politeness rate (w ≤ 1, validated
        # by the engine), so the per-host politeness bound is preserved by
        # construction; 1.0 / absent = full rate.
        self.host_priorities = {str(h): float(w) for h, w in (host_priorities or {}).items()}
        # crawler-trap guard: per-host discovery budget, tracked per ROUTE
        # KEY with a per-salt share of max(1, cap // k) — like politeness,
        # so a salted host's total budget stays ≈ cap instead of k·cap. A host
        # generating unbounded distinct children (calendar pages, session
        # ids) hits the cap; its surplus children are dropped and counted,
        # and the host is flagged. Deterministic w.r.t. n_shards: all URLs
        # of a route key buffer at one shard, and per-host arrival order is
        # the (parent_seq, child_idx)-sorted subsequence — shard-invariant.
        self.max_urls_per_host = max_urls_per_host
        self._host_discovered: dict[str, int] = {}
        self._trapped: set[str] = set()
        self._tokens: dict[str, int] = {}  # tokens left after the host's last pop
        self._last_refill: dict[str, int] = {}  # round of that pop
        # key-sharded seen ownership (module docstring): with SeenService
        # actors the shard holds NO seen state of its own; without them
        # (plain-class / single-process mode) it keeps a private SeenSet.
        self._seen_actors = list(seen_shards) if seen_shards else None
        if self._seen_actors:
            self.seen = None
        else:
            spill = None
            if seen_spill_dir:
                import os

                spill = os.path.join(seen_spill_dir, f"shard{shard_id:04d}")
            self.seen = SeenSet(
                capacity=seen_capacity, exact_spill_dir=spill, exact_max_inmem=seen_exact_max_inmem
            )
        self.queues: dict[str, list] = {}  # host -> list[(url, depth)] FIFO
        self._qhead: dict[str, int] = {}  # pop cursor per host (amortized O(1))
        self._buffer: list[tuple[int, int, str, int]] = []  # (parent_seq, child_idx, url, depth)
        self._pending_emit: pa.Table | None = None  # popped, awaiting emit_round_chunks
        self._pending_hosts: list[str] = []
        self._pending_counts: np.ndarray = np.empty(0, np.int64)
        self._trace_threads: list = []  # in-flight background trace writes
        self.round = 0
        self.counters = {
            "enqueued": 0,
            "emitted": 0,
            "skipped_robots": 0,
            "skipped_filters": 0,
            "skipped_seen": 0,
            "containers": 0,
            "leaves": 0,
            "trap_dropped": 0,
        }

    # -- enqueue path -------------------------------------------------------

    def _enqueue_urls(self, urls: list[str], depths: np.ndarray, roots: np.ndarray) -> int:
        """Seen-test-and-add in given order; append survivors to host queues.
        ``roots`` carries the originating seed's root_id (per-root routing,
        the reference's target_table lineage, file_system_crawler.py:376)."""
        if not urls:
            return 0
        keys = xxh64_batch(pa.array(urls, type=pa.string()))
        new = self._check_and_add(keys)
        self.counters["skipped_seen"] += int((~new).sum())
        added = 0
        cap = self.max_urls_per_host
        for i in np.flatnonzero(new):
            url = urls[i]
            host = url.split("://", 1)[1].split("/", 1)[0].lower()
            rkey = route_key(url, host, self.salt_hosts)
            if cap is not None:
                k = int(self.salt_hosts.get(host, 1)) if self.salt_hosts else 1
                rcap = max(1, cap // k) if k > 1 else cap
                seen_n = self._host_discovered.get(rkey, 0)
                if seen_n >= rcap:
                    self.counters["trap_dropped"] += 1
                    self._trapped.add(host)
                    continue
                self._host_discovered[rkey] = seen_n + 1
            self.queues.setdefault(rkey, []).append((url, int(depths[i]), int(roots[i])))
            added += 1
        self.counters["enqueued"] += added
        return added

    def _check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized seen test-and-set, preserving the caller's order.
        External mode partitions the keys by owner (``key % n_seen``) and
        issues ONE check_and_add per owner actor — order within each
        owner's sub-array is the buffer order, and reassembly restores the
        full-batch order, so first-occurrence-wins semantics are identical
        to the local path (all duplicates of a URL sit in THIS batch)."""
        if self.seen is not None:
            return self.seen.check_and_add(keys)
        import ray as _ray

        keys = np.asarray(keys, dtype=np.uint64)
        owners = (keys % np.uint64(len(self._seen_actors))).astype(np.int64)
        mask = np.zeros(len(keys), dtype=bool)
        idxs, refs = [], []
        for o in np.unique(owners):
            idx = np.flatnonzero(owners == o)
            idxs.append(idx)
            refs.append(self._seen_actors[int(o)].check_and_add.remote(keys[idx]))
        for idx, sub in zip(idxs, _ray.get(refs)):
            mask[idx] = sub
        return mask

    def add_seeds(self, seeds: list) -> int:
        """Seeds are (url, root_id) pairs (or bare urls → root_id = 0)."""
        pairs = [(s, 0) if isinstance(s, str) else tuple(s) for s in seeds]
        return self._enqueue_urls(
            [p[0] for p in pairs],
            np.zeros(len(pairs), dtype=np.int64),
            np.array([p[1] for p in pairs], dtype=np.int64),
        )

    def buffer_children(self, items: list[tuple]) -> int:
        """Fetch tasks deliver (parent_seq, child_idx, canonical_url, depth,
        root_id)."""
        self._buffer.extend(items)
        return len(self._buffer)

    def end_round(self) -> dict:
        self._buffer.sort(key=lambda t: (t[0], t[1]))
        urls = [t[2] for t in self._buffer]
        depths = np.array([t[3] for t in self._buffer], dtype=np.int64)
        roots = np.array([t[4] for t in self._buffer], dtype=np.int64)
        self._buffer.clear()
        self._enqueue_urls(urls, depths, roots)
        self.round += 1
        return {"round": self.round, "pending": self.pending_count()}

    def pending_count(self) -> int:
        return sum(len(q) - self._qhead.get(h, 0) for h, q in self.queues.items())

    def pending_by_host(self) -> dict:
        """Queue depth per host — the skew signal. A hot host shows up as a
        deep queue (its per-round emission is capped by the politeness
        budget). Fetch-side load is already balanced regardless (emissions
        are striped round-robin across fetch tasks), and aggregation-side
        skew is neutralized by partial pre-aggregation (analytics.grouped_sum),
        so the remaining lever for a pathologically hot host is salting its
        queue across shards — reported here so the driver can decide."""
        return {h: len(q) - self._qhead.get(h, 0) for h, q in self.queues.items() if len(q) - self._qhead.get(h, 0) > 0}

    def end_and_pop(self) -> tuple:
        """Round transition in one RPC: enqueue the buffered children of the
        finished round, then pop the next round's emissions. Returns
        (emissions_table, pending_count)."""
        self.end_round()
        t = self.pop_round()
        return t, self.pending_count()

    # -- hierarchical round merge (driver never sees emission rows) ---------

    def pop_round_meta(self) -> dict:
        """Pop the round's emissions but RETAIN the table in the shard;
        return only per-host counts (the shard's hosts are lex-sorted, and
        each host belongs to exactly one shard, so the driver can compute
        global seq offsets from counts alone — the tree-merge fan-in is
        O(#active hosts) metadata, not O(#emissions) rows. VERDICT r01 #4)."""
        t = self.pop_round()
        self._pending_emit = t
        hosts = t.column("host").to_numpy(zero_copy_only=False)
        if len(hosts) == 0:
            self._pending_hosts, self._pending_counts = [], np.empty(0, np.int64)
            return {"hosts": [], "counts": []}
        change = np.ones(len(hosts), dtype=bool)
        change[1:] = hosts[1:] != hosts[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(hosts)))
        self._pending_hosts = [str(h) for h in hosts[starts]]
        self._pending_counts = counts
        return {"hosts": self._pending_hosts, "counts": counts.tolist()}

    def end_and_pop_meta(self) -> tuple:
        """end_round + pop_round_meta in one RPC (the fast-path barrier)."""
        self.end_round()
        return self.pop_round_meta(), self.pending_count()

    def emit_round_chunks(
        self, offsets: list[int], rows_per_chunk: int, round_no: int, trace_dir: str | None
    ) -> tuple:
        """Finish the round's emission on the shard side: assign global seq
        (offset-per-host + host_idx), write this shard's trace part straight
        to disk, stripe the table into fetch chunks and ``ray.put`` each —
        the driver receives only ObjectRefs. ``offsets`` aligns with the
        hosts returned by :meth:`pop_round_meta`.

        Returns ``(container_refs, leaf_refs, n)``: container rows are the
        only ones that feed the frontier (children), so the engine's round
        barrier waits on them alone; leaf rows carry the expensive payload
        work (fetch + decode + phash) and drain asynchronously across round
        boundaries (the round-overlap lever, VERDICT r04 #2)."""
        import ray as _ray

        t = self._pending_emit
        self._pending_emit = None
        if t is None or len(t) == 0:
            return [], [], 0
        base = np.repeat(np.asarray(offsets, dtype=np.int64), self._pending_counts)
        seq = base + t.column("host_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("seq", pa.array(seq))
        if trace_dir is not None:
            import os
            import threading

            from .engine import _atomic_write

            os.makedirs(trace_dir, exist_ok=True)
            # the trace part writes on a background thread: Arrow tables are
            # immutable and the path is unique per (round, shard), so the
            # disk I/O comes off the shard's serial round chain — callers
            # that READ the trace (checkpoint, trace_table) must flush via
            # :meth:`flush_trace` first
            th = threading.Thread(
                target=_atomic_write,
                args=(
                    t.select(["seq", "url", "host", "depth", "is_dir"]),
                    os.path.join(trace_dir, f"part-{round_no:05d}-shard{self.shard_id:04d}.parquet"),
                ),
                daemon=True,
            )
            th.start()
            self._trace_threads = [x for x in self._trace_threads if x.is_alive()]
            self._trace_threads.append(th)
        n = len(t)
        is_dir = t.column("is_dir").to_numpy(zero_copy_only=False).astype(bool)
        dir_idx = np.flatnonzero(is_dir)
        leaf_idx = np.flatnonzero(~is_dir)

        def stripe(idx: np.ndarray) -> list:
            m = len(idx)
            if m == 0:
                return []
            k = min(max(1, -(-m // max(1, rows_per_chunk))), m)
            return [_ray.put(t.take(idx[i::k])) for i in range(k)]

        return stripe(dir_idx), stripe(leaf_idx), n

    def flush_trace(self) -> bool:
        """Join in-flight background trace writes — the durability barrier
        before anything reads the trace spool (checkpoint, trace_table)."""
        for th in self._trace_threads:
            th.join()
        self._trace_threads = []
        return True

    # -- pop path -----------------------------------------------------------

    def pop_round(self) -> pa.Table:
        """Emit up to ``budget`` URLs per owned host, vectorizing the robots
        + filter checks per host batch. Returns EMIT_SCHEMA rows."""
        out_host: list[str] = []
        out_idx: list[int] = []
        out_url: list[str] = []
        out_depth: list[int] = []
        out_isdir: list[bool] = []
        out_size: list[int | None] = []
        out_root: list[int] = []
        for host in sorted(h for h, q in self.queues.items() if len(q) > self._qhead.get(h, 0)):
            emitted = 0
            # per-salt budget: a salted host's k queues split the host's
            # budget so the per-HOST politeness bound still holds
            h0 = true_host(host)
            k = int(self.salt_hosts.get(h0, 1)) if self.salt_hosts else 1
            budget, capacity = self._host_rate(h0, k)
            # token bucket (logical clock): refill `budget` per elapsed round
            # since the host's last pop, capped at `capacity`
            elapsed = self.round - self._last_refill.get(host, -1)
            allowance = min(capacity, self._tokens.get(host, 0) + budget * elapsed)
            q = self.queues[host]
            head = self._qhead.get(host, 0)
            while head < len(q) and emitted < allowance:
                # pop a candidate window of (allowance - emitted) entries and
                # evaluate checks vectorized; loop handles refill when some fail
                take = min(len(q) - head, allowance - emitted)
                cand = q[head : head + take]
                head += take
                urls = [c[0] for c in cand]
                depths = np.array([c[1] for c in cand], dtype=np.int32)
                roots = [c[2] for c in cand]
                # batched Source protocol (VERDICT r02 #6): one vectorized
                # call per candidate window, not one Python call per URL;
                # sources/base dispatches to a per-URL fallback for Sources
                # that only implement the scalar protocol
                allowed = robots_batch(self.web, h0, urls)
                self.counters["skipped_robots"] += int((~allowed).sum())
                is_dir = is_container_batch(self.web, urls)
                meta = metadata_batch(self.web, urls)
                sizes, mtimes = meta["size"], meta["mtime"]
                batch = self._features(urls, is_dir, depths, sizes, mtimes)
                fmask = self.chain.mask(batch) if (self.chain.skip_filters or self.chain.notify_filters or self.chain.invert) else np.ones(len(urls), bool)
                self.counters["skipped_filters"] += int((allowed & ~fmask).sum())
                ok = allowed & fmask
                for j in np.flatnonzero(ok):
                    out_host.append(host)
                    out_idx.append(emitted)
                    out_url.append(urls[j])
                    out_depth.append(int(depths[j]))
                    out_isdir.append(bool(is_dir[j]))
                    out_size.append(sizes[j])
                    out_root.append(int(roots[j]))
                    emitted += 1
            self._tokens[host] = allowance - emitted
            self._last_refill[host] = self.round
            if head >= len(q):
                del self.queues[host]
                self._qhead.pop(host, None)
            else:
                self._qhead[host] = head
        self._prune_token_state()
        self.counters["emitted"] += len(out_url)
        self.counters["containers"] += int(sum(out_isdir))
        self.counters["leaves"] += len(out_isdir) - int(sum(out_isdir))
        return pa.table(
            {
                "host": pa.array(out_host, type=pa.string()),
                "host_idx": pa.array(out_idx, type=pa.int32()),
                "url": pa.array(out_url, type=pa.string()),
                "depth": pa.array(out_depth, type=pa.int32()),
                "is_dir": pa.array(out_isdir, type=pa.bool_()),
                "size": pa.array(out_size, type=pa.int64()),
                "root_id": pa.array(out_root, type=pa.int32()),
                "shard": pa.array([self.shard_id] * len(out_url), type=pa.int32()),
            },
            schema=EMIT_SCHEMA,
        )

    def _host_rate(self, h0: str, k: int) -> tuple[int, int]:
        """Effective (refill, cap) for one route key: the host's priority
        weight scales the politeness rate DOWN (never up), then salting
        divides the scaled rate across the host's k salt queues.  Both
        floors at 1 so every queued host keeps draining (priorities shift
        crawl ORDER between hosts; they never starve one)."""
        w = self.host_priorities.get(h0) if self.host_priorities else None
        budget, capacity = self.budget, self.capacity
        if w is not None and w < 1.0:
            budget = max(1, int(budget * w))
            capacity = max(1, int(capacity * w))
        if k > 1:
            budget, capacity = max(1, budget // k), max(1, capacity // k)
        return budget, capacity

    def _prune_token_state(self) -> None:
        """Drop token-bucket entries that carry no information: a drained
        host whose allowance has saturated at capacity behaves identically
        to an absent entry (the missing-key default also yields capacity),
        so keeping it only bloats actor RAM and every checkpoint. Provably
        trace-neutral — saturation is monotone in elapsed rounds."""
        dead = []
        for host, tok in self._tokens.items():
            if host in self.queues:
                continue
            h0 = true_host(host)
            k = int(self.salt_hosts.get(h0, 1)) if self.salt_hosts else 1
            budget, capacity = self._host_rate(h0, k)
            saturated = tok + budget * (self.round - self._last_refill.get(host, -1)) >= capacity
            # the missing-key default (tokens=0, last=-1) must ALSO yield
            # capacity at every future round, else dropping diverges when
            # capacity >> budget early in the crawl
            default_saturated = budget * (self.round + 1) >= capacity
            if saturated and default_saturated:
                dead.append(host)
        for host in dead:
            self._tokens.pop(host, None)
            self._last_refill.pop(host, None)

    def _features(
        self, urls: list[str], is_dir: np.ndarray, depths: np.ndarray, sizes: list, mtimes: list
    ) -> pa.Table:
        arr = pa.array(urls, type=pa.string())
        names = name_of(arr)
        return pa.table(
            {
                "url": arr,
                "name": names,
                "ext": ext_of(names, pa.array(is_dir)),
                "is_dir": pa.array(is_dir),
                "size": pa.array(sizes, type=pa.int64()),
                "mtime": pa.array(mtimes, type=pa.int64()),
                "depth": pa.array(depths, type=pa.int32()),
            }
        )

    # -- stats / checkpoint -------------------------------------------------

    def get_counters(self) -> dict:
        return dict(self.counters, shard=self.shard_id, round=self.round, pending=self.pending_count())

    def trapped_hosts(self) -> list[str]:
        """Hosts that hit the discovery budget (crawler-trap suspects)."""
        return sorted(self._trapped)

    def seen_keys(self) -> np.ndarray:
        assert self.seen is not None, "seen set is externalized; read the SeenService actors"
        return np.sort(self.seen.keys_array())

    def state(self) -> dict:
        # compact queues to their unpopped suffix before snapshotting
        queues = {h: q[self._qhead.get(h, 0) :] for h, q in self.queues.items()}
        return {
            "shard_id": self.shard_id,
            "round": self.round,
            "budget": self.budget,
            "capacity": self.capacity,
            "tokens": dict(self._tokens),
            "last_refill": dict(self._last_refill),
            "queues": queues,
            "counters": dict(self.counters),
            # external mode: seen state is checkpointed from the SeenService
            # actors (engine writes seen_{i}.pkl), not duplicated here
            "seen": self.seen.state() if self.seen is not None else None,
            "buffer": list(self._buffer),
            "salt_hosts": dict(self.salt_hosts),
            "host_priorities": dict(self.host_priorities),
            "host_discovered": dict(self._host_discovered),
            "trapped": sorted(self._trapped),
        }

    def load_state(self, st: dict) -> None:
        self.shard_id = st["shard_id"]
        self.round = st["round"]
        self.budget = st["budget"]
        self.capacity = st.get("capacity", st["budget"])
        self._tokens = dict(st.get("tokens", {}))
        self._last_refill = dict(st.get("last_refill", {}))
        self.queues = {h: list(q) for h, q in st["queues"].items()}
        self._qhead = {}
        self.counters = dict(st["counters"])
        if st.get("seen") is not None:
            self.seen = SeenSet.from_state(st["seen"])
        # else: keep the external SeenService handles from __init__
        self._buffer = [tuple(t) for t in st["buffer"]]
        self.salt_hosts = dict(st.get("salt_hosts", {}))
        self.host_priorities = {str(h): float(w) for h, w in st.get("host_priorities", {}).items()}
        self._host_discovered = dict(st.get("host_discovered", {}))
        self._trapped = set(st.get("trapped", []))
        self.counters.setdefault("trap_dropped", 0)


def shard_of_host(host: str, n_shards: int) -> int:
    return xxh64(host.lower(), seed=3) % n_shards


def route_key(url: str, host: str, salt_hosts: dict | None) -> str:
    """Queue/partition key for a URL. Unsalted hosts key by host; a host in
    ``salt_hosts`` (host → k) splits across k pseudo-hosts ``host#i`` by
    url-hash — the north rule's 'salted repartitioning of skewed hosts'.
    The salt is a pure function of the URL, so the same URL always routes
    to the same shard and the seen-set stays exact. Politeness budget is
    divided across salts (per-salt = budget // k), so the per-HOST rate
    bound still holds; intra-host FIFO becomes per-salt FIFO (documented
    trade, SCALE.md)."""
    k = salt_hosts.get(host) if salt_hosts else None
    if not k or int(k) <= 1:
        return host
    return f"{host}#{xxh64(url, seed=5) % int(k)}"


def true_host(key: str) -> str:
    """Strip the salt suffix off a route key."""
    return key.split("#", 1)[0]
