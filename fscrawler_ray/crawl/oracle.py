"""Single-threaded reference-semantics crawler (the trace oracle).

A deliberately simple, independent implementation of crawl/semantics.md —
plain dicts and deques, no shared code with the distributed engine beyond
the pure functions (synthetic web, robots rules, url kernels, scalar filter
``authorize``). The pytest trace-equivalence suite compares the engine's
frontier trace and final seen-set against this oracle, mirroring the role
of the reference's single-threaded DFS
(/root/reference/app/crawler/file_system_crawler.py:404-505).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..filters.core import FilterChain
from ..functions.hashing import xxh64
from ..functions.urls import canonicalize


@dataclass
class OracleResult:
    trace: list = field(default_factory=list)  # [(seq, url)]
    seen: set = field(default_factory=set)  # {xxh64(canonical_url)}
    rows: list = field(default_factory=list)  # fetched leaf payload dicts
    counters: dict = field(default_factory=dict)


def _canon(url: str) -> str:
    return canonicalize([url]).to_pylist()[0]


def normalize_seeds(seeds: list[str]) -> list[str]:
    """Root-subsumption dedup (reference file_system_crawler.py:203-228):
    drop a seed when a previously accepted seed is its URL prefix (path
    boundary aware) or it is a prefix of one."""
    accepted: list[str] = []
    for s in seeds:
        c = _canon(s)
        dup = False
        for a in accepted:
            pa_, pc_ = a.rstrip("/") + "/", c.rstrip("/") + "/"
            if pc_.startswith(pa_) or pa_.startswith(pc_):
                dup = True
                break
        if not dup:
            accepted.append(c)
    return accepted


def crawl_oracle(
    web,  # any Source (SynthWeb, LocalFSSource, ...)
    seeds: list[str],
    chain: FilterChain | None = None,
    politeness_budget: int = 4,
    max_rounds: int = 100,
    fetch_payloads: bool = False,
    politeness_capacity: int | None = None,
    host_priorities: dict | None = None,
) -> OracleResult:
    res = OracleResult(counters={"skipped_robots": 0, "skipped_filters": 0, "skipped_seen": 0, "containers": 0, "leaves": 0})
    chain = chain or FilterChain()
    queues: dict[str, deque] = {}
    seen: set[int] = set()

    def host_of(url: str) -> str:
        return url.split("://", 1)[1].split("/", 1)[0].lower()

    def try_enqueue(url: str, depth: int, root_id: int) -> None:
        key = xxh64(url, seed=0)
        if key in seen:
            res.counters["skipped_seen"] += 1
            return
        seen.add(key)
        queues.setdefault(host_of(url), deque()).append((url, depth, root_id))

    for rid, s in enumerate(normalize_seeds(seeds)):
        try_enqueue(s, 0, rid)

    capacity = politeness_capacity if politeness_capacity is not None else politeness_budget
    tokens: dict[str, int] = {}
    last_refill: dict[str, int] = {}
    seq = 0
    for _round in range(max_rounds):
        active = sorted(h for h, q in queues.items() if q)
        if not active:
            break
        pending_children: list[tuple[int, int, str, int]] = []  # (parent_seq, child_idx, url, child_depth)
        for host in active:
            q = queues[host]
            emitted_this_host = 0
            elapsed = _round - last_refill.get(host, -1)
            # priority weight scales the refill rate down (engine's
            # FrontierShard._host_rate, minus salting — the oracle is unsalted)
            w = (host_priorities or {}).get(host)
            budget_h, cap_h = politeness_budget, capacity
            if w is not None and w < 1.0:
                budget_h, cap_h = max(1, int(budget_h * w)), max(1, int(cap_h * w))
            allowance = min(cap_h, tokens.get(host, 0) + budget_h * elapsed)
            while q and emitted_this_host < allowance:
                url, depth, root_id = q.popleft()
                if not web.robots_allowed(host, url):
                    res.counters["skipped_robots"] += 1
                    continue
                is_dir = web.is_container(url)
                meta = web.metadata(url)
                name = url.rstrip("/").rsplit("/", 1)[-1] if url.rstrip("/").count("/") >= 3 else ""
                ext = None
                if not is_dir and "." in name:
                    cand = name.rsplit(".", 1)[-1].lower()
                    ext = cand if len(cand) <= 12 else None
                row = {
                    "url": url,
                    "name": name,
                    "ext": ext,
                    "is_dir": is_dir,
                    "size": meta["size"],
                    "mtime": meta["mtime"],
                    "depth": depth,
                }
                if not chain.authorize(row):
                    res.counters["skipped_filters"] += 1
                    continue
                res.trace.append((seq, url))
                emitted_this_host += 1
                if is_dir:
                    res.counters["containers"] += 1
                    for ci, child in enumerate(web.children(url)):
                        pending_children.append((seq, ci, _canon(child), depth + 1, root_id))
                else:
                    res.counters["leaves"] += 1
                    if fetch_payloads:
                        payload = web.fetch(url)
                        if payload is not None:
                            payload = dict(payload, url=url, seq=seq, root_id=root_id)
                            res.rows.append(payload)
                seq += 1
            tokens[host] = allowance - emitted_this_host
            last_refill[host] = _round
        pending_children.sort(key=lambda t: (t[0], t[1]))
        for _ps, _ci, child, cdepth, crid in pending_children:
            try_enqueue(child, cdepth, crid)
    res.seen = seen
    return res
