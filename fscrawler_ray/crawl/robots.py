"""Synthetic robots.txt rules + per-host cache.

Deterministic per host (pure function of the host name + seed) so the
oracle and every frontier shard compute identical rules without I/O. The
cache object is the actor-local "robots cache" the north rule names; in a
real deployment ``rules_for_host`` would fetch and parse ``/robots.txt``.
"""

from __future__ import annotations

from ..functions.hashing import xxh64


def rules_for_host(host: str, seed: int = 42) -> tuple[str, ...]:
    """Disallowed path prefixes for a host (possibly empty)."""
    h = xxh64(host, seed=seed)
    rules: list[str] = []
    # every host disallows /private* subtrees; a third also block /tmp
    rules.append("/private")
    if h % 3 == 0:
        rules.append("/tmp")
    if h % 11 == 0:
        rules.append("/gallery9")
    return tuple(rules)


class RobotsCache:
    """Per-host memoized rules + allow check (actor-local state)."""

    def __init__(self, seed: int = 42):
        self.seed = seed
        self._cache: dict[str, tuple[str, ...]] = {}

    def allowed(self, host: str, url: str) -> bool:
        rules = self._cache.get(host)
        if rules is None:
            rules = rules_for_host(host, self.seed)
            self._cache[host] = rules
        path = url.split("://", 1)[-1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        return not any(path.startswith(r) for r in rules)

    def stats(self) -> dict:
        return {"hosts_cached": len(self._cache)}
