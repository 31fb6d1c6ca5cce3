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


def rfc_ruleset_for_host(host: str, seed: int = 42) -> tuple[tuple[str, bool], ...]:
    """RFC 9309-style (pattern, allow) ruleset for a host.

    Patterns use the robots.txt matching language: plain prefixes, ``*``
    (any char run) and a trailing ``$`` end-of-path anchor.  The legacy
    prefix rules (rules_for_host) are a strict subset, extended with
    deterministic allow-overrides and wildcard denies so longest-match
    precedence is actually exercised.  Deterministic per (host, seed) —
    every frontier shard and the oracle derive identical rules with no
    I/O, mirroring a real deployment's fetched-and-cached /robots.txt."""
    h = xxh64(host, seed=seed)
    rules: list[tuple[str, bool]] = [("/private", False)]
    if h % 2 == 0:
        # allow-override INSIDE the denied subtree: longer pattern wins,
        # so /privateN/img_*.png files survive on these hosts
        rules.append(("/private*/img_*.png$", True))
    if h % 3 == 0:
        rules.append(("/tmp", False))
        rules.append(("/*.tmp$", False))
    if h % 5 == 0:
        rules.append(("/*.log$", False))
    if h % 11 == 0:
        rules.append(("/gallery9", False))
        rules.append(("/gallery9/*.jpg$", True))
    return tuple(rules)


def rule_regex(pattern: str) -> str:
    """Translate a robots.txt pattern to an anchored RE2 regex: ``*`` →
    ``.*``, trailing ``$`` → end anchor, everything else literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in "\\.^$+?()[]{}|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)


def rfc_eval_paths(path, rules) -> tuple:
    """Vectorized RFC 9309 verdict over an Arrow path array.

    One RE2 pass per RULE (rules are bounded, paths are not), folding the
    longest matching allow/deny pattern lengths per path. Verdict:
    ``allow_len >= deny_len`` — the most specific (longest) rule wins and
    allow wins ties; no match at all is an implicit allow (allow_len 0 vs
    deny_len -1). Precedence length is ``len(pattern)`` octets, the same
    measure the SQL oracle uses."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(path, pa.ChunkedArray):
        path = path.combine_chunks()
    n = len(path)
    allow_len = np.zeros(n, dtype=np.int64)
    deny_len = np.full(n, -1, dtype=np.int64)
    for pattern, allow in rules:
        m = pc.match_substring_regex(path, rule_regex(pattern)).to_numpy(
            zero_copy_only=False
        )
        ln = len(pattern)
        if allow:
            allow_len = np.where(m & (ln > allow_len), ln, allow_len)
        else:
            deny_len = np.where(m & (ln > deny_len), ln, deny_len)
    return allow_len, deny_len


class RobotsCache:
    """Per-host memoized rules + allow check (actor-local state).

    ``rfc=True`` switches from legacy prefix-disallow semantics to the
    RFC 9309 longest-match allow/deny evaluator (wildcards + $ anchor)."""

    def __init__(self, seed: int = 42, rfc: bool = False):
        self.seed = seed
        self.rfc = rfc
        self._cache: dict[str, tuple] = {}

    def _rules(self, host: str):
        rules = self._cache.get(host)
        if rules is None:
            rules = (
                rfc_ruleset_for_host(host, self.seed)
                if self.rfc
                else rules_for_host(host, self.seed)
            )
            self._cache[host] = rules
        return rules

    def allowed(self, host: str, url: str) -> bool:
        rules = self._rules(host)
        path = url.split("://", 1)[-1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        if not self.rfc:
            return not any(path.startswith(r) for r in rules)
        import pyarrow as pa

        allow_len, deny_len = rfc_eval_paths(pa.array([path]), rules)
        return bool(allow_len[0] >= deny_len[0])

    def stats(self) -> dict:
        return {"hosts_cached": len(self._cache)}
