"""The adaptive-crawl governor END-TO-END (VERDICT r03 #8): salts +
priorities + trap flags composed in ONE plan, applied through checkpoint →
resume, at two shard counts.  The piecewise levers are covered by
test_salting / test_priority_feedback / test_trap_guard; this asserts the
COMPOSED plan keeps every invariant at once:

(a) the resumed crawl finishes with the exact URL set + seen set of an
    uninterrupted run under the same discovery budget,
(b) re-routing under the plan's salts strictly reduces the hot host's
    max per-route-key backlog (the skew lever actually bites),
(c) the per-HOST politeness rate bound holds per round even with salted
    queues and down-weighted priorities in play.
"""

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.frontier import true_host
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

WEB = WebConfig(seed=42, n_hosts=16, max_depth=4, cross_link_rate=0.5)
BUDGET = 4
CAP = 16  # discovery budget: low enough to trap the cross-link magnet within the truncated run


@pytest.mark.parametrize("n_shards", [2, 8])
def test_governor_plan_composed_resume(tmp_path, n_shards):
    seeds = SynthWeb(WEB).seeds()

    ref = CrawlEngine(
        CrawlConfig(web=WEB, n_shards=n_shards, politeness_budget=BUDGET,
                    max_rounds=150, max_urls_per_host=CAP)
    )
    ref.run(seeds)
    ref_urls = set(r["url"] for r in ref.trace_table().to_pylist())
    ref_seen = set(int(k) for k in ref.seen_keys())
    ref.shutdown()

    ck = str(tmp_path / f"ck{n_shards}")
    eng = CrawlEngine(
        CrawlConfig(web=WEB, n_shards=n_shards, politeness_budget=BUDGET,
                    max_rounds=3, max_urls_per_host=CAP, checkpoint_dir=ck)
    )
    eng.run(seeds)
    plan = eng.governor_plan(salt_threshold=8)
    # every lever fired on this web: backlog salts, link-graph priorities,
    # discovery-budget trap flags
    assert plan["salt_hosts"], plan
    assert plan["host_priorities"] and all(0 < w <= 1 for w in plan["host_priorities"].values())
    assert plan["trapped_hosts"], plan
    hot = max(plan["salt_hosts"], key=lambda h: plan["salt_hosts"][h])
    backlog_before = sum(n for k, n in eng.hot_hosts(top=1000) if true_host(k) == hot)
    eng.checkpoint()
    eng.shutdown(cleanup_spool=False)

    out = str(tmp_path / f"out{n_shards}")
    res = CrawlEngine.resume(
        CrawlConfig(web=WEB, n_shards=n_shards, politeness_budget=BUDGET,
                    max_urls_per_host=CAP, checkpoint_dir=ck, out_dir=out,
                    salt_hosts=plan["salt_hosts"],
                    host_priorities=plan["host_priorities"])
    )
    # (b) the salts spread the hot backlog: strictly below the whole-host
    # backlog per route key, nothing lost
    per_key = dict(res.hot_hosts(top=1000))
    hot_keys = [k for k in per_key if true_host(k) == hot]
    assert len(hot_keys) > 1, per_key
    assert max(per_key[k] for k in hot_keys) < backlog_before
    assert sum(per_key[k] for k in hot_keys) == backlog_before

    res.run(max_rounds=200)
    # (a) coverage is plan-invariant
    assert set(r["url"] for r in res.trace_table().to_pylist()) == ref_urls
    assert set(int(k) for k in res.seen_keys()) == ref_seen

    # (c) per-HOST politeness bound per round, salts + priorities composed
    # (resume inherits the manifest's trace spool, so read res.trace_dir —
    # it holds the truncated rounds AND the resumed ones)
    by_round: dict[int, Counter] = {}
    for f in glob.glob(os.path.join(res.trace_dir, "part-*.parquet")):
        rnd = int(os.path.basename(f).split("-")[1])
        cnt = by_round.setdefault(rnd, Counter())
        for h in pq.read_table(f, columns=["host"]).column("host").to_pylist():
            cnt[true_host(h)] += 1
    assert by_round, "no trace parts written"
    for rnd, cnt in by_round.items():
        for host, n in cnt.items():
            assert n <= BUDGET, (rnd, host, n)
    res.shutdown()
