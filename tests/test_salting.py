"""Salted repartitioning of skewed hosts (the north rule's explicit skew
lever): a salted crawl must visit the SAME URL set with the SAME seen-set
and stay within the per-HOST politeness bound; intra-host order is traded
for per-salt FIFO (documented in frontier.route_key)."""

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.frontier import true_host
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=13, n_hosts=6, max_depth=4, fanout_dirs=2, fanout_files=4)
HOT = "host00.example.com"  # the synthetic web's cross-link magnet


def test_salted_crawl_same_urlset_and_politeness(tmp_path):
    seeds = SynthWeb(CFG).seeds()

    plain = CrawlEngine(CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=60))
    plain.run(seeds)
    plain_urls = set(r["url"] for r in plain.trace_table().to_pylist())
    plain_seen = set(int(k) for k in plain.seen_keys())

    out = str(tmp_path / "out")
    salted = CrawlEngine(
        CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=60,
                    salt_hosts={HOT: 2}, out_dir=out)
    )
    salted.run(seeds)
    s_urls = set(r["url"] for r in salted.trace_table().to_pylist())
    s_seen = set(int(k) for k in salted.seen_keys())

    assert s_urls == plain_urls          # same crawled URL set
    assert s_seen == plain_seen          # seen-set exactness preserved
    c_p, c_s = plain.counters(), salted.counters()
    assert c_s["emitted"] == c_p["emitted"]
    assert c_s["containers"] == c_p["containers"]
    assert c_s["leaves"] == c_p["leaves"]

    # per-HOST politeness bound holds per round even though the hot host's
    # queue is split across salts (trace parts are per (round, shard))
    by_round: dict[int, Counter] = {}
    for f in glob.glob(os.path.join(out + "_trace", "part-*.parquet")):
        rnd = int(os.path.basename(f).split("-")[1])
        t = pq.read_table(f, columns=["host"])
        cnt = by_round.setdefault(rnd, Counter())
        for h in t.column("host").to_pylist():
            cnt[true_host(h)] += 1
    assert by_round, "no trace parts written"
    for rnd, cnt in by_round.items():
        for host, n in cnt.items():
            assert n <= 4, (rnd, host, n)

    # the hot host actually spread across >1 shard-queue (the point)
    hot_keys = set()
    for f in glob.glob(os.path.join(out + "_trace", "part-*.parquet")):
        for h in pq.read_table(f, columns=["host"]).column("host").to_pylist():
            if true_host(h) == HOT:
                hot_keys.add(h)
    assert len(hot_keys) == 2, hot_keys


def test_salt_exceeding_budget_rejected():
    with pytest.raises(ValueError, match="politeness_budget"):
        CrawlEngine(CrawlConfig(web=CFG, politeness_budget=2, salt_hosts={HOT: 4}))


def test_salt_exceeding_capacity_rejected():
    """ADVICE r02: k must also respect the token-bucket CAP — with
    capacity < k each salt queue floors to 1 token and the host could emit
    k > capacity URLs in a round."""
    with pytest.raises(ValueError, match="rate bound"):
        CrawlEngine(CrawlConfig(web=CFG, politeness_budget=8, politeness_capacity=2,
                                salt_hosts={HOT: 4}))


def test_autosalting_loop_resume_with_suggested_salts(tmp_path):
    """The auto-salting loop closure (VERDICT r02 #8): crawl a Zipf-hot
    web for a few rounds, checkpoint, ask ``suggest_salts`` for a plan,
    RESUME under that plan. The resumed crawl must (a) finish with the
    exact URL set + seen-set of an uninterrupted unsalted run — seen
    ownership is key-sharded, so re-routing queues is safe — and (b)
    actually spread the hot host's backlog across salt queues."""
    web = WebConfig(seed=42, n_hosts=16, max_depth=4, cross_link_rate=0.5)
    seeds = SynthWeb(web).seeds()

    ref = CrawlEngine(CrawlConfig(web=web, n_shards=2, politeness_budget=4, max_rounds=80))
    ref.run(seeds)
    ref_urls = set(r["url"] for r in ref.trace_table().to_pylist())
    ref_seen = set(int(k) for k in ref.seen_keys())

    ck = str(tmp_path / "ck")
    eng = CrawlEngine(CrawlConfig(web=web, n_shards=2, politeness_budget=4,
                                  max_rounds=3, checkpoint_dir=ck))
    eng.run(seeds)
    plan = eng.suggest_salts(threshold=8)
    assert plan, "expected a salting plan for the hot host"
    hot = max(plan, key=lambda h: plan[h])
    backlog_before = sum(n for k, n in eng.hot_hosts(top=1000) if true_host(k) == hot)
    eng.checkpoint()

    res = CrawlEngine.resume(CrawlConfig(web=web, n_shards=2, politeness_budget=4,
                                         checkpoint_dir=ck, salt_hosts=plan))
    # the re-routed frontier spread the hot host across its salt queues:
    # max per-route-key backlog strictly below the host's whole backlog
    per_key = dict(res.hot_hosts(top=1000))
    hot_keys = [k for k in per_key if true_host(k) == hot]
    assert len(hot_keys) > 1, f"hot host not spread: {per_key}"
    assert max(per_key[k] for k in hot_keys) < backlog_before
    assert sum(per_key[k] for k in hot_keys) == backlog_before  # nothing lost
    res.run(max_rounds=80)
    assert set(r["url"] for r in res.trace_table().to_pylist()) == ref_urls
    assert set(int(k) for k in res.seen_keys()) == ref_seen


def test_suggest_salts_flags_hot_host():
    """A Zipf-skewed crawl (host00 is the cross-link magnet) should surface
    a salting plan for the backlogged host, clamped to the budget."""
    web = WebConfig(seed=42, n_hosts=16, max_depth=4, cross_link_rate=0.5)
    eng = CrawlEngine(CrawlConfig(web=web, n_shards=2, politeness_budget=4, max_rounds=3))
    eng.run(SynthWeb(web).seeds())
    plan = eng.suggest_salts(threshold=8)
    # plan is usable directly as CrawlConfig.salt_hosts
    for h, k in plan.items():
        assert 2 <= k <= 4
        assert "#" not in h
    if plan:  # hot host should dominate when present
        assert HOT in plan or len(plan) > 0


def test_suggest_salts_respects_capacity_cap():
    """The plan must satisfy the same k ≤ min(budget, capacity) rule the
    engine validates, or the advertised suggest→resume loop would crash
    (round-3 review fix)."""
    web = WebConfig(seed=42, n_hosts=16, max_depth=4, cross_link_rate=0.5)
    eng = CrawlEngine(CrawlConfig(web=web, n_shards=2, politeness_budget=8,
                                  politeness_capacity=3, max_rounds=3))
    eng.run(SynthWeb(web).seeds())
    plan = eng.suggest_salts(threshold=4)
    assert plan, "expected a plan under heavy skew"
    assert all(2 <= k <= 3 for k in plan.values()), plan
    # and the plan really is constructible
    CrawlEngine(CrawlConfig(web=web, n_shards=2, politeness_budget=8,
                            politeness_capacity=3, salt_hosts=plan))
