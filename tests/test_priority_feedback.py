"""Frontier prioritization — the pagerank feedback loop (the rate-knob
mirror of auto-salting): host weights in (0, 1] scale a host's token-bucket
refill rate, so a de-prioritized host drains slower but the crawled URL SET,
seen-set exactness, the per-host politeness bound and engine≡oracle trace
parity all hold.  ``suggest_priorities`` turns the link graph observed by
the fetch tasks into the next run's weight plan.
"""

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

import ray

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.frontier import true_host
from fscrawler_ray.crawl.oracle import crawl_oracle
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=13, n_hosts=6, max_depth=4, fanout_dirs=2, fanout_files=4)
HOT = "host00.example.com"  # the synthetic web's cross-link magnet
SLOW = {HOT: 0.25}


def test_prioritized_crawl_same_urlset_and_scaled_rate(tmp_path):
    seeds = SynthWeb(CFG).seeds()

    plain = CrawlEngine(CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=150))
    plain.run(seeds)
    plain_urls = set(r["url"] for r in plain.trace_table().to_pylist())
    plain_seen = set(int(k) for k in plain.seen_keys())

    out = str(tmp_path / "out")
    slow = CrawlEngine(
        CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=150,
                    host_priorities=SLOW, out_dir=out)
    )
    slow.run(seeds)
    s_urls = set(r["url"] for r in slow.trace_table().to_pylist())

    # coverage is priority-INVARIANT: same URL set, same seen set
    assert s_urls == plain_urls
    assert set(int(k) for k in slow.seen_keys()) == plain_seen

    # per-round rate: deprioritized host ≤ max(1, int(4*0.25)) = 1,
    # everyone else keeps the full politeness budget
    by_round: dict[int, Counter] = {}
    for f in glob.glob(os.path.join(out + "_trace", "part-*.parquet")):
        rnd = int(os.path.basename(f).split("-")[1])
        cnt = by_round.setdefault(rnd, Counter())
        for h in pq.read_table(f, columns=["host"]).column("host").to_pylist():
            cnt[true_host(h)] += 1
    assert by_round, "no trace parts written"
    hot_rounds = 0
    for rnd, cnt in by_round.items():
        for host, n in cnt.items():
            assert n <= (1 if host == HOT else 4), (rnd, host, n)
        hot_rounds += int(cnt.get(HOT, 0) > 0)
    # the hot host really was throttled: it needs ≥4× the rounds it gets
    # at full rate for the same URL count
    hot_total = sum(c.get(HOT, 0) for c in by_round.values())
    assert hot_rounds >= hot_total  # ≤1 per round ⇒ at least one round each


def test_engine_trace_matches_oracle_under_priorities():
    seeds = SynthWeb(CFG).seeds()
    oracle = crawl_oracle(SynthWeb(CFG), seeds, politeness_budget=4,
                          max_rounds=150, host_priorities=SLOW)
    eng = CrawlEngine(
        CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=150,
                    host_priorities=SLOW)
    )
    eng.run(seeds)
    t = eng.trace_table()
    got = list(zip(t.column("seq").to_pylist(), t.column("url").to_pylist()))
    assert got == oracle.trace
    assert set(int(k) for k in eng.seen_keys()) == oracle.seen


def test_suggest_priorities_ranks_link_magnet_highest():
    eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=3, politeness_budget=4, max_rounds=150))
    eng.run(SynthWeb(CFG).seeds())
    plan = eng.suggest_priorities(floor=0.25)
    assert plan, "no link graph observed"
    assert all(0.25 <= w <= 1.0 for w in plan.values())
    assert max(plan.values()) == 1.0
    # the cross-link magnet host carries the top pagerank weight
    assert plan[HOT] == 1.0
    # weights are valid CrawlConfig input (the loop closes)
    CrawlEngine(CrawlConfig(web=CFG, host_priorities=plan))


def test_priority_weights_validated():
    with pytest.raises(ValueError, match="host_priorities"):
        CrawlEngine(CrawlConfig(web=CFG, host_priorities={HOT: 1.5}))
    with pytest.raises(ValueError, match="host_priorities"):
        CrawlEngine(CrawlConfig(web=CFG, host_priorities={HOT: 0.0}))


def test_feedback_survives_checkpoint_and_new_plan_wins(tmp_path):
    ck = str(tmp_path / "ck")
    eng = CrawlEngine(
        CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, max_rounds=6,
                    checkpoint_dir=ck)
    )
    eng.run(SynthWeb(CFG).seeds(), max_rounds=6)
    edges_before = dict(eng.host_edges)
    assert edges_before, "fetch tasks tallied no host links"
    eng.checkpoint()
    plan = eng.suggest_priorities()

    res = CrawlEngine.resume(
        CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, max_rounds=64,
                    checkpoint_dir=ck, host_priorities=plan)
    )
    # the feedback signal survived the checkpoint ...
    assert res.host_edges == edges_before
    # ... and the NEW weight plan reached every shard (not the old empty one)
    for st in ray.get([s.state.remote() for s in res.shards]):
        assert st["host_priorities"] == plan


def test_governor_plan_composes_all_levers(ray_session):
    from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
    from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

    cfg = WebConfig(seed=13, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=5)
    eng = CrawlEngine(
        CrawlConfig(web=cfg, n_shards=2, politeness_budget=3, max_rounds=20, max_urls_per_host=9)
    )
    eng.run(SynthWeb(cfg).seeds())
    plan = eng.governor_plan()
    assert set(plan) == {"salt_hosts", "host_priorities", "trapped_hosts"}
    # the plan must be directly consumable by the next CrawlConfig
    CrawlEngine(
        CrawlConfig(
            web=cfg, n_shards=2, politeness_budget=3, max_rounds=1,
            salt_hosts=plan["salt_hosts"], host_priorities=plan["host_priorities"],
            max_urls_per_host=9,
        )
    )
    assert plan["trapped_hosts"]  # the tight budget flags hosts
    assert all(0 < w <= 1 for w in plan["host_priorities"].values())
