"""Skew detection: the Zipf-skewed hot host (cross-linked from everywhere)
shows up in the frontier's queue-depth signal mid-crawl."""

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=3, n_hosts=8, max_depth=4, fanout_dirs=3, fanout_files=5, cross_link_rate=0.4)


def test_hot_host_detected_midcrawl():
    web = SynthWeb(CFG)
    eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=3, politeness_budget=2, max_rounds=3))
    eng.run(web.seeds())
    hot = eng.hot_hosts()
    assert hot, "crawl truncated at 3 rounds must leave pending queues"
    hosts = [h for h, _ in hot]
    # the cross-link target accumulates the deepest backlog under a tight
    # politeness budget
    assert CFG.hot_host in hosts[:3]
    # signal is consistent with the aggregate pending count
    import ray

    total = sum(ray.get([s.pending_count.remote() for s in eng.shards]))
    assert sum(n for _, n in eng.hot_hosts(top=10**6)) == total
