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


def test_bloom_semi_join_exact_and_prune_modes(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray as _ray

    from fscrawler_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(5)
    left = pa.table({"k": pa.array(rng.integers(0, 5000, 20000), pa.int64())})
    keys = np.unique(rng.integers(0, 5000, 200)).astype(np.int64)
    ds = _ray.data.from_arrow(left).repartition(4)
    got = bloom_semi_join(ds, keys, on="k").to_pandas()["k"].to_numpy()
    truth = left.column("k").to_numpy(zero_copy_only=False)
    truth = truth[np.isin(truth, keys)]
    assert sorted(got) == sorted(truth)  # exact mode == true semi join
    # prune mode is a SUPERSET (bloom has no false negatives) and still
    # drops the vast majority of non-matching rows at 1e-3 fp
    pruned = bloom_semi_join(ds, keys, on="k", exact=False).to_pandas()["k"].to_numpy()
    assert set(truth) <= set(pruned)
    assert len(pruned) <= len(truth) + 0.01 * len(left)
