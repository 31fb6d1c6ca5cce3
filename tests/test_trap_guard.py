"""Crawler-trap guard: the per-host discovery budget caps unbounded URL
spaces, is shard-invariant, survives checkpoint/resume, and leaves
uncapped hosts untouched."""

import pyarrow.compute as pc
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=13, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=5)


def _run(cap, n_shards=2, checkpoint_dir=None, checkpoint_every=0):
    eng = CrawlEngine(
        CrawlConfig(
            web=CFG,
            n_shards=n_shards,
            politeness_budget=3,
            max_rounds=60,
            max_urls_per_host=cap,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
        )
    )
    eng.run(SynthWeb(CFG).seeds())
    return eng


def test_trap_budget_caps_every_host(ray_session):
    capped = _run(cap=12)
    t = capped.trace_table()
    per_host = t.group_by("host").aggregate([("url", "count")])
    # emitted ≤ enqueued ≤ cap for every host
    assert pc.max(per_host.column("url_count")).as_py() <= 12
    s = capped.summary()
    assert s["counters"]["trap_dropped"] > 0
    assert len(s["trapped_hosts"]) > 0
    free = _run(cap=None)
    assert len(free.trace_table()) > len(t)
    assert "trapped_hosts" not in free.summary()
    assert free.summary()["counters"]["trap_dropped"] == 0


@pytest.mark.parametrize("n_shards", [1, 3])
def test_trap_budget_shard_invariant(n_shards, ray_session):
    base = _run(cap=9, n_shards=2).trace_table()
    other = _run(cap=9, n_shards=n_shards).trace_table()
    assert base.column("url").to_pylist() == other.column("url").to_pylist()
    assert base.column("seq").to_pylist() == other.column("seq").to_pylist()


def test_trap_budget_resume_continues_counting(tmp_path, ray_session):
    full = _run(cap=10).trace_table()
    d = str(tmp_path / "ckpt")
    partial = CrawlEngine(
        CrawlConfig(
            web=CFG, n_shards=2, politeness_budget=3, max_rounds=4,
            max_urls_per_host=10, checkpoint_dir=d,
        )
    )
    partial.run(SynthWeb(CFG).seeds())
    partial.checkpoint()
    resumed = CrawlEngine.resume(
        CrawlConfig(
            web=CFG, n_shards=2, politeness_budget=3, max_rounds=60,
            max_urls_per_host=10, checkpoint_dir=d,
        )
    )
    resumed.run()  # continue from manifest (no seeds re-added)
    assert resumed.trace_table().column("url").to_pylist() == full.column("url").to_pylist()
