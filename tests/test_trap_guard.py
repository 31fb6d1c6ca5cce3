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


def test_trap_budget_divides_across_salts(ray_session):
    """A salted host's k queues share the budget (max(1, cap//k) each), so
    salting can't multiply the host's URL space; and a salt-plan change on
    resume migrates the consumed budget instead of resetting it."""
    cap = 12
    salted = CrawlEngine(
        CrawlConfig(
            web=CFG, n_shards=2, politeness_budget=3, max_rounds=60,
            max_urls_per_host=cap, salt_hosts={CFG.hot_host: 2},
        )
    )
    salted.run(SynthWeb(CFG).seeds())
    t = salted.trace_table()
    per_host = t.group_by("host").aggregate([("url", "count")])
    assert pc.max(per_host.column("url_count")).as_py() <= cap  # not k*cap


def test_trap_budget_survives_salt_change_on_resume(tmp_path, ray_session):
    cap = 10
    d = str(tmp_path / "ckpt")
    partial = CrawlEngine(
        CrawlConfig(
            web=CFG, n_shards=2, politeness_budget=3, max_rounds=4,
            max_urls_per_host=cap, checkpoint_dir=d,
        )
    )
    partial.run(SynthWeb(CFG).seeds())
    partial.checkpoint()
    # resume with a NEW salt plan for the hot host: consumed budget is
    # redistributed (ceil-split), so the host cannot exceed ≈cap overall
    resumed = CrawlEngine.resume(
        CrawlConfig(
            web=CFG, n_shards=2, politeness_budget=3, max_rounds=60,
            max_urls_per_host=cap, checkpoint_dir=d, salt_hosts={CFG.hot_host: 2},
        )
    )
    resumed.run()
    t = resumed.trace_table()
    per_host = t.group_by("host").aggregate([("url", "count")])
    hosts = per_host.column("host").to_pylist()
    counts = dict(zip(hosts, per_host.column("url_count").to_pylist()))
    # ceil-split re-distribution may round the consumed budget up by at
    # most 1 per salt queue; the host still cannot exceed cap + k - 1
    assert counts.get(CFG.hot_host, 0) <= cap + 1
    assert max(counts.values()) <= cap + 1
