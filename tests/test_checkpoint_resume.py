"""Kill/resume parity: a crawl checkpointed mid-run and resumed in fresh
actors must produce the identical trace, seen-set, and counters as an
uninterrupted run (the reference's DB-stage resume semantics,
/root/reference/app/index_files.py:53-79, externalized to manifests)."""

import tempfile

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=23, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=4)


def _mk(tmp, max_rounds, checkpoint_every=0):
    return CrawlConfig(
        web=CFG,
        n_shards=2,
        politeness_budget=3,
        max_rounds=max_rounds,
        checkpoint_dir=tmp,
        checkpoint_every=checkpoint_every,
    )


def test_checkpoint_resume_equals_uninterrupted():
    web = SynthWeb(CFG)
    seeds = web.seeds()

    full = CrawlEngine(_mk(None, 50))
    full.cfg.checkpoint_dir = None
    full.run(seeds)
    full_trace = full.trace_table().to_pylist()
    full_seen = set(int(k) for k in full.seen_keys())

    with tempfile.TemporaryDirectory() as tmp:
        # run only 3 rounds, checkpoint, drop the engine ("kill")
        part = CrawlEngine(_mk(tmp, 3))
        part.run(seeds)
        assert part.round_no <= 3
        part.checkpoint()
        del part

        resumed = CrawlEngine.resume(_mk(tmp, 50))
        resumed.run()  # continue from manifest (no seeds re-added)
        got_trace = resumed.trace_table().to_pylist()
        got_seen = set(int(k) for k in resumed.seen_keys())

    assert [(r["seq"], r["url"]) for r in got_trace] == [(r["seq"], r["url"]) for r in full_trace]
    assert got_seen == full_seen
    c_full = full.counters()
    c_res = resumed.counters()
    for k in ("emitted", "skipped_robots", "skipped_filters", "skipped_seen", "containers", "leaves"):
        assert c_res[k] == c_full[k], k
