"""Observer hooks + should_stop cancellation (reference analog:
iCrawlerObserver notify loop + crawl_event.should_stop,
app/crawler/file_system_crawler.py:240-241): an observer cancels the crawl
mid-run; the stop is clean and checkpointed, and resuming completes with a
trace identical to an uninterrupted run."""

import tempfile

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=31, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=4)


def _cfg(tmp, max_rounds=50):
    return CrawlConfig(web=CFG, n_shards=2, politeness_budget=3,
                       max_rounds=max_rounds, checkpoint_dir=tmp)


def test_observer_rounds_and_cancel_resume_parity():
    seeds = SynthWeb(CFG).seeds()

    full = CrawlEngine(_cfg(None))
    full.cfg.checkpoint_dir = None
    events = []
    full.add_observer(lambda ev: events.append((ev.round, ev.emitted)))
    full.run(seeds)
    assert len(events) == full.round_no  # one event per processed round
    assert [e[0] for e in events] == list(range(full.round_no))
    full_trace = full.trace_table().to_pylist()

    with tempfile.TemporaryDirectory() as tmp:
        part = CrawlEngine(_cfg(tmp))

        def stop_after_2(ev):
            if ev.round >= 2:
                ev.should_stop = True

        part.add_observer(stop_after_2)
        part.run(seeds)
        assert part.stopped_early
        assert part.round_no == 3  # rounds 0..2 processed, stop at barrier
        del part

        resumed = CrawlEngine.resume(_cfg(tmp))
        resumed.run()
        got = resumed.trace_table().to_pylist()

    assert [(r["seq"], r["url"]) for r in got] == [(r["seq"], r["url"]) for r in full_trace]
