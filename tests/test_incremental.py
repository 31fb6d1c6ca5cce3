"""Incremental re-crawl: second run against the first run's results skips
unchanged payload fetches entirely but produces the identical trace and
seen-set (reference semantics: unchanged-path skip,
/root/reference/app/crawling_queue_consumer.py:110-115; README's 157×
re-run speedup)."""

import glob
import tempfile

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=31, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=4)


def test_incremental_recrawl_skips_unchanged():
    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as out1, tempfile.TemporaryDirectory() as out2:
        first = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out1))
        s1 = first.run(web.seeds())
        assert s1["result_rows"] > 0
        files1 = glob.glob(out1 + "/**/*.parquet", recursive=True)
        assert files1, "first run must write partitioned parquet"

        second = CrawlEngine(
            CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out2, prev_index_dir=out1)
        )
        s2 = second.run(web.seeds())

        # identical frontier behavior
        assert second.trace_table().to_pylist() == first.trace_table().to_pylist()
        assert list(second.seen_keys()) == list(first.seen_keys())
        # every payload that was fetched the first time is skipped now
        assert s2["skipped_unchanged"] == s1["result_rows"]
        assert s2["result_rows"] == 0
        files2 = glob.glob(out2 + "/**/*.parquet", recursive=True)
        assert files2 == []  # nothing rewritten


def test_round_history_progress():
    web = SynthWeb(CFG)
    eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4))
    eng.run(web.seeds())
    assert eng.round_history
    assert sum(h["emitted"] for h in eng.round_history) == eng.seq_offset
