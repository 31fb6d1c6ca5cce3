"""Token-bucket politeness: tokens accumulate while a host is idle (up to
capacity), and the engine's trace still matches the oracle exactly — the
'same politeness budget ⇒ same ordering' contract generalized to bursts."""

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.oracle import crawl_oracle
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=13, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=5)


def run_pair(budget, capacity):
    web = SynthWeb(CFG)
    oracle = crawl_oracle(
        web, web.seeds(), politeness_budget=budget, politeness_capacity=capacity, max_rounds=50
    )
    eng = CrawlEngine(
        CrawlConfig(
            web=CFG, n_shards=3, politeness_budget=budget, politeness_capacity=capacity, max_rounds=50
        )
    )
    eng.run(web.seeds())
    et = eng.trace_table()
    got = list(zip(et.column("seq").to_pylist(), et.column("url").to_pylist()))
    return oracle, got


def test_bursty_capacity_matches_oracle():
    oracle, got = run_pair(budget=2, capacity=6)
    assert got == oracle.trace
    assert len(oracle.trace) > 0


def test_capacity_changes_ordering():
    o_plain, _ = run_pair(budget=2, capacity=2)
    o_burst, _ = run_pair(budget=2, capacity=6)
    # bursts change the schedule (but each is individually deterministic)
    assert o_plain.trace != o_burst.trace
    # ... without changing WHAT gets crawled eventually
    assert o_plain.seen == o_burst.seen
