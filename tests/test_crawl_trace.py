"""Trace-equivalence: the distributed engine must reproduce the independent
single-threaded oracle's frontier trace and final seen-set exactly, at any
shard count / parallelism (the north rule's core check)."""

import numpy as np
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.oracle import crawl_oracle, normalize_seeds
from fscrawler_ray.filters.factory import build_chain_from_spec
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=11, n_hosts=6, max_depth=3, fanout_dirs=2, fanout_files=4)

CHAIN_SPEC = {
    "skip_filters": [
        {"ExtensionFilter": {"excluded": ["tmp", "log"]}},
        {"NameFilter": {"excluded_names": [".DS_Store"]}},
    ]
}


def run_engine(n_shards, budget=3, max_rounds=50, chain_spec=None, seeds=None):
    web = SynthWeb(CFG)
    eng = CrawlEngine(
        CrawlConfig(
            web=CFG,
            chain_spec=chain_spec,
            n_shards=n_shards,
            politeness_budget=budget,
            max_rounds=max_rounds,
        )
    )
    eng.run(seeds or web.seeds())
    return eng


def run_oracle(budget=3, max_rounds=50, chain_spec=None, seeds=None):
    web = SynthWeb(CFG)
    chain = build_chain_from_spec(chain_spec) if chain_spec else None
    return crawl_oracle(web, seeds or web.seeds(), chain=chain, politeness_budget=budget, max_rounds=max_rounds)


def test_normalize_seeds_subsumption():
    seeds = ["http://a.com/x", "http://a.com/x/y", "http://a.com", "http://b.com/"]
    # second is under first; third is an ancestor of first -> both dropped
    assert normalize_seeds(seeds) == ["http://a.com/x", "http://b.com/"]


@pytest.mark.parametrize("n_shards", [1, 2, 3, 8])
def test_trace_matches_oracle(n_shards):
    oracle = run_oracle()
    eng = run_engine(n_shards)
    etrace = eng.trace_table()
    got = list(zip(etrace.column("seq").to_pylist(), etrace.column("url").to_pylist()))
    assert got == oracle.trace
    assert set(int(k) for k in eng.seen_keys()) == oracle.seen


def test_trace_matches_with_filter_chain():
    oracle = run_oracle(chain_spec=CHAIN_SPEC)
    eng = run_engine(2, chain_spec=CHAIN_SPEC)
    etrace = eng.trace_table()
    got = list(zip(etrace.column("seq").to_pylist(), etrace.column("url").to_pylist()))
    assert got == oracle.trace
    assert set(int(k) for k in eng.seen_keys()) == oracle.seen
    c = eng.counters()
    assert c["skipped_filters"] == oracle.counters["skipped_filters"]
    assert c["skipped_robots"] == oracle.counters["skipped_robots"]
    assert c["skipped_seen"] == oracle.counters["skipped_seen"]


def test_partial_crawl_budget_determinism():
    # same politeness budget ⇒ same ordering, even truncated
    oracle = run_oracle(budget=2, max_rounds=4)
    eng = run_engine(3, budget=2, max_rounds=4)
    etrace = eng.trace_table()
    got = list(zip(etrace.column("seq").to_pylist(), etrace.column("url").to_pylist()))
    assert got == oracle.trace
    # a different budget gives a different (but still deterministic) trace
    oracle_b3 = run_oracle(budget=3, max_rounds=4)
    assert oracle_b3.trace != oracle.trace


def test_robots_block_private():
    # seed a robots-disallowed path directly: it must be enqueued (seen) but
    # never emitted, in both oracle and engine
    seeds = ["http://qq.example.com/private0", "http://rr.example.com/"]
    oracle = run_oracle(seeds=seeds)
    assert oracle.counters["skipped_robots"] >= 1
    assert all("/private0" not in u or not u.endswith("/private0") for _, u in oracle.trace)
    eng = run_engine(2, seeds=seeds)
    assert eng.counters()["skipped_robots"] == oracle.counters["skipped_robots"]
    # rules are path-prefix based from the root
    for _, u in oracle.trace:
        rest = u.split("://", 1)[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
        assert not path.startswith("/private")


def test_result_rows_match_oracle_payloads():
    oracle = run_oracle(max_rounds=6, budget=3)
    oracle_fetch = run_oracle(max_rounds=6, budget=3)
    web = SynthWeb(CFG)
    # oracle with payloads
    from fscrawler_ray.crawl.oracle import crawl_oracle as co

    o = co(web, web.seeds(), politeness_budget=3, max_rounds=6, fetch_payloads=True)
    eng = run_engine(2, budget=3, max_rounds=6)
    assert eng.result_rows == len(o.rows)
    _ = (oracle, oracle_fetch)
