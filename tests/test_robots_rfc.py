"""RFC 9309 robots semantics: longest-match allow/deny with * and $
wildcards (crawl/robots.rfc_*), the opt-in WebConfig.rfc_robots engine
mode, and scalar/batch evaluator agreement."""

import pyarrow as pa
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.oracle import crawl_oracle
from fscrawler_ray.crawl.robots import (
    RobotsCache,
    rfc_eval_paths,
    rfc_ruleset_for_host,
    rule_regex,
)
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig


def test_rule_regex_translation():
    assert rule_regex("/private") == "^/private"
    assert rule_regex("/*.tmp$") == "^/.*\\.tmp$"
    assert rule_regex("/a+b") == "^/a\\+b"


def _verdicts(paths, rules):
    a, d = rfc_eval_paths(pa.array(paths), rules)
    return list(a >= d)


def test_longest_match_allow_override():
    rules = [("/private", False), ("/private/pub*", True)]
    assert _verdicts(
        ["/private/x", "/private/pub1/img.png", "/public"], rules
    ) == [False, True, True]


def test_allow_wins_equal_length_tie():
    # RFC 9309: for equivalent-specificity rules, the least restrictive
    # (allow) applies
    rules = [("/page", False), ("/page", True)]
    assert _verdicts(["/page1"], rules) == [True]


def test_dollar_anchor_and_wildcard():
    rules = [("/*.tmp$", False)]
    assert _verdicts(["/a/b.tmp", "/a/b.tmp.bak", "/a.tmpx"], rules) == [
        False,
        True,
        True,
    ]


def test_no_match_is_implicit_allow():
    assert _verdicts(["/anything"], [("/private", False)]) == [True]


def test_scalar_cache_matches_batch_eval():
    cfg = WebConfig(seed=7, n_hosts=4, rfc_robots=True)
    web = SynthWeb(cfg)
    cache = RobotsCache(seed=7, rfc=True)
    host = "host01.example.com"
    urls = [
        f"http://{host}/private1/img_00001.png",
        f"http://{host}/private1/img_00001.jpg",
        f"http://{host}/gallery0/img_00002.tmp",
        f"http://{host}/gallery0/img_00002.log",
        f"http://{host}/",
    ]
    batch = web.robots_batch(host, urls)
    for u, b in zip(urls, batch):
        assert cache.allowed(host, u) == bool(b)


@pytest.mark.parametrize("n_shards", [1, 3])
def test_rfc_trace_matches_oracle(n_shards, ray_session):
    cfg = WebConfig(seed=11, n_hosts=6, max_depth=3, fanout_dirs=2, fanout_files=4, rfc_robots=True)
    oracle = crawl_oracle(SynthWeb(cfg), SynthWeb(cfg).seeds(), politeness_budget=3, max_rounds=50)
    eng = CrawlEngine(CrawlConfig(web=cfg, n_shards=n_shards, politeness_budget=3, max_rounds=50))
    eng.run(SynthWeb(cfg).seeds())
    etrace = eng.trace_table()
    got = list(zip(etrace.column("seq").to_pylist(), etrace.column("url").to_pylist()))
    assert got == oracle.trace
    assert eng.counters()["skipped_robots"] == oracle.counters["skipped_robots"]
    eng.shutdown()


def test_rfc_mode_changes_the_crawl(ray_session):
    """The RFC ruleset must actually bite: same web, legacy vs RFC robots
    produce different traces (wildcard denies + allow-overrides exist)."""
    base = dict(seed=11, n_hosts=6, max_depth=3, fanout_dirs=2, fanout_files=4)
    legacy = crawl_oracle(
        SynthWeb(WebConfig(**base)), SynthWeb(WebConfig(**base)).seeds(),
        politeness_budget=3, max_rounds=50,
    )
    rfc = crawl_oracle(
        SynthWeb(WebConfig(**base, rfc_robots=True)),
        SynthWeb(WebConfig(**base, rfc_robots=True)).seeds(),
        politeness_budget=3, max_rounds=50,
    )
    assert legacy.trace != rfc.trace


def test_ruleset_exercises_every_feature():
    """Across the host space the synthetic rulesets must include an
    allow-override, a wildcard deny and a $ anchor (else the parity tests
    prove nothing about those features)."""
    feats = {"allow": False, "star": False, "anchor": False}
    for i in range(32):
        for pattern, allow in rfc_ruleset_for_host(f"host{i:02d}.example.com"):
            feats["allow"] |= allow
            feats["star"] |= "*" in pattern
            feats["anchor"] |= pattern.endswith("$")
    assert all(feats.values()), feats


def test_robots_diff_planted_rule_change(tmp_path):
    """robots_diff: the seed change flips verdicts exactly where the
    rulesets disagree; totals partition (denied_new = newly_denied +
    (denied_old - newly_allowed))."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.crawl.robots import rfc_eval_paths, rfc_ruleset_for_host
    from fscrawler_ray.pipelines.crawl_report import robots_diff

    host = "h0.example"
    paths = ["/gallery1/a.png", "/private0/x.jpg", "/tmp/y.log", "/a/b.png", "/z.tmp"]
    t = pa.table(
        {
            "url": pa.array([f"http://{host}{p}" for p in paths], pa.string()),
            "host": pa.array([host] * len(paths), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = robots_diff(str(tmp_path), old_seed=42, new_seed=43).to_pandas().iloc[0]

    def ok(seed, p):
        a, d = rfc_eval_paths(pa.array([p]), rfc_ruleset_for_host(host, seed))
        return a[0] >= d[0]

    exp_nd = sum(1 for p in paths if ok(42, p) and not ok(43, p))
    exp_na = sum(1 for p in paths if not ok(42, p) and ok(43, p))
    assert out["n_urls"] == len(paths)
    assert out["newly_denied"] == exp_nd
    assert out["newly_allowed"] == exp_na
    assert out["denied_new"] == out["denied_old"] - exp_na + exp_nd
