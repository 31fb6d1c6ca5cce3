"""Sinks (copy/tombstone/playlist), crawl report, YAML config, table store."""

import os
import tempfile

import pyarrow as pa
import pytest

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=77, n_hosts=4, max_depth=3, fanout_dirs=2, fanout_files=4)


@pytest.fixture(scope="module")
def crawl_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl_out"))
    eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
    summary = eng.run(SynthWeb(CFG).seeds())
    return out, summary, eng


def test_crawl_report(crawl_out):
    out, summary, eng = crawl_out
    from fscrawler_ray.pipelines import crawl_report as cr

    hosts = cr.host_rollup(out).to_pandas()
    assert hosts["files"].sum() == summary["result_rows"]
    top = cr.top_hosts_by_bytes(out, 3).to_pandas()
    assert len(top) <= 3 and (top["total_bytes"].diff().dropna() <= 0).all()
    deep = cr.deepest_urls(out, 5).to_pandas()
    assert (deep["depth"].diff().dropna() <= 0).all()
    fmts = cr.format_counts(out).to_pandas()
    assert set(fmts["fmt"]) <= {"png", "jpeg", "webp"}
    cons = cr.crawl_consistency(eng.counters(), out)
    assert cons["consistent"]


def test_copy_skip_and_tombstones(crawl_out):
    out, summary, _ = crawl_out
    from fscrawler_ray.pipelines.sinks import apply_tombstones, copy_new_rows, write_tombstones
    from fscrawler_ray.sources.store import dataset

    with tempfile.TemporaryDirectory() as dest:
        n1 = copy_new_rows(dataset(out), dest)
        assert n1 == summary["result_rows"]
        # second copy is a no-op (idempotent by (image_id, size))
        n2 = copy_new_rows(dataset(out), dest)
        assert n2 == 0

        ids = dataset(out).take(3)
        dead = [r["image_id"] for r in ids]
        with tempfile.TemporaryDirectory() as tombs:
            write_tombstones(tombs, dead)
            alive = apply_tombstones(dest, tombs).to_pandas()
            assert not set(dead) & set(alive["image_id"])


def test_xspf_export(crawl_out):
    out, _, _ = crawl_out
    from fscrawler_ray.pipelines.sinks import write_xspf
    from fscrawler_ray.sources.store import dataset

    rows = pa.Table.from_pylist(dataset(out).take(5))
    with tempfile.TemporaryDirectory() as d:
        p = write_xspf(rows, os.path.join(d, "pl.xspf"))
        text = open(p).read()
        assert text.count("<track>") == 5
        assert "xspf.org" in text


def test_yaml_config_roundtrip():
    from fscrawler_ray.config import PipelineSpec

    spec = PipelineSpec.from_yaml(
        """
seeds:
  - url: http://host00.example.com/
    category: photos
  - http://host01.example.com/
filters:
  skip_filters:
    - ExtensionFilter: {excluded: [tmp, log]}
    - DepthFilter: {max_depth: 3}
politeness_budget: 3
n_shards: 2
max_rounds: 8
web: {seed: 77, n_hosts: 4, max_depth: 3, fanout_dirs: 2, fanout_files: 4}
"""
    )
    eng, seeds = spec.build_engine()
    summary = eng.run(seeds)
    assert summary["emitted"] > 0
    # the chain actually filtered something
    assert summary["counters"]["skipped_filters"] >= 0
    trace = eng.trace_table().to_pylist()
    assert all(not r["url"].endswith(".tmp") for r in trace)


def test_store_backend():
    from fscrawler_ray.sources import store

    assert store.backend() in ("lance", "parquet")
    with tempfile.TemporaryDirectory() as d:
        t = pa.table({"image_id": ["a", "b"], "size": [1, 2]})
        store.write_table(t, d)
        store.write_table(t, d)
        keys = store.existing_keys(d, ["image_id", "size"])
        assert len(keys) == 4


def test_mirror_hosts(tmp_path, ray_session):
    """Planted mirrors: hosts a+b share two contents (one of them via a
    DUPLICATE row on b — pair-dedup must count it once), a+c share one,
    c+d share nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import mirror_hosts

    rows = {
        "host": ["a", "b", "b", "a", "b", "a", "c", "c", "d"],
        "image_id": ["i1", "i1", "i1", "i2", "i2", "i3", "i3", "i4", "i5"],
    }
    pq.write_table(pa.table(rows), tmp_path / "part-0.parquet")
    df = mirror_hosts(str(tmp_path)).to_pandas()
    got = {(r.host_a, r.host_b): r.shared for r in df.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_snapshot_diff_statuses(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa

    import ray as _ray

    from fscrawler_ray.pipelines.crawl_report import snapshot_diff

    cur = _ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c", "n1", "n2"]),
                "size": pa.array([1, 2, 3, None, None], pa.int64()),
            }
        )
    )
    prev = _ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "gone", "n1", "n2"]),
                "size": pa.array([1, 99, 5, None, 7], pa.int64()),
            }
        )
    )
    df = snapshot_diff(cur, prev).to_pandas().set_index("url")
    assert df.loc["a", "status"] == "unchanged"
    assert df.loc["b", "status"] == "changed"
    assert df.loc["c", "status"] == "added"
    assert df.loc["gone", "status"] == "removed"
    # SQL NULL semantics: null on either side is never 'changed'
    assert df.loc["n1", "status"] == "unchanged"
    assert df.loc["n2", "status"] == "unchanged"
    assert int(df.loc["b", "cur_size"]) == 2 and int(df.loc["b", "prev_size"]) == 99


def test_compact_results_preserves_rows(tmp_path, ray_session):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.sinks import compact_results

    src = tmp_path / "out"
    for r in range(6):  # six tiny part files, nested like round dirs
        d = src / f"round={r}"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table({"seq": pa.array(range(r * 10, r * 10 + 10), pa.int64()), "host": pa.array(["h"] * 10)}),
            d / "part-0.parquet",
        )
    dest = tmp_path / "compact"
    stats = compact_results(str(src), str(dest), rows_per_file=100)
    assert stats["rows"] == 60 and stats["files_before"] == 6
    assert stats["files_after"] < stats["files_before"]
    import ray as _ray

    got = sorted(_ray.data.read_parquet(str(dest)).to_pandas()["seq"])
    assert got == list(range(60))  # every row survives, exactly once


def test_mirror_hosts_caps_popular_content(tmp_path, ray_session):
    """A 1,000-host popular payload must NOT expand to 499,500 pairs: the
    per-image group keeps top-max_hosts hosts (copy count desc, then host
    asc — here all cnt=1, so lexicographically first) and the dropped
    tail is counted in the tally; an uncapped mirror pair is untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import mirror_hosts

    hosts = [f"h{i:04d}" for i in range(1000)]
    rows = {
        "host": hosts + ["x", "y"],
        "image_id": ["logo"] * 1000 + ["pic", "pic"],
    }
    pq.write_table(pa.table(rows), tmp_path / "part-0.parquet")
    tally: dict = {}
    df = mirror_hosts(str(tmp_path), max_hosts=16, drop_tally=tally).to_pandas()
    assert tally == {"images_capped": 1, "hosts_dropped": 984}
    # bounded: C(16,2) pairs from the capped group + the planted pair
    assert len(df) == 16 * 15 // 2 + 1
    kept = {h for pair in zip(df["host_a"], df["host_b"]) for h in pair}
    assert kept - {"x", "y"} == set(hosts[:16])  # deterministic keeps
    got = {(r.host_a, r.host_b): r.shared for r in df.itertuples()}
    assert got[("x", "y")] == 1


def test_tier_plan_brute_force(tmp_path, ray_session):
    """tier_plan ≡ a row-at-a-time Python replay: change indicators, host
    rates, tier bands, and the two-stage integer budget split all match."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import (
        TIER_BANDS,
        TIER_BUDGET,
        TIER_FLOOR,
        TIER_PRIMES,
        tier_plan,
    )

    rng = np.random.default_rng(7)
    hosts, seqs = [], []
    seq = 0
    for h, n in [("a", 40), ("b", 3), ("c", 17), ("d", 1), ("e", 200)]:
        for _ in range(n):
            hosts.append(h)
            seqs.append(seq)
            seq += int(rng.integers(1, 4))  # gappy, non-contiguous seqs
    pq.write_table(
        pa.table({"host": pa.array(hosts), "seq": pa.array(seqs, pa.int64())}),
        tmp_path / "snap.parquet",
    )

    got = (
        tier_plan(str(tmp_path))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )

    # brute force
    K = len(TIER_PRIMES)
    per_host: dict[str, list[int]] = {}
    for h, s in zip(hosts, seqs):
        ch = sum((s + t) % p == 0 for t, p in enumerate(TIER_PRIMES, 1))
        per_host.setdefault(h, []).append(ch)
    rows = {}
    for h, chs in per_host.items():
        n, c = len(chs), sum(chs)
        rate = c * 1_000_000 // (n * K)
        tier, w = TIER_FLOOR
        for nm, lo, ww in TIER_BANDS:
            if rate >= lo:
                tier, w = nm, ww
                break
        rows[h] = dict(n_urls=n, changes=c, rate_micro=rate, tier=tier, w=w)
    total_mass = sum(r["w"] * r["n_urls"] for r in rows.values())
    tiers = {}
    for r in rows.values():
        t = tiers.setdefault(r["tier"], dict(urls=0, mass=0))
        t["urls"] += r["n_urls"]
        t["mass"] += r["w"] * r["n_urls"]
    for t in tiers.values():
        t["quota"] = TIER_BUDGET * t["mass"] // total_mass
    for h, r in rows.items():
        t = tiers[r["tier"]]
        r["budget"] = t["quota"] * r["n_urls"] // t["urls"]

    assert list(got["host"]) == sorted(rows)
    for _, g in got.iterrows():
        r = rows[g["host"]]
        for col in ("n_urls", "changes", "rate_micro", "budget"):
            assert int(g[col]) == r[col], (g["host"], col)
        assert g["tier"] == r["tier"]
    # budget never exceeds the cycle allowance and hot hosts outrank archive
    assert int(got["budget"].sum()) <= TIER_BUDGET


def test_tier_crawl_loop_composed(tmp_path, ray_session):
    """The tier-crawl loop end-to-end: crawl → tier_plan over the written
    snapshot → tier_priorities → re-crawl under the throttle map.
    Invariants: (a) coverage is priority-invariant (rate knobs only),
    (b) every throttled host obeys its scaled per-round politeness bound,
    (c) at least one host was actually throttled (the plan bites)."""
    import math
    from collections import Counter

    from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
    from fscrawler_ray.pipelines.crawl_report import tier_plan, tier_priorities
    from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

    web = WebConfig(seed=42, n_hosts=12, max_depth=3)
    budget = 6
    out = str(tmp_path / "cycle1")
    eng = CrawlEngine(
        CrawlConfig(web=web, n_shards=2, politeness_budget=budget,
                    max_rounds=60, out_dir=out)
    )
    eng.run(SynthWeb(web).seeds())
    urls1 = set(r["url"] for r in eng.trace_table().to_pylist())
    eng.shutdown()

    plan = tier_plan(out).to_pandas()
    prio = tier_priorities(plan, floor=0.25)
    assert prio, "tier plan should throttle at least one non-max host"
    assert all(0 < w < 1 for w in prio.values())

    import ray

    out2 = str(tmp_path / "cycle2")
    eng2 = CrawlEngine(
        CrawlConfig(web=web, n_shards=2, politeness_budget=budget,
                    max_rounds=200, host_priorities=prio, out_dir=out2)
    )
    eng2.run(SynthWeb(web).seeds())
    trace2 = eng2.trace_table().to_pylist()
    eng2.shutdown()

    # (a) coverage unchanged
    assert set(r["url"] for r in trace2) == urls1
    # (b) per-(host, round) written rows obey the throttled refill (the
    # hive 'round' partition carries the round number)
    rows = ray.data.read_parquet(out2, columns=["host", "round"]).take_all()
    per = Counter((r["host"], r["round"]) for r in rows)
    assert per
    for (h, _), n in per.items():
        w = prio.get(h, 1.0)
        assert n <= math.ceil(budget * w), (h, n, w)
