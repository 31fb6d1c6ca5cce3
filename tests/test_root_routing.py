"""Per-root routing: category / min_age / target_table flow from seeds
through the frontier lineage into per-table output datasets (the
reference's per-root config + target_table routing,
file_system_crawler.py:220-225, 376)."""

import glob
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=61, n_hosts=4, max_depth=3, fanout_dirs=2, fanout_files=4, cross_link_rate=0.0)


def test_target_table_routing():
    web = SynthWeb(CFG)
    seeds = web.seeds()[:4]
    meta = [
        {"category": "photos", "min_age": 3, "target_table": "media"},
        {"category": "games", "min_age": 12, "target_table": "games"},
        {"category": "photos", "min_age": 3, "target_table": "media"},
        {"category": "docs", "min_age": 7, "target_table": "archive"},
    ]
    with tempfile.TemporaryDirectory() as out:
        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        s = eng.run(seeds, seed_meta=meta)
        assert s["result_rows"] > 0
        files = glob.glob(out + "/**/*.parquet", recursive=True)
        tables = sorted({f.split("table-")[1].split("/")[0] for f in files if "table-" in f})
        assert set(tables) <= {"media", "games", "archive"}
        assert len(tables) >= 2
        t = pa.concat_tables([pq.read_table(f) for f in files])
        rows = t.to_pylist()
        host_of = lambda u: u.split("://", 1)[1].split("/", 1)[0]
        for r in rows:
            rid = r["root_id"]
            assert r["category"] == meta[rid]["category"]
            assert r["min_age"] == meta[rid]["min_age"]
            assert r["target_table"] == meta[rid]["target_table"]
            # with cross-links disabled, lineage matches the seed's host
            assert host_of(r["url"]) == host_of(seeds[rid])


def test_default_meta_when_unspecified():
    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as out:
        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        eng.run(web.seeds())
        files = glob.glob(out + "/**/*.parquet", recursive=True)
        assert files and all("table-results" in f for f in files)
