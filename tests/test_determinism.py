"""Output determinism: the crawl's RESULT ROWS (not just the trace) must
be identical regardless of shard count and fetch chunking — the
partitioning knobs are pure performance levers (crawl/semantics.md)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=29, n_hosts=5, max_depth=3, fanout_dirs=2, fanout_files=4)


def _rows(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    df = t.select(["seq", "url", "host", "size", "phash", "caption", "round"]).to_pandas()
    return df.sort_values("seq").reset_index(drop=True)


def test_results_invariant_to_shards_and_chunking(tmp_path):
    seeds = SynthWeb(CFG).seeds()
    outs = []
    for i, (n_shards, fc) in enumerate([(2, None), (4, 3), (1, 1)]):
        out = str(tmp_path / f"out{i}")
        eng = CrawlEngine(
            CrawlConfig(web=CFG, n_shards=n_shards, politeness_budget=3,
                        max_rounds=40, out_dir=out, fetch_concurrency=fc)
        )
        eng.run(seeds)
        outs.append(_rows(out))
    base = outs[0]
    for other in outs[1:]:
        pa_base = pa.Table.from_pandas(base, preserve_index=False)
        pa_other = pa.Table.from_pandas(other, preserve_index=False)
        assert pa_base.equals(pa_other), "results differ across partitioning configs"
