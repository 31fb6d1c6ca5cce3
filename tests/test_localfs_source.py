"""The pluggable Source protocol: a local-filesystem crawl through the SAME
frontier engine (the reference's native domain,
app/crawler/file_system_crawler.py:404-505), with trace parity against the
single-threaded oracle and payload round-trip checks."""

import os

import numpy as np
import pyarrow as pa

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.oracle import crawl_oracle
from fscrawler_ray.functions.codecs import encode, synth_image
from fscrawler_ray.sources.base import make_source
from fscrawler_ray.sources.localfs import LocalFSSource


def _build_tree(root):
    """Two roots with nested dirs, decodable images, and junk files."""
    n_img = 0
    for sub in ["", "a", "a/deep", "b"]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(3):
            img = synth_image(hash((sub, i)) & 0xFFFF, 48 + 8 * i, 52)
            fmt = ["png", "jpeg", "webp"][i]
            with open(os.path.join(d, f"img_{i}.{fmt if fmt != 'jpeg' else 'jpg'}"), "wb") as f:
                f.write(encode(img, fmt))
            n_img += 1
        with open(os.path.join(d, "notes.txt"), "wb") as f:
            f.write(b"not an image at all")
    return n_img


def test_localfs_crawl_trace_matches_oracle(tmp_path):
    r0, r1 = str(tmp_path / "r0"), str(tmp_path / "r1")
    n0 = _build_tree(r0)
    n1 = _build_tree(r1)
    spec = {"kind": "localfs", "roots": {"data0": r0, "data1": r1}}
    src = make_source(spec)
    seeds = src.seeds()

    out = str(tmp_path / "out")
    eng = CrawlEngine(CrawlConfig(web=spec, n_shards=2, politeness_budget=4,
                                  max_rounds=30, out_dir=out))
    s = eng.run(seeds)

    orc = crawl_oracle(LocalFSSource(spec["roots"]), seeds, politeness_budget=4)
    etrace = [(r["seq"], r["url"]) for r in eng.trace_table().to_pylist()]
    assert etrace == orc.trace
    assert set(int(k) for k in eng.seen_keys()) == orc.seen

    # payloads: every decodable image landed; junk dead-lettered
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert t.num_rows == n0 + n1
    assert len(set(t.column("fmt").to_pylist())) == 3  # png/jpeg/webp all present
    dl = glob.glob(os.path.join(out + "_deadletter", "*.parquet"))
    dl_rows = sum(pq.read_table(f).num_rows for f in dl)
    assert dl_rows == 8  # one notes.txt per dir (4 dirs x 2 roots)

    # pixel round-trip: stored bytes decode to the original image
    from fscrawler_ray.functions.codecs import decode

    row = t.slice(0, 1).to_pylist()[0]
    img, w, h, fmt = decode(row["bytes"])
    assert (w, h) == (row["w"], row["h"])


def test_localfs_escape_and_unknown_host_are_safe(tmp_path):
    src = LocalFSSource({"d": str(tmp_path)})
    assert src.fetch_raw("file://d/../../etc/passwd") is None
    assert src.fetch_raw("file://other/x.png") is None
    assert src.children("file://other/") == []
    assert src.metadata("file://other/x")["size"] is None


def test_localfs_checkpoint_resume_parity(tmp_path):
    """Cross-feature: a LocalFS crawl checkpointed mid-run and resumed in
    fresh actors matches the uninterrupted crawl (source protocol +
    manifest validation + trace spool all composing)."""
    r0 = str(tmp_path / "r0")
    _build_tree(r0)
    spec = {"kind": "localfs", "roots": {"data0": r0}}
    seeds = make_source(spec).seeds()

    full = CrawlEngine(CrawlConfig(web=spec, n_shards=2, politeness_budget=2, max_rounds=50))
    full.run(seeds)
    want = full.trace_table().to_pylist()

    ck = str(tmp_path / "ck")
    part = CrawlEngine(CrawlConfig(web=spec, n_shards=2, politeness_budget=2,
                                   max_rounds=2, checkpoint_dir=ck))
    part.run(seeds)
    part.checkpoint()
    del part

    resumed = CrawlEngine.resume(
        CrawlConfig(web=spec, n_shards=2, politeness_budget=2, max_rounds=50, checkpoint_dir=ck)
    )
    resumed.run()
    got = resumed.trace_table().to_pylist()
    assert [(r["seq"], r["url"]) for r in got] == [(r["seq"], r["url"]) for r in want]

    # a DIFFERENT source spec must be rejected at resume
    import pytest

    other = {"kind": "localfs", "roots": {"data0": str(tmp_path)}}
    with pytest.raises(ValueError, match="web="):
        CrawlEngine.resume(CrawlConfig(web=other, n_shards=2, politeness_budget=2, checkpoint_dir=ck))


def test_localfs_uppercase_root_key_still_crawls(tmp_path):
    """Review regression: canonicalization lowercases URL authorities, so
    root keys must match case-insensitively."""
    r0 = str(tmp_path / "r0")
    _build_tree(r0)
    src = LocalFSSource({"Data0": r0})
    seeds = src.seeds()
    eng = CrawlEngine(CrawlConfig(web={"kind": "localfs", "roots": {"Data0": r0}},
                                  n_shards=2, politeness_budget=4, max_rounds=20))
    s = eng.run(seeds)
    assert s["result_rows"] == 12  # all images found despite the case mismatch
