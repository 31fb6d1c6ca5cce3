"""Sitemap XML export: per-host urlset packing, real-size summary,
resume-skip markers, parse-back roundtrip.

Reference analog: the XML playlist export
(app/processors/playlist_generator.py:7-51) lifted to the crawl's
per-host layout with the sitemaps.org 50k-URL cap semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _spool(tmp_path, n=90):
    # URLs include &/< to exercise the escape path end-to-end
    urls = [
        f"http://h{i % 4}.test/p/{i}?a=1&b=<{i}>" if i % 5 == 0 else f"http://h{i % 4}.test/p/{i}"
        for i in range(n)
    ]
    t = pa.table(
        {
            "seq": pa.array(list(range(n)), pa.int64()),
            "url": pa.array(urls, pa.string()),
            "host": pa.array([f"h{i % 4}.test" for i in range(n)], pa.string()),
        }
    )
    d = str(tmp_path / "spool")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return d, urls


def test_sitemap_export_roundtrip_resume(tmp_path, ray_session):
    from fscrawler_ray.pipelines.sinks import read_sitemaps, write_sitemaps

    spool, urls = _spool(tmp_path)
    out = str(tmp_path / "maps")
    summary = write_sitemaps(spool, out, max_urls=10, range_width=7).to_pandas()
    assert not summary["skipped"].any()
    # 4 hosts x ~23 urls, cap 10 => 3 files per host
    assert summary["n_urls"].sum() == len(urls)
    assert (summary.groupby("host")["file_idx"].max() >= 2).all()
    for _, r in summary.iterrows():
        p = os.path.join(out, f"sitemap-{r['host']}-{int(r['file_idx']):05d}.xml")
        assert os.path.getsize(p) == int(r["xml_bytes"])
        body = open(p, encoding="utf-8").read()
        assert body.startswith('<?xml version="1.0"')
        assert body.rstrip().endswith("</urlset>")
        assert "&" not in body.replace("&amp;", "").replace("&lt;", "").replace("&gt;", "")

    back = read_sitemaps(out).to_pandas()
    assert sorted(back["url"]) == sorted(urls)  # escapes reversed exactly
    # per-host file assignment is the seq-order rank // cap
    for host, g in back.groupby("host"):
        idx = [int(u.rsplit("/", 1)[1].split("?")[0]) for u in g["url"]]
        order = sorted(range(len(idx)), key=lambda j: idx[j])
        ranks = {j: r for r, j in enumerate(order)}
        for j, (_, row) in enumerate(g.iterrows()):
            assert row["file_idx"] == ranks[j] // 10

    again = write_sitemaps(spool, out, max_urls=10, range_width=7).to_pandas()
    assert again["skipped"].all()


def test_rendezvous_minimal_disruption(tmp_path, ray_session):
    """HRW theorem: growing 8 → 10 shards may only move a host TO a new
    shard (8 or 9) — never between old shards; moved fraction ~ 2/10."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import rendezvous_shards

    hosts = [f"host-{i}.example" for i in range(500)]
    d = str(tmp_path / "spool")
    os.makedirs(d)
    pq.write_table(pa.table({"host": pa.array(hosts, pa.string())}), f"{d}/part-0.parquet")

    out = rendezvous_shards(d).to_pandas()
    assert len(out) == 500
    moved = out[out["moved"] == 1]
    assert set(moved["shard_grown"]) <= {8, 9}
    assert (out.loc[out["moved"] == 0, "shard"] == out.loc[out["moved"] == 0, "shard_grown"]).all()
    assert 0.10 <= len(moved) / 500 <= 0.32  # expected 0.2
    assert out["shard"].between(0, 7).all()


def test_sitemap_incremental_equals_scratch(tmp_path, ray_session):
    """Incremental maintenance invariant: after deleting seq%23==0 rows,
    the partially-rewritten directory is BYTE-IDENTICAL to a from-scratch
    export over the edited spool, and only affected hosts rewrite."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.sinks import sitemap_incremental, write_sitemaps

    n = 120
    # host h0 gets no seq%23 hits by construction => must be skipped
    seqs = list(range(n))
    hosts = [f"h{i % 3}.test" for i in range(n)]
    # one host with NO deleted rows: h9 only gets seqs with s%23 != 0
    extra = [(1000 + k, "h9.test") for k in range(12) if (1000 + k) % 23 != 0]
    seqs += [s for s, _ in extra]
    hosts += [h for _, h in extra]
    urls = [f"http://{h}/p/{s}" for s, h in zip(seqs, hosts)]
    d = str(tmp_path / "spool")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
            }
        ),
        os.path.join(d, "part-0.parquet"),
    )

    inc_dir = str(tmp_path / "inc")
    out = sitemap_incremental(d, inc_dir, max_urls=10, range_width=7).to_pandas()
    assert (out.loc[out["host"] == "h9.test", "rewritten"] == 0).all()
    assert (out.loc[out["host"] != "h9.test", "rewritten"] == 1).all()

    # from-scratch over the edited rows
    edited = str(tmp_path / "edited")
    os.makedirs(edited)
    keep = [i for i, s in enumerate(seqs) if s % 23 != 0]
    pq.write_table(
        pa.table(
            {
                "seq": pa.array([seqs[i] for i in keep], pa.int64()),
                "url": pa.array([urls[i] for i in keep], pa.string()),
                "host": pa.array([hosts[i] for i in keep], pa.string()),
            }
        ),
        os.path.join(edited, "part-0.parquet"),
    )
    scratch_dir = str(tmp_path / "scratch")
    write_sitemaps(edited, scratch_dir, max_urls=10, range_width=7).to_pandas()

    inc_files = sorted(f for f in os.listdir(inc_dir) if f.endswith(".xml"))
    scr_files = sorted(f for f in os.listdir(scratch_dir) if f.endswith(".xml"))
    assert inc_files == scr_files
    for f in inc_files:
        a = hashlib.md5(open(os.path.join(inc_dir, f), "rb").read()).hexdigest()
        b = hashlib.md5(open(os.path.join(scratch_dir, f), "rb").read()).hexdigest()
        assert a == b, f
