"""Per-row invariants on real crawl output (BASELINE.json input_hint):
decoded-pixel PSNR ≥ 40 dB for lossy formats, exact caption equality, exact
phash equality — engine rows vs the independent oracle's fetches."""

import glob
import tempfile

import numpy as np
import pyarrow.parquet as pq

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.crawl.oracle import crawl_oracle
from fscrawler_ray.functions.codecs import LOSSY, decode, psnr, synth_image
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

CFG = WebConfig(seed=47, n_hosts=4, max_depth=3, fanout_dirs=2, fanout_files=4)


def test_result_rows_match_oracle_and_invariants():
    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as out:
        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        eng.run(web.seeds())
        import pyarrow as pa

        files = sorted(glob.glob(out + "/**/*.parquet", recursive=True))
        t = pa.concat_tables([pq.read_table(f) for f in files])

    oracle = crawl_oracle(web, web.seeds(), politeness_budget=4, fetch_payloads=True)
    orows = {r["url"]: r for r in oracle.rows}
    erows = t.to_pylist()
    assert len(erows) == len(orows)
    for r in erows:
        o = orows[r["url"]]
        # exact caption + phash equality vs the oracle
        assert r["caption"] == o["caption"]
        assert r["phash"] == o["phash"]
        assert r["seq"] == o["seq"]
        # decoded pixels reproduce the original within the PSNR contract
        img, w, h, fmt = decode(r["bytes"])
        assert (w, h, fmt) == (r["w"], r["h"], r["fmt"])
        ps = web.payload_seed(r["url"])
        original = synth_image(ps & 0xFFFFFFFF, w, h)
        p = psnr(original, img)
        if fmt in LOSSY:
            assert p >= 40.0, (r["url"], fmt, p)
        else:
            assert np.array_equal(original, img)


def test_dead_letter_accounting():
    """leaves emitted == payload rows + dead-lettered (non-image) leaves."""
    import glob as _glob
    import pyarrow as pa
    import pyarrow.parquet as pq

    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as d:
        out = d + "/results"
        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        s = eng.run(web.seeds())
        dl_files = sorted(_glob.glob(d + "/results_deadletter/**/*.parquet", recursive=True))
        assert dl_files, "the synthetic web always links some non-image leaves"
        dl = pa.concat_tables([pq.read_table(f) for f in dl_files])
        assert set(dl.column("reason").to_pylist()) == {"non_image_payload"}
        assert s["counters"]["leaves"] == s["result_rows"] + dl.num_rows


def test_fairness_gini_known_values(ray_session, tmp_path):
    # equal shares → gini 0; one-host-takes-all → (n-1)/n scaled
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from fscrawler_ray.pipelines.crawl_report import fairness_gini

    eq = tmp_path / "eq"
    eq.mkdir()
    pqt.write_table(
        pa.table({"host": ["a"] * 5 + ["b"] * 5 + ["c"] * 5 + ["d"] * 5}), eq / "p.parquet"
    )
    g = fairness_gini(str(eq)).to_pandas()
    assert g["gini_micro"].iloc[0] == 0 and g["n_hosts"].iloc[0] == 4

    skew = tmp_path / "skew"
    skew.mkdir()
    # hosts with counts 1,1,1,97: exact ranked-cumulative formula
    pqt.write_table(
        pa.table({"host": ["a"] + ["b"] + ["c"] + ["z"] * 97}), skew / "p.parquet"
    )
    g2 = fairness_gini(str(skew)).to_pandas()
    n, s0 = 4, 100
    s1 = 1 * 1 + 2 * 1 + 3 * 1 + 4 * 97
    want = (2 * s1 - (n + 1) * s0) * 1_000_000 // (n * s0)
    assert g2["gini_micro"].iloc[0] == want > 600_000


def test_lorenz_deciles_conservation(ray_session, tmp_path):
    # deciles partition hosts; urls and hosts conserve; shares sum ≈ 1e6
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from fscrawler_ray.pipelines.crawl_report import fairness_gini, lorenz_deciles

    rows = []
    for i, c in enumerate([1, 2, 3, 4, 5, 10, 10, 20, 45, 100]):
        rows += [f"h{i:02d}"] * c
    p = tmp_path / "sp"
    p.mkdir()
    pqt.write_table(pa.table({"host": rows}), p / "p.parquet")
    d = lorenz_deciles(str(p)).to_pandas()
    assert d["n_hosts"].sum() == 10 and d["urls"].sum() == 200
    assert 999_990 <= d["share_micro"].sum() <= 1_000_000  # floor rounding
    # ascending rank: the last decile holds the 100-URL host
    assert d.sort_values("decile")["urls"].iloc[-1] == 100
    g = fairness_gini(str(p)).to_pandas()
    assert g["total_urls"].iloc[0] == 200


def test_cdc_replay_planted_ops():
    """CDC round-trip: a snapshot pair planted with all four statuses
    yields the expected op counts, and applying the derived op log to
    prev reproduces cur exactly (count + keyed md5 checksum)."""
    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.crawl_report import cdc_replay

    prev = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3", "u4"], pa.string()),
            "size": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    # u1 unchanged, u2 changed, u3+u4 removed, u5+u6 added
    cur = pa.table(
        {
            "url": pa.array(["u1", "u2", "u5", "u6"], pa.string()),
            "size": pa.array([10, 21, 50, 60], pa.int64()),
        }
    )
    out = cdc_replay(
        ray.data.from_arrow(cur).repartition(2),
        ray.data.from_arrow(prev).repartition(2),
    ).to_pandas()
    r = out.iloc[0]
    assert r["n_upserts"] == 3  # u2 changed + u5/u6 added
    assert r["n_deletes"] == 2  # u3, u4
    assert r["n_prev"] == 4 and r["n_cur"] == 4 and r["n_replayed"] == 4
    assert r["replay_ok"] == 1
    assert r["cur_checksum"] == r["replay_checksum"] > 0


def test_crawl_delay_audit_planted(tmp_path):
    """Crawl-delay audit: planted per-round rates flag exactly the hosts
    whose observed max exceeds round_seconds // delay; delay-0 hosts are
    always compliant."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import crawl_delay_audit

    def delay_of(host: str) -> int:
        h = int.from_bytes(hashlib.md5(host.encode()).digest()[:8], "little")
        return [0, 1, 2, 4, 8][h % 5]

    # find hosts across delay classes
    hosts = {}
    i = 0
    while len(hosts) < 3 and i < 1000:
        h = f"h{i}.example"
        d = delay_of(h)
        if d in (0, 4, 8) and d not in hosts.values():
            hosts[h] = d
        i += 1
    assert set(hosts.values()) == {0, 4, 8}
    inv = {d: h for h, d in hosts.items()}

    rows = []
    # delay 8 -> cap 8: plant 9/round (violation)
    rows += [(inv[8], 0)] * 9
    # delay 4 -> cap 16: plant 16/round (compliant, at the cap)
    rows += [(inv[4], 0)] * 16
    # delay 0 -> unbounded: plant 500/round (compliant)
    rows += [(inv[0], 0)] * 500
    t = pa.table(
        {
            "host": pa.array([h for h, _ in rows], pa.string()),
            "round": pa.array([r for _, r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = crawl_delay_audit(str(tmp_path)).to_pandas().set_index("host")
    assert out.loc[inv[8], "compliant"] == 0 and out.loc[inv[8], "cap"] == 8
    assert out.loc[inv[4], "compliant"] == 1 and out.loc[inv[4], "cap"] == 16
    assert out.loc[inv[0], "compliant"] == 1 and out.loc[inv[0], "cap"] == -1


def test_merkle_diff_localizes_divergence():
    """Merkle buckets: identical snapshots agree on every bucket; a
    single-row edit flips EXACTLY the edited key's bucket; block count
    never changes digests."""
    import hashlib

    import pyarrow as pa

    import ray
    from fscrawler_ray.pipelines.crawl_report import merkle_diff

    urls = [f"http://h{i % 4}.example/p{i}" for i in range(64)]
    base = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "size": pa.array(list(range(64)), pa.int64()),
        }
    )
    same = merkle_diff(
        ray.data.from_arrow(base).repartition(3), ray.data.from_arrow(base)
    ).to_pandas()
    assert (same["differs"] == 0).all()
    assert int(same["n_cur"].sum()) == 64 and int(same["n_prev"].sum()) == 64

    # edit one row's value -> only that key's bucket diverges
    edited = base.set_column(1, "size", pa.array([999] + list(range(1, 64)), pa.int64()))
    out = merkle_diff(ray.data.from_arrow(edited), ray.data.from_arrow(base)).to_pandas()
    h = int.from_bytes(hashlib.md5(urls[0].encode()).digest()[:8], "little")
    target = h % 16
    assert (out.loc[out["bucket"] == target, "differs"] == 1).all()
    assert int(out["differs"].sum()) == 1
    # counts unchanged by a value edit
    assert (out["n_cur"] == out["n_prev"]).all()


def test_starvation_audit_planted_gaps(tmp_path):
    """Starvation audit: planted activity patterns produce the expected
    max inter-round gaps (diff between consecutive active rounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import starvation_audit

    rows = (
        [("steady", r) for r in (0, 1, 2, 3)]
        + [("starved", r) for r in (0, 9, 10)]
        + [("oneshot", 5)]
    )
    t = pa.table(
        {
            "host": pa.array([h for h, _ in rows], pa.string()),
            "round": pa.array([r for _, r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = starvation_audit(str(tmp_path)).to_pandas().set_index("host")
    assert out.loc["steady", "max_gap"] == 1 and out.loc["steady", "n_active_rounds"] == 4
    assert out.loc["starved", "max_gap"] == 9
    assert out.loc["oneshot", "max_gap"] == 0
    assert out.loc["oneshot", "first_round"] == out.loc["oneshot", "last_round"] == 5


def test_merkle_sync_converges_with_partial_transfer():
    """The bucket-scoped sync converges (sync_ok) while shipping only
    the divergent buckets (strictly fewer than all of them for the CDC
    snapshot pair, which perturbs a minority of keys)."""
    import ray
    from fscrawler_ray.pipelines.crawl_report import merkle_sync_cert

    import pyarrow as pa

    prev = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(64)], pa.string()),
            "size": pa.array(list(range(64)), pa.int64()),
        }
    )
    # perturb exactly one key's value
    cur = prev.set_column(1, "size", pa.array([999] + list(range(1, 64)), pa.int64()))
    out = merkle_sync_cert(
        ray.data.from_arrow(cur).repartition(3), ray.data.from_arrow(prev)
    ).to_pandas().iloc[0]
    assert out["sync_ok"] == 1
    assert out["n_diff_buckets"] == 1  # one edited key -> one bucket ships
    assert out["n_cur"] == out["n_synced"] == 64
