"""Image-corpus curation: quality-filter ladder + caption consistency."""

import numpy as np
import pyarrow as pa

import ray

from fscrawler_ray.functions.codecs import encode
from fscrawler_ray.pipelines.image_corpus import caption_consistency, clean_image_corpus


def _row(i, img, caption, fmt="png"):
    h, w = img.shape[:2]
    return {
        "image_id": f"img{i}",
        "bytes": encode(img, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": 0,
    }


def _table(rows):
    return pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        }
    )


def _img(val, w=64, h=64):
    return np.full((h, w, 3), val, dtype=np.uint8)


def test_quality_ladder_attributes_each_drop():
    rows = [
        _row(0, _img(128, w=10, h=64), "a perfectly fine caption"),  # small
        _row(1, _img(128, w=200, h=64), "a perfectly fine caption"),  # aspect 3.1
        _row(2, _img(128), "hi"),  # thin caption
        _row(3, _img(0), "a perfectly fine caption"),  # black
        _row(4, _img(255), "a perfectly fine caption"),  # blown out
        _row(5, _img(128), "a perfectly fine caption"),  # keeper
    ]
    kept, tally = clean_image_corpus(ray.data.from_arrow(_table(rows)))
    assert tally == {
        "drop_small": 1,
        "drop_aspect": 1,
        "drop_caption": 1,
        "drop_dark": 1,
        "drop_bright": 1,
        "kept": 1,
    }
    k = kept.to_pandas()
    assert list(k["image_id"]) == ["img5"]
    assert abs(k["brightness"][0] - 128 / 255) < 1e-6


def test_quality_ladder_first_rule_wins():
    # one row violating small AND aspect AND caption: attributed to the
    # CHEAPEST rule only (ladder order), counted once
    rows = [_row(0, _img(128, w=10, h=40), "x")]
    _, tally = clean_image_corpus(ray.data.from_arrow(_table(rows)))
    assert tally["drop_small"] == 1
    assert tally["drop_aspect"] == 0 and tally["drop_caption"] == 0
    assert sum(tally.values()) == 1


def test_caption_consistency_separates_aligned_from_random():
    from fscrawler_ray.stages.multimodal import CaptionExtractStage

    base = _img(128)
    derived = CaptionExtractStage()(
        _table([_row(0, base, "placeholder")])
    ).column("extracted_caption")[0].as_py()
    rows = [
        _row(0, base, derived),  # caption == what the pixels say
        _row(1, base, "totally unrelated words here"),
    ]
    got = (
        caption_consistency(ray.data.from_arrow(_table(rows)))
        .to_pandas()
        .set_index("image_id")["consistency"]
    )
    assert got["img0"] == 1.0
    assert got["img1"] == 0.0


def test_aspect_bucket_labels():
    import numpy as np

    from fscrawler_ray.pipelines.image_corpus import _bucket_labels

    w = np.array([100.0, 160.0, 90.0, 99.0, 200.0])
    h = np.array([100.0, 90.0, 160.0, 100.0, 100.0])
    # 200x100 (ratio 2.0) snaps to the ladder's widest bucket, 16:9
    assert list(_bucket_labels(w, h)) == ["1:1", "16:9", "9:16", "1:1", "16:9"]


def test_aspect_buckets_pack_deterministically(ray_session):
    from fscrawler_ray.pipelines.image_corpus import aspect_buckets
    from fscrawler_ray.sources.images import images_dataset

    a = aspect_buckets(images_dataset(300, parallelism=2), batch_size=8).to_pandas()
    b = aspect_buckets(images_dataset(300, parallelism=7), batch_size=8).to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)  # sharding-invariant assignment
    # every batch is full (== batch_size) except at most the last per bucket
    for bucket, g in a.groupby("bucket"):
        sizes = g.groupby("batch_idx").size().sort_index()
        assert (sizes.iloc[:-1] == 8).all() and sizes.iloc[-1] <= 8
        # batch ids are dense from 0
        assert list(sizes.index) == list(range(len(sizes)))
    # within a bucket, batches follow image_id order
    g = a[a["bucket"] == a["bucket"].iloc[0]].sort_values("image_id")
    assert (g["batch_idx"].to_numpy() == sorted(g["batch_idx"].to_numpy())).all()


def test_shard_manifest_capacity_and_order(ray_session):
    """Shard assignment is the exclusive-byte-prefix // cap rule: shards
    are contiguous in image_id order, and every shard's payload stays
    under cap + its last item's size (an item may straddle the boundary)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from fscrawler_ray.pipelines.image_corpus import shard_manifest

    rng = np.random.default_rng(11)
    n = 300
    sizes = rng.integers(1_000, 40_000, size=n)
    t = pa.table(
        {
            "image_id": pa.array([f"img_{i:010d}" for i in range(n)], pa.string()),
            "bytes": pa.array([b"x" * int(s) for s in sizes], pa.binary()),
        }
    )
    cap = 100_000
    out = (
        shard_manifest(ray.data.from_arrow(t), cap=cap, range_width=7)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    prefix = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    assert (out["shard"].to_numpy() == prefix // cap).all()
    assert (out["nbytes"].to_numpy() == sizes).all()
    # contiguity: shard ids are non-decreasing in id order
    assert (np.diff(out["shard"].to_numpy()) >= 0).all()


def test_write_shards_roundtrip_and_resume(tmp_path, ray_session):
    """Shard export: blobs + offset indexes reconstruct every payload
    byte-for-byte; a re-run skips every completed shard (index = commit
    marker); membership matches shard_manifest exactly."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fscrawler_ray.pipelines.image_corpus import shard_manifest, write_shards

    rng = np.random.default_rng(5)
    n = 120
    payloads = [rng.bytes(int(s)) for s in rng.integers(500, 9_000, size=n)]
    t = pa.table(
        {
            "image_id": pa.array([f"img_{i:010d}" for i in range(n)], pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
        }
    )
    out = str(tmp_path / "shards")
    cap = 25_000
    summary = (
        write_shards(ray.data.from_arrow(t), out, cap=cap, range_width=9)
        .to_pandas()
        .sort_values("shard")
    )
    assert not summary["skipped"].any()
    assert summary["n_items"].sum() == n

    want = (
        shard_manifest(ray.data.from_arrow(t), cap=cap, range_width=9)
        .to_pandas()
        .sort_values("image_id")
    )
    got_rows = {}
    for shard in summary["shard"]:
        blob = open(os.path.join(out, f"shard-{shard:06d}.bin"), "rb").read()
        idx = pq.read_table(
            os.path.join(out, f"shard-{shard:06d}.index.parquet")
        ).to_pandas()
        assert len(blob) == int(idx["nbytes"].sum())
        for _, r in idx.iterrows():
            got_rows[r["image_id"]] = (
                shard,
                blob[int(r["offset"]) : int(r["offset"]) + int(r["nbytes"])],
            )
    assert len(got_rows) == n
    for i, (_, w) in enumerate(want.iterrows()):
        shard, data = got_rows[w["image_id"]]
        assert shard == int(w["shard"])
        assert data == payloads[i]

    # resume: everything already committed → all skipped, files untouched
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    again = write_shards(ray.data.from_arrow(t), out, cap=cap, range_width=9).to_pandas()
    assert again["skipped"].all()
    assert mtimes == {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}


def test_curation_funnel_stages(tmp_path):
    """Planted rows exercise every funnel stage: URL-filtered, quality-
    filtered, keep-best dedup (two resolutions of one phash), shard
    count = ceil(keeper bytes / cap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.image_corpus import curation_funnel

    def row(iid, url, host, w, h, caption, phash, size):
        return (iid, url, host, w, h, caption, phash, size)

    rows = [
        # clean keeper candidates: same phash, two resolutions -> 1 keeper
        row("img_a", "http://ok.com/g/img_1.jpg", "ok.com", 100, 100, "a red cat", 7, 1000),
        row("img_b", "http://ok.com/g/img_2.jpg", "ok.com", 200, 200, "a red cat", 7, 4000),
        # distinct phash survivor
        row("img_c", "http://ok.com/g/img_3.jpg", "ok.com", 100, 100, "a blue dog", 8, 2000),
        # fails URL rules (banned token)
        row("img_d", "http://ok.com/g/img_90.jpg", "ok.com", 100, 100, "a red cat", 9, 1000),
        # passes URL, fails quality (tiny)
        row("img_e", "http://ok.com/g/img_4.jpg", "ok.com", 10, 10, "a red cat", 10, 1000),
    ]
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([r[0] for r in rows]),
                "url": pa.array([r[1] for r in rows]),
                "host": pa.array([r[2] for r in rows]),
                "w": pa.array([r[3] for r in rows], pa.int32()),
                "h": pa.array([r[4] for r in rows], pa.int32()),
                "caption": pa.array([r[5] for r in rows]),
                "phash": pa.array([r[6] for r in rows], pa.int64()),
                "size": pa.array([r[7] for r in rows], pa.int64()),
            }
        ),
        tmp_path / "part-0.parquet",
    )
    out = curation_funnel(str(tmp_path), cap=5000).to_pandas().set_index("stage")["n"]
    assert out["total"] == 5
    assert out["url_pass"] == 4  # img_d dropped
    assert out["quality"] == 3  # img_e dropped
    assert out["dedup"] == 2  # img_a loses to img_b (higher px)
    # keeper bytes = 4000 (img_b) + 2000 (img_c) = 6000 -> 2 shards at cap 5000
    assert out["shards"] == 2


def test_bucketed_shard_manifest_per_bucket_reset(tmp_path):
    """Each aspect bucket gets its own shard numbering starting at 0, and
    byte budgets never mix across buckets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.image_corpus import bucketed_shard_manifest

    rows = []
    # 4 square images (1:1) of 3000 B each and 3 wide images (16:9)
    for i in range(4):
        rows.append((f"img_{i:05d}", b"x" * 3000, 100, 100))
    for i in range(4, 7):
        rows.append((f"img_{i:05d}", b"y" * 3000, 160, 90))
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([r[0] for r in rows]),
                "bytes": pa.array([r[1] for r in rows], pa.binary()),
                "w": pa.array([r[2] for r in rows], pa.int32()),
                "h": pa.array([r[3] for r in rows], pa.int32()),
            }
        ),
        tmp_path / "part-0.parquet",
    )
    import ray

    ds = ray.data.read_parquet(str(tmp_path))
    out = bucketed_shard_manifest(ds, cap=5000).to_pandas()
    sq = out[out["bucket"] == "1:1"].sort_values("image_id")["shard"].tolist()
    wd = out[out["bucket"] == "16:9"].sort_values("image_id")["shard"].tolist()
    # 3000-byte items at cap 5000: cumsum 0,3000,6000,9000 -> shards 0,0,1,1
    assert sq == [0, 0, 1, 1]
    # the wide bucket restarts at shard 0: cumsum 0,3000,6000 -> 0,0,1
    assert wd == [0, 0, 1]


def test_write_tar_shards_roundtrip_resume_deterministic(tmp_path, ray_session):
    """WebDataset tar export: archives reconstruct every payload + caption
    byte-for-byte through read_tar_shards; a re-run skips completed shards
    (.done = commit marker); a re-export after deleting one shard rebuilds
    a byte-identical archive (pinned ustar headers)."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import ray

    from fscrawler_ray.pipelines.image_corpus import read_tar_shards, write_tar_shards

    rng = np.random.default_rng(7)
    n = 60
    payloads = [rng.bytes(int(s)) for s in rng.integers(500, 9_000, size=n)]
    t = pa.table(
        {
            "image_id": pa.array([f"img_{i:010d}" for i in range(n)], pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "fmt": pa.array(["png" if i % 2 else "jpeg" for i in range(n)], pa.string()),
            "caption": pa.array([f"caption number {i}" for i in range(n)], pa.string()),
        }
    )
    out = str(tmp_path / "wds")
    cap = 25_000
    summary = (
        write_tar_shards(ray.data.from_arrow(t), out, cap=cap, range_width=9)
        .to_pandas()
        .sort_values("shard")
    )
    assert not summary["skipped"].any()
    assert summary["n_samples"].sum() == n
    # real on-disk sizes match the summary and the 512-block arithmetic
    for _, r in summary.iterrows():
        p = os.path.join(out, f"shard-{int(r['shard']):06d}.tar")
        assert os.path.getsize(p) == int(r["tar_bytes"])
        assert int(r["tar_bytes"]) % 10240 == 0

    back = read_tar_shards(out).to_pandas().sort_values("image_id")
    assert len(back) == n
    for i, (_, r) in enumerate(back.iterrows()):
        assert r["bytes"] == payloads[i]
        assert r["caption"] == f"caption number {i}"

    # resume: second run skips everything
    again = write_tar_shards(ray.data.from_arrow(t), out, cap=cap, range_width=9).to_pandas()
    assert again["skipped"].all()

    # determinism: delete one shard (+ marker), re-export, byte-identical
    victim = int(summary["shard"].iloc[0])
    vp = os.path.join(out, f"shard-{victim:06d}.tar")
    before = hashlib.md5(open(vp, "rb").read()).hexdigest()
    os.remove(vp)
    os.remove(vp + ".done")
    third = write_tar_shards(ray.data.from_arrow(t), out, cap=cap, range_width=9).to_pandas()
    assert not third[third["shard"] == victim]["skipped"].any()
    assert hashlib.md5(open(vp, "rb").read()).hexdigest() == before


def test_caption_selfrank_planted(ray_session):
    # unique captions self-rank 1; a duplicated caption ties and the
    # lexically smaller id wins rank 1 while the larger id ranks 2
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from fscrawler_ray.pipelines.image_corpus import caption_selfrank

    rows = {
        "image_id": ["a01", "a02", "a03", "z99"],
        "caption": [
            "red fox jumps",
            "red fox jumps",  # exact dup of a01's caption
            "blue whale swims deep",
            "quiet green meadow",
        ],
    }
    ds = _ray.data.from_arrow(pa.table(rows))
    got = caption_selfrank(ds, n_queries=4).to_pandas().set_index("image_id")
    assert got.loc["a01", "self_rank"] == 1
    assert got.loc["a02", "self_rank"] == 2  # loses the tie to a01
    assert got.loc["a03", "self_rank"] == 1
    assert got.loc["z99", "self_rank"] == 1
    assert got.loc["a03", "self_overlap"] == 4


def test_caption_conflict_planted(ray_session):
    # two images with identical pixels (same phash) but different captions
    # must surface as a conflict group; agreeing dups must not; singletons absent
    import pyarrow as pa
    import ray as _ray

    from fscrawler_ray.pipelines.dedup import caption_conflict

    t = pa.table(
        {
            "image_id": ["a", "b", "c", "d", "e"],
            "phash": pa.array([11, 11, 22, 22, 33], pa.int64()),
            "caption": ["cat", "dog", "tree", "tree", "solo"],
        }
    )
    got = caption_conflict(_ray.data.from_arrow(t)).to_pandas().set_index("phash")
    assert got.loc[11, "has_conflict"] == 1 and got.loc[11, "n_captions"] == 2
    assert got.loc[11, "keeper_image_id"] == "a"
    assert got.loc[22, "has_conflict"] == 0
    assert 33 not in got.index
