"""WARC/1.0 export (ISO 28500): byte-exact roundtrip, resume-skip
commit markers, deterministic re-cuts, and size arithmetic.

Reference analog: the reference persists crawl results to DB tables for
replay (app/index_files.py:53-79); a web-scale crawler ships WARC."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _spool(tmp_path, n=60, seed=11):
    """Parquet spool shaped like the crawl payload output (seq, url,
    bytes) — including one null-payload row the writer must drop."""
    import numpy as np

    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(int(s)) for s in rng.integers(400, 8_000, size=n)]
    payloads[3] = None  # non-leaf row: no payload fetched
    t = pa.table(
        {
            "seq": pa.array(list(range(n)), pa.int64()),
            "url": pa.array([f"http://host{i % 7}.test/p/{i}" for i in range(n)], pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
        }
    )
    d = str(tmp_path / "spool")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return d, payloads


def test_warc_roundtrip_resume_deterministic(tmp_path, ray_session):
    from fscrawler_ray.pipelines.sinks import read_warc_shards, write_warc_shards

    spool, payloads = _spool(tmp_path)
    out = str(tmp_path / "warc")
    cap = 20_000
    summary = write_warc_shards(spool, out, cap=cap, range_width=9).to_pandas()
    assert not summary["skipped"].any()
    assert summary["n_records"].sum() == sum(p is not None for p in payloads)
    # the summary's warc_bytes is the REAL on-disk size
    for _, r in summary.iterrows():
        p = os.path.join(out, f"shard-{int(r['shard']):06d}.warc")
        assert os.path.getsize(p) == int(r["warc_bytes"])

    back = read_warc_shards(out).to_pandas().sort_values("seq")
    want = [(i, p) for i, p in enumerate(payloads) if p is not None]
    assert list(back["seq"]) == [i for i, _ in want]
    assert all(bytes(a) == b for a, b in zip(back["bytes"], [p for _, p in want]))
    assert list(back["url"]) == [f"http://host{i % 7}.test/p/{i}" for i, _ in want]

    # resume: second run skips every completed shard
    again = write_warc_shards(spool, out, cap=cap, range_width=9).to_pandas()
    assert again["skipped"].all()

    # determinism: delete one archive (+ marker), re-export → byte-identical
    victim = int(summary["shard"].iloc[0])
    vp = os.path.join(out, f"shard-{victim:06d}.warc")
    before = hashlib.md5(open(vp, "rb").read()).hexdigest()
    os.remove(vp)
    os.remove(vp + ".done")
    third = write_warc_shards(spool, out, cap=cap, range_width=9).to_pandas()
    assert not third[third["shard"] == victim]["skipped"].any()
    assert hashlib.md5(open(vp, "rb").read()).hexdigest() == before


def test_warc_shard_assignment_is_range_width_invariant(tmp_path, ray_session):
    """Shard membership is a pure prefix-sum function of (seq, rec_bytes)
    — re-cutting with a different scan range width yields the identical
    assignment (the two-level scan is an implementation detail)."""
    from fscrawler_ray.pipelines.sinks import write_warc_shards

    spool, _ = _spool(tmp_path, n=40, seed=5)
    a = (
        write_warc_shards(spool, str(tmp_path / "w1"), cap=15_000, range_width=3)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    b = (
        write_warc_shards(spool, str(tmp_path / "w2"), cap=15_000, range_width=64)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert a[["shard", "n_records", "payload_bytes", "warc_bytes"]].equals(
        b[["shard", "n_records", "payload_bytes", "warc_bytes"]]
    )


def test_cdx_index_seeks_to_real_records(tmp_path, ray_session):
    """The CDX index is computed WITHOUT reading archive bytes — certify
    it against reality: seek into the written archive at every (shard,
    off), read rlen bytes, and the slice must be a complete WARC record
    whose URL and payload match the spool row."""
    from fscrawler_ray.pipelines.sinks import cdx_index, write_warc_shards

    spool, payloads = _spool(tmp_path, n=50, seed=7)
    out = str(tmp_path / "warc")
    cap = 18_000
    write_warc_shards(spool, out, cap=cap, range_width=9).to_pandas()
    idx = cdx_index(spool, cap=cap, range_width=9).to_pandas().sort_values("seq")

    assert list(idx["seq"]) == [i for i, p in enumerate(payloads) if p is not None]
    blobs = {}
    for _, r in idx.iterrows():
        shard = int(r["shard"])
        if shard not in blobs:
            with open(os.path.join(out, f"shard-{shard:06d}.warc"), "rb") as f:
                blobs[shard] = f.read()
        rec = blobs[shard][int(r["off"]) : int(r["off"]) + int(r["rlen"])]
        assert rec.startswith(b"WARC/1.0\r\n")
        assert rec.endswith(b"\r\n\r\n")
        hdr, _, rest = rec.partition(b"\r\n\r\n")
        fields = dict(
            line.split(": ", 1) for line in hdr.decode().split("\r\n")[1:] if ": " in line
        )
        assert fields["WARC-Target-URI"] == r["url"]
        assert rest[:-4] == payloads[int(r["seq"])]
    # offsets tile each archive exactly: per shard, sorted offs are the
    # exclusive cumsum of rlens and end at the file size
    for shard, g in idx.groupby("shard"):
        g = g.sort_values("off")
        assert list(g["off"]) == [0] + list(g["rlen"].cumsum())[:-1]
        assert g["rlen"].sum() == len(blobs[int(shard)])


def test_warc_revisit_dedup_and_refers(tmp_path):
    """Revisit export: duplicate payloads after the first write
    body-less records (archive strictly smaller than the plain export),
    and each revisit's WARC-Refers-To names the original seq."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.sinks import (
        write_warc_revisit_shards,
        write_warc_shards,
    )

    payload = bytes(range(256)) * 8
    rows = [
        (0, "http://h/a.jpg", payload, "img_A"),
        (1, "http://h/b.jpg", b"unique-bytes-1" * 50, "img_B"),
        (2, "http://h/a_copy.jpg", payload, "img_A"),   # dup of seq 0
        (3, "http://h/a_copy2.jpg", payload, "img_A"),  # dup of seq 0
    ]
    t = pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "bytes": pa.array([r[2] for r in rows], pa.binary()),
            "image_id": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    spool = tmp_path / "spool"
    spool.mkdir()
    pq.write_table(t, str(spool / "part.parquet"))

    plain = (tmp_path / "plain").as_posix()
    rev = (tmp_path / "rev").as_posix()
    p = write_warc_shards(str(spool), plain).to_pandas()
    r = write_warc_revisit_shards(str(spool), rev).to_pandas()
    assert int(r["n_revisits"].sum()) == 2
    assert int(r["n_records"].sum()) == 4
    assert int(r["warc_bytes"].sum()) < int(p["warc_bytes"].sum())
    # dedup saves ~2 payload copies
    assert int(p["payload_bytes"].sum()) - int(r["payload_bytes"].sum()) == 2 * len(payload)

    import glob

    blob = b"".join(open(f, "rb").read() for f in sorted(glob.glob(rev + "/*.warc")))
    refs = re.findall(rb"WARC-Refers-To: <urn:fscrawler:(\d+)>", blob)
    assert refs == [b"0", b"0"]
    # revisit records carry no body
    assert blob.count(payload) == 1
