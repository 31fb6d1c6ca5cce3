"""Multimodal stages (caption extraction, audio/video stubs), no-stat scan
mode, and the two-phase stage-machine processing path."""

import tempfile

import pytest

import ray

from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
from fscrawler_ray.sources.images import images_dataset
from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig
from fscrawler_ray.stages.multimodal import (
    AudioFeatureStage,
    CaptionExtractStage,
    VideoFrameSampleStage,
    synth_audio_table,
)

CFG = WebConfig(seed=19, n_hosts=4, max_depth=3, fanout_dirs=2, fanout_files=4)


def _caps_by_id(t):
    return dict(zip(t.column("image_id").to_pylist(), t.column("extracted_caption").to_pylist()))


def test_caption_extract_stage():
    ds = images_dataset(32).map_batches(CaptionExtractStage, batch_format="pyarrow", batch_size=16, concurrency=2)
    t = ds.take_batch(32, batch_format="pyarrow")
    caps = _caps_by_id(t)
    assert all(c and c.startswith("a ") for c in caps.values())
    assert 0.0 <= min(t.column("brightness").to_pylist())
    # deterministic PER IMAGE — keyed by id, not row position: the actor
    # pool's block completion order is not stable (preserve_order=False)
    t2 = images_dataset(32).map_batches(CaptionExtractStage, batch_format="pyarrow", batch_size=16, concurrency=2).take_batch(32, batch_format="pyarrow")
    assert caps == _caps_by_id(t2)


def test_audio_stage_fake_backend():
    t = synth_audio_table(24)
    ds = ray.data.from_arrow(t).map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=2)
    out = ds.take_batch(24, batch_format="pyarrow")
    assert out.num_rows == 24
    assert len(out.column("mel_features")[0].as_py()) == 8
    assert "bytes" not in out.column_names


def test_video_stage_expands_frames():
    t = synth_audio_table(6).rename_columns(["media_id", "bytes", "sample_rate", "n_channels", "duration_ms", "codec"])
    import pyarrow as pa

    vt = pa.table(
        {
            "media_id": t.column("media_id"),
            "bytes": t.column("bytes"),
            "duration_ms": t.column("duration_ms"),
        }
    )
    ds = ray.data.from_arrow(vt).map_batches(VideoFrameSampleStage, batch_format="pyarrow", batch_size=4, concurrency=2)
    out = ds.take_batch(100, batch_format="pyarrow")
    assert out.num_rows == 18  # 6 media × 3 frames
    from fscrawler_ray.functions.codecs import decode

    img, w, h, fmt = decode(out.column("frame_png")[0].as_py())
    assert fmt == "png" and (w, h) == (16, 16)


def test_external_backends_are_stubbed():
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(backend="ffmpeg")
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(backend="ffmpeg")


def test_no_stat_scan_mode():
    web = SynthWeb(CFG)
    full = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4))
    s_full = full.run(web.seeds())
    scan = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, fetch_payloads=False))
    s_scan = scan.run(web.seeds())
    # identical traversal, zero payloads
    assert scan.trace_table().to_pylist() == full.trace_table().to_pylist()
    assert s_scan["result_rows"] == 0
    assert s_full["result_rows"] > 0


def test_two_phase_process_resumes():
    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as out, tempfile.TemporaryDirectory() as proc:
        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        s = eng.run(web.seeds())
        from fscrawler_ray.pipelines.process_results import process_results

        r1 = process_results(out, proc)
        assert r1["processed"] == s["result_rows"]
        r2 = process_results(out, proc)
        assert r2["processed"] == 0
        assert r2["previously_done"] == s["result_rows"]
        t = ray.data.read_parquet(proc).take_batch(10, batch_format="pyarrow")
        assert "stage" in t.column_names
        assert "bytes" not in t.column_names


def test_audio_wav_backend_real_dsp():
    """The 'wav' backend REALLY decodes: a pure 440 Hz sine at amplitude
    0.5 must show its energy in the right FFT band, zcr ~ 2*f, and RMS
    loudness ~ 20*log10(0.5/sqrt(2))."""
    import io
    import wave as wavemod

    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.stages.multimodal import AudioFeatureStage

    sr, f0, amp = 16000, 440.0, 0.5
    t = np.arange(sr) / sr  # 1 second
    pcm = (amp * np.sin(2 * np.pi * f0 * t) * 32767).astype("<i2")
    bio = io.BytesIO()
    with wavemod.open(bio, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    batch = pa.table({"media_id": ["a"], "bytes": pa.array([bio.getvalue()], pa.binary())})
    out = AudioFeatureStage(backend="wav")(batch)
    loud = out.column("loudness")[0].as_py()
    zcr = out.column("zcr")[0].as_py()
    mel = np.array(out.column("mel_features")[0].as_py())
    assert abs(loud - 20 * np.log10(amp / np.sqrt(2))) < 0.5, loud
    assert abs(zcr - f0) < 30, zcr  # 2*f0 sign flips/s, normalized by /2 -> f0
    # the band containing 440 Hz dominates
    edges = np.geomspace(50.0, sr / 2.0, 9)
    expect_band = int(np.searchsorted(edges, f0) - 1)
    assert int(mel.argmax()) == expect_band, (mel.tolist(), expect_band)


def test_audio_ffmpeg_backend_still_stubbed():
    import pytest

    from fscrawler_ray.stages.multimodal import AudioFeatureStage

    with pytest.raises(NotImplementedError):
        AudioFeatureStage(backend="ffmpeg")


def test_video_fsv_backend_real_demux_decode():
    """The 'fsv' backend really demuxes and decodes: sampled thumbnails
    must be pixel-identical to the container's frames at the sampled
    indices, and timestamps must follow frame_index/fps."""
    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.functions import codecs
    from fscrawler_ray.stages.multimodal import (
        VideoFrameSampleStage,
        decode_fsv_header,
        encode_fsv,
    )

    frames = [codecs.synth_image(100 + f, 32, 32) for f in range(8)]
    buf = encode_fsv(frames, fps=8.0)
    n, fps, toc = decode_fsv_header(buf)
    assert (n, fps) == (8, 8.0) and len(toc) == 8

    batch = pa.table({"media_id": ["v"], "bytes": pa.array([buf], pa.binary())})
    out = VideoFrameSampleStage(backend="fsv", n_frames=3)(batch)
    assert out.num_rows == 3
    assert out.column("decode_ok").to_pylist() == [True] * 3
    picks = [int((f + 0.5) * 8 / 3) for f in range(3)]  # 1, 4, 6
    assert out.column("ts_ms").to_pylist() == [int(i / 8.0 * 1000) for i in picks]
    for row, idx in enumerate(picks):
        thumb, _, _, _ = codecs.decode(out.column("frame_png")[row].as_py())
        assert np.array_equal(thumb, frames[idx]), (row, idx)

    # garbage container flags, never crashes
    bad = pa.table({"media_id": ["x"], "bytes": pa.array([b"AVI?nope"], pa.binary())})
    out2 = VideoFrameSampleStage(backend="fsv")(bad)
    assert out2.column("decode_ok").to_pylist() == [False]


def test_video_fsv_torn_frame_flags_row_only():
    """A container with a valid TOC but a torn frame payload flags that
    frame's row; other frames and clips still process (review finding)."""
    import pyarrow as pa

    from fscrawler_ray.functions import codecs
    from fscrawler_ray.stages.multimodal import VideoFrameSampleStage, encode_fsv

    frames = [codecs.synth_image(7 + f, 32, 32) for f in range(4)]
    buf = encode_fsv(frames, fps=4.0)
    torn = buf[:-10]  # truncate inside the last frame's payload
    empty = encode_fsv([], fps=4.0)
    batch = pa.table({"media_id": ["torn", "empty", "good"],
                      "bytes": pa.array([torn, empty, buf], pa.binary())})
    out = VideoFrameSampleStage(backend="fsv", n_frames=4)(batch)
    df = out.to_pandas()
    good = df[df.media_id == "good"]
    assert good.decode_ok.all() and len(good) == 4
    emp = df[df.media_id == "empty"]
    assert len(emp) == 1 and not emp.decode_ok.iloc[0]  # flagged, not dropped
    t = df[df.media_id == "torn"]
    assert len(t) == 4 and not t.decode_ok.iloc[-1] and t.decode_ok.iloc[0]


def test_video_fsv_short_clip_samples_distinct_frames():
    """Review regression: total < n_frames must sample distinct frames,
    not the first frame repeatedly."""
    import pyarrow as pa

    from fscrawler_ray.functions import codecs
    from fscrawler_ray.stages.multimodal import VideoFrameSampleStage, encode_fsv

    frames = [codecs.synth_image(50 + f, 32, 32) for f in range(2)]
    buf = encode_fsv(frames, fps=2.0)
    out = VideoFrameSampleStage(backend="fsv", n_frames=4)(
        pa.table({"media_id": ["s"], "bytes": pa.array([buf], pa.binary())})
    ).to_pandas()
    assert len(out) == 2
    assert sorted(out["ts_ms"]) == [0, 500]  # frames 0 and 1, not 0 twice


def test_incremental_processor_streams_per_round():
    """IncrementalProcessor (crawl→enrich composed per round through the
    observer surface) must produce EXACTLY the store a one-shot batch
    process_results builds over the finished crawl — and be idempotent."""
    web = SynthWeb(CFG)
    with tempfile.TemporaryDirectory() as out, tempfile.TemporaryDirectory() as proc_inc, \
         tempfile.TemporaryDirectory() as proc_batch:
        from fscrawler_ray.pipelines.process_results import IncrementalProcessor, process_results

        eng = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, out_dir=out))
        inc = IncrementalProcessor(out, proc_inc, batch_size=128)
        eng.add_observer(inc)
        s = eng.run(web.seeds())

        # streamed per round: at least one round processed rows, totals match
        assert sum(st["processed"] for st in inc.stats) == s["result_rows"]
        assert len(inc.stats) >= 2

        # equivalent to the one-shot batch phase over the whole output
        r = process_results(out, proc_batch)
        assert r["processed"] == s["result_rows"]
        a = ray.data.read_parquet(proc_inc).to_pandas().sort_values("image_id").reset_index(drop=True)
        b = ray.data.read_parquet(proc_batch).to_pandas().sort_values("image_id").reset_index(drop=True)
        assert sorted(a.columns) == sorted(b.columns)
        cols = sorted(c for c in a.columns if c != "stage")
        assert a[cols].equals(b[cols])

        # idempotent: a batch pass over the crawl output after the
        # incremental run finds nothing left to do
        r2 = process_results(out, proc_inc)
        assert r2["processed"] == 0 and r2["previously_done"] == s["result_rows"]


def test_augment_stage_geometry_and_psnr():
    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.functions import codecs
    from fscrawler_ray.stages.image_stages import AugmentStage

    # involution / cycle structure of the ops
    img = codecs.synth_image(3, 24, 16)
    st = AugmentStage()
    assert np.array_equal(st.apply_op(st.apply_op(img, "flip_h"), "flip_h"), img)
    r = img
    for _ in range(4):
        r = st.apply_op(r, "rot90")
    assert np.array_equal(r, img)
    assert np.array_equal(st.apply_op(st.apply_op(img, "rot180"), "rot180"), img)

    # end-to-end through encode/decode: shape swaps for odd rotations and
    # the lossy re-encode keeps PSNR >= 40 dB vs the augmented pixels
    rows = []
    for i, fmt in enumerate(["png", "jpeg", "webp"]):
        src = codecs.synth_image(i, 20, 12)
        rows.append((f"img{i}", codecs.encode(src, fmt), src))
    batch = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    out = st(batch)
    for j in range(out.num_rows):
        op = out.column("aug_op")[j].as_py()
        buf = out.column("aug_bytes")[j].as_py()
        dec, w, h, fmt = codecs.decode(buf)
        src_dec, _, _, _ = codecs.decode(rows[j][1])
        want = AugmentStage.apply_op(src_dec, op)
        assert (h, w) == want.shape[:2]
        assert codecs.psnr(dec, want) >= 40.0


def test_augment_images_dataset_roundtrip():
    import ray
    from fscrawler_ray.sources.images import images_dataset
    from fscrawler_ray.stages.image_stages import augment_images

    ds = images_dataset(40)
    out = augment_images(ds, concurrency=2, batch_size=16)
    t = out.to_pandas()
    assert len(t) == 40
    assert t["aug_bytes"].notna().all()
    assert set(t["aug_op"]) <= {"flip_h", "rot90", "rot180", "rot270"}


def test_kill_mid_round_concurrent_processor_resume_both(tmp_path):
    """Chaos composition (VERDICT r04 #10): the engine dies mid-round
    while the incremental processor is consuming the SAME spool — the
    crash leaves (a) a checkpoint at round 2, (b) a PARTIALLY-written
    round=2 partition from in-flight leaf tasks, already partially
    consumed by the processor, and (c) a processor output part lost
    before fsync.  Resuming BOTH must converge to exactly the
    uninterrupted run's trace and store, and a final catch-up pass must
    find nothing left to do.  Mirrors the reference's two-phase
    DB-mediated restart (app/index_files.py:53-79)."""
    import glob
    import os
    import shutil

    from fscrawler_ray.pipelines.process_results import IncrementalProcessor, process_results

    seeds = SynthWeb(CFG).seeds()

    # ground truth: uninterrupted crawl + one-shot batch process
    full_out = str(tmp_path / "full_out")
    full = CrawlEngine(CrawlConfig(web=CFG, n_shards=2, politeness_budget=4, max_rounds=50, out_dir=full_out))
    s_full = full.run(seeds)
    full_trace = [(r["seq"], r["url"]) for r in full.trace_table().to_pylist()]
    proc_full = str(tmp_path / "proc_full")
    process_results(full_out, proc_full)

    # interrupted run: checkpoint every round, processor consuming per round
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    proc = str(tmp_path / "proc")
    cfg = CrawlConfig(
        web=CFG, n_shards=2, politeness_budget=4, max_rounds=50,
        out_dir=out, checkpoint_dir=ckpt, checkpoint_every=1,
    )
    eng = CrawlEngine(cfg)
    eng.add_observer(IncrementalProcessor(out, proc))
    eng.run(seeds, max_rounds=2)  # "dies" holding a checkpoint at round 2
    del eng

    # crash tail (a): round=2 partially written by in-flight leaf tasks —
    # the web is deterministic, so the full run's round=2 parts ARE what a
    # crashed round 2 would have spilled; copy half of them in
    src = sorted(glob.glob(os.path.join(full_out, "round=2", "table-*", "part-*.parquet")))
    assert src, "ground-truth run has no round=2 parts"
    for f in src[: max(1, len(src) // 2)]:
        rel = os.path.relpath(f, full_out)
        dst = os.path.join(out, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(f, dst)
    # crash tail (b): the processor consumed the partial round before the
    # crash was noticed (a catch-up scan over the damaged spool)
    process_results(out, proc)
    # crash tail (c): the processor lost its most recent output part
    lost = sorted(
        glob.glob(os.path.join(proc, "**", "*.parquet"), recursive=True),
        key=os.path.getmtime,
    )[-1]
    os.remove(lost)

    # resume BOTH: engine restarts at round 2 (prunes the partial parts,
    # rewrites them), the processor keeps consuming per round
    eng2 = CrawlEngine.resume(cfg)
    eng2.add_observer(IncrementalProcessor(out, proc))
    s2 = eng2.run()

    # the composed restart converges: trace parity with the uninterrupted run
    got_trace = [(r["seq"], r["url"]) for r in eng2.trace_table().to_pylist()]
    assert got_trace == full_trace

    # a final catch-up re-processes ONLY what the lost part dropped (the
    # per-round events may already have re-covered it when the lost rows
    # belonged to a resumed round) and ends idempotent
    r = process_results(out, proc)
    r2 = process_results(out, proc)
    assert r2["processed"] == 0
    assert r2["previously_done"] == s_full["result_rows"]

    # store parity with the one-shot batch store (stage label aside)
    a = ray.data.read_parquet(proc).to_pandas().sort_values("image_id").reset_index(drop=True)
    b = ray.data.read_parquet(proc_full).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(c for c in a.columns if c != "stage")
    assert a[cols].equals(b[cols])
