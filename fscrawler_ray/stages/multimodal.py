"""Multimodal actor-pool stages: caption-from-image (the OCR/text-extractor
analog) and audio/video feature stubs.

Reference analog: TextExtractorFileProcessor + strategy chain
(/root/reference/app/processors/text_extractor_file_processor.py:20-55,
pdf/picture strategies) — heavy models loaded once per actor, applied per
batch. Here:

- :class:`CaptionExtractStage` — a REAL stage: decodes the image (in-repo
  codecs) and produces a deterministic pseudo-caption from pixel statistics
  (stands in for an OCR/captioning model; the per-actor "model load" is the
  precomputed bucket vocabulary). Demonstrates the actor-pool pattern with
  true decode work.
- :class:`AudioFeatureStage` / :class:`VideoFrameSampleStage` — the
  audio/video payload plumbing (schema, batch shapes, actor signature,
  output layout) with the codec hook STUBBED: real audio/video libraries are
  not in this container, so ``backend='ffmpeg'`` raises NotImplementedError
  and ``backend='fake'`` runs a deterministic byte-level fake so the
  pipeline shape is testable end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import xxh64_batch

_BRIGHT = ["dark", "dim", "soft", "bright", "brilliant"]
_HUE = ["red", "orange", "yellow", "green", "cyan", "blue", "violet", "magenta"]
_TEXTURE = ["smooth", "grainy", "busy", "chaotic"]


class CaptionExtractStage:
    """Decode pixels → deterministic descriptive caption (OCR-model-pool
    analog). Output columns: extracted_caption (string), brightness
    (float64), dominant_hue (string)."""

    def __init__(self):
        # the "model load": precomputed hue bin centers, once per actor
        self.hue_bins = np.linspace(0, 360, len(_HUE), endpoint=False)

    def _describe(self, img: np.ndarray) -> tuple[str, float, str]:
        f = img.astype(np.float32)
        brightness = float(f.mean()) / 255.0
        r, g, b = f[..., 0].mean(), f[..., 1].mean(), f[..., 2].mean()
        mx, mn = max(r, g, b), min(r, g, b)
        if mx - mn < 1e-3:
            hue = 0.0
        elif mx == r:
            hue = 60 * (((g - b) / (mx - mn)) % 6)
        elif mx == g:
            hue = 60 * ((b - r) / (mx - mn) + 2)
        else:
            hue = 60 * ((r - g) / (mx - mn) + 4)
        hue_name = _HUE[int(hue // (360 / len(_HUE))) % len(_HUE)]
        grad = float(np.abs(np.diff(f.mean(axis=2), axis=0)).mean())
        texture = _TEXTURE[min(int(grad / 8), len(_TEXTURE) - 1)]
        bright_name = _BRIGHT[min(int(brightness * len(_BRIGHT)), len(_BRIGHT) - 1)]
        caption = f"a {bright_name} {texture} {hue_name} image"
        return caption, round(brightness, 6), hue_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        caps: list[str | None] = []
        brs: list[float] = []
        hues: list[str | None] = []
        for buf in batch.column("bytes").to_pylist():
            try:
                img, _, _, _ = codecs.decode(buf)
            except Exception:
                caps.append(None)
                brs.append(0.0)
                hues.append(None)
                continue
            c, b, h = self._describe(img)
            caps.append(c)
            brs.append(b)
            hues.append(h)
        out = batch.append_column("extracted_caption", pa.array(caps, pa.string()))
        out = out.append_column("brightness", pa.array(brs, pa.float64()))
        out = out.append_column("dominant_hue", pa.array(hues, pa.string()))
        return out


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int8()),
        ("duration_ms", pa.int32()),
        ("codec", pa.string()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fps", pa.float32()),
        ("duration_ms", pa.int32()),
        ("codec", pa.string()),
    ]
)


def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque audio payloads with typed metadata."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids = [f"aud_{i:08d}" for i in range(n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(2000, 20000)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "bytes": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(rng.choice([16000, 44100, 48000], n).astype(np.int32)),
            "n_channels": pa.array(rng.choice([1, 2], n).astype(np.int8)),
            "duration_ms": pa.array(rng.integers(500, 60000, n).astype(np.int32)),
            "codec": pa.array(rng.choice(["opus", "mp3", "flac"], n).tolist(), pa.string()),
        },
        schema=AUDIO_SCHEMA,
    )


def synth_wav_table(n: int, seed: int = 42) -> pa.Table:
    """REAL RIFF/WAVE payloads (stdlib ``wave`` writer): deterministic sine
    mixtures + noise, 16-bit mono PCM. These decode with the stage's 'wav'
    backend — honest audio bytes, no external codecs needed."""
    import io
    import wave

    rng = np.random.Generator(np.random.PCG64(seed))
    ids, bufs, srs, durs = [], [], [], []
    for i in range(n):
        sr = int(rng.choice([8000, 16000]))
        dur_s = float(rng.uniform(0.2, 0.8))
        f0 = float(rng.uniform(200, min(2000, sr / 2 - 200)))
        amp = float(rng.uniform(0.2, 0.9))
        t = np.arange(int(sr * dur_s)) / sr
        sig = amp * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(len(t))
        pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        ids.append(f"wav_{i:08d}")
        # embed the ID3v2-analog tag as a real RIFF chunk (fields derive
        # from the clip index so the SQL oracle can re-derive them while
        # the engine parses actual container bytes — the EXIF pattern)
        bufs.append(embed_id3_riff(bio.getvalue(), make_id3v2(*id3_fields_for(i))))
        srs.append(sr)
        durs.append(int(dur_s * 1000))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "bytes": pa.array(bufs, pa.binary()),
            "sample_rate": pa.array(np.array(srs, np.int32)),
            "n_channels": pa.array(np.ones(n, np.int8)),
            "duration_ms": pa.array(np.array(durs, np.int32)),
            "codec": pa.array(["wav"] * n, pa.string()),
        },
        schema=AUDIO_SCHEMA,
    )


_ID3_ARTISTS = (
    "The Seismographs",
    "Borealis Quartet",
    "Crater City Sound",
    "Dune Echoes",
    "Harbor Lights",
    "Static Garden",
    "Velvet Antenna",
    "Zephyr Union",
)


def id3_fields_for(i: int) -> tuple[str, str, int]:
    """Deterministic (title, artist, year) for clip index ``i`` — the
    generator contract the SQL oracle re-derives from media_id."""
    return (f"Track {i:05d}", _ID3_ARTISTS[i % 8], 1990 + (i * 7) % 30)


def make_id3v2(title: str, artist: str, year: int) -> bytes:
    """A REAL ID3v2.3 tag block (header + syncsafe size + TIT2/TPE1/TYER
    text frames, ISO-8859-1) — the honest analog of the reference's draft
    id3tag_extractor (/root/reference/app/processors/metadata_extractor/
    draft/id3tag_extractor.py)."""
    import struct

    def frame(fid: bytes, text: str) -> bytes:
        payload = b"\x00" + text.encode("latin1")
        return fid + struct.pack(">I", len(payload)) + b"\x00\x00" + payload

    frames = frame(b"TIT2", title) + frame(b"TPE1", artist) + frame(b"TYER", str(year))
    sz = len(frames)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3\x03\x00\x00" + ss + frames


def parse_id3v2(tag: bytes) -> dict:
    """Parse an ID3v2.3 block → {title, artist, year}; raises ValueError on
    malformed input (honest parser, no fallback to the generator)."""
    import struct

    if tag[:3] != b"ID3" or tag[3] != 3:
        raise ValueError("not an ID3v2.3 tag")
    sz = (tag[6] << 21) | (tag[7] << 14) | (tag[8] << 7) | tag[9]
    body, off, out = tag[10 : 10 + sz], 0, {}
    while off + 10 <= len(body):
        fid = body[off : off + 4]
        (flen,) = struct.unpack(">I", body[off + 4 : off + 8])
        payload = body[off + 10 : off + 10 + flen]
        if payload[:1] == b"\x00":
            text = payload[1:].decode("latin1")
            if fid == b"TIT2":
                out["title"] = text
            elif fid == b"TPE1":
                out["artist"] = text
            elif fid == b"TYER":
                out["year"] = int(text)
        off += 10 + flen
    return out


def embed_id3_riff(wav: bytes, tag: bytes) -> bytes:
    """Append the tag as a RIFF ``id3 `` chunk (the real WAV convention for
    carrying ID3) and fix up the RIFF size header; stdlib ``wave`` decode
    is unaffected (it stops at the data chunk)."""
    import struct

    chunk = b"id3 " + struct.pack("<I", len(tag)) + tag
    if len(tag) % 2:
        chunk += b"\x00"  # RIFF chunks are word-aligned
    (riff_sz,) = struct.unpack("<I", wav[4:8])
    return wav[:4] + struct.pack("<I", riff_sz + len(chunk)) + wav[8:] + chunk


def extract_id3_riff(buf: bytes) -> dict:
    """Walk the RIFF chunk list to the ``id3 `` chunk and parse it."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    off = 12
    while off + 8 <= len(buf):
        cid = buf[off : off + 4]
        (sz,) = struct.unpack("<I", buf[off + 4 : off + 8])
        if cid == b"id3 ":
            return parse_id3v2(buf[off + 8 : off + 8 + sz])
        off += 8 + sz + (sz % 2)
    raise ValueError("no id3 chunk")


def id3_batch(batch: pa.Table) -> pa.Table:
    """Extractor stage: parse the embedded ID3v2 tag out of each WAV
    payload → id3_title / id3_artist / id3_year columns (null row when the
    container carries no tag). Loops only at the per-clip container-parse
    boundary, like every codec stage."""
    titles, artists, years = [], [], []
    for buf in batch.column("bytes").to_pylist():
        try:
            d = extract_id3_riff(buf)
            titles.append(d.get("title"))
            artists.append(d.get("artist"))
            years.append(d.get("year"))
        except (ValueError, IndexError):
            titles.append(None)
            artists.append(None)
            years.append(None)
    out = batch.append_column("id3_title", pa.array(titles, pa.string()))
    out = out.append_column("id3_artist", pa.array(artists, pa.string()))
    return out.append_column("id3_year", pa.array(years, pa.int64()))


def _decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Stdlib WAV decode → (mono float64 in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={sw}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


class AudioFeatureStage:
    """Actor-pool audio featurizer with three backends:

    - ``'wav'`` — REAL decode: stdlib ``wave`` parses RIFF 16-bit PCM and
      numpy computes genuine features (RMS loudness in dBFS,
      zero-crossing rate, log-spaced FFT band energies — the mel-ish
      filterbank). No external codec needed.
    - ``'fake'`` — byte-hash-derived features (for opaque/compressed
      payloads whose codecs are absent in this container).
    - ``'ffmpeg'`` — honest NotImplementedError (library not installed).
    """

    def __init__(self, backend: str = "fake", n_mels: int = 8):
        if backend not in ("fake", "wav"):
            raise NotImplementedError(
                f"audio backend {backend!r} needs ffmpeg/librosa, which are not "
                "available in this environment; use backend='wav' (PCM) or 'fake'"
            )
        self.backend = backend
        self.n_mels = n_mels

    def _wav_features(self, buf: bytes):
        x, sr = _decode_wav(buf)
        if len(x) == 0:
            return np.zeros(self.n_mels, np.float32), -120.0, 0.0
        rms = float(np.sqrt(np.mean(x**2)))
        loud_db = 20.0 * np.log10(max(rms, 1e-6))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) * sr / 2.0
        p = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
        edges = np.geomspace(50.0, sr / 2.0, self.n_mels + 1)
        bands = np.empty(self.n_mels, np.float64)
        for k in range(self.n_mels):
            m = (freqs >= edges[k]) & (freqs < edges[k + 1])
            bands[k] = p[m].sum() if m.any() else 0.0
        feats = np.log1p(bands / max(len(x), 1)).astype(np.float32)
        return feats, round(loud_db, 6), round(zcr, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "wav":
            feats, louds, zcrs, oks = [], [], [], []
            for buf in batch.column("bytes").to_pylist():
                try:
                    f, l, z = self._wav_features(buf)
                    oks.append(True)
                except Exception:
                    # undecodable payload flags the row, never kills the
                    # stage (record-and-continue, like the dead letters)
                    f, l, z = None, None, None
                    oks.append(False)
                feats.append(f)
                louds.append(l)
                zcrs.append(z)
            out = batch.drop_columns(["bytes"])
            out = out.append_column(
                "mel_features",
                pa.array([f.tolist() if f is not None else None for f in feats], pa.list_(pa.float32())),
            )
            out = out.append_column("loudness", pa.array(louds, pa.float64()))
            out = out.append_column("zcr", pa.array(zcrs, pa.float64()))
            out = out.append_column("decode_ok", pa.array(oks, pa.bool_()))
            return out
        data = batch.column("bytes")
        h = xxh64_batch(data)
        feats = []
        for i, key in enumerate(h):
            rng = np.random.Generator(np.random.PCG64(int(key)))
            feats.append(rng.random(self.n_mels).astype(np.float32))
        out = batch.drop_columns(["bytes"])
        out = out.append_column(
            "mel_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
        out = out.append_column("loudness", pa.array([float(f.mean()) for f in feats], pa.float64()))
        return out


_FSV_MAGIC = b"FSV1"


def encode_fsv(frames: list[np.ndarray], fps: float = 12.0, fmt: str = "png") -> bytes:
    """Encode frames into the FSV1 container: magic + u32 frame count +
    f32 fps + per-frame (u32 length, codec bytes). A documented, seekable
    toy container so video demux/decode is REAL in this environment (the
    per-frame codec is the repo's own functions/codecs.py)."""
    import struct

    parts = [_FSV_MAGIC, struct.pack("<I", len(frames)), struct.pack("<f", fps)]
    for img in frames:
        buf = codecs.encode(img, fmt)
        parts.append(struct.pack("<I", len(buf)))
        parts.append(buf)
    return b"".join(parts)


def decode_fsv_header(buf: bytes) -> tuple[int, float, list[tuple[int, int]]]:
    """Parse the FSV1 container TOC without decoding any frame: returns
    (n_frames, fps, [(offset, length), ...]) — this is what lets the
    sampler seek straight to the frames it wants."""
    import struct

    if buf[:4] != _FSV_MAGIC:
        raise ValueError("not an FSV1 container")
    n = struct.unpack_from("<I", buf, 4)[0]
    fps = struct.unpack_from("<f", buf, 8)[0]
    toc = []
    off = 12
    for _ in range(n):
        ln = struct.unpack_from("<I", buf, off)[0]
        toc.append((off + 4, ln))
        off += 4 + ln
    return n, fps, toc


def synth_video_table(n: int, seed: int = 42, frames_per_clip: int = 8) -> pa.Table:
    """Deterministic REAL video payloads: FSV1 containers of codec-encoded
    frames (animated by shifting the synth pattern per frame)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, bufs, ws, hs, fpss, durs = [], [], [], [], [], []
    for i in range(n):
        w = int(rng.choice([32, 48]))
        h = int(rng.choice([32, 48]))
        fps = float(rng.choice([8.0, 12.0, 24.0]))
        base = int(rng.integers(0, 1 << 31))
        frames = [codecs.synth_image((base + f) & 0xFFFFFFFF, w, h) for f in range(frames_per_clip)]
        bufs.append(encode_fsv(frames, fps=fps))
        ids.append(f"vid_{i:08d}")
        ws.append(w)
        hs.append(h)
        fpss.append(fps)
        durs.append(int(frames_per_clip / fps * 1000))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "bytes": pa.array(bufs, pa.binary()),
            "w": pa.array(np.array(ws, np.int32)),
            "h": pa.array(np.array(hs, np.int32)),
            "fps": pa.array(np.array(fpss, np.float32)),
            "duration_ms": pa.array(np.array(durs, np.int32)),
            "codec": pa.array(["fsv1"] * n, pa.string()),
        },
        schema=VIDEO_SCHEMA,
    )


class VideoFrameSampleStage:
    """Actor-pool frame sampler (the reference's evenly-spaced ffmpeg frames,
    preview_file_processor.py:17-62). Emits one row per sampled frame
    (flat_map-style expansion).

    - ``'fsv'`` — REAL demux+decode: parses the FSV1 container TOC, seeks
      to the evenly-spaced frames, decodes ONLY those (IO/compute pruning
      at the frame level) and re-encodes png thumbnails.
    - ``'fake'`` — byte-hash-derived frames (opaque payloads).
    - ``'ffmpeg'`` — honest NotImplementedError (library not installed).
    """

    def __init__(self, backend: str = "fake", n_frames: int = 3):
        if backend not in ("fake", "fsv"):
            raise NotImplementedError(
                f"video backend {backend!r} needs ffmpeg, which is not available "
                "in this environment; use backend='fsv' (FSV1 container) or 'fake'"
            )
        self.backend = backend
        self.n_frames = n_frames

    def _sample_fsv(self, buf: bytes, mid: str, rows: tuple) -> None:
        ids, frame_no, ts_ms, thumbs, oks = rows

        def flag() -> None:
            ids.append(mid)
            frame_no.append(-1)
            ts_ms.append(0)
            thumbs.append(None)
            oks.append(False)

        try:
            total, fps, toc = decode_fsv_header(buf)
        except Exception:
            flag()
            return
        if total == 0 or fps <= 0:
            flag()  # empty/degenerate clip: flagged, never silently dropped
            return
        eff = min(self.n_frames, total)
        picks = [int((f + 0.5) * total / eff) for f in range(eff)]  # distinct, evenly spaced
        for f, idx in enumerate(picks):
            try:
                off, ln = toc[idx]
                img, _, _, _ = codecs.decode(buf[off : off + ln])  # decode ONLY sampled frames
                thumb = codecs.encode(img, "png")
            except Exception:
                # a torn frame flags its row; the clip's other frames and
                # the rest of the batch still process
                ids.append(mid)
                frame_no.append(f)
                ts_ms.append(int(idx / fps * 1000))
                thumbs.append(None)
                oks.append(False)
                continue
            ids.append(mid)
            frame_no.append(f)
            ts_ms.append(int(idx / fps * 1000))
            thumbs.append(thumb)
            oks.append(True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[str] = []
        frame_no: list[int] = []
        ts_ms: list[int] = []
        thumbs: list[bytes | None] = []
        oks: list[bool] = []
        if self.backend == "fsv":
            for i in range(batch.num_rows):
                self._sample_fsv(
                    batch.column("bytes")[i].as_py(),
                    batch.column("media_id")[i].as_py(),
                    (ids, frame_no, ts_ms, thumbs, oks),
                )
        else:
            keys = xxh64_batch(batch.column("bytes"))
            for i in range(batch.num_rows):
                dur = batch.column("duration_ms")[i].as_py()
                mid = batch.column("media_id")[i].as_py()
                rng = np.random.Generator(np.random.PCG64(int(keys[i])))
                for f in range(self.n_frames):
                    ids.append(mid)
                    frame_no.append(f)
                    ts_ms.append(int((f + 0.5) * dur / self.n_frames))
                    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
                    thumbs.append(codecs.encode(img, "png"))
                    oks.append(True)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int32()),
                "frame_png": pa.array(thumbs, pa.binary()),
                "decode_ok": pa.array(oks, pa.bool_()),
            }
        )
