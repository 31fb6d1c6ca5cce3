"""map_batches stages over the input_hint image table.

Each stage is either a stateless batch function (pure Arrow/numpy) or a
callable class for ``map_batches(Cls, concurrency=N)`` when it holds
per-worker state. Reference processor analogs:

- :class:`DecodePhashVerify` — the decode + verification + perceptual-hash
  stage (thumbnail/metadata processors,
  /root/reference/app/processors/preview_file_processor.py:17-62 and
  extended_attributes_file_processor.py:18-93), enforcing the input_hint
  per-row invariant (PSNR ≥ 40 dB for lossy formats, exact phash).
- :func:`content_hash_batch` — exact content hash of payload bytes
  (hash_file_processor.py:16-51).
- :func:`attrs_batch` — magic-byte format sniff + size + content family
  (the libmagic MIME stage, extended_attributes_file_processor.py:22-44;
  family rules app/models/path.py:171-208).
- :func:`caption_features_batch` — keywords + rating + quality + language
  (keywords_file_processor.py / rating_file_processor.py analogs).
- :class:`ThumbnailStage` — actor-pool thumbnailer (preview processor
  analog). Uses the in-repo deterministic codecs; a hook for external
  codecs (PIL/ffmpeg — not installed here) raises NotImplementedError.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import codecs
from ..functions.hashing import xxh64_batch
from ..functions.phash import hamming64, phash_batch, to_gray32
from ..functions.text import keywords_batch, langid_batch, quality_features, rating_batch

# MIME/format → content family (the path.py:171-208 rule table, reduced to
# the formats that exist in this corpus)
_FAMILY = {"png": "PICTURE", "jpeg": "PICTURE", "webp": "PICTURE", "html": "DOCUMENT", None: "APPLICATION"}
# family → content category (the reduced ContentCategory mapping,
# app/models/content.py:21-46) and category → PEGI minimum age
# (content.py:49-81)
_CATEGORY = {"PICTURE": "PHOTO", "DOCUMENT": "DOCUMENT", "APPLICATION": "APP"}
_PEGI = {"PHOTO": 3, "DOCUMENT": 3, "APP": 12}


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """Add ``hash`` = xxh64(bytes) (uint64 stored as int64)."""
    h = xxh64_batch(batch.column("bytes")).astype(np.int64)
    return batch.append_column("hash", pa.array(h))


def attrs_batch(batch: pa.Table) -> pa.Table:
    """Add ``size`` (payload length), ``sniffed_fmt`` (magic bytes), and
    ``content_family``; vectorized except the 4-byte magic comparisons,
    which operate on a fixed-width prefix slice."""
    data = batch.column("bytes")
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    size = pc.binary_length(data).cast(pa.int64())
    prefix = pc.binary_slice(data.cast(pa.large_binary()), 0, 12)
    pl = prefix.to_pylist()
    sniffed = [codecs.sniff_format(p or b"") for p in pl]
    family = [_FAMILY.get(s, "APPLICATION") for s in sniffed]
    if "size" in batch.column_names:
        # crawl results already carry the discovery-time content length;
        # replace it with the exact payload length
        out = batch.set_column(batch.column_names.index("size"), "size", size)
    else:
        out = batch.append_column("size", size)
    out = out.append_column("sniffed_fmt", pa.array(sniffed, type=pa.string()))
    out = out.append_column(
        "content_family", pa.array(family, type=pa.string()).dictionary_encode()
    )
    category = [_CATEGORY.get(f, "APP") for f in family]
    out = out.append_column(
        "content_category", pa.array(category, type=pa.string()).dictionary_encode()
    )
    out = out.append_column(
        "content_min_age", pa.array([_PEGI.get(c, 3) for c in category], type=pa.int8())
    )
    return out


def exif_batch(batch: pa.Table) -> pa.Table:
    """Parse the embedded EXIF-analog metadata segment out of each payload
    (JPEG APP1 / PNG eXIf / RIFF EXIF — functions/codecs.extract_exif; the
    reference's draft exif_extractor.py analog).  Adds ``exif_orientation``
    (int32, null when absent/malformed), ``exif_camera`` (string) and
    ``exif_captured_at_us`` (int64 µs epoch).  Loops only at the per-image
    container-parse boundary, like every codec stage."""
    data = batch.column("bytes")
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    orient: list[int | None] = []
    camera: list[str | None] = []
    captured: list[int | None] = []
    for buf in data.to_pylist():
        meta = codecs.parse_exif(codecs.extract_exif(buf or b"") or b"")
        orient.append(meta["orientation"] if meta else None)
        camera.append(meta["camera"] if meta else None)
        captured.append(meta["captured_at_us"] if meta else None)
    out = batch.append_column("exif_orientation", pa.array(orient, pa.int32()))
    out = out.append_column("exif_camera", pa.array(camera, pa.string()))
    return out.append_column("exif_captured_at_us", pa.array(captured, pa.int64()))


def iptc_batch(batch: pa.Table) -> pa.Table:
    """Parse the IPTC-IIM-analog datasets trailing the EXIF block in each
    payload's metadata segment (functions/codecs.extract_iptc; the
    reference's draft itpc_extractor.py analog).  Adds ``iptc_caption``,
    ``iptc_byline`` (string, null when absent/malformed) and
    ``iptc_keywords`` (comma-joined string).  Loops only at the per-image
    container-parse boundary."""
    data = batch.column("bytes")
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    caps: list[str | None] = []
    bylines: list[str | None] = []
    kws: list[str | None] = []
    for buf in data.to_pylist():
        meta = codecs.extract_iptc(buf or b"")
        caps.append(meta["caption"] if meta else None)
        bylines.append(meta["byline"] if meta else None)
        kws.append(",".join(meta["keywords"]) if meta and meta["keywords"] else None)
    out = batch.append_column("iptc_caption", pa.array(caps, pa.string()))
    out = out.append_column("iptc_byline", pa.array(bylines, pa.string()))
    return out.append_column("iptc_keywords", pa.array(kws, pa.string()))


def decode_phash_verify_batch(batch: pa.Table) -> pa.Table:
    """Stateless form of :class:`DecodePhashVerify` (max_hamming=0) for
    plain task pools — the stage holds no per-worker state, so elastic
    tasks beat a fixed actor pool (no actor spin-up cost on small inputs)."""
    return DecodePhashVerify()(batch)


class DecodePhashVerify:
    """Decode payloads, verify (w, h, fmt) metadata and the stored phash,
    recompute phash from decoded pixels. Usable as a plain batch callable
    (stateless) or via map_batches(cls, concurrency=...) when configured.

    Output adds: ``decode_ok`` (bool), ``verify_ok`` (bool: dims+fmt match),
    ``phash_computed`` (int64), ``phash_match`` (bool), ``phash_dist``
    (int64 hamming). Per-row decode failures become data (error flags), not
    exceptions — the reference's record-and-continue contract
    (app/crawling_queue_consumer.py:123-126).
    """

    def __init__(self, max_hamming: int = 0):
        self.max_hamming = max_hamming

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        fmt = batch.column("fmt").to_pylist()
        n = len(data)
        ok = np.zeros(n, dtype=bool)
        verify = np.zeros(n, dtype=bool)
        grays = np.zeros((n, 32, 32), dtype=np.float32)
        for i, buf in enumerate(data):
            try:
                img, iw, ih, ifmt = codecs.decode(buf)
            except Exception:
                continue
            ok[i] = True
            verify[i] = (iw == w[i]) and (ih == h[i]) and (ifmt == fmt[i])
            grays[i] = to_gray32(img)
        ph = phash_batch(grays)
        ph[~ok] = 0
        stored = batch.column("phash").to_numpy(zero_copy_only=False)
        dist = hamming64(ph, stored)
        match = ok & (dist <= self.max_hamming)
        out = batch.append_column("decode_ok", pa.array(ok))
        out = out.append_column("verify_ok", pa.array(verify))
        out = out.append_column("phash_computed", pa.array(ph))
        out = out.append_column("phash_dist", pa.array(dist))
        out = out.append_column("phash_match", pa.array(match))
        return out


def caption_features_batch(batch: pa.Table) -> pa.Table:
    """Keywords + rating + token count + language + quality score from the
    caption column (all vectorized except the branchy keyword convention)."""
    cap = batch.column("caption")
    if isinstance(cap, pa.ChunkedArray):
        cap = cap.combine_chunks()
    out = batch.append_column("keywords", keywords_batch(cap))
    out = out.append_column("rating", rating_batch(cap, batch.column("image_id")))
    q = quality_features(cap)
    out = out.append_column("caption_tokens", q.column("n_tokens"))
    out = out.append_column("caption_quality", q.column("quality_score"))
    out = out.append_column("caption_lang", langid_batch(cap))
    return out


class ThumbnailStage:
    """Actor-pool thumbnailer: decode → area-mean downscale to ``max_px`` →
    re-encode png → ``thumb`` binary column (+ ``thumb_w``/``thumb_h``).

    ``codec='builtin'`` uses the in-repo deterministic codecs. Any external
    codec (``'pillow'``, ``'ffmpeg'``) is a deliberate stub: the Ray-side
    plumbing (actor pool, batch shape, schema) is real, but the decode hook
    raises NotImplementedError because those libraries are not available in
    this environment.
    """

    def __init__(self, max_px: int = 64, codec: str = "builtin"):
        self.max_px = max_px
        if codec != "builtin":
            raise NotImplementedError(
                f"external codec {codec!r} not available in this environment; "
                "use codec='builtin' (deterministic in-repo codecs)"
            )

    def _downscale(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        s = max(h, w) / self.max_px
        if s <= 1:
            return img
        th, tw = max(1, int(h / s)), max(1, int(w / s))
        ys = (np.arange(th + 1) * h // th).astype(int)
        xs = (np.arange(tw + 1) * w // tw).astype(int)
        c = np.zeros((h + 1, w + 1, 3), dtype=np.float64)
        c[1:, 1:] = img.astype(np.float64).cumsum(0).cumsum(1)
        area = ((ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1]))[..., None]
        block = (
            c[ys[1:], :][:, xs[1:]] - c[ys[:-1], :][:, xs[1:]] - c[ys[1:], :][:, xs[:-1]] + c[ys[:-1], :][:, xs[:-1]]
        )
        return np.clip(block / np.maximum(area, 1), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs: list[bytes | None] = []
        tws: list[int] = []
        ths: list[int] = []
        for buf in batch.column("bytes").to_pylist():
            try:
                img, _, _, _ = codecs.decode(buf)
            except Exception:
                thumbs.append(None)
                tws.append(0)
                ths.append(0)
                continue
            t = self._downscale(img)
            thumbs.append(codecs.encode(t, "png"))
            ths.append(t.shape[0])
            tws.append(t.shape[1])
        out = batch.append_column("thumb", pa.array(thumbs, type=pa.binary()))
        out = out.append_column("thumb_w", pa.array(tws, type=pa.int32()))
        out = out.append_column("thumb_h", pa.array(ths, type=pa.int32()))
        return out


class AugmentStage:
    """Actor-pool image augmentation for training-data pipelines:
    deterministic per-image geometric ops (horizontal flip, k×90°
    rotation chosen by image_id hash) on DECODED pixels, re-encoded in
    the source format.  The involution/cycle structure is the
    correctness contract (flip∘flip = id, rot90⁴ = id — asserted in
    tests), and every lossy re-encode preserves the PSNR ≥ 40 dB
    invariant the flagship pipeline enforces.

    Same decode posture as ThumbnailStage: the in-repo deterministic
    codecs are the real backend; external codecs are deliberate
    environment-gated stubs.  Stateless per batch but shaped as a
    callable class so `map_batches(AugmentStage, concurrency=N)` reuses
    the compiled setup per actor (reference analog: the preview
    processor's per-process init, app/processors/preview_file_processor.py).
    """

    _OPS = ("flip_h", "rot90", "rot180", "rot270")

    def __init__(self, codec: str = "builtin", op_hash: str = "xxh64"):
        if codec != "builtin":
            raise NotImplementedError(
                f"external codec {codec!r} not available in this environment; "
                "use codec='builtin' (deterministic in-repo codecs)"
            )
        # 'md5' picks ops via the SQL-replayable md5_number_upper hash so
        # the oracle can re-derive (op, dims); the scale path stays on the
        # vectorized xxh64 default
        assert op_hash in ("xxh64", "md5")
        self.op_hash = op_hash

    @staticmethod
    def apply_op(img: np.ndarray, op: str) -> np.ndarray:
        if op == "flip_h":
            return img[:, ::-1]
        if op == "rot90":
            return np.rot90(img, 1)
        if op == "rot180":
            return np.rot90(img, 2)
        if op == "rot270":
            return np.rot90(img, 3)
        raise ValueError(f"unknown op {op!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import xxh64_batch

        ids = batch.column("image_id")
        if self.op_hash == "md5":
            from ..functions.sketches import md5_u64_batch

            h = md5_u64_batch(ids.cast(pa.string()))
        else:
            h = xxh64_batch(ids.cast(pa.string()), seed=99)
        ops = [self._OPS[int(x % np.uint64(len(self._OPS)))] for x in h]
        out_bytes: list[bytes | None] = []
        out_w: list[int] = []
        out_h: list[int] = []
        for buf, op in zip(batch.column("bytes").to_pylist(), ops):
            try:
                img, _, _, fmt = codecs.decode(buf)
            except Exception:
                out_bytes.append(None)
                out_w.append(0)
                out_h.append(0)
                continue
            aug = np.ascontiguousarray(self.apply_op(img, op))
            out_bytes.append(codecs.encode(aug, fmt))
            out_h.append(aug.shape[0])
            out_w.append(aug.shape[1])
        return pa.table(
            {
                "image_id": ids,
                "aug_op": pa.array(ops, pa.string()),
                "aug_bytes": pa.array(out_bytes, pa.binary()),
                "aug_w": pa.array(out_w, pa.int32()),
                "aug_h": pa.array(out_h, pa.int32()),
            }
        )


def augment_images(ds, concurrency: int = 4, batch_size: int = 64):
    """images Dataset → (image_id, aug_op, aug_bytes, aug_w, aug_h)."""
    return ds.map_batches(
        AugmentStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
