"""Deterministic image codecs (no PIL/libjpeg in this environment).

The input contract (BASELINE.json ``input_hint``) is a table of
``(image_id, bytes, w, h, fmt, caption, phash)`` where ``bytes`` holds an
encoded image and the per-row invariant is *decoded-pixel allclose with
PSNR ≥ 40 dB for lossy formats*. Real image libraries are not installed, so
this module defines a small family of fully deterministic codecs that wear
the real containers' magic bytes (so MIME sniffing — the analog of the
reference's libmagic stage,
/root/reference/app/processors/metadata_extractor/extended_attributes_file_processor.py:22-37
— is honest) but carry zlib-compressed pixel payloads:

- ``png``  — lossless: raw RGB, zlib-compressed. PSNR = ∞.
- ``jpeg`` — lossy: uniform quantization step 4 then zlib. PSNR ≈ 46 dB.
- ``webp`` — lossy: uniform quantization step 2 then zlib. PSNR ≈ 52 dB.

Every function is numpy-vectorized per image; batch helpers loop over rows
only at the (unavoidable) per-image codec boundary, exactly like a real
decode stage would.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8\xff\xe0",
    "webp": b"RIFF",
}
_QUANT = {"png": 1, "jpeg": 4, "webp": 2}
LOSSY = {"jpeg", "webp"}
FORMATS = tuple(_QUANT)

_HDR = struct.Struct("<HHB")  # w, h, quant


def encode(img: np.ndarray, fmt: str, exif: bytes | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 image deterministically. ``exif`` (a
    pack_exif payload) embeds as each container's REAL metadata shape —
    JPEG APP1 segment, PNG eXIf chunk (with CRC), RIFF EXIF subchunk — so
    the extractor stage genuinely parses container structure (the analog
    of the reference's draft exif_extractor.py)."""
    if fmt not in _QUANT:
        raise ValueError(f"unknown format {fmt!r}")
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    q = _QUANT[fmt]
    payload = (img // q).astype(np.uint8).tobytes() if q > 1 else img.tobytes()
    body = _HDR.pack(w, h, q) + zlib.compress(payload, level=1)
    if fmt == "webp":
        meta = b""
        if exif is not None:
            pad = exif + (b"\x00" if len(exif) % 2 else b"")  # RIFF pads to even
            meta = b"EXIF" + struct.pack("<I", len(exif)) + pad
        return MAGIC["webp"] + struct.pack("<I", len(body) + len(meta) + 8) + b"WEBPFSR " + meta + body
    if fmt == "jpeg":
        meta = b""
        if exif is not None:
            seg = b"Exif\x00\x00" + exif
            meta = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
        return MAGIC[fmt] + meta + body
    meta = b""
    if exif is not None:
        meta = struct.pack(">I", len(exif)) + b"eXIf" + exif + struct.pack(">I", zlib.crc32(exif))
    return MAGIC[fmt] + meta + body


# -- EXIF-analog metadata block (reference draft exif_extractor.py) ---------

_EXIF_TIFF = b"II*\x00"  # little-endian TIFF magic, as real EXIF payloads open
_EXIF_FIXED = struct.Struct("<HHq")  # orientation, camera-name len, captured_at (us epoch)


def pack_exif(orientation: int, camera: str, captured_at_us: int) -> bytes:
    """Fixed TIFF-flavored EXIF-analog payload: orientation (1-8), camera
    model string, capture timestamp (µs since epoch)."""
    name = camera.encode("utf-8")
    return _EXIF_TIFF + _EXIF_FIXED.pack(orientation, len(name), captured_at_us) + name


def parse_exif(payload: bytes) -> dict | None:
    """Inverse of pack_exif; None on anything malformed (honest parser)."""
    if len(payload) < 4 + _EXIF_FIXED.size or payload[:4] != _EXIF_TIFF:
        return None
    orientation, nlen, ts = _EXIF_FIXED.unpack_from(payload, 4)
    name = payload[4 + _EXIF_FIXED.size : 4 + _EXIF_FIXED.size + nlen]
    if len(name) != nlen or not (1 <= orientation <= 8):
        return None
    try:
        camera = name.decode("utf-8")
    except UnicodeDecodeError:
        return None
    return {"orientation": orientation, "camera": camera, "captured_at_us": ts}


def extract_exif(buf: bytes) -> bytes | None:
    """Locate the container's metadata segment and return the EXIF-analog
    payload, or None when the image carries none."""
    fmt = sniff_format(buf)
    try:
        if fmt == "jpeg" and buf[4:6] == b"\xff\xe1":
            (seglen,) = struct.unpack_from(">H", buf, 6)
            seg = buf[8 : 6 + seglen]
            return seg[6:] if seg[:6] == b"Exif\x00\x00" else None
        if fmt == "png" and buf[12:16] == b"eXIf":
            (plen,) = struct.unpack_from(">I", buf, 8)
            payload = buf[16 : 16 + plen]
            if len(payload) != plen:
                return None  # declared length runs past the buffer
            (crc,) = struct.unpack_from(">I", buf, 16 + plen)
            return payload if crc == zlib.crc32(payload) else None
        if fmt == "webp" and buf[16:20] == b"EXIF":
            (plen,) = struct.unpack_from("<I", buf, 20)
            payload = buf[24 : 24 + plen]
            return payload if len(payload) == plen else None
    except struct.error:  # truncated header/length field
        return None
    return None


# -- IPTC-IIM-analog datasets (reference draft itpc_extractor.py) -----------
#
# Real IPTC rides in the image's metadata slot as a stream of IIM datasets
# (0x1C marker, record, dataset, big-endian length, data). Here the stream
# is appended AFTER the EXIF-analog block inside the same container
# segment — parse_exif reads only its fixed part and ignores the trailing
# datasets, exactly like real APP1/APP13 coexistence.


def pack_iptc(caption: str, keywords: list[str], byline: str) -> bytes:
    """IIM dataset stream: 2:120 Caption-Abstract, 2:25 Keywords
    (repeatable), 2:80 By-line."""

    def ds(rec: int, dset: int, data: bytes) -> bytes:
        return bytes([0x1C, rec, dset]) + struct.pack(">H", len(data)) + data

    out = ds(2, 0x78, caption.encode("utf-8"))
    for k in keywords:
        out += ds(2, 0x19, k.encode("utf-8"))
    return out + ds(2, 0x50, byline.encode("utf-8"))


def parse_iptc(payload: bytes) -> dict | None:
    """Scan an IIM dataset stream; None on malformed or empty input
    (honest parser — no generator fallback)."""
    off, caption, byline, kws = 0, None, None, []
    while off + 5 <= len(payload):
        if payload[off] != 0x1C:
            return None
        rec, dset = payload[off + 1], payload[off + 2]
        (ln,) = struct.unpack_from(">H", payload, off + 3)
        data = payload[off + 5 : off + 5 + ln]
        if len(data) != ln:
            return None
        if rec == 2 and dset in (0x78, 0x19, 0x50):
            try:
                text = data.decode("utf-8")
            except UnicodeDecodeError:
                return None
            if dset == 0x78:
                caption = text
            elif dset == 0x19:
                kws.append(text)
            else:
                byline = text
        off += 5 + ln
    if caption is None and byline is None and not kws:
        return None
    return {"caption": caption, "keywords": kws, "byline": byline}


def meta_parts(payload: bytes) -> tuple[bytes, bytes]:
    """Split a metadata-slot payload into (EXIF-analog block, trailing
    IIM stream); whole payload is EXIF when no valid block leads."""
    if len(payload) < 4 + _EXIF_FIXED.size or payload[:4] != _EXIF_TIFF:
        return payload, b""
    _, nlen, _ = _EXIF_FIXED.unpack_from(payload, 4)
    end = 4 + _EXIF_FIXED.size + nlen
    return payload[:end], payload[end:]


def extract_iptc(buf: bytes) -> dict | None:
    """Locate the container's metadata segment and parse the IIM stream
    trailing the EXIF-analog block, or None when absent."""
    payload = extract_exif(buf)
    if payload is None:
        return None
    _, trailing = meta_parts(payload)
    return parse_iptc(trailing) if trailing else None


def _body_offset(buf: bytes, fmt: str) -> int:
    """Offset of the pixel body, skipping any metadata segment."""
    if fmt == "jpeg":
        if buf[4:6] == b"\xff\xe1":
            (seglen,) = struct.unpack_from(">H", buf, 6)
            return 6 + seglen
        return len(MAGIC["jpeg"])
    if fmt == "png":
        if buf[12:16] == b"eXIf":
            (plen,) = struct.unpack_from(">I", buf, 8)
            return 8 + 4 + 4 + plen + 4
        return len(MAGIC["png"])
    # webp: 16-byte RIFF header, then an optional padded EXIF subchunk
    if buf[16:20] == b"EXIF":
        (plen,) = struct.unpack_from("<I", buf, 20)
        return 24 + plen + (plen % 2)
    return 16


def sniff_format(buf: bytes) -> str | None:
    """Magic-byte MIME sniff (the libmagic analog). Returns fmt or None."""
    if buf[:8] == MAGIC["png"]:
        return "png"
    if buf[:4] == MAGIC["jpeg"]:
        return "jpeg"
    if buf[:4] == MAGIC["webp"] and buf[8:12] == b"WEBP":
        return "webp"
    return None


def decode(buf: bytes) -> tuple[np.ndarray, int, int, str]:
    """Decode → (img (h,w,3) uint8, w, h, fmt). Raises ValueError on junk."""
    fmt = sniff_format(buf)
    if fmt is None:
        raise ValueError("unknown image format")
    off = _body_offset(buf, fmt)
    w, h, q = _HDR.unpack_from(buf, off)
    raw = zlib.decompress(buf[off + _HDR.size :])
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if q > 1:
        img = np.minimum(img.astype(np.uint16) * q + q // 2, 255).astype(np.uint8)
    return img, w, h, fmt


def reencode_reconstruction(img: np.ndarray, fmt: str) -> np.ndarray:
    """The exact pixels ``decode(encode(img, fmt))`` returns, computed
    WITHOUT the zlib round-trip: quantize-and-reconstruct is the only
    lossy step, so fetch paths can phash the decoded-equivalent image at
    a fraction of a real decode's cost. Bit-identical to decode (asserted
    in tests)."""
    q = _QUANT[fmt]
    if q <= 1:
        return img
    return np.minimum((img // q).astype(np.uint16) * q + q // 2, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def synth_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-photo: low-frequency field + noise, seeded.

    Low-res random field upsampled bilinearly so lossy quantization and
    phash have realistic structure to latch onto.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    gw, gh = max(2, w // 8), max(2, h // 8)
    grid = rng.integers(0, 256, (gh, gw, 3)).astype(np.float32)
    # float32 throughout — the silent float64 upcast doubles the cost of the
    # hottest kernel in the synthetic fetch path
    yi = np.linspace(0, gh - 1, h, dtype=np.float32)
    xi = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    fy = (yi - y0.astype(np.float32))[:, None, None]
    fx = (xi - x0.astype(np.float32))[None, :, None]
    top = grid[y0][:, x0] * (1 - fx) + grid[y0][:, x1] * fx
    bot = grid[y1][:, x0] * (1 - fx) + grid[y1][:, x1] * fx
    img = top * (1 - fy) + bot * fy
    noise = rng.standard_normal(img.shape, dtype=np.float32) * np.float32(6.0)
    return np.clip(img + noise, 0, 255).astype(np.uint8)
