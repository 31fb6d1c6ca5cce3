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


def encode(img: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 image deterministically."""
    if fmt not in _QUANT:
        raise ValueError(f"unknown format {fmt!r}")
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    q = _QUANT[fmt]
    payload = (img // q).astype(np.uint8).tobytes() if q > 1 else img.tobytes()
    body = _HDR.pack(w, h, q) + zlib.compress(payload, level=1)
    if fmt == "webp":
        return MAGIC["webp"] + struct.pack("<I", len(body) + 8) + b"WEBPFSR " + body
    return MAGIC[fmt] + body


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
    off = 16 if fmt == "webp" else len(MAGIC[fmt])
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
