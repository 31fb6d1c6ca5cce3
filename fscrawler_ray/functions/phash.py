"""64-bit DCT perceptual hash, batch-vectorized.

The analog of the reference's content hash for near-duplicate *pixels*
(reference exact content hash: /root/reference/app/processors/hash_file_processor.py:16-51;
duplicate finder keyed on it: app/database/data_manager.py:330-359). A
standard pHash: downscale to 32×32 grayscale via block mean, 2-D DCT-II,
take the 8×8 low-frequency block (excluding DC), threshold at its median →
64 bits packed into an int64.

The DCT is a pair of matrix multiplies, so a whole batch of 32×32 grays is
hashed with one einsum — no per-row Python in the transform.
"""

from __future__ import annotations

import numpy as np

_N = 32


def _dct_matrix(n: int = _N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def to_gray32(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (32, 32) float32 grayscale via area-mean resize."""
    g = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    h, w = g.shape
    # area-style resize: index-mean over target bins
    ys = (np.arange(_N + 1) * h // _N).astype(int)
    xs = (np.arange(_N + 1) * w // _N).astype(int)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = g.cumsum(0).cumsum(1)
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    area = np.maximum(area, 1)
    block = (
        csum[ys[1:], :][:, xs[1:]]
        - csum[ys[:-1], :][:, xs[1:]]
        - csum[ys[1:], :][:, xs[:-1]]
        + csum[ys[:-1], :][:, xs[:-1]]
    )
    return (block / area).astype(np.float32)


def phash_batch(grays: np.ndarray) -> np.ndarray:
    """(B, 32, 32) grayscale batch → (B,) int64 perceptual hashes."""
    if grays.ndim == 2:
        grays = grays[None]
    d = np.einsum("ij,bjk,lk->bil", _DCT, grays.astype(np.float64), _DCT)
    low = d[:, :8, :8].reshape(len(grays), 64).copy()
    low[:, 0] = 0.0  # drop DC term
    med = np.median(low[:, 1:], axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def phash_image(img: np.ndarray) -> int:
    """Single (h, w, 3) uint8 image → int64 phash."""
    return int(phash_batch(to_gray32(img)[None])[0])


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 phash arrays."""
    x = np.ascontiguousarray(
        (np.asarray(a).astype(np.int64).view(np.uint64))
        ^ (np.asarray(b).astype(np.int64).view(np.uint64))
    )
    u8 = x.view(np.uint8).reshape(x.size, 8)
    return np.unpackbits(u8, axis=1).sum(axis=1).astype(np.int64).reshape(x.shape)
