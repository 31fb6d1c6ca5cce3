"""xxHash64 — pure-Python scalar reference + numpy-vectorized batch kernel.

The north rule keys the URL-seen set by ``xxhash64(canonical_url)``. The
``xxhash`` C package is not available in this environment, so this module
implements the public XXH64 algorithm (https://github.com/Cyan4973/xxHash,
spec in doc/xxhash_spec.md) twice:

- :func:`xxh64` — scalar, pure Python, the reference implementation
  (validated against the spec's published empty-input vector).
- :func:`xxh64_batch` — numpy-vectorized over a pyarrow string/binary array
  (variable-length rows). Processes all rows simultaneously, looping only
  over *stripe index* (bounded by max(len)//32) with per-row masks. This is
  the hot-path kernel used inside map_batches for seen-set keys and content
  hashes of small payloads.

Reference parity: plays the role of the reference's content hash
(xxh3_64 default — /root/reference/app/processors/hash_file_processor.py:16-51,
algorithm choice app/crawler_entry_point.py:113-116). We use XXH64 (same
family, fully specified) since correctness is verifiable from the public spec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASK64 = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & MASK64, 31) * P1) & MASK64


def _merge_round(acc: int, lane: int) -> int:
    return ((acc ^ _round(0, lane)) * P1 + P4) & MASK64


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """Scalar XXH64 (spec-faithful pure Python)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    if n >= 32:
        a1 = (seed + P1 + P2) & MASK64
        a2 = (seed + P2) & MASK64
        a3 = seed & MASK64
        a4 = (seed - P1) & MASK64
        i = 0
        while i <= n - 32:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & MASK64
        acc = _merge_round(acc, a1)
        acc = _merge_round(acc, a2)
        acc = _merge_round(acc, a3)
        acc = _merge_round(acc, a4)
    else:
        acc = (seed + P5) & MASK64
        i = 0
    acc = (acc + n) & MASK64
    while i <= n - 8:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * P1 + P4) & MASK64
        i += 8
    if i <= n - 4:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        acc = (_rotl(acc, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        acc ^= (data[i] * P5) & MASK64
        acc = (_rotl(acc, 11) * P1) & MASK64
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & MASK64
    acc ^= acc >> 29
    acc = (acc * P3) & MASK64
    acc ^= acc >> 32
    return acc


# ---------------------------------------------------------------------------
# Vectorized batch kernel
# ---------------------------------------------------------------------------

_U = np.uint64
_P1 = _U(P1)
_P2 = _U(P2)
_P3 = _U(P3)
_P4 = _U(P4)
_P5 = _U(P5)


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _vround(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _vrotl(acc + lane * _P2, 31) * _P1


def _vmerge(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return (acc ^ _vround(np.zeros_like(acc), lane)) * _P1 + _P4


def _padded_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Return (padded uint8 matrix [n, P] with P % 8 == 0, lengths)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (list, tuple, np.ndarray)):
        arr = pa.array(arr)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)
    off = off[arr.offset :]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = (off[1:] - off[:-1]).astype(np.int64)
    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    padw = max(8, ((maxlen + 7) // 8) * 8)
    out = np.zeros((n, padw), dtype=np.uint8)
    total = int(lengths.sum())
    if total:
        # Row payloads are back-to-back in the value buffer (offsets are
        # cumulative), so the source is one contiguous slice; only the
        # destination needs a gather: dst[i] = row*padw + col, computed as
        # arange + a per-row constant shift repeated by row length.
        row_starts = np.cumsum(lengths) - lengths
        shift = np.arange(n, dtype=np.int64) * padw - row_starts
        dst = np.arange(total, dtype=np.int64) + np.repeat(shift, lengths)
        out.reshape(-1)[dst] = data[off[0] : off[0] + total]
    return out, lengths


def xxh64_batch(arr, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over a pyarrow string/binary array → uint64 ndarray.

    Loops only over stripe/tail index (≤ maxlen//32 + 11 masked numpy passes),
    never over rows.
    """
    out, lengths = _padded_bytes(arr)
    n = len(lengths)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    words = out.view("<u8")  # [n, padw//8]
    dwords = out.view("<u4")  # [n, padw//4]
    L = lengths.astype(np.uint64)
    sd = _U(seed & MASK64)
    rows = np.arange(n)

    nstripes = (lengths // 32).astype(np.int64)
    max_stripes = int(nstripes.max())
    big = lengths >= 32
    with np.errstate(over="ignore"):
        a1 = np.full(n, sd + _P1 + _P2, dtype=_U)
        a2 = np.full(n, sd + _P2, dtype=_U)
        a3 = np.full(n, sd, dtype=_U)
        a4 = np.full(n, sd - _P1, dtype=_U)
        for k in range(max_stripes):
            m = nstripes > k
            if not m.any():
                break
            lane = words[:, 4 * k : 4 * k + 4]
            a1 = np.where(m, _vround(a1, lane[:, 0]), a1)
            a2 = np.where(m, _vround(a2, lane[:, 1]), a2)
            a3 = np.where(m, _vround(a3, lane[:, 2]), a3)
            a4 = np.where(m, _vround(a4, lane[:, 3]), a4)
        merged = _vrotl(a1, 1) + _vrotl(a2, 7) + _vrotl(a3, 12) + _vrotl(a4, 18)
        merged = _vmerge(merged, a1)
        merged = _vmerge(merged, a2)
        merged = _vmerge(merged, a3)
        merged = _vmerge(merged, a4)
        acc = np.where(big, merged, np.full(n, sd + _P5, dtype=_U))
        acc = acc + L

        # tail: up to 3 × u64, then one u32, then up to 3 bytes (tail < 32)
        start = nstripes * 32
        tail = lengths - start
        nu64 = tail // 8
        for t in range(3):
            m = nu64 > t
            if m.any():
                wi = np.where(m, start // 8 + t, 0)
                lane = words[rows, wi]
                acc = np.where(m, _vrotl(acc ^ _vround(np.zeros_like(acc), lane), 27) * _P1 + _P4, acc)
        pos = start + nu64 * 8
        rem = lengths - pos
        m = rem >= 4
        if m.any():
            di = np.where(m, pos // 4, 0)
            lane32 = dwords[rows, di].astype(_U)
            acc = np.where(m, _vrotl(acc ^ (lane32 * _P1), 23) * _P2 + _P3, acc)
        pos = pos + np.where(m, 4, 0)
        rem = lengths - pos
        for b in range(3):
            m = rem > b
            if m.any():
                bi = np.where(m, pos + b, 0)
                byte = out[rows, bi].astype(_U)
                acc = np.where(m, _vrotl(acc ^ (byte * _P5), 11) * _P1, acc)

        acc ^= acc >> _U(33)
        acc *= _P2
        acc ^= acc >> _U(29)
        acc *= _P3
        acc ^= acc >> _U(32)
    return acc


def xxh64_u64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of fixed-width little-endian uint64 keys (8 bytes each).

    Used to derive independent hash functions for bloom/cuckoo from a single
    precomputed url-hash column without re-hashing strings.
    """
    k = np.ascontiguousarray(keys, dtype="<u8")
    sd = _U(seed & MASK64)
    with np.errstate(over="ignore"):
        acc = np.full(len(k), sd + _P5, dtype=_U) + _U(8)
        lane = k.view(_U) if k.dtype == _U else k.astype(_U)
        acc = _vrotl(acc ^ _vround(np.zeros_like(acc), lane), 27) * _P1 + _P4
        acc ^= acc >> _U(33)
        acc *= _P2
        acc ^= acc >> _U(29)
        acc *= _P3
        acc ^= acc >> _U(32)
    return acc
