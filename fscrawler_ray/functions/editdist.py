"""Batch Levenshtein: Wagner-Fischer vectorized ACROSS pairs.

The O(La·Lb) character loop runs over positions; every min/add inside it
is a numpy op over the whole pair axis, so a 64k-pair chunk costs ~L²
vector ops instead of 64k Python DP runs.  Distances are byte-level over
UTF-8 (identical to character-level for ASCII corpora like the testdata;
documented divergence for multi-byte text).

This is the verify kernel of the fuzzy-join family (pipelines/editdist):
the reference has no fuzzy matching — this extends its duplicate-finder
(app/data_manager.py duplicate queries) to near-miss names.
"""

from __future__ import annotations

import numpy as np

_EMPTY = np.zeros(0, np.int64)


def _encode(names) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte matrix (m, Lmax) zero-padded + per-row byte lengths."""
    bs = [x.encode("utf-8") if isinstance(x, str) else bytes(x or b"") for x in names]
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    lmax = max(1, int(lens.max()) if len(lens) else 1)
    mat = np.frombuffer(
        b"".join(b.ljust(lmax, b"\0") for b in bs), dtype=np.uint8
    ).reshape(len(bs), lmax)
    return mat, lens


def _lev_chunk(names_a, names_b) -> np.ndarray:
    a, la = _encode(names_a)
    b, lb = _encode(names_b)
    m = len(la)
    la_max, lb_max = int(la.max(initial=0)), int(lb.max(initial=0))
    res = np.empty(m, dtype=np.int64)
    res[la == 0] = lb[la == 0]
    prev = np.broadcast_to(np.arange(lb_max + 1, dtype=np.int32), (m, lb_max + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, la_max + 1):
        cur[:, 0] = i
        ai = a[:, i - 1][:, None]  # (m, 1)
        cost = (ai != b[:, :lb_max]).astype(np.int32)  # (m, lb_max)
        for j in range(1, lb_max + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost[:, j - 1], out=cur[:, j])
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return res


def levenshtein_pairs(names_a, names_b, chunk: int = 65536) -> np.ndarray:
    """Edit distance for each aligned (names_a[i], names_b[i]) pair."""
    n = len(names_a)
    if n != len(names_b):
        raise ValueError(f"pair arrays differ in length: {n} vs {len(names_b)}")
    if n == 0:
        return _EMPTY
    out = np.empty(n, np.int64)
    for s in range(0, n, chunk):
        out[s : s + chunk] = _lev_chunk(names_a[s : s + chunk], names_b[s : s + chunk])
    return out
