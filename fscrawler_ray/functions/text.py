"""Text kernels: keyword extraction, rating, tokenization, language-ID,
quality scoring, fingerprints, simhash/minhash primitives.

Reference parity:
- keywords: naming-convention extractor,
  /root/reference/app/processors/metadata_extractor/keywords_file_processor.py:37-81
  (split name on ``'- '`` then ``'[...]'`` segments scanned from the end,
  ``.``/``_`` → ``', '``, reject parts with chars outside ``[a-zA-Z0-9,\\s\\]]``).
- rating: first run of ``+`` characters, capped at 5,
  /root/reference/app/processors/metadata_extractor/rating_file_processor.py:33-39
  (name first, then full path).

Everything else is the large-scale training-data-pipeline extension set
(dedup/quality ops the reference does not have). Batch functions are
pyarrow.compute / numpy vectorized; ``extract_keywords`` is the one scalar
helper (branchy reverse-scan semantics) and its batch wrapper is only used
in metadata stages, never on payload bytes.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import xxh64_batch, xxh64_u64

_NON_KEYWORD = re.compile(r"[^a-zA-Z0-9,\s\]]+")


def _split_words(part: str) -> list[str] | None:
    part = part.replace(".", ", ").replace("_", ", ")
    if ", " in part:
        if _NON_KEYWORD.findall(part):
            return None
        return [str(k).strip() for k in part.split(", ")]
    return None


def extract_keywords(name: str) -> list[str]:
    """Reference keyword semantics (see module docstring). Returns []
    when no convention matches."""
    keywords: list[str] = []
    if "- " in name:
        for part in reversed(name.split("-")):
            kw = _split_words(part)
            if kw:
                keywords = kw
                break
    if not keywords:
        for part in reversed(name.split("[")):
            kw = _split_words(part.replace("]", ""))
            if kw:
                keywords = kw
                break
    return keywords


def keywords_batch(names) -> pa.Array:
    """Batch keyword extraction → list<string> column."""
    if isinstance(names, (pa.Array, pa.ChunkedArray)):
        names = names.to_pylist()
    return pa.array([extract_keywords(n or "") for n in names], type=pa.list_(pa.string()))


def rating_batch(names, full_paths=None) -> pa.Array:
    """Vectorized rating: length of the first ``+`` run in the name, falling
    back to the full path; capped at 5; null when absent."""

    def first_run(arr):
        m = pc.extract_regex(arr, r"(?P<plus>\++)")
        ln = pc.utf8_length(pc.struct_field(m, 0))
        # min_element_wise skips nulls by default, which would turn "no
        # match" into 5 — clamp with if_else to keep nulls null.
        return pc.if_else(pc.greater(ln, 5), pa.scalar(5, pa.int32()), ln)

    r = first_run(pa.array(names) if not isinstance(names, (pa.Array, pa.ChunkedArray)) else names)
    if full_paths is not None:
        fp = pa.array(full_paths) if not isinstance(full_paths, (pa.Array, pa.ChunkedArray)) else full_paths
        r = pc.if_else(pc.is_valid(r), r, first_run(fp))
    return r.cast(pa.int8())


def token_count_batch(texts) -> pa.Array:
    """Whitespace token count (vectorized)."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    return pc.count_substring_regex(arr, r"\S+").cast(pa.int64())


# --- language ID (marker-word heuristic) -----------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "fr": ["le", "la", "les", "des", "est", "que", "une", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "es": ["el", "los", "las", "que", "una", "por", "con", "para"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def langid_batch(texts) -> pa.Array:
    """Heuristic language ID: argmax of marker-token hit counts; 'und' when
    nothing matches."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    low = pc.utf8_lower(arr)
    langs = list(_LANG_MARKERS)
    scores = np.zeros((len(arr), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        words = _LANG_MARKERS[lang]
        if lang == "zh":
            pat = "|".join(words)
        else:
            pat = r"\b(" + "|".join(words) + r")\b"
        scores[:, j] = pc.count_substring_regex(low, pat).to_numpy(zero_copy_only=False)
    best = scores.argmax(axis=1)
    hit = scores.max(axis=1) > 0
    out = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return pa.array(out.tolist(), type=pa.string())


_STOPWORDS_PAT = r"\b(" + "|".join(sum(_LANG_MARKERS.values(), [])[:24]) + r")\b"


def quality_features(texts) -> pa.Table:
    """Vectorized quality features: n_chars, n_tokens, mean_token_len,
    punct_ratio, stopword_ratio, quality_score ∈ [0,1]."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n_chars = pc.utf8_length(arr).cast(pa.float64())
    n_tokens = pc.count_substring_regex(arr, r"\S+").cast(pa.float64())
    n_punct = pc.count_substring_regex(arr, r"[^\w\s]").cast(pa.float64())
    n_stop = pc.count_substring_regex(pc.utf8_lower(arr), _STOPWORDS_PAT).cast(pa.float64())
    safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    mean_len = pc.divide(pc.subtract(n_chars, pc.subtract(n_tokens, pa.scalar(1.0))), safe_tokens)
    punct_ratio = pc.divide(n_punct, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_tokens)
    nc = n_chars.to_numpy(zero_copy_only=False)
    mt = mean_len.to_numpy(zero_copy_only=False)
    pr = punct_ratio.to_numpy(zero_copy_only=False)
    sr = stop_ratio.to_numpy(zero_copy_only=False)
    length_score = np.clip(nc / 500.0, 0, 1)
    wordlen_score = np.exp(-0.5 * ((mt - 5.0) / 3.0) ** 2)
    punct_score = np.clip(1.0 - 4.0 * pr, 0, 1)
    score = 0.4 * length_score + 0.3 * wordlen_score + 0.2 * punct_score + 0.1 * np.clip(sr * 5, 0, 1)
    return pa.table(
        {
            "n_chars": n_chars.cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
            "mean_token_len": mean_len,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": pa.array(np.round(score, 6)),
        }
    )


# --- shingles / minhash / simhash / fingerprints ---------------------------


def _token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Split texts into whitespace tokens; return (token_hash uint64 flat,
    doc_id int64 flat) — the flat segmented representation every sketch
    builds on."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    h = xxh64_batch(flat)
    return h[mask], doc_id[mask]


def shingle_hashes(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingles → uint64 hashes + doc ids (vectorized: combine k
    consecutive token hashes per doc with mixing)."""
    h, doc = _token_hashes(texts)
    if k <= 1 or len(h) == 0:
        return h, doc
    out = h.copy()
    valid = np.ones(len(h), dtype=bool)
    with np.errstate(over="ignore"):
        for j in range(1, k):
            shifted = np.roll(h, -j)
            same = np.roll(doc, -j) == doc
            same[-j:] = False
            out = out * np.uint64(0x9E3779B185EBCA87) + shifted
            valid &= same
    return xxh64_u64(out[valid]), doc[valid]


def minhash_signatures(texts, num_perm: int = 64, k_shingle: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over k-token shingles.
    Docs with no shingles get all-max sentinel rows."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    h, doc = shingle_hashes(arr, k_shingle)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(h) == 0:
        return sig
    # segmented min via sort + reduceat (np.minimum.at is orders of
    # magnitude slower — unbuffered ufunc)
    order = np.argsort(doc, kind="stable")
    hs, doc_s = h[order], doc[order]
    starts = np.flatnonzero(np.diff(doc_s, prepend=doc_s[0] - 1))
    present = doc_s[starts]
    for p in range(num_perm):
        hp = xxh64_u64(hs, seed=p + 1)
        sig[present, p] = np.minimum.reduceat(hp, starts)
    return sig


def simhash64(texts) -> np.ndarray:
    """(n_docs,) int64 SimHash over whitespace tokens."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    h, doc = _token_hashes(arr)
    if len(h) == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(
        np.ascontiguousarray(h).view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int64)  # (T, 64)
    contrib = bits * 2 - 1
    # doc ids are non-decreasing by construction → segmented sum via reduceat
    acc = np.zeros((n, 64), dtype=np.int64)
    starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
    acc[doc[starts]] = np.add.reduceat(contrib, starts, axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (out_bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def simhash64_md5(texts) -> np.ndarray:
    """``simhash64`` with the SQL-replayable md5 token hash
    (md5_number_upper) — same little-endian bit algebra, same >0 sign
    rule.  Exists so the oracle can replay the sketch; the scale path
    stays on the vectorized xxh64 ``simhash64``."""
    from .sketches import md5_u64_batch

    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, doc = flat.filter(pa.array(mask)), doc[mask]
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    h = md5_u64_batch(flat)
    bits = np.unpackbits(
        np.ascontiguousarray(h).view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int64)
    contrib = bits * 2 - 1
    acc = np.zeros((n, 64), dtype=np.int64)
    starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
    acc[doc[starts]] = np.add.reduceat(contrib, starts, axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (out_bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def md5_shingle3_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """md5-u64 hashes of 3-token shingle STRINGS (lowercased \\s+ tokens,
    empties dropped, joined with unit separator \\x1f) plus their doc
    indices, doc-ordered — the SQL-replayable twin of ``shingle_hashes``
    (DuckDB rebuilds the identical preimage with lead() windows and
    hashes it with md5_number_upper).  Shared by fingerprint64_md5 and
    the md5 MinHash pipeline; the scale path stays on xxh64."""
    from .sketches import md5_u64_batch

    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    t = np.asarray(flat.filter(pa.array(mask)).to_pylist(), dtype=object)
    doc = doc[mask]
    if len(t) < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    s1, s2 = np.roll(t, -1), np.roll(t, -2)
    valid = (np.roll(doc, -1) == doc) & (np.roll(doc, -2) == doc)
    valid[-2:] = False
    if not valid.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    sep = "\x1f"
    sh = [a + sep + b + sep + c for a, b, c in zip(t[valid], s1[valid], s2[valid])]
    return md5_u64_batch(pa.array(sh, pa.string())), doc[valid]


def fingerprint64_md5(texts) -> np.ndarray:
    """``fingerprint64``'s SQL-replayable twin: min md5 hash of 3-token
    shingle STRINGS (tokens joined with unit separator \\x1f, so the
    oracle rebuilds the identical preimage); 0 for docs with <3 tokens."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    hs, dv = md5_shingle3_hashes(arr)
    out = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hs):
        starts = np.flatnonzero(np.diff(dv, prepend=dv[0] - 1))
        out[dv[starts]] = np.minimum.reduceat(hs, starts)
    out[out == np.iinfo(np.uint64).max] = 0
    return out.astype(np.int64)


MERSENNE61 = (1 << 61) - 1


def mh_perm_consts(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_p, b_p) constants for the mod-(2^61-1) universal
    hash family h_p(x) = (a_p·x + b_p) mod P, derived from md5 of fixed
    strings so the engine kernel and the DuckDB oracle inline the SAME
    literals.  a_p ∈ [1, 2^31-1] keeps the numpy split multiply exact;
    b_p ∈ [0, P)."""
    import hashlib

    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for p in range(num_perm):
        a[p] = int.from_bytes(hashlib.md5(f"mh-a-{p}".encode()).digest()[:4], "little") % (
            (1 << 31) - 1
        ) + 1
        b[p] = int.from_bytes(hashlib.md5(f"mh-b-{p}".encode()).digest()[:8], "little") % MERSENNE61
    return a, b


def mulmod61(a: int, x: np.ndarray) -> np.ndarray:
    """(a · x) mod (2^61 - 1) vectorized in uint64 — a < 2^31, x < 2^61.
    The high 32-bit partial product is rotated back into range via
    2^61 ≡ 1 (mod P); everything stays below 2^63, so plain uint64
    arithmetic is exact (DuckDB computes the same value directly in
    HUGEINT: ``(a * x) % 2305843009213693951``)."""
    P = np.uint64(MERSENNE61)
    a = np.uint64(a)
    t = a * (x >> np.uint64(32))  # a·xhi < 2^60 < P
    # t·2^32 mod P: t = thi·2^29 + tlo  →  thi + tlo·2^32  (2^61 ≡ 1)
    y = (t >> np.uint64(29)) + ((t & np.uint64((1 << 29) - 1)) << np.uint64(32))
    low = a * (x & np.uint64(0xFFFFFFFF))  # < 2^63
    y = y + (low & P) + (low >> np.uint64(61))
    y = (y & P) + (y >> np.uint64(61))
    y = (y & P) + (y >> np.uint64(61))
    return np.where(y >= P, y - P, y)


def fingerprint64(texts) -> np.ndarray:
    """(n_docs,) int64 rolling-hash document fingerprint: min mixed hash of
    3-token shingles (winnowing-style min-sampling); 0 for empty docs."""
    arr = pa.array(texts) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    n = len(arr)
    h, doc = shingle_hashes(arr, 3)
    out = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(h):
        starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
        out[doc[starts]] = np.minimum.reduceat(h, starts)
    out[out == np.iinfo(np.uint64).max] = 0
    return out.astype(np.int64)
