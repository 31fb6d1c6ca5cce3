"""URL canonicalization + feature extraction, vectorized over Arrow arrays.

URLs play the role of filesystem paths in the reference (the frontier is the
analog of the DFS recursion over ``Path.iterdir()``,
/root/reference/app/crawler/file_system_crawler.py:404-505). Canonical form
keys the seen-set (``xxhash64(canonical_url)``), so canonicalization must be
deterministic and idempotent.

Canonical form: lowercase scheme+host, default port stripped, fragment
stripped, duplicate slashes collapsed, ``.``/``..`` segments resolved,
trailing slash stripped (except the root path). All transformations are
pyarrow.compute kernels; nothing loops over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[:port] capture + the rest
_SPLIT_RE = r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<rest>[^#]*)"


def _as_array(urls) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        return urls.combine_chunks()
    if not isinstance(urls, pa.Array):
        return pa.array(urls, type=pa.string())
    return urls


def canonicalize(urls) -> pa.Array:
    """Vectorized canonical URL form (idempotent).

    Default-port stripping is scheme-aware (:80 only for http, :443 only
    for https), and the query string is split off before slash-collapse /
    dot-segment resolution so ``?next=http://b`` is preserved verbatim —
    distinct URLs must not collide in the xxh64-keyed seen-set.
    """
    arr = _as_array(urls)
    parts = pc.extract_regex(arr, _SPLIT_RE)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(head, r"^(http://.*):80$", r"\1")
    head = pc.replace_substring_regex(head, r"^(https://.*):443$", r"\1")
    rest = pc.struct_field(parts, "rest")
    # split path from query; path transforms must not touch the query
    pq = pc.extract_regex(rest, r"^(?P<path>[^?]*)(?P<query>(?:\?.*)?)$")
    path = pc.struct_field(pq, "path")
    query = pc.struct_field(pq, "query")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    # collapse duplicate slashes
    path = pc.replace_substring_regex(path, r"//+", "/")
    # resolve ./ and ../ segments (bounded passes; paths are shallow);
    # a leading /../ has no parent to consume and resolves to / (RFC 3986
    # remove_dot_segments)
    for _ in range(8):
        nxt = pc.replace_substring_regex(path, r"/\./", "/")
        nxt = pc.replace_substring_regex(nxt, r"/[^/]+/\.\./", "/")
        nxt = pc.replace_substring_regex(nxt, r"^/\.\./", "/")
        nxt = pc.replace_substring_regex(nxt, r"^/\.\.$", "/")
        if nxt.equals(path):
            break
        path = nxt
    path = pc.replace_substring_regex(path, r"/\.$", "/")
    path = pc.replace_substring_regex(path, r"/[^/]+/\.\.$", "/")
    # strip trailing slash except root
    path = pc.replace_substring_regex(path, r"(.)/$", r"\1")
    out = pc.binary_join_element_wise(head, path, query, "")
    # rows that did not match the regex (no scheme) pass through unchanged
    return pc.if_else(pc.is_valid(parts), out, arr)


def host_of(urls) -> pa.Array:
    """Vectorized host (lowercased, port stripped) of each URL."""
    arr = _as_array(urls)
    h = pc.struct_field(pc.extract_regex(arr, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/:?#]*)"), 0)
    return pc.utf8_lower(h)


def name_of(urls) -> pa.Array:
    """Last path segment of each URL (the "file name" analog)."""
    arr = _as_array(urls)
    m = pc.extract_regex(arr, r"/(?P<name>[^/?#]*)(?:[?#].*)?$")
    return pc.if_else(pc.is_valid(m), pc.struct_field(m, 0), pa.scalar("", pa.string()))


def ext_of(names, is_dir=None, max_len: int = 12) -> pa.Array:
    """Extension per the reference's quirky rule
    (/root/reference/app/filters/extension_filter.py:45-49): lowercase text
    after the last dot of the *name*; null when no dot, when the candidate is
    longer than ``max_len`` chars ("likely a dot mid-filename"), or when the
    entry is a directory/container.
    """
    arr = _as_array(names)
    m = pc.extract_regex(arr, r"\.(?P<ext>[^./]+)$")
    ext = pc.utf8_lower(pc.struct_field(m, 0))
    ext = pc.if_else(pc.less_equal(pc.utf8_length(ext), max_len), ext, pa.scalar(None, pa.string()))
    if is_dir is not None:
        is_dir = _as_array(is_dir)
        ext = pc.if_else(is_dir, pa.scalar(None, pa.string()), ext)
    return ext


def depth_of(urls, roots=None) -> pa.Array:
    """Path depth = number of non-empty path segments after the host
    (reference semantics: segments of the path relative to the crawl root,
    /root/reference/app/filters/depth_filter.py:35-49). When ``roots`` is
    given (same length), the matching root prefix is stripped first.
    """
    arr = _as_array(urls)
    path = pc.struct_field(pc.extract_regex(arr, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(?P<path>/[^?#]*)?"), 0)
    path = pc.if_else(pc.is_valid(path), path, pa.scalar("/"))
    if roots is not None:
        roots = _as_array(roots)
        rpath = pc.struct_field(
            pc.extract_regex(roots, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(?P<path>/[^?#]*)?"), 0
        )
        rpath = pc.if_else(pc.is_valid(rpath), rpath, pa.scalar(""))
        path = _strip_prefix_rowwise(path, rpath)
    # count non-empty segments: occurrences of '/[^/]' boundaries
    seg = pc.count_substring_regex(path, r"/[^/]")
    return seg.cast(pa.int32())


def _strip_prefix_rowwise(path: pa.Array, prefix: pa.Array) -> pa.Array:
    """Fallback element-wise prefix strip (only used when roots differ per
    row); numpy-based on offsets, no Python-per-row loop."""
    import numpy as np

    p = path.to_pandas().to_numpy(dtype=object)
    q = prefix.to_pandas().to_numpy(dtype=object)
    lens = np.fromiter((len(x) for x in q), dtype=np.int64, count=len(q))
    out = [s[l:] if s.startswith(t) else s for s, t, l in zip(p, q, lens)]
    return pa.array(out, type=pa.string())


def url_features(urls, is_container=None) -> pa.Table:
    """One-stop vectorized featureization used by the filter chain:
    columns (url, host, name, ext, depth)."""
    arr = canonicalize(urls)
    names = name_of(arr)
    return pa.table(
        {
            "url": arr,
            "host": host_of(arr),
            "name": names,
            "ext": ext_of(names, is_container),
            "depth": depth_of(arr),
        }
    )
