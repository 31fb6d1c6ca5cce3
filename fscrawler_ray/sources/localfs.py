"""Local-filesystem Source — the reference's native domain, through the
same frontier engine.

Maps pseudo-hosts to directory roots (``{"data0": "/path/to/root"}``) so
the host-hash sharding that partitions web crawls gives per-root
parallelism here too. URLs look like ``file://data0/sub/dir/img.png``.
Reference analog: the ``os.scandir`` DFS of
/root/reference/app/crawler/file_system_crawler.py:404-505 and
app/fast_crawler.py:20-40.

Payloads decode with the repo's own deterministic codec
(functions/codecs.py); undecodable files dead-letter like any non-image
payload. Listing order is sorted(name) — deterministic, matching the
oracle's per-directory iteration contract.
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.codecs import decode
from ..functions.hashing import xxh64
from ..functions.phash import to_gray32


class LocalFSSource:
    def __init__(self, roots: dict):
        # pseudo-hosts are URL authorities: canonicalization lowercases
        # them, so root keys must be matched case-insensitively or an
        # uppercase key would silently crawl nothing
        self.roots = {h.lower(): os.path.abspath(p) for h, p in roots.items()}

    # -- url <-> path -------------------------------------------------------

    def seeds(self) -> list[str]:
        return [f"file://{h}/" for h in sorted(self.roots)]

    def _split(self, url: str) -> tuple[str, str]:
        rest = url.split("://", 1)[1]
        host, _, sub = rest.partition("/")
        return host.lower(), sub

    def _path(self, url: str) -> str | None:
        host, sub = self._split(url)
        root = self.roots.get(host)
        if root is None:
            return None
        p = os.path.normpath(os.path.join(root, sub))
        # refuse to escape the root (".." in a crafted link)
        if not (p == root or p.startswith(root + os.sep)):
            return None
        return p

    # -- Source protocol ----------------------------------------------------

    def is_container(self, url: str) -> bool:
        p = self._path(url)
        return p is not None and os.path.isdir(p)

    def children(self, url: str) -> list[str]:
        p = self._path(url)
        if p is None or not os.path.isdir(p):
            return []
        base = url.rstrip("/")
        try:
            names = sorted(os.listdir(p))
        except OSError:
            return []
        return [f"{base}/{n}" for n in names]

    def metadata(self, url: str) -> dict:
        p = self._path(url)
        try:
            st = os.stat(p)
        except (OSError, TypeError):
            return {"size": None, "mtime": None}
        return {"size": int(st.st_size), "mtime": int(st.st_mtime_ns // 1000)}

    def robots_allowed(self, host: str, url: str) -> bool:
        return True  # no robots for local trees

    def fetch_raw(self, url: str) -> tuple | None:
        p = self._path(url)
        if p is None or not os.path.isfile(p):
            return None
        try:
            with open(p, "rb") as f:
                buf = f.read()
            img, w, h, fmt = decode(buf)
        except Exception:
            return None  # undecodable payload -> dead letter
        name = os.path.basename(p)
        row = {
            "image_id": f"img_{xxh64(buf) & 0xFFFFFFFFFF:012x}",
            "bytes": buf,
            "w": int(w),
            "h": int(h),
            "fmt": fmt,
            "caption": os.path.splitext(name)[0].replace("_", " "),
        }
        return row, to_gray32(img)

    def fetch(self, url: str) -> dict | None:
        r = self.fetch_raw(url)
        if r is None:
            return None
        row, gray = r
        from ..functions.phash import phash_batch

        row["phash"] = int(phash_batch(gray[None])[0])
        return row


_ = np  # gray arrays flow through numpy; keep the import explicit
