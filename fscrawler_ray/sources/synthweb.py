"""Deterministic synthetic web — the sandbox stand-in for the network.

Every property of the web is a pure function of ``xxh64(canonical_url)`` and
a global seed, so the single-threaded oracle and the distributed engine see
exactly the same graph without sharing state. This replaces the reference's
``Path.iterdir()`` recursion (/root/reference/app/crawler/file_system_crawler.py:482-500)
with a link graph:

- container URLs ("directories") expand into child containers + leaf images;
- leaf URLs ("files") fetch into image+caption payloads (input_hint schema);
- metadata (content_length, modified time) is known at discovery time, like
  an HTTP HEAD — with deliberate gaps to exercise the SizeFilter
  deny-on-missing / DateFilter allow-on-missing quirks;
- ~5% of leaves share a payload seed with another URL → exact pixel dupes
  for the dedup stages (the reference's find_duplicates analog,
  app/database/data_manager.py:330-359);
- hosts are Zipf-skewed: host 0 receives many cross-links (hot-host skew for
  salting/repartition tests);
- some paths are under "/private" and blocked by robots rules.

Nothing here calls the network or the filesystem.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.codecs import encode, synth_image
from ..functions.hashing import xxh64
from ..functions.phash import to_gray32

_WORDS = (
    "sunset beach mountain river city night forest bridge cloud star "
    "garden ocean desert island valley harbor temple market castle tower"
).split()

_EXTS = ["jpg", "png", "webp", "jpg", "png", "jpg", "tmp", "log", "html"]

EPOCH_US = 1_700_000_000_000_000  # fixed logical clock base (2023-11-14T22:13:20Z)

# EXIF-analog camera models (reference draft exif_extractor.py): synthetic
# but shaped like real Make/Model strings
_CAMERAS = (
    "Acme DX-100",
    "Acme DX-200",
    "Borealis Z5",
    "Borealis Z9",
    "Crater Mini",
    "Crater Pro",
    "Dune 4K",
    "Dune 8K",
)


# IPTC-analog vocab (reference draft itpc_extractor.py): bylines and
# keyword tags shaped like real IIM 2:80 / 2:25 values
_BYLINES = (
    "A. Stone",
    "B. Rivers",
    "C. Vega",
    "D. Marsh",
    "E. Calder",
    "F. Onda",
)
_IPTC_KW = (
    "landscape",
    "urban",
    "portrait",
    "wildlife",
    "aerial",
    "macro",
    "night",
    "street",
)


def iptc_fields_for(ps40: int) -> tuple[str, list[str], str]:
    """Deterministic IPTC-analog (caption, keywords, byline) from the low
    40 bits of the payload seed — re-derivable from image_id by the SQL
    oracle, like exif_fields_for."""
    caption = f"Scene {ps40 % 997}"
    keywords = [_IPTC_KW[(ps40 >> 13) % 8], _IPTC_KW[(ps40 >> 16) % 8]]
    byline = _BYLINES[(ps40 >> 10) % 6]
    return caption, keywords, byline


def exif_fields_for(ps40: int) -> tuple[int, str, int]:
    """Deterministic EXIF-analog fields from the LOW 40 BITS of the payload
    seed — exactly the bits image_id preserves (``img_%012x`` truncates to
    40 bits), so a SQL oracle can re-derive (orientation, camera,
    captured_at) from image_id alone while the engine parses them from the
    embedded binary segment."""
    orientation = 1 + ps40 % 8
    camera = _CAMERAS[(ps40 >> 3) % len(_CAMERAS)]
    captured_at_us = EPOCH_US - ((ps40 >> 6) % (365 * 86400)) * 1_000_000
    return orientation, camera, captured_at_us


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    n_hosts: int = 16
    max_depth: int = 4
    fanout_dirs: int = 3
    fanout_files: int = 6
    dup_rate: float = 0.05
    missing_meta_rate: float = 0.04
    cross_link_rate: float = 0.08
    hot_host: str = "host00.example.com"
    # opt-in RFC 9309 robots semantics: longest-match allow/deny with
    # * / $ wildcards (crawl/robots.rfc_ruleset_for_host). Default stays
    # the legacy prefix-disallow rules so existing traces are unchanged.
    rfc_robots: bool = False


class SynthWeb:
    def __init__(self, cfg: WebConfig = WebConfig()):
        self.cfg = cfg
        self._robots = None

    def robots_allowed(self, host: str, url: str) -> bool:
        """Source-protocol politeness check (synthetic robots.txt rules,
        memoized per host)."""
        if self._robots is None:
            from ..crawl.robots import RobotsCache

            self._robots = RobotsCache(
                seed=self.cfg.seed, rfc=getattr(self.cfg, "rfc_robots", False)
            )
        return self._robots.allowed(host, url)

    # -- batched protocol (vectorized; see sources/base.py) ------------------

    @staticmethod
    def _paths(urls: list[str]):
        """Vectorized '/path' extraction: everything after the authority,
        '/' when absent (matches the scalar parsers above)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(urls, type=pa.string())
        path = pc.replace_substring_regex(arr, r"^[a-z+.-]+://[^/]*", "")
        return pc.if_else(pc.equal(path, ""), "/", path)

    def robots_batch(self, host: str, urls: list[str]) -> np.ndarray:
        """One prefix/regex test per RULE (bounded per host), not per URL."""
        import pyarrow.compute as pc

        from ..crawl.robots import rfc_eval_paths, rfc_ruleset_for_host, rules_for_host

        path = self._paths(urls)
        if getattr(self.cfg, "rfc_robots", False):
            allow_len, deny_len = rfc_eval_paths(
                path, rfc_ruleset_for_host(host, self.cfg.seed)
            )
            return allow_len >= deny_len
        rules = rules_for_host(host, self.cfg.seed)
        blocked = np.zeros(len(urls), dtype=bool)
        for r in rules:
            blocked |= pc.starts_with(path, r).to_numpy(zero_copy_only=False)
        return ~blocked

    def is_container_batch(self, urls: list[str]) -> np.ndarray:
        import pyarrow.compute as pc

        sub = self._paths(urls)
        stripped = pc.utf8_rtrim(sub, "/")
        is_root = pc.equal(stripped, "").to_numpy(zero_copy_only=False)
        depth = pc.count_substring(stripped, "/").to_numpy(zero_copy_only=False)
        last = pc.replace_substring_regex(stripped, r"^.*/", "")
        dirlike = pc.or_(
            pc.starts_with(last, "gallery"), pc.starts_with(last, "private")
        ).to_numpy(zero_copy_only=False)
        return is_root | (dirlike & (depth < self.cfg.max_depth))

    def metadata_batch(self, urls: list[str]) -> dict:
        import pyarrow as pa

        from ..functions.hashing import xxh64_batch

        h = xxh64_batch(pa.array(urls, type=pa.string()), seed=self.cfg.seed)
        missing = (h % np.uint64(1000)) < np.uint64(int(self.cfg.missing_meta_rate * 1000))
        size = (np.uint64(2000) + (h >> np.uint64(16)) % np.uint64(60000)).astype(np.int64)
        mt_missing = (h % np.uint64(977)) < np.uint64(30)
        mtime = (
            EPOCH_US - ((h >> np.uint64(24)) % np.uint64(400 * 86400)).astype(np.int64) * 1_000_000
        )
        return {
            "size": [None if m else int(s) for m, s in zip(missing, size)],
            "mtime": [None if m else int(t) for m, t in zip(mt_missing, mtime)],
        }

    def children_batch(self, urls: list[str]) -> list[list[str]]:
        """Batched child expansion: ALL hashing is vectorized (one
        xxh64_batch over the container URLs, one over the flattened
        file-slot strings); only the final list assembly walks Python."""
        import pyarrow as pa

        from ..functions.hashing import xxh64_batch

        n = len(urls)
        if n == 0:
            return []
        h = xxh64_batch(pa.array(urls, type=pa.string()), seed=self.cfg.seed)
        is_cont = self.is_container_batch(urls)
        ndirs = (np.uint64(1) + h % np.uint64(self.cfg.fanout_dirs)).astype(np.int64)
        nfiles = (np.uint64(2) + (h >> np.uint64(8)) % np.uint64(self.cfg.fanout_files)).astype(np.int64)
        ndirs[~is_cont] = 0
        nfiles[~is_cont] = 0
        bases = [u.rstrip("/") for u in urls]
        # flatten the file slots, hash them in ONE call, then slice back
        slot_urls = [f"{urls[i]}#f{j}" for i in range(n) for j in range(nfiles[i])]
        hj = (
            xxh64_batch(pa.array(slot_urls, type=pa.string()), seed=self.cfg.seed)
            if slot_urls
            else np.empty(0, np.uint64)
        )
        offs = np.concatenate([[0], np.cumsum(nfiles)])
        cross = (h % np.uint64(100)) < np.uint64(int(self.cfg.cross_link_rate * 100))
        dup = (h % np.uint64(7)) == 0
        out: list[list[str]] = []
        for i in range(n):
            if not is_cont[i]:
                out.append([])
                continue
            # Python-int shift: numpy's uint64 >> wraps the count mod 64 on
            # x86 for counts ≥ 64 (reachable at fanout_dirs ≥ 17), which
            # would diverge from the scalar children() contract — the two
            # paths must generate IDENTICAL webs (round-3 review fix)
            base, hi = bases[i], int(h[i])
            kids: list[str] = []
            for d in range(int(ndirs[i])):
                kind = (hi >> (3 * d + 16)) % 12
                kids.append(f"{base}/private{d}" if kind == 0 else f"{base}/gallery{d}")
            for k in range(int(offs[i]), int(offs[i + 1])):
                hk = int(hj[k])
                ext = _EXTS[hk % len(_EXTS)]
                if hk % 37 == 0:
                    kids.append(f"{base}/weird{k - int(offs[i])}.extension-longer-than-twelve")
                elif hk % 41 == 0:
                    kids.append(f"{base}/.DS_Store")
                else:
                    kids.append(f"{base}/img_{hk % 100000:05d}.{ext}")
            if cross[i]:
                kids.append(f"http://{self.cfg.hot_host}/gallery{hi % 3}")
            if dup[i] and kids:
                kids.append(kids[-1])
            out.append(kids)
        return out

    # -- topology -----------------------------------------------------------

    def hosts(self) -> list[str]:
        return [f"host{i:02d}.example.com" for i in range(self.cfg.n_hosts)]

    def seeds(self) -> list[str]:
        """Seed list, deliberately containing a nested seed (subsumed by its
        ancestor) to exercise root-subsumption dedup
        (reference: file_system_crawler.py:212-218)."""
        out = [f"http://{h}/" for h in self.hosts()]
        out.append(f"http://{self.hosts()[1]}/gallery0")  # nested under seed 1
        return out

    def _h(self, url: str) -> int:
        return xxh64(url, seed=self.cfg.seed)

    def is_container(self, url: str) -> bool:
        """Containers: the root path and /gallery* paths below max depth."""
        path = url.split("://", 1)[1].split("/", 1)
        sub = "/" + path[1] if len(path) > 1 else "/"
        if sub == "/" or sub == "":
            return True
        depth = len([s for s in sub.split("/") if s])
        if depth >= self.cfg.max_depth:
            return False
        last = sub.rstrip("/").rsplit("/", 1)[-1]
        return last.startswith("gallery") or last.startswith("private")

    def children(self, url: str) -> list[str]:
        """Deterministic child links of a container (ordered). Mirrors the
        per-directory iteration order contract of the reference (§2.9)."""
        if not self.is_container(url):
            return []
        h = self._h(url)
        base = url.rstrip("/")
        host = url.split("://", 1)[1].split("/", 1)[0]
        ndirs = 1 + h % self.cfg.fanout_dirs
        nfiles = 2 + (h >> 8) % self.cfg.fanout_files
        out: list[str] = []
        for i in range(ndirs):
            kind = (h >> (3 * i + 16)) % 12
            if kind == 0:
                out.append(f"{base}/private{i}")  # robots-blocked subtree
            else:
                out.append(f"{base}/gallery{i}")
        for j in range(nfiles):
            hj = xxh64(f"{url}#f{j}", seed=self.cfg.seed)
            ext = _EXTS[hj % len(_EXTS)]
            if hj % 37 == 0:
                out.append(f"{base}/weird{j}.extension-longer-than-twelve")
            elif hj % 41 == 0:
                out.append(f"{base}/.DS_Store")
            else:
                out.append(f"{base}/img_{hj % 100000:05d}.{ext}")
        # occasional cross-host link into the hot host (skew)
        if (h % 100) < int(self.cfg.cross_link_rate * 100):
            out.append(f"http://{self.cfg.hot_host}/gallery{h % 3}")
        # occasional duplicate link to an already-linked sibling (seen-set hit)
        if h % 7 == 0 and out:
            out.append(out[-1])
        _ = host
        return out

    # -- per-URL metadata (the HEAD analog) ---------------------------------

    def metadata(self, url: str) -> dict:
        """(size, mtime_us) known at discovery; deliberately missing for a
        slice of URLs."""
        h = self._h(url)
        missing = (h % 1000) < int(self.cfg.missing_meta_rate * 1000)
        size = None if missing else 2_000 + (h >> 16) % 60_000
        mtime = None if (h % 977) < 30 else EPOCH_US - ((h >> 24) % (400 * 86400)) * 1_000_000
        return {"size": size, "mtime": mtime}

    # -- fetch (the payload generator) --------------------------------------

    def payload_seed(self, url: str) -> int:
        """Payload identity. ~dup_rate of leaves collide deliberately."""
        h = self._h(url)
        if (h % 1000) < int(self.cfg.dup_rate * 1000):
            return self.cfg.seed * 1_000_003 + h % 64  # one of 64 shared payloads
        return h

    def fetch_raw(self, url: str) -> tuple[dict, np.ndarray] | None:
        """Fetch a leaf URL → (row-without-phash, decoded 32×32 gray), or
        None for non-image payloads. Callers batch the phash across rows
        (one DCT einsum per batch instead of per image)."""
        name = url.rsplit("/", 1)[-1]
        ext = name.rsplit(".", 1)[-1].lower() if "." in name else None
        ps = self.payload_seed(url)
        if ext not in ("jpg", "jpeg", "png", "webp"):
            return None
        fmt = {"jpg": "jpeg"}.get(ext, ext)
        rng_w = 48 + ps % 160
        rng_h = 48 + (ps >> 7) % 160
        img = synth_image(ps & 0xFFFFFFFF, rng_w, rng_h)
        from ..functions.codecs import pack_exif, pack_iptc

        # one metadata slot, two real blocks: EXIF-analog first, IPTC IIM
        # datasets trailing (parse_exif reads its fixed part only — the
        # APP1/APP13 coexistence shape)
        ps40 = ps & 0xFFFFFFFFFF
        meta = pack_exif(*exif_fields_for(ps40)) + pack_iptc(*iptc_fields_for(ps40))
        buf = encode(img, fmt, exif=meta)
        row = {
            "image_id": f"img_{ps & 0xFFFFFFFFFF:012x}",
            "bytes": buf,
            "w": rng_w,
            "h": rng_h,
            "fmt": fmt,
            "caption": self.caption(ps),
        }
        # phash must be computed from the DECODED payload (what any
        # verifier reading `bytes` will see), not the pre-encode pixels —
        # lossy formats otherwise drift by 1-2 hamming bits and falsely
        # fail the stored-vs-recomputed phash invariant. The reconstruction
        # is computed directly (bit-identical to decode, no zlib round-trip)
        from ..functions.codecs import reencode_reconstruction

        return row, to_gray32(reencode_reconstruction(img, fmt))

    def fetch(self, url: str) -> dict | None:
        """Single-row fetch with phash (oracle/tests path)."""
        r = self.fetch_raw(url)
        if r is None:
            return None
        row, gray = r
        from ..functions.phash import phash_batch

        row["phash"] = int(phash_batch(gray[None])[0])
        return row

    def caption(self, ps: int) -> str:
        rng = np.random.Generator(np.random.PCG64(ps & 0xFFFFFFFF))
        words = [str(w) for w in rng.choice(_WORDS, size=4 + int(rng.integers(0, 6)))]
        cap = " ".join(words)
        style = ps % 10
        if style == 0:
            cap = f"{words[0]} - {'_'.join(words[1:3])}, {words[-1]}"
        elif style == 1:
            cap = f"{cap} [{words[0]}, {words[1]}]"
        elif style == 2:
            cap = cap + " " + "+" * (1 + ps % 7)
        return cap

    # expose gray for tests needing pixel-level checks
    def decoded_gray(self, url: str):
        row = self.fetch(url)
        if row is None:
            return None
        from ..functions.codecs import decode

        img, _, _, _ = decode(row["bytes"])
        return to_gray32(img)
