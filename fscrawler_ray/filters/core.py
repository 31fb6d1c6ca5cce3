"""The vectorized filter chain — reference F1-F9 semantics over Arrow batches.

Each filter implements both:

- ``mask(batch: pa.Table) -> pa.BooleanArray`` — the vectorized predicate
  applied inside ``map_batches`` / the frontier expansion (``True`` = keep);
- ``authorize(row: dict) -> bool`` — scalar semantics used by the
  single-threaded trace oracle, so engine and oracle share one definition.

Batch columns consumed (produced by ``functions.urls.url_features`` plus
metadata): ``url name ext is_dir size mtime depth``. Missing-metadata
semantics follow the reference exactly:

- SizeFilter **denies** when size is null
  (/root/reference/app/filters/size_filter.py:46-47);
- DateFilter **allows** when mtime is null
  (/root/reference/app/filters/date_filter.py:69-70);
- ExtensionFilter's extension is null for >12-char candidates
  (/root/reference/app/filters/extension_filter.py:45-49);
- RegexPatternFilter also matches its pattern as a de-backslashed literal
  substring (/root/reference/app/filters/path_regex_pattern_filter.py:58-73);
- FilePatternFilter always passes containers
  (/root/reference/app/filters/file_pattern_filter.py:24-28).

Combinators (reference: skip filters AND-ed,
file_system_crawler.py:447-460; notify filters OR-ed, :462-467; FastCrawler
``invert_filters`` fast_crawler.py:96-113) live in :class:`FilterChain`.
"""

from __future__ import annotations

import datetime as _dt
import re
import sys
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _np_bool(mask) -> np.ndarray:
    if isinstance(mask, (pa.Array, pa.ChunkedArray)):
        return mask.to_numpy(zero_copy_only=False).astype(bool)
    return np.asarray(mask, dtype=bool)


def _col(batch: pa.Table, name: str):
    if name in batch.column_names:
        c = batch.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return None


class VectorFilter:
    """Base class. Subclasses must implement ``mask`` and ``authorize``."""

    name: str = "filter"

    def mask(self, batch: pa.Table) -> np.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    def authorize(self, row: dict) -> bool:
        """Scalar fallback: evaluate the vector mask on a 1-row batch."""
        batch = pa.table({k: [v] for k, v in row.items()})
        return bool(self.mask(batch)[0])

    def __repr__(self) -> str:
        return f"<{self.__class__.__name__}>"


@dataclass
class ExtensionFilter(VectorFilter):
    """F1 — extension allow/deny (extension_filter.py:45-59)."""

    authorized: frozenset = field(default_factory=frozenset)
    excluded: frozenset = field(default_factory=frozenset)

    def __post_init__(self):
        # None is a legal member ("deny extensionless rows") — lowercase
        # only the strings
        self.authorized = frozenset(x.lower() if isinstance(x, str) else x for x in self.authorized)
        self.excluded = frozenset(x.lower() if isinstance(x, str) else x for x in self.excluded)

    @staticmethod
    def _value_set(items) -> pa.Array:
        return pa.array(sorted(x for x in items if x is not None), type=pa.string())

    def mask(self, batch: pa.Table) -> np.ndarray:
        ext = _col(batch, "ext")
        n = len(batch)
        ok = np.ones(n, dtype=bool)
        ext_py = ext.to_numpy(zero_copy_only=False) if ext is not None else np.array([None] * n)
        if self.excluded:
            excl = pc.is_in(ext, value_set=self._value_set(self.excluded))
            ok &= ~_np_bool(pc.fill_null(excl, False))
            if None in self.excluded:
                ok &= ~np.array([e is None for e in ext_py])
        if self.authorized:
            auth = pc.fill_null(pc.is_in(ext, value_set=self._value_set(self.authorized)), False)
            ok &= _np_bool(auth)
            # excluded wins over authorized for ext=None (mirrors the scalar
            # authorize(): the excluded check runs first and denies)
            if None in self.authorized and None not in self.excluded:
                ok |= np.array([e is None for e in ext_py])
        return ok

    def authorize(self, row: dict) -> bool:
        ext = row.get("ext")
        if self.excluded and ext in self.excluded:
            return False
        if self.authorized and ext not in self.authorized:
            return False
        return True


@dataclass
class DepthFilter(VectorFilter):
    """F2 — deny when 0 < max_depth < depth (depth_filter.py:35-49)."""

    max_depth: int = -1

    def mask(self, batch: pa.Table) -> np.ndarray:
        if self.max_depth <= 0:
            return np.ones(len(batch), dtype=bool)
        depth = _col(batch, "depth")
        return _np_bool(pc.fill_null(pc.less_equal(depth, self.max_depth), True))

    def authorize(self, row: dict) -> bool:
        d = row.get("depth")
        return not (d is not None and 0 < self.max_depth < d)


def _to_utc_us(ts) -> int | None:
    if ts is None:
        return None
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return int(ts.timestamp() * 1_000_000)
    if isinstance(ts, _dt.date):
        # bare YAML dates parse to datetime.date — midnight UTC
        dtm = _dt.datetime(ts.year, ts.month, ts.day, tzinfo=_dt.timezone.utc)
        return int(dtm.timestamp() * 1_000_000)
    return int(ts)


@dataclass
class DateFilter(VectorFilter):
    """F3 — timestamp range; PASS when metadata missing (date_filter.py:66-87)."""

    min_date: object = None
    max_date: object = None

    def __post_init__(self):
        self._min_us = _to_utc_us(self.min_date)
        self._max_us = _to_utc_us(self.max_date)

    def mask(self, batch: pa.Table) -> np.ndarray:
        mt = _col(batch, "mtime")
        n = len(batch)
        if mt is None:
            return np.ones(n, dtype=bool)
        if pa.types.is_timestamp(mt.type):
            # normalize unit (s/ms/us/ns) before comparing against the
            # microsecond bounds
            us = mt.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            us = mt.cast(pa.int64())
        ok = pa.array(np.ones(n, dtype=bool))
        if self._min_us is not None:
            ok = pc.and_(ok, pc.greater_equal(us, self._min_us))
        if self._max_us is not None:
            ok = pc.and_(ok, pc.less_equal(us, self._max_us))
        return _np_bool(pc.fill_null(ok, True))  # missing date ⇒ allow

    def authorize(self, row: dict) -> bool:
        us = _to_utc_us(row.get("mtime"))
        if us is None:
            return True
        if self._min_us is not None and us < self._min_us:
            return False
        if self._max_us is not None and us > self._max_us:
            return False
        return True


@dataclass
class SizeFilter(VectorFilter):
    """F4 — size range; DENY when metadata missing (size_filter.py:46-53)."""

    min_size: int = 0
    max_size: int = sys.maxsize

    def mask(self, batch: pa.Table) -> np.ndarray:
        sz = _col(batch, "size")
        n = len(batch)
        if sz is None:
            return np.zeros(n, dtype=bool)
        ok = pc.and_(pc.greater_equal(sz, self.min_size), pc.less_equal(sz, self.max_size))
        return _np_bool(pc.fill_null(ok, False))  # missing size ⇒ deny

    def authorize(self, row: dict) -> bool:
        sz = row.get("size")
        if sz is None:
            return False
        return self.min_size <= sz <= self.max_size


@dataclass
class PatternFilter(VectorFilter):
    """F5 — plain substring containment on the full URL
    (path_pattern_filter.py:47-63)."""

    authorized_pattern: str = ""
    excluded_pattern: str = ""

    def mask(self, batch: pa.Table) -> np.ndarray:
        url = _col(batch, "url")
        ok = np.ones(len(batch), dtype=bool)
        if self.excluded_pattern:
            ok &= ~_np_bool(pc.match_substring(url, self.excluded_pattern))
        if self.authorized_pattern:
            ok &= _np_bool(pc.match_substring(url, self.authorized_pattern))
        return ok

    def authorize(self, row: dict) -> bool:
        u = row["url"]
        if self.excluded_pattern and self.excluded_pattern in u:
            return False
        if self.authorized_pattern and self.authorized_pattern not in u:
            return False
        return True


@dataclass
class RegexPatternFilter(VectorFilter):
    """F6 — regex with the quirky literal-substring fallback
    (path_regex_pattern_filter.py:58-73). Containers are matched with a
    trailing '/'."""

    authorized_pattern: str = ""
    excluded_pattern: str = ""
    ignore_case: bool = True

    def __post_init__(self):
        fl = re.IGNORECASE if self.ignore_case else 0
        self._auth = re.compile(self.authorized_pattern, fl) if self.authorized_pattern else None
        self._excl = re.compile(self.excluded_pattern, fl) if self.excluded_pattern else None
        # the vectorized path runs RE2 (pyarrow), the scalar oracle runs
        # Python re: a Python-valid / RE2-invalid pattern (lookaround,
        # backreference) would pass construction and then crash the crawl
        # at the first batch — fail fast here instead
        flags = "(?i)" if self.ignore_case else ""
        for pat in (self.authorized_pattern, self.excluded_pattern):
            if not pat:
                continue
            try:
                pc.match_substring_regex(pa.array(["x"], pa.string()), flags + pat)
            except pa.lib.ArrowInvalid as e:
                raise ValueError(
                    f"pattern {pat!r} is valid Python re but not RE2 "
                    f"(lookaround/backreferences unsupported): {e}"
                ) from e

    def _paths(self, batch: pa.Table) -> pa.Array:
        url = _col(batch, "url")
        is_dir = _col(batch, "is_dir")
        if is_dir is None:
            return url
        slashed = pc.binary_join_element_wise(url, pa.scalar("/"), "")
        return pc.if_else(pc.fill_null(is_dir, False), slashed, url)

    def _match(self, pat: str, paths: pa.Array) -> np.ndarray:
        flags = "(?i)" if self.ignore_case else ""
        rx = _np_bool(pc.match_substring_regex(paths, flags + pat))
        literal = pat.replace("\\", "")
        lit = _np_bool(pc.match_substring(paths, literal)) if literal else np.zeros(len(paths), bool)
        return rx | lit

    def mask(self, batch: pa.Table) -> np.ndarray:
        paths = self._paths(batch)
        ok = np.ones(len(batch), dtype=bool)
        if self._excl is not None:
            ok &= ~self._match(self.excluded_pattern, paths)
        if self._auth is not None:
            ok &= self._match(self.authorized_pattern, paths)
        return ok

    def authorize(self, row: dict) -> bool:
        p = row["url"] + "/" if row.get("is_dir") else row["url"]
        if self._excl is not None:
            if self._excl.findall(p) or self.excluded_pattern.replace("\\", "") in p:
                return False
        if self._auth is not None:
            if not self._auth.findall(p) and self.authorized_pattern.replace("\\", "") not in p:
                return False
        return True


@dataclass
class NameFilter(VectorFilter):
    """F7 — deny when basename ∈ excluded_names
    (path_name_ignore_filter.py:29-32)."""

    excluded_names: frozenset = field(default_factory=frozenset)

    def __post_init__(self):
        self.excluded_names = frozenset(self.excluded_names)

    def mask(self, batch: pa.Table) -> np.ndarray:
        if not self.excluded_names:
            return np.ones(len(batch), dtype=bool)
        name = _col(batch, "name")
        bad = pc.fill_null(
            pc.is_in(name, value_set=pa.array(sorted(self.excluded_names), type=pa.string())), False
        )
        return ~_np_bool(bad)

    def authorize(self, row: dict) -> bool:
        return row.get("name") not in self.excluded_names


@dataclass
class FilePatternFilter(PatternFilter):
    """F8 — PatternFilter that always passes containers
    (file_pattern_filter.py:24-38)."""

    def mask(self, batch: pa.Table) -> np.ndarray:
        base = super().mask(batch)
        is_dir = _col(batch, "is_dir")
        if is_dir is None:
            return base
        return _np_bool(pc.fill_null(is_dir, False)) | base

    def authorize(self, row: dict) -> bool:
        if row.get("is_dir"):
            return True
        return super().authorize(row)


class OrFilter(VectorFilter):
    """F9 — disjunction of child filters (or_filter.py:15-30)."""

    def __init__(self, filters: list[VectorFilter]):
        if not filters:
            raise ValueError("The filters list is mandatory")
        self.filters = list(filters)

    def mask(self, batch: pa.Table) -> np.ndarray:
        out = np.zeros(len(batch), dtype=bool)
        for f in self.filters:
            out |= np.asarray(f.mask(batch), dtype=bool)
        return out

    def authorize(self, row: dict) -> bool:
        return any(f.authorize(row) for f in self.filters)


class FilterChain:
    """Skip(AND) + notify(OR) + invert combinators compiled to one batch mask.

    ``skip_filters``: ALL must authorize or the row is dropped (AND —
    file_system_crawler.py:447-460). ``notify_filters``: row kept if ANY
    authorizes (OR — :462-467). ``invert=True`` selects the rejected rows
    instead (fast_crawler.py:96-113).
    """

    def __init__(self, skip_filters=(), notify_filters=(), invert: bool = False):
        self.skip_filters = list(skip_filters)
        self.notify_filters = list(notify_filters)
        self.invert = invert

    def mask(self, batch: pa.Table) -> np.ndarray:
        ok = np.ones(len(batch), dtype=bool)
        for f in self.skip_filters:
            ok &= np.asarray(f.mask(batch), dtype=bool)
        if self.notify_filters:
            any_ok = np.zeros(len(batch), dtype=bool)
            for f in self.notify_filters:
                any_ok |= np.asarray(f.mask(batch), dtype=bool)
            ok &= any_ok
        return ~ok if self.invert else ok

    def authorize(self, row: dict) -> bool:
        ok = all(f.authorize(row) for f in self.skip_filters)
        if ok and self.notify_filters:
            ok = any(f.authorize(row) for f in self.notify_filters)
        return (not ok) if self.invert else ok

    def apply(self, batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(self.mask(batch)))
