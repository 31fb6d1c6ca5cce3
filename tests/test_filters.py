import datetime as dt

import pyarrow as pa
import pytest

from fscrawler_ray.filters import (
    DateFilter,
    DepthFilter,
    ExtensionFilter,
    FilePatternFilter,
    FilterChain,
    NameFilter,
    OrFilter,
    PatternFilter,
    RegexPatternFilter,
    SizeFilter,
    build_chain_from_spec,
)


def batch(**cols):
    return pa.table(cols)


URLS = batch(
    url=["http://h.com/a/x.jpg", "http://h.com/a/x.tmp", "http://h.com/dir", "http://h.com/b/noext"],
    name=["x.jpg", "x.tmp", "dir", "noext"],
    ext=["jpg", "tmp", None, None],
    is_dir=[False, False, True, False],
    size=[100, 5, None, 50],
    mtime=pa.array([dt.datetime(2024, 1, 1), None, dt.datetime(2020, 1, 1), dt.datetime(2025, 6, 1)]),
    depth=[2, 2, 1, 2],
)


def both(f, b=URLS):
    """Assert vector mask and scalar authorize agree, return the mask."""
    m = list(f.mask(b))
    rows = b.to_pylist()
    s = [f.authorize(r) for r in rows]
    assert [bool(x) for x in m] == s, (m, s)
    return [bool(x) for x in m]


def test_extension_filter():
    assert both(ExtensionFilter(excluded={"tmp"})) == [True, False, True, True]
    # authorized set: null extension denied too (None not in set)
    assert both(ExtensionFilter(authorized={"jpg"})) == [True, False, False, False]
    assert both(ExtensionFilter()) == [True, True, True, True]


def test_depth_filter():
    assert both(DepthFilter(max_depth=1)) == [False, False, True, False]
    assert both(DepthFilter(max_depth=-1)) == [True, True, True, True]


def test_date_filter_missing_allows():
    f = DateFilter(min_date=dt.datetime(2023, 1, 1), max_date=dt.datetime(2024, 12, 31))
    assert both(f) == [True, True, False, False]


def test_size_filter_missing_denies():
    assert both(SizeFilter(min_size=10)) == [True, False, False, True]
    assert both(SizeFilter(min_size=0, max_size=60)) == [False, True, False, True]


def test_pattern_filter_substring_only():
    assert both(PatternFilter(excluded_pattern="/a/")) == [False, False, True, True]
    assert both(PatternFilter(authorized_pattern=".jpg")) == [True, False, False, False]


def test_regex_filter_and_literal_fallback():
    # plain regex
    assert both(RegexPatternFilter(excluded_pattern=r"\.tmp$")) == [True, False, True, True]
    # dirs get a trailing slash before matching
    assert both(RegexPatternFilter(authorized_pattern=r"/dir/$")) == [False, False, True, False]
    # literal fallback: pattern that fails as regex match but matches with backslashes stripped
    # '\n' makes the regex require a newline (never present) but the
    # de-backslashed literal '/b/noext' is a substring of row 3's url
    f = RegexPatternFilter(excluded_pattern=r"/b/\noext")
    assert both(f) == [True, True, True, False]


def test_name_filter():
    assert both(NameFilter(excluded_names={"x.tmp", "dir"})) == [True, False, False, True]


def test_file_pattern_filter_dirs_pass():
    assert both(FilePatternFilter(authorized_pattern=".jpg")) == [True, False, True, False]


def test_or_filter():
    f = OrFilter([ExtensionFilter(authorized={"jpg"}), NameFilter(excluded_names={"x.jpg", "x.tmp", "noext"})])
    assert both(f) == [True, False, True, False]
    with pytest.raises(ValueError):
        OrFilter([])


def test_chain_skip_and_notify_and_invert():
    chain = FilterChain(
        skip_filters=[ExtensionFilter(excluded={"tmp"}), SizeFilter(min_size=10)],
        notify_filters=[PatternFilter(authorized_pattern="/a/"), PatternFilter(authorized_pattern="/b/")],
    )
    assert [bool(x) for x in chain.mask(URLS)] == [True, False, False, True]
    inv = FilterChain(skip_filters=chain.skip_filters, notify_filters=chain.notify_filters, invert=True)
    assert [bool(x) for x in inv.mask(URLS)] == [False, True, True, False]
    assert [chain.authorize(r) for r in URLS.to_pylist()] == [True, False, False, True]


def test_factory_spec():
    chain = build_chain_from_spec(
        {
            "skip_filters": [
                {"ExtensionFilter": {"excluded": ["tmp"]}},
                {"SizeFilter": {"min_size": 10}},
            ],
            "notify_filters": [{"PatternFilter": {"authorized_pattern": "/a/"}}],
        }
    )
    assert [bool(x) for x in chain.mask(URLS)] == [True, False, False, False]
    nested = build_chain_from_spec(
        {"skip_filters": [{"OrFilter": {"filters": [{"ExtensionFilter": {"authorized": ["jpg"]}}, {"DepthFilter": {"max_depth": 1}}]}}]}
    )
    assert [bool(x) for x in nested.mask(URLS)] == [True, False, True, False]


def test_mask_authorize_parity_fuzz():
    """Property: for every filter, the vectorized mask equals row-by-row
    scalar authorize on arbitrary feature rows."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(["x.jpg", "x.tmp", "dir", "noext", ".DS_Store", "a.b.c.longextension"])
    rows = st.lists(
        st.fixed_dictionaries(
            {
                "url": st.sampled_from(
                    ["http://h.com/a/x.jpg", "http://h.com/a/x.tmp", "http://q.org/dir", "http://h.com/b/noext"]
                ),
                "name": names,
                "ext": st.sampled_from(["jpg", "tmp", None, "png"]),
                "is_dir": st.booleans(),
                "size": st.one_of(st.none(), st.integers(0, 10_000)),
                "mtime": st.one_of(st.none(), st.integers(1_500_000_000_000_000, 1_800_000_000_000_000)),
                "depth": st.integers(0, 6),
            }
        ),
        min_size=1,
        max_size=8,
    )
    filters = [
        ExtensionFilter(excluded={"tmp"}),
        ExtensionFilter(authorized={"jpg", "png"}),
        # None in both sets: excluded wins (ADVICE r02) — the degenerate
        # config where the vectorized mask used to OR ext=None back in
        ExtensionFilter(authorized=frozenset({"jpg", None}), excluded=frozenset({"tmp", None})),
        ExtensionFilter(authorized=frozenset({None, "png"})),
        DepthFilter(max_depth=3),
        DateFilter(min_date=dt.datetime(2019, 1, 1), max_date=dt.datetime(2026, 1, 1)),
        SizeFilter(min_size=100, max_size=9000),
        PatternFilter(excluded_pattern="/a/"),
        RegexPatternFilter(authorized_pattern=r"\.(jpg|png)$"),
        NameFilter(excluded_names={"x.tmp", ".DS_Store"}),
        FilePatternFilter(authorized_pattern=".jpg"),
    ]

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("name", pa.string()),
            ("ext", pa.string()),
            ("is_dir", pa.bool_()),
            ("size", pa.int64()),
            ("mtime", pa.int64()),
            ("depth", pa.int32()),
        ]
    )

    @settings(max_examples=40, deadline=None)
    @given(rows)
    def check(rs):
        batch = pa.table(
            {k: pa.array([r[k] for r in rs], type=schema.field(k).type) for k in rs[0]}
        )
        for f in filters:
            m = [bool(x) for x in f.mask(batch)]
            s = [f.authorize(r) for r in rs]
            assert m == s, (type(f).__name__, m, s)

    check()


def test_filter_review_regressions():
    """Third review batch: YAML bare dates, empty NameFilter, RE2-invalid
    patterns fail fast, None extension members, timestamp-unit
    normalization."""
    import datetime as dt

    import pyarrow as pa
    import pytest
    import yaml

    from fscrawler_ray.filters.core import DateFilter, ExtensionFilter, NameFilter, RegexPatternFilter
    from fscrawler_ray.filters.factory import build_chain_from_spec

    # bare YAML date parses to datetime.date — must not crash
    c = build_chain_from_spec(yaml.safe_load("skip_filters:\n  - DateFilter: {min_date: 2020-01-01}"))
    b = pa.table({"url": ["u"], "name": ["n"], "mtime": pa.array([1_700_000_000_000_000], pa.int64())})
    assert c.mask(b).tolist() == [True]

    # empty NameFilter (dataclass default) passes everything
    assert NameFilter().mask(b).tolist() == [True]

    # Python-valid / RE2-invalid pattern fails at CONSTRUCTION, not mid-crawl
    with pytest.raises(ValueError, match="RE2"):
        RegexPatternFilter(excluded_pattern=r"(?!admin)/sec")

    # None in excluded = deny extensionless; mask/authorize agree
    f = ExtensionFilter(excluded=frozenset({"tmp", None}))
    b2 = pa.table({"ext": pa.array(["tmp", "jpg", None])})
    assert f.mask(b2).tolist() == [False, True, False]
    assert [f.authorize({"ext": e}) for e in ["tmp", "jpg", None]] == [False, True, False]

    # timestamp columns in seconds normalize to us before comparison
    f2 = DateFilter(min_date=dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc))
    b3 = pa.table({"mtime": pa.array([1_700_000_000], pa.timestamp("s"))})
    assert f2.mask(b3).tolist() == [True]
