from fscrawler_ray.functions.urls import canonicalize, depth_of, ext_of, host_of, name_of


def test_canonicalize_rules():
    cases = {
        "HTTP://Example.COM:80//a/./b/../c/img.JPG#frag": "http://example.com/a/c/img.JPG",
        "http://h.com": "http://h.com/",
        "http://h.com/": "http://h.com/",
        "https://H.com:443/x/y/z/": "https://h.com/x/y/z",
        "http://h.com/a/b/c/d.png?q=1": "http://h.com/a/b/c/d.png?q=1",
    }
    got = canonicalize(list(cases)).to_pylist()
    assert got == list(cases.values())


def test_canonicalize_idempotent():
    urls = ["http://a.com/x/../y/", "https://B.org:443//q"]
    once = canonicalize(urls)
    twice = canonicalize(once)
    assert once.to_pylist() == twice.to_pylist()


def test_ext_quirks():
    names = name_of(canonicalize([
        "http://h.com/a/IMG.JPG",
        "http://h.com/a/file.with.a.really.long.trailing.part123456789",
        "http://h.com/a/noext",
        "http://h.com/a/twelve.abcdefghijkl",   # exactly 12 chars -> kept
        "http://h.com/a/thirteen.abcdefghijklm",  # 13 chars -> None
    ]))
    assert ext_of(names).to_pylist() == ["jpg", None, None, "abcdefghijkl", None]


def test_canonicalize_idempotent_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(alphabet="abcZ09._-%", min_size=0, max_size=6)

    @settings(max_examples=50, deadline=None)
    @given(
        st.sampled_from(["http", "https", "HTTP"]),
        st.sampled_from(["Host.COM", "a.b.c", "x.io:80", "y.z:8080"]),
        st.lists(st.sampled_from([".", "..", "a", "bb", "", "img.JPG"]), max_size=6),
        seg,
    )
    def check(scheme, host, parts, frag):
        url = f"{scheme}://{host}/" + "/".join(parts) + (f"#{frag}" if frag else "")
        once = canonicalize([url]).to_pylist()[0]
        twice = canonicalize([once]).to_pylist()[0]
        assert once == twice
        assert "#" not in once

    check()


def test_host_depth():
    urls = canonicalize(["http://A.com/x/y", "http://b.com/", "http://c.com/1/2/3/4"])
    assert host_of(urls).to_pylist() == ["a.com", "b.com", "c.com"]
    assert depth_of(urls).to_pylist() == [2, 0, 4]


def test_canonicalize_scheme_aware_ports_and_query():
    """ADVICE r01: default-port stripping must be scheme-aware and the
    query string must survive slash-collapse / dot-resolution verbatim."""
    cases = {
        "http://h.com:80/x": "http://h.com/x",
        "http://h.com:443/x": "http://h.com:443/x",   # not http's default
        "https://h.com:443/x": "https://h.com/x",
        "https://h.com:80/x": "https://h.com:80/x",   # not https's default
        "http://h.com/a/?next=http://b//c/../d": "http://h.com/a?next=http://b//c/../d",
        "http://h.com/p//q?u=..//v": "http://h.com/p/q?u=..//v",
    }
    got = canonicalize(list(cases)).to_pylist()
    assert got == list(cases.values())
    assert canonicalize(got).to_pylist() == got  # idempotent


def test_canonicalize_leading_dotdot():
    got = canonicalize(["http://h/../x", "http://h/..", "http://h/../../y"]).to_pylist()
    assert got == ["http://h/x", "http://h/", "http://h/y"]


def test_url_filter_rules(tmp_path):
    """Each FineWeb-style URL rule trips on its planted violator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import url_filter

    rows = [
        ("http://ok.example.com/g1/img_12345.jpg", "ok.example.com", "clean"),
        ("http://ok.example.com/" + "x" * 90 + ".jpg", "ok.example.com", "too_long"),
        ("http://ok.example.com/123456789012345.jpg", "ok.example.com", "digits"),
        ("http://ok.example.com/a/b/c/d/e.jpg", "ok.example.com", "deep"),
        ("http://host03.example.com/g1/img_1.jpg", "host03.example.com", "blocked"),
        ("http://ok.example.com/g1/img_90001.jpg", "ok.example.com", "banned_tok"),
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "host": pa.array([r[1] for r in rows]),
            }
        ),
        tmp_path / "part-0.parquet",
    )
    out = url_filter(str(tmp_path)).to_pandas().set_index("url")
    by = {r[2]: out.loc[r[0]] for r in rows}
    assert by["clean"]["url_pass"] == 1
    assert by["too_long"]["r_len"] == 0 and by["too_long"]["url_pass"] == 0
    assert by["digits"]["r_digits"] == 0
    assert by["deep"]["r_depth"] == 0
    assert by["blocked"]["r_host"] == 0
    assert by["banned_tok"]["r_token"] == 0


def test_url_flags_duckdb_parity_fuzz():
    """RE2-parity fuzz for the FineWeb-style URL rules vs the oracle's
    DuckDB replay, on adversarial URL shapes (deep paths, digit floods,
    banned tokens, blocked hosts, long tails)."""
    import duckdb
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from fscrawler_ray.pipelines.crawl_report import (
        URL_BANNED_TOKENS,
        URL_BLOCKED_HOSTS,
        URL_MAX_LEN,
        URL_MAX_SLASHES,
        url_flag_batch,
    )

    _blk = ", ".join(f"'{h}'" for h in URL_BLOCKED_HOSTS)
    _tok = " OR ".join(f"regexp_matches(url, '{t}')" for t in URL_BANNED_TOKENS)
    sql = (
        "WITH c AS (SELECT url, host, CAST(length(url) AS BIGINT) AS ln, "
        "cast(len(regexp_extract_all(url, '[0-9]')) AS BIGINT) AS n_dig, "
        "cast(len(regexp_extract_all(url, '/')) AS BIGINT) AS n_sl FROM t) "
        "SELECT url, "
        f"CAST(CASE WHEN ln <= {URL_MAX_LEN} THEN 1 ELSE 0 END AS BIGINT) AS r_len, "
        "CAST(CASE WHEN 4 * n_dig <= ln THEN 1 ELSE 0 END AS BIGINT) AS r_digits, "
        f"CAST(CASE WHEN n_sl <= {URL_MAX_SLASHES} THEN 1 ELSE 0 END AS BIGINT) AS r_depth, "
        f"CAST(CASE WHEN host IN ({_blk}) THEN 0 ELSE 1 END AS BIGINT) AS r_host, "
        f"CAST(CASE WHEN {_tok} THEN 0 ELSE 1 END AS BIGINT) AS r_token "
        "FROM c"
    )

    host = st.sampled_from(
        ["ok.example.com", "host03.example.com", "host13.example.com", "h9.example.com"]
    )
    seg = st.sampled_from(["g1", "123456", "img_9", "gallery7", "a", "x" * 40, "img_12345.jpg"])
    path = st.lists(seg, min_size=0, max_size=6).map("/".join)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(host, path), min_size=1, max_size=5))
    def run(rows):
        urls = [f"http://{h}/{p}" for h, p in rows]
        hosts = [h for h, _ in rows]
        eng = url_flag_batch(
            pa.array(urls, pa.string()), pa.array(hosts, pa.string())
        ).to_pandas().drop(columns=["url_pass"])
        con = duckdb.connect()
        con.register("t", pa.table({"url": pa.array(urls), "host": pa.array(hosts)}))
        want = con.sql(sql).df()
        # align on row order (both preserve input order)
        for c in ["r_len", "r_digits", "r_depth", "r_host", "r_token"]:
            assert list(eng[c]) == list(want[c]), (c, urls)

    run()
