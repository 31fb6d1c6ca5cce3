"""HyperLogLog distinct-count sketch: the mergeable-partial pattern for
COUNT(DISTINCT) at scale — per-block register folds, element-wise-max
merge (associative/commutative/idempotent → retry-safe), bias-corrected
estimate within the published error bound."""

import numpy as np
import pyarrow as pa

from fscrawler_ray.functions.sketches import hll_distinct, hll_estimate, hll_fold, hll_merge

SF = "/root/testdata/sf0.001"


def test_hll_merge_equals_union_fold():
    a = hll_fold(pa.array([f"a{i}" for i in range(4000)]), p=10)
    b = hll_fold(pa.array([f"a{i}" for i in range(2000, 6000)]), p=10)
    u = hll_fold(pa.array([f"a{i}" for i in range(6000)]), p=10)
    assert np.array_equal(hll_merge(a, b), u)
    # idempotent + commutative (retry/reorder safety)
    assert np.array_equal(hll_merge(a, a), a)
    assert np.array_equal(hll_merge(b, a), hll_merge(a, b))


def test_hll_accuracy_across_ranges():
    for n in (50, 1000, 50000):
        regs = hll_fold(pa.array([f"v{i}" for i in range(n)]), p=12)
        est = hll_estimate(regs)
        tol = 0.02 if n < 100 else 0.05  # linear counting is near-exact
        assert abs(est - n) / n < tol, (n, est)


def test_hll_distinct_on_dataset_matches_exact():
    import ray

    from fscrawler_ray.pipelines.analytics import (
        q_approx_distinct_users_by_type,
        q_distinct_users_by_type,
    )

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    exact = ds.to_pandas()["user_id"].nunique()
    est = hll_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # grouped: every key within 5% of the exact two-shuffle query
    approx = q_approx_distinct_users_by_type(SF).to_pandas().set_index("event_type")
    want = q_distinct_users_by_type(SF).to_pandas().set_index("event_type")
    assert sorted(approx.index) == sorted(want.index)
    for k in want.index:
        e, w = int(approx.loc[k, "approx_distinct"]), int(want.loc[k, "users"])
        assert abs(e - w) / w < 0.05, (k, e, w)


def test_hll_null_semantics():
    """NULLs follow SQL: COUNT(DISTINCT) drops null VALUES; GROUP BY
    keeps a null KEY group — and null never collides with ''."""
    import ray

    from fscrawler_ray.functions.sketches import hll_distinct_by_key

    vals = pa.array(["a", "b", None, "a", None, ""])
    regs = hll_fold(vals, p=10)
    assert round(hll_estimate(regs)) == 3  # a, b, '' — nulls dropped

    t = pa.table(
        {
            "k": pa.array(["x", "x", None, None, "y"]),
            "v": pa.array(["1", "2", "3", None, "4"]),
        }
    )
    out = hll_distinct_by_key(ray.data.from_arrow(t), "k", "v", p=10).to_pandas()
    got = {k if k == k and k is not None else None: int(c) for k, c in zip(out["k"], out["approx_distinct"])}
    assert got == {"x": 2, None: 1, "y": 1}, got


def test_cms_heavy_hitters_match_exact_topk():
    import ray

    from fscrawler_ray.functions.sketches import cms_fold, cms_merge, cms_query, heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: token i appears ~ 5000/i times — clear heavy head
    toks = []
    for i in range(1, 200):
        toks += [f"tok{i:03d}"] * (5000 // i)
    rng.shuffle(toks)
    t = pa.table({"tok": pa.array(toks)})
    ds = ray.data.from_arrow(t).repartition(8)

    out = heavy_hitters(ds, "tok", k=10).to_pandas()
    vc = pa.compute.value_counts(t.column("tok").combine_chunks())
    exact = dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))
    want = sorted(exact, key=lambda v: (-exact[v], v))[:10]
    assert list(out["tok"]) == want
    # CMS estimates are upper bounds and tight on the heavy head
    for _, r in out.iterrows():
        assert r["approx_count"] >= exact[r["tok"]]
        assert r["approx_count"] <= exact[r["tok"]] * 1.05 + 10

    # split-fold + merge == one fold
    a = cms_fold(t.column("tok").slice(0, 5000))
    b = cms_fold(t.column("tok").slice(5000))
    u = cms_fold(t.column("tok"))
    assert np.array_equal(cms_merge(a, b), u)
    probe = pa.array(["tok001", "tok100", "never-seen"])
    est = cms_query(u, probe)
    assert est[0] >= 5000 and est[2] <= 20


def test_qhist_quantiles_within_bin_width():
    import ray

    from fscrawler_ray.functions.sketches import (
        approx_quantile_by_key,
        qhist_fold,
        qhist_merge,
        qhist_quantile,
    )

    df = __import__("pandas").read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    lo, hi, bins = 0.0, 4096.0, 1024
    tol = (hi - lo) / bins
    regs = qhist_fold(df["n_chars"].to_numpy(), lo, hi, bins)
    for q in (0.1, 0.5, 0.9):
        exact = float(np.sort(df["n_chars"].to_numpy())[int(np.floor(q * (len(df) - 1)))])
        assert abs(qhist_quantile(regs, q, lo, hi) - exact) <= tol + 1e-9, q

    # merge == union fold
    half = len(df) // 2
    a = qhist_fold(df["n_chars"].to_numpy()[:half], lo, hi, bins)
    b = qhist_fold(df["n_chars"].to_numpy()[half:], lo, hi, bins)
    assert np.array_equal(qhist_merge(a, b), regs)

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"]).repartition(4)
    out = approx_quantile_by_key(ds, "lang", "n_chars", 0.5, lo, hi, bins).to_pandas()
    for _, r in out.iterrows():
        g = df[df["lang"] == r["lang"]]["n_chars"].to_numpy()
        exact = float(np.sort(g)[int(np.floor(0.5 * (len(g) - 1)))])
        assert abs(r["approx_quantile"] - exact) <= tol + 1e-9, r["lang"]


def test_query_wrappers_match_exact_counterparts():
    """The sketch-backed queries() entries agree with their exact twins."""
    import duckdb

    from fscrawler_ray.pipelines.textops import (
        q_approx_median_chars_by_lang,
        q_top_tokens_approx,
    )

    top = q_top_tokens_approx(SF, k=10).to_pandas()
    want = duckdb.sql(
        "WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS tok "
        f"FROM '{SF}/documents.parquet') "
        "SELECT tok, count(*) AS c FROM t WHERE tok <> '' GROUP BY tok ORDER BY c DESC, tok LIMIT 10"
    ).df()
    assert list(top["tok"]) == list(want["tok"])

    med = q_approx_median_chars_by_lang(SF).to_pandas()
    exact = duckdb.sql(
        f"SELECT lang, quantile_disc(n_chars, 0.5) AS m FROM '{SF}/documents.parquet' GROUP BY lang"
    ).df().set_index("lang")["m"]
    for _, r in med.iterrows():
        assert abs(r["approx_quantile"] - float(exact[r["lang"]])) <= 2.1, r["lang"]


def test_md5_register_hash_matches_duckdb_bitwise():
    """md5_u64_batch IS md5_number_upper(CAST(x AS VARCHAR)) — the whole
    SQL-replayable-sketch contract rests on this byte order."""
    import duckdb

    from fscrawler_ray.functions.sketches import md5_u64_batch

    vals = [str(v) for v in [0, 1, 42, 10**12, -7]] + ["", "abc", "héllo"]
    got = md5_u64_batch(pa.array(vals, pa.string()))
    want = [
        duckdb.sql(f"SELECT md5_number_upper('{v}'::VARCHAR)").fetchone()[0] for v in vals
    ]
    assert [int(g) for g in got] == want


def test_hll_md5_grouped_matches_exact_and_sql_estimator():
    """The md5-register grouped HLL stays inside the accuracy bound AND
    its estimator path is the integer-exact one (sum of 2^(cap-r) folded
    as Python ints, libm log) — spot-check against a direct recompute."""
    import math

    import duckdb

    from fscrawler_ray.functions.sketches import (
        hll_distinct_by_key_md5,
        hll_estimate_sql_exact,
        hll_fold_md5,
    )
    import ray

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    out = hll_distinct_by_key_md5(ds, key="event_type", col="user_id", p=12).to_pandas()
    want = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS u FROM '{SF}/events.parquet' GROUP BY 1"
    ).df().set_index("event_type")["u"]
    for _, r in out.iterrows():
        w = int(want[r["event_type"]])
        assert abs(int(r["approx_distinct"]) - w) / w < 0.05, (r["event_type"], w)

    # estimator recompute parity on a single fold
    regs = hll_fold_md5(pa.array([f"u{i}" for i in range(500)]), p=12)
    est = hll_estimate_sql_exact(regs, p=12)
    zeros = int((regs == 0).sum())
    assert est == 4096.0 * math.log(4096.0 / zeros)  # linear-counting regime


def test_md5_chunks_match_duckdb_bitwise():
    """md5_chunks_batch chunk d IS CAST('0x'||substring(md5(x),1+8d,8) AS
    UBIGINT) — the CMS-oracle contract."""
    import duckdb

    from fscrawler_ray.functions.sketches import md5_chunks_batch

    vals = ["", "abc", "héllo", "the", "42"]
    got = md5_chunks_batch(pa.array(vals, pa.string()), 4)
    for d in range(4):
        want = [
            duckdb.sql(
                f"SELECT CAST('0x' || substring(md5('{v}'), {1 + 8 * d}, 8) AS UBIGINT)"
            ).fetchone()[0]
            for v in vals
        ]
        assert [int(x) for x in got[d]] == want


def test_cms_md5_merge_upper_bound_and_exact_on_head():
    """Partial-fold add-merge ≡ one-shot fold; estimates upper-bound true
    counts and are exact on the heavy head at this width."""
    from fscrawler_ray.functions.sketches import cms_fold_md5, cms_merge, cms_query_md5

    rng = np.random.default_rng(7)
    vals = [f"tok{int(i)}" for i in rng.zipf(1.7, 4000) if i < 500]
    arr = pa.array(vals, pa.string())
    one = cms_fold_md5(arr, width=1024, depth=4)
    half = len(vals) // 2
    merged = cms_merge(
        cms_fold_md5(pa.array(vals[:half], pa.string()), width=1024, depth=4),
        cms_fold_md5(pa.array(vals[half:], pa.string()), width=1024, depth=4),
    )
    assert (one == merged).all()
    import collections

    truth = collections.Counter(vals)
    items = sorted(truth, key=lambda t: (-truth[t], t))[:10]
    est = cms_query_md5(one, pa.array(items, pa.string()))
    for t, e in zip(items, est):
        assert e >= truth[t]
        assert e - truth[t] <= len(vals) * 4 / 1024  # within CMS error bound


def test_md5_sketch_twins_structural_properties():
    """The SQL-replayable md5 twins keep the sketches' contracts: identical
    docs → identical sketches; near-identical docs → small simhash hamming
    distance; shared shingles → shared fingerprint min."""
    from fscrawler_ray.functions.text import fingerprint64_md5, simhash64_md5

    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    s = simhash64_md5([a, a, b, ""])
    assert s[0] == s[1]
    ham = bin((int(s[0]) ^ int(s[2])) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 24  # one of nine distinct words changed → near, not far
    assert s[3] == 0
    f = fingerprint64_md5([a, a, "one two", ""])
    assert f[0] == f[1]
    assert f[2] == 0 and f[3] == 0  # <3 tokens → 0


def test_hll_pairwise_intersection_inclusion_exclusion():
    """est(A) + est(B) - est(A ∪ B) approximates |A ∩ B| within HLL error
    at p=10; the merge is idempotent/commutative so the union estimate is
    order-independent."""
    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.functions.sketches import (
        hll_estimate_sql_exact,
        hll_fold_md5,
        hll_merge,
    )

    p = 10
    a_vals = pa.array([f"item{i}" for i in range(3000)])
    b_vals = pa.array([f"item{i}" for i in range(2000, 6000)])  # overlap 1000
    ra = hll_fold_md5(a_vals, p=p)
    rb = hll_fold_md5(b_vals, p=p)
    ea, eb = hll_estimate_sql_exact(ra, p), hll_estimate_sql_exact(rb, p)
    eu = hll_estimate_sql_exact(hll_merge(ra, rb), p)
    inter = ea + eb - eu
    assert abs(inter - 1000) / 1000 < 0.25, inter
    eu2 = hll_estimate_sql_exact(hll_merge(rb, ra), p)
    assert eu == eu2
