"""TPC-H-shape batch: Q4/Q12/Q14/Q16 analogs, the PPS systematic sampler
and the RANGE-frame calendar window.

The oracle sweep (tools/check_oracle.py) certifies SQL parity on the
testdata; these tests pin the SEMANTICS on adversarial synthetic inputs —
the strict `>` of the EXISTS rewrite, the ship-year boundary, the
denylisted distinct count, threshold-crossing selection across bucket
boundaries, and the gap-aware RANGE frame vs a brute-force scan.
"""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.pipelines.analytics import (
    q_order_priority_late,
    q_orders_range30,
    q_part_supplier_variety,
    q_pps_sample_docs,
    q_promo_revenue_monthly,
    q_returnflag_priority,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")


def _rows(res):
    t = res.to_pandas() if hasattr(res, "to_pandas") else res
    import pandas as pd

    if isinstance(t, pa.Table):
        t = t.to_pandas()
    assert isinstance(t, pd.DataFrame)
    return t


def test_order_priority_late_strict_inequality(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": pa.array([_ts("2020-01-05")] * 3 + [_ts("2020-02-01")], pa.timestamp("us")),
            "o_orderpriority": pa.array(["A", "A", "B", "B"]),
        },
    )
    # order 1: one early + one late line (late); order 2: ship == orderdate
    # exactly (NOT late — strict >); order 3: late; order 4: no lines.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_shipdate": pa.array(
                [_ts("2020-01-04"), _ts("2020-01-06"), _ts("2020-01-05"), _ts("2020-01-10")], pa.timestamp("us")
            ),
        },
    )
    df = _rows(q_order_priority_late(str(tmp_path))).set_index("o_orderpriority")["order_count"]
    assert df.to_dict() == {"A": 1, "B": 1}


def test_returnflag_priority_year_boundary(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "l_returnflag": pa.array(["R", "R", "R", "N", "N"]),
            "l_shipdate": pa.array(
                [
                    _ts("1998-06-01"),  # in window, high
                    _ts("1997-06-01"),  # before window
                    _ts("1998-06-01"),  # in window, low
                    _ts("1998-12-31"),  # in window, low
                    _ts("1999-01-01"),  # exclusive upper bound
                ],
                pa.timestamp("us"),
            ),
        },
    )
    df = _rows(q_returnflag_priority(str(tmp_path))).set_index("l_returnflag")
    assert df.loc["R", "high_line_count"] == 1 and df.loc["R", "low_line_count"] == 1
    assert df.loc["N", "high_line_count"] == 0 and df.loc["N", "low_line_count"] == 1


def test_promo_revenue_monthly_split(tmp_path):
    _write(
        tmp_path,
        "part",
        {"p_partkey": pa.array([1, 2], pa.int64()), "p_type": pa.array(["PROMO", "STANDARD"])},
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2, 1], pa.int64()),
            "l_extendedprice": pa.array([100.0, 50.0, 10.0]),
            "l_discount": pa.array([0.1, 0.0, 0.0]),
            "l_shipdate": pa.array([_ts("2020-01-15"), _ts("2020-01-20"), _ts("2020-02-01")], pa.timestamp("us")),
        },
    )
    df = _rows(q_promo_revenue_monthly(str(tmp_path))).set_index("mo").sort_index()
    jan, feb = df.iloc[0], df.iloc[1]
    assert (jan["promo_cents"], jan["total_cents"]) == (9000, 14000)
    assert (feb["promo_cents"], feb["total_cents"]) == (1000, 1000)


def test_part_supplier_variety_denylist_distinct(tmp_path):
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["B1", "B1", "B2"]),
            "p_size": pa.array([5, 5, 7], pa.int32()),
        },
    )
    # duplicate (1, s1) pair collapses; supplier 3 is denylisted (3 % 3 == 0);
    # s1 counts ONCE for (B1, 5) though it supplies both part 1 and part 2.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 1, 3, 4], pa.int64()),
        },
    )
    _write(tmp_path, "supplier", {"s_suppkey": pa.array([1, 2, 3, 4], pa.int64())})
    df = _rows(q_part_supplier_variety(str(tmp_path)))
    got = {(r.p_brand, r.p_size): r.supplier_cnt for r in df.itertuples()}
    assert got == {("B1", 5): 2, ("B2", 7): 1}


def test_pps_sample_matches_bruteforce_across_buckets(tmp_path):
    rng = np.random.default_rng(7)
    n = 40
    doc_ids = np.arange(n, dtype=np.int64)
    langs = np.array(["en", "fr"])[doc_ids % 2]
    chars = rng.integers(1, 500, n).astype(np.int64)
    _write(
        tmp_path,
        "documents",
        {"doc_id": pa.array(doc_ids), "lang": pa.array(langs), "n_chars": pa.array(chars)},
    )
    k = 3
    # brute force: doc-id-ordered cumulative weight, threshold crossings
    expect = set()
    for lang in ("en", "fr"):
        m = langs == lang
        ids, w = doc_ids[m], chars[m]
        total, cum = int(w.sum()), 0
        for i, wt in zip(ids, w):
            prev, cum = cum, cum + int(wt)
            if (cum * k) // total > (prev * k) // total:
                expect.add(int(i))
    # bucket=4 forces every lang across many buckets → exercises the
    # offset-broadcast path, not the single-group degenerate case
    df = _rows(q_pps_sample_docs(str(tmp_path), k=k, bucket=4))
    assert set(df["doc_id"]) == expect
    # systematic PPS yields at most k (exactly k when no weight > total/k)
    assert df.groupby("lang").size().max() <= k


def test_orders_range30_gap_aware(tmp_path):
    base = dt.datetime(2020, 1, 1)
    offsets = [0, 10, 29, 31, 100]
    prices = [1.0, 2.0, 3.0, 4.0, 5.0]
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": pa.array([base + dt.timedelta(days=o) for o in offsets], pa.timestamp("us")),
            "o_totalprice": pa.array(prices),
        },
    )
    df = _rows(q_orders_range30(str(tmp_path))).sort_values("d").reset_index(drop=True)
    cents = [100, 200, 300, 400, 500]
    expect = []
    for i, o in enumerate(offsets):
        expect.append(sum(c for c, oo in zip(cents, offsets) if o - 29 <= oo <= o))
    assert list(df["mov30_cents"]) == expect
    # day 29 reaches back to day 0 (inclusive frame edge); day 31 does not
    assert df.loc[2, "mov30_cents"] == 600 and df.loc[3, "mov30_cents"] == 900


def test_min_cost_supplier_ties_survive(tmp_path):
    # part 1: suppliers 1 and 2 tie at the min (both kept, each once even
    # though supplier 1 hits the min on two lines); part 2: single min.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
            "l_extendedprice": pa.array([10.0, 10.0, 10.0, 99.0, 7.5, 8.0]),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_min_cost_supplier

    df = _rows(q_min_cost_supplier(str(tmp_path)))
    got = sorted(map(tuple, df.itertuples(index=False)))
    assert got == [(1, 1, 1000), (1, 2, 1000), (2, 4, 750)]


def test_value_hour_moments_reconstruct_covariance(tmp_path):
    import pandas as pd

    ts = [_ts("2024-01-01T03:00"), _ts("2024-01-01T10:30"), _ts("2024-01-02T23:59")]
    vals = [1.25, 2.0, None]
    _write(
        tmp_path,
        "events",
        {
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array(vals, pa.float64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_value_hour_moments

    r = _rows(q_value_hour_moments(str(tmp_path))).iloc[0]
    # null value drops from ALL moments (count(value) semantics)
    assert (r["n"], r["sum_x"], r["sum_y"], r["sum_xy"]) == (2, 325, 13, 2375)
    n, sx, sy, sxy = r["n"], r["sum_x"], r["sum_y"], r["sum_xy"]
    cov = (n * sxy - sx * sy) / n**2
    x = np.array([125, 200]); y = np.array([3, 10])
    assert abs(cov - np.mean((x - x.mean()) * (y - y.mean()))) < 1e-9


def test_small_qty_loss_strict_fraction_boundary(tmp_path):
    # part 1: avg qty = 10 → threshold 2.0; the qty==2 line is NOT below
    # 20% (strict <), qty==1 is; part 2: single line never below its own avg.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "l_quantity": pa.array([18.0, 19.0, 2.0, 1.0, 5.0]),
            "l_extendedprice": pa.array([10.0, 10.0, 10.0, 3.5, 10.0]),
        },
    )
    _write(
        tmp_path,
        "part",
        {"p_partkey": pa.array([1, 2], pa.int64()), "p_brand": pa.array(["B1", "B2"])},
    )
    from fscrawler_ray.pipelines.analytics import q_small_qty_loss

    df = _rows(q_small_qty_loss(str(tmp_path)))
    got = {r.p_brand: (r.n_lines, r.loss_cents) for r in df.itertuples()}
    assert got == {"B1": (1, 350)}


def test_large_orders_strict_threshold_and_dims(tmp_path):
    # order 1 totals exactly 200 units (NOT > 200 — excluded); order 2
    # crosses via two lines; order 3 is huge but loses the price sort.
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 2, 2, 3], pa.int64()),
            "l_quantity": pa.array([200.0, 150.0, 51.0, 300.0]),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 20, 30], pa.int64()),
            "o_totalprice": pa.array([999.0, 50.0, 25.0]),
            "o_orderdate": pa.array([_ts("2020-01-01")] * 3, pa.timestamp("us")),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([10, 20, 30], pa.int64()),
            "c_name": pa.array(["alice", "bob", "carol"]),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_large_orders

    df = _rows(q_large_orders(str(tmp_path)))
    assert list(df["l_orderkey"]) == [2, 3]  # price desc, order 1 excluded
    assert list(df["c_name"]) == ["bob", "carol"]
    assert list(df["total_units"]) == [20100, 30000]


def test_rich_dormant_by_nation_avg_boundary(tmp_path):
    # positive balances: 100, 300 → avg 200.  cust 1 (=200 exactly) NOT
    # rich (strict >); cust 2 (300) rich but purchased; cust 3 (300) rich
    # and dormant; cust 4 negative balance never rich.
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_nationkey": pa.array([7, 7, 7, 8], pa.int64()),
            "c_acctbal": pa.array([2.0, 3.0, 3.0, -5.0]),
        },
    )
    # positive-average base: cust1=200c, cust2=300c, cust3=300c, avg=800/3≈266.7
    # → rich = {2, 3}; cust 2 purchases, cust 3 has only a click event.
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([2, 3], pa.int64()),
            "event_type": pa.array(["purchase", "click"]),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_rich_dormant_by_nation

    df = _rows(q_rich_dormant_by_nation(str(tmp_path)))
    got = {r.c_nationkey: (r.n_cust, r.total_bal_cents) for r in df.itertuples()}
    assert got == {7: (1, 300)}


def test_top_supplier_ties_and_window_edges(tmp_path):
    # suppliers 1 and 2 tie at max revenue inside the quarter; supplier 3's
    # bigger line ships exactly at the exclusive upper bound (dropped), and
    # supplier 4's at the inclusive lower bound (kept, but smaller).
    _write(
        tmp_path,
        "lineitem",
        {
            "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([100.0, 100.0, 500.0, 40.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
            "l_shipdate": pa.array(
                [_ts("1997-02-01"), _ts("1997-03-31"), _ts("1997-04-01"), _ts("1997-01-01")],
                pa.timestamp("us"),
            ),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "s_name": pa.array(["s1", "s2", "s3", "s4"]),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_top_supplier

    df = _rows(q_top_supplier(str(tmp_path)))
    got = sorted(zip(df["s_suppkey"], df["s_name"], df["total_revenue_cents"]))
    assert got == [(1, "s1", 10000), (2, "s2", 10000)]


def test_order_count_distribution_zero_bucket(tmp_path):
    _write(tmp_path, "customer", {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
    # cust 1: 2 orders; cust 2: 1; cust 3+4: none → zero bucket = 2
    _write(tmp_path, "orders", {"o_custkey": pa.array([1, 1, 2], pa.int64())})
    from fscrawler_ray.pipelines.analytics import q_order_count_distribution

    df = _rows(q_order_count_distribution(str(tmp_path)))
    got = dict(zip(df["c_count"], df["custdist"]))
    assert got == {2: 1, 1: 1, 0: 2}


def test_late_sole_suppliers_blame_semantics(tmp_path):
    base = _ts("2020-01-01")
    late = _ts("2020-04-01")  # > 60 days after base
    ontime = _ts("2020-01-15")
    # order 1: suppliers 1 (late twice — counted once) + 2 (on time) → blame 1
    # order 2: suppliers 1 and 2 BOTH late → nl=2, nobody blamed
    # order 3: single supplier late → ns=1, excluded
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 1, 2, 9], pa.int64()),
            "l_shipdate": pa.array([late, late, ontime, late, late, late], pa.timestamp("us")),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array([base, base, base], pa.timestamp("us")),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {"s_suppkey": pa.array([1, 2, 9], pa.int64()), "s_name": pa.array(["s1", "s2", "s9"])},
    )
    from fscrawler_ray.pipelines.analytics import q_late_sole_suppliers

    df = _rows(q_late_sole_suppliers(str(tmp_path)))
    assert [(r.l_suppkey, r.s_name, r.numwait) for r in df.itertuples()] == [(1, "s1", 1)]


def test_disjunctive_revenue_branch_isolation(tmp_path):
    # one line per branch, one line matching brand but failing its branch's
    # quantity window (and every other branch), one superset-filter reject
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#4"]),
            "p_size": pa.array([10, 20, 30], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2, 3, 1, 1], pa.int64()),
            "l_quantity": pa.array([5.0, 15.0, 25.0, 20.0, 40.0]),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 99.0, 99.0]),
            "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.0]),
        },
    )
    from fscrawler_ray.pipelines.analytics import q_disjunctive_revenue

    df = _rows(q_disjunctive_revenue(str(tmp_path)))
    assert (df["n_lines"].iat[0], df["revenue_cents"].iat[0]) == (3, 1000 + 1000 + 3000)


def test_nation_trade_volume_cross_border_only(tmp_path):
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["NA", "NB"]),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    })
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    })
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([100, 200], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
    })
    # line 1: supp NA → cust NB (cross); line 2: supp NB → cust NB (domestic, dropped)
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([200, 200], pa.int64()),
        "l_suppkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, 99.0]),
        "l_discount": pa.array([0.0, 0.0]),
        "l_shipdate": pa.array([_ts("1997-05-01")] * 2, pa.timestamp("us")),
    })
    from fscrawler_ray.pipelines.analytics import q_nation_trade_volume

    df = _rows(q_nation_trade_volume(str(tmp_path)))
    assert [(r.supp_nation, r.cust_nation, r.ship_year, r.revenue_cents) for r in df.itertuples()] == [
        ("NA", "NB", 1997, 1000)
    ]


def test_market_share_totals_close(tmp_path):
    _write(tmp_path, "region", {
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EUROPE", "ASIA"]),
    })
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    })
    # cust 10 in EUROPE; cust 30 in ASIA (its order excluded entirely)
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([10, 30], pa.int64()),
        "c_nationkey": pa.array([0, 2], pa.int64()),
    })
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([100, 300], pa.int64()),
        "o_custkey": pa.array([10, 30], pa.int64()),
    })
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([100, 100, 300], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 30.0, 99.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_shipdate": pa.array([_ts("1997-05-01")] * 3, pa.timestamp("us")),
    })
    from fscrawler_ray.pipelines.analytics import q_market_share

    df = _rows(q_market_share(str(tmp_path))).sort_values("supp_nation").reset_index(drop=True)
    assert list(df["nation_cents"]) == [1000, 3000]
    assert list(df["year_cents"]) == [4000, 4000]  # denominator shared per year


def test_q9_q11_q20_shapes_nonempty(ray_session):
    # the final three TPC-H shapes (adapted: no partsupp table) return
    # rows at the smallest sf and respect their own invariants
    from fscrawler_ray.pipelines.analytics import (
        q_dominant_suppliers,
        q_important_part_suppliers,
        q_profit_by_nation_year,
    )

    sf = "/root/testdata/sf0.001"
    p = q_profit_by_nation_year(sf).to_pandas()
    assert len(p) > 0 and (p["profit_cents"] > 0).all()
    i = q_important_part_suppliers(sf).to_pandas()
    assert len(i) > 0
    # every kept pair is above 3x the mean pair value by construction:
    # re-derive the global stats and check the exact integer predicate
    import duckdb

    tot, n = duckdb.sql(
        "SELECT SUM(c), COUNT(*) FROM (SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT)) c "
        f"FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_partkey, l_suppkey)"
    ).fetchone()
    assert all(int(x) * int(n) > int(tot) * 3 for x in i["pair_cents"])
    d = q_dominant_suppliers(sf).to_pandas()
    assert len(d) > 0 and (d["pair_qty"] <= d["part_qty"]).all()
