"""Mergeable-statistics batch: funnel / cohort / moments / pareto.

The oracle sweep (tools/check_oracle.py) certifies SQL parity on the
testdata; these tests pin the SEMANTICS on adversarial synthetic inputs
— the greedy funnel chain vs a brute-force sequence scan, cohort offsets
under craftily-ordered events, variance reconstruction from the raw
moments, and the pareto running total.
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.analytics import (
    grouped_min,
    q_cohort_retention,
    q_funnel_stages,
    q_pareto_sources,
    q_value_moments_by_type,
)

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _brute_funnel(rows, chain=("view", "click", "purchase")):
    """Reference: user qualifies at stage k iff SOME STRICTLY-increasing
    (in ts) subsequence of their events matches chain[:k] — equal
    timestamps across adjacent stages do NOT chain, mirroring the
    product's ts > t_prev."""
    counts = [0] * len(chain)
    by_user = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((ts, t))
    for evs in by_user.values():
        evs.sort()
        best = 0
        last_ts = None
        # greedy earliest-transition is optimal for strict-subsequence match
        for ts, t in evs:
            if best < len(chain) and t == chain[best] and (last_ts is None or ts > last_ts):
                best += 1
                last_ts = ts
        for k in range(best):
            counts[k] += 1
    return counts


def test_funnel_greedy_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = []
    for u in range(60):
        n = rng.integers(1, 9)
        types = rng.choice(["view", "click", "purchase", "error"], size=n)
        stamps = np.sort(rng.choice(10**7, size=n, replace=False))
        for t, s in zip(types, stamps):
            rows.append((u, str(t), base + int(s)))
    # adversarial user: click BEFORE first view, purchase before second click
    rows += [
        (1000, "click", base + 1),
        (1000, "view", base + 2),
        (1000, "purchase", base + 3),
        (1000, "click", base + 4),
    ]
    rows += [(1001, "view", base + 1), (1001, "click", base + 1)]  # tie ts: NOT strictly after
    sf = _write_events(tmp_path, rows)
    got = q_funnel_stages(sf).to_pandas()
    assert list(got["users"]) == _brute_funnel(rows)
    # user 1000 has no click-after-view→purchase-after-that chain ending in purchase
    assert _brute_funnel([r for r in rows if r[0] == 1000])[2] == 0


def test_cohort_retention_offsets(tmp_path):
    base = pd.Timestamp("2024-01-01")  # a Monday
    rows = []
    # user 0: weeks 0 and 2 of cohort week0; user 1: cohort week1 only;
    # user 2: two events inside ONE week → a single (user, week) pair
    rows.append((0, "view", (base + pd.Timedelta(days=2)).value // 1000))
    rows.append((0, "view", (base + pd.Timedelta(days=15)).value // 1000))
    rows.append((1, "view", (base + pd.Timedelta(days=8)).value // 1000))
    rows.append((2, "view", (base + pd.Timedelta(days=1)).value // 1000))
    rows.append((2, "view", (base + pd.Timedelta(days=3)).value // 1000))
    sf = _write_events(tmp_path, rows)
    got = q_cohort_retention(sf).to_pandas().sort_values(["cohort", "offset_weeks"]).reset_index(drop=True)
    w0, w1 = base, base + pd.Timedelta(days=7)
    want = pd.DataFrame(
        {
            "cohort": [w0, w0, w1],
            "offset_weeks": [0, 2, 0],
            "users": [2, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({"cohort": "datetime64[ns]", "offset_weeks": "int64", "users": "int64"}), want
    )


def test_moments_reconstruct_variance():
    t = q_value_moments_by_type(SF).to_pandas()
    import duckdb

    ref = duckdb.sql(
        f"SELECT event_type, var_pop(round(value*100)) AS v FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).df()
    merged = t.merge(ref, on="event_type")
    var = (merged["n"] * merged["sumsq_cents"] - merged["sum_cents"] ** 2) / merged["n"] ** 2
    assert np.allclose(var, merged["v"], rtol=1e-9)


def test_pareto_cumsum_covers_total():
    t = q_pareto_sources(SF).to_pandas()
    assert (t["chars"] > 0).all()
    assert t["cum_chars"].iloc[-1] == t["chars"].sum()
    # running total is over chars DESC: increments are non-increasing
    inc = np.diff(t["cum_chars"].to_numpy(), prepend=0)
    assert (np.diff(inc) <= 0).all()


def test_grouped_min_merges_across_blocks():
    t = pa.table({"k": pa.array([1, 2, 1, 2, 1], pa.int64()), "v": pa.array([5, 3, 1, 9, 2], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)  # force per-block partials
    got = grouped_min(ds, "k", "v", "m").to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["m"]) == [1, 3]
