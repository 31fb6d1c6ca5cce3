"""Ranking windows (ntile / percent_rank / cume_dist), collect-list
string_agg, and LEAD transition counts — semantics pinned on adversarial
synthetic inputs (tie ranks, ntile remainder rule, single-row partitions,
ts ties broken by event_id); the oracle sweep certifies SQL parity."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.pipelines.analytics import (
    q_customer_balance_windows,
    q_event_transitions,
    q_lang_list_by_source,
)


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")


def _rows(res):
    t = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(t, pa.Table):
        t = t.to_pandas()
    return t


def test_balance_windows_ties_remainder_singleton(tmp_path):
    # nation 7: 5 rows over 4 tiles (remainder → first tile gets 2);
    # two ties at 200 share competition rank; nation 8: single row (pr=0).
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
            "c_nationkey": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
            "c_acctbal": pa.array([1.0, 2.0, 2.0, 3.0, 4.0, 5.0]),
        },
    )
    df = _rows(q_customer_balance_windows(str(tmp_path))).set_index("c_custkey").sort_index()
    assert list(df["quartile"]) == [1, 1, 2, 3, 4, 1]
    # ranks in nation 7: 1, 2, 2, 4, 5 → pr = (rank-1)/4
    assert list(df["pr"]) == [0.0, 0.25, 0.25, 0.75, 1.0, 0.0]
    # cume_dist: rows ≤ value over n
    assert list(df["cd"]) == [0.2, 0.6, 0.6, 0.8, 1.0, 1.0]


def test_lang_roster_sorted_distinct(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "source": pa.array(["s1", "s1", "s1", "s2"]),
            "lang": pa.array(["fr", "en", "fr", "zh"]),
        },
    )
    df = _rows(q_lang_list_by_source(str(tmp_path))).set_index("source")
    assert df.loc["s1", "langs"] == "en,fr" and df.loc["s1", "n_langs"] == 2
    assert df.loc["s2", "langs"] == "zh" and df.loc["s2", "n_langs"] == 1


def test_event_transitions_tie_broken_by_event_id(tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    # user 1: a→b→b (two ts-tied rows ordered by event_id); user 2: single
    # event contributes nothing.
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([10, 11, 12, 20], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([t0, t0 + dt.timedelta(seconds=1), t0 + dt.timedelta(seconds=1), t0], pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "b", "c"]),
        },
    )
    df = _rows(q_event_transitions(str(tmp_path)))
    got = {(r.a, r.b): r.n for r in df.itertuples()}
    assert got == {("a", "b"): 1, ("b", "b"): 1}


def test_events_hopping_window_coverage(tmp_path):
    # an event at minute 45 covers windows starting at :30 and :00; an
    # event exactly on a hop boundary covers its own window and the prior
    t0 = dt.datetime(2024, 1, 1, 0, 45)
    t1 = dt.datetime(2024, 1, 1, 1, 0)
    pq_cols = {
        "event_type": pa.array(["x", "x"]),
        "ts": pa.array([t0, t1], pa.timestamp("us")),
        "value": pa.array([1.0, None], pa.float64()),
    }
    pq.write_table(pa.table(pq_cols), tmp_path / "events.parquet")
    from fscrawler_ray.pipelines.analytics import q_events_hopping

    df = _rows(q_events_hopping(str(tmp_path))).sort_values("win_us").reset_index(drop=True)
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1e6)
    m30 = 1_800_000_000
    got = {int(r.win_us): (r.cnt, r.total_cents) for r in df.itertuples()}
    # windows: 0:00(covers 0:45? window [start, start+60) → 0:00 window covers 0:45 ✓)
    assert got == {
        base + 0 * m30: (1, 100),   # event@0:45 (window 0:00-1:00)
        base + 1 * m30: (2, 100),   # both events (0:30-1:30)
        base + 2 * m30: (1, 0),     # null-value event@1:00 (1:00-2:00)
    }


def test_balance_windows_cross_bucket_scan(tmp_path):
    """Force the two-level scan across MANY value buckets (bucket_cents=100)
    and check against the single-partition brute force."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 60
    keys = np.arange(1, n + 1, dtype=np.int64)
    nat = (keys % 3).astype(np.int64)
    bal = rng.integers(-300, 300, n) / 100.0  # cents span several 100-buckets
    pq.write_table(
        pa.table({"c_custkey": pa.array(keys), "c_nationkey": pa.array(nat), "c_acctbal": pa.array(bal)}),
        tmp_path / "customer.parquet",
    )
    from fscrawler_ray.pipelines.analytics import q_customer_balance_windows

    df = _rows(q_customer_balance_windows(str(tmp_path), bucket_cents=100)).sort_values("c_custkey")
    # brute force per nation
    import pandas as pd

    cents = np.round(bal * 100).astype(np.int64)
    ref = pd.DataFrame({"k": keys, "nat": nat, "c": cents})
    for _, g in ref.groupby("nat"):
        g = g.sort_values(["c", "k"]).reset_index(drop=True)
        m = len(g)
        q, rem = divmod(m, 4)
        sizes = [q + 1] * rem + [q] * (4 - rem)
        tile = np.repeat(np.arange(1, 5), sizes)[:m]
        vals = g["c"].to_numpy()
        rank = np.searchsorted(vals, vals, "left") + 1
        cume = np.searchsorted(vals, vals, "right")
        sub = df[df["c_nationkey"] == g["nat"].iat[0]].set_index("c_custkey")
        for i, row in g.iterrows():
            got = sub.loc[row["k"]]
            assert got["quartile"] == tile[i]
            assert got["pr"] == ((rank[i] - 1) / (m - 1) if m > 1 else 0.0)
            assert got["cd"] == cume[i] / m


def test_rolling_wau_window_semantics(tmp_path):
    import numpy as np

    base = dt.datetime(2024, 3, 1)
    # user 1 on day 0 and day 3 (distinct ONCE in any window holding both);
    # user 2 on day 0 only; day 7 is outside day 0's window; day 8 only
    # sees day 3's (user 1) not day 0's users... and itself (user 3)
    rows = [
        (1, base),
        (1, base),  # same-day duplicate collapses
        (2, base),
        (1, base + dt.timedelta(days=3)),
        (3, base + dt.timedelta(days=8)),
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        ),
        tmp_path / "events.parquet",
    )
    from fscrawler_ray.pipelines.analytics import q_rolling_wau

    df = _rows(q_rolling_wau(str(tmp_path))).sort_values("day").reset_index(drop=True)
    days = [(d - np.datetime64(base)).astype("timedelta64[D]").astype(int) for d in df["day"].to_numpy()]
    got = dict(zip(days, df["wau"]))
    # only OBSERVED days appear (0, 3, 8), never invented future days
    assert got == {0: 2, 3: 2, 8: 2}  # day 8 window [2..8] holds users {1, 3}
