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
