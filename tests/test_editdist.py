"""Vectorized Levenshtein kernel vs a scalar reference DP (fuzz incl.
empty strings and chunk boundaries) + the fuzzy-join pipeline on planted
near-miss names."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_ray.functions.editdist import levenshtein_pairs
from fscrawler_ray.pipelines.editdist import q_similar_part_names, similar_name_pairs


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return dp[lb]


def test_kernel_matches_reference_fuzz():
    rng = np.random.default_rng(11)
    alpha = list("abcde ")
    strs = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(300)]
    strs += ["", "", "a"]  # empties on both sides
    a = rng.choice(strs, 500).astype(object)
    b = rng.choice(strs, 500).astype(object)
    got = levenshtein_pairs(a, b, chunk=128)  # multiple chunks
    want = np.array([_ref_lev(x, y) for x, y in zip(a, b)])
    assert (got == want).all()


def test_kernel_edge_shapes():
    assert levenshtein_pairs(np.array([], object), np.array([], object)).tolist() == []
    assert levenshtein_pairs(np.array(["", "abc"], object), np.array(["xy", ""], object)).tolist() == [2, 3]


def test_similar_pairs_planted(tmp_path, ray_session):
    # brand B1: "red widget"/"red gadget" (dist 2), "red widget"/"red widgets"
    # (dist 1), "zzzzzzzzzz" matches nothing; the length band drops the
    # long-vs-short comparison before any DP; brand B2 isolates its rows.
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "p_brand": pa.array(["B1", "B1", "B1", "B1", "B2"]),
                "p_name": pa.array(["red widget", "red gadget", "red widgets", "tiny", "red widget"]),
            }
        ),
        tmp_path / "part.parquet",
    )
    df = q_similar_part_names(str(tmp_path)).to_pandas()
    got = sorted(zip(df["partkey_a"], df["partkey_b"], df["dist"]))
    assert got == [(1, 2, 2), (1, 3, 1)]  # gadget→widgets is 3, over the cap


def _pairs_set(df):
    return set(zip(df["id_a"], df["id_b"], df["dist"]))


def test_composite_length_blocking_equivalence(ray_session):
    """Banded (key, len-bucket) blocking emits EXACTLY the key-only pair
    set — incl. pairs straddling a bucket boundary (ghost path) — and
    never emits a pair twice."""
    import ray

    rng = np.random.default_rng(7)
    alpha = list("ab")
    names = ["".join(rng.choice(alpha, rng.integers(3, 21))) for _ in range(250)]
    # planted boundary-straddlers for B=8: len 7 vs len 9, dist 2
    names += ["aaaaaaa", "aaaaaaaaa", "bbbbbbbb"]
    n = len(names)
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "k": pa.array(["hot"] * n),
            "name": pa.array(names),
        }
    )
    ds = ray.data.from_arrow(t)
    banded = similar_name_pairs(ds, "k", "id", "name", max_dist=2, len_bucket=8).to_pandas()
    plain = similar_name_pairs(
        ray.data.from_arrow(t), "k", "id", "name", max_dist=2, len_bucket=None
    ).to_pandas()
    assert len(banded) == len(_pairs_set(banded))  # no duplicate emission
    assert _pairs_set(banded) == _pairs_set(plain)
    # the planted boundary pair (len 7 vs 9, buckets 0 vs 1) must survive
    assert (n - 3, n - 2, 2) in _pairs_set(banded)


def test_hot_key_group_size_is_bounded(ray_session):
    """One hot brand must shard across length buckets: no single
    map_groups group sees more than home+ghost of two adjacent buckets
    (the anti-funnel property the module docstring promises)."""
    import ray

    rng = np.random.default_rng(3)
    lens = rng.integers(5, 61, size=400)
    names = ["x" * int(l) for l in lens]
    B = 8
    t = pa.table(
        {
            "id": pa.array(range(len(names)), pa.int64()),
            "k": pa.array(["hot"] * len(names)),
            "name": pa.array(names),
        }
    )
    # group sizes under the composite key: home copies of bucket g + ghost
    # copies from bucket g-1
    home = np.bincount(lens // B)
    sizes = home + np.r_[0, home[:-1]]
    assert sizes.max() < len(names) // 2  # sharded, not funneled
    out = similar_name_pairs(
        ray.data.from_arrow(t), "k", "id", "name", max_dist=2, len_bucket=B
    ).to_pandas()
    # equal-length all-x names are dist 0; |Δlen|≤2 pairs have dist Δlen
    want = {
        (i, j, abs(int(lens[i]) - int(lens[j])))
        for i in range(len(lens))
        for j in range(i + 1, len(lens))
        if abs(int(lens[i]) - int(lens[j])) <= 2
    }
    assert _pairs_set(out) == want


def test_part_entities_canonical_is_component_min(tmp_path, ray_session):
    """Planted fuzzy clusters resolve to min-partkey canonicals through
    the composed blocking -> verify -> CC pipeline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.editdist import q_part_entities

    # cluster A: 3 near-miss names (chain), cluster B: 2, one singleton
    rows = [
        (10, "B1", "widget alpha"),
        (11, "B1", "widget alphb"),   # dist 1 to 10
        (12, "B1", "widget alphbc"),  # dist 1 to 11, 2 to 10
        (20, "B1", "gizmo omega"),
        (21, "B1", "gizmo omegb"),    # dist 1 to 20
        (30, "B2", "widget alpha"),   # same name, other brand: no edge
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_brand": pa.array([r[1] for r in rows]),
                "p_name": pa.array([r[2] for r in rows]),
            }
        ),
        tmp_path / "part.parquet",
    )
    out = q_part_entities(str(tmp_path)).to_pandas()
    got = dict(zip(out["partkey"], out["canonical"]))
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}  # singleton absent
