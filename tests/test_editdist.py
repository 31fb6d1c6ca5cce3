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
