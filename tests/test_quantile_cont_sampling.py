"""grouped_quantile_cont semantics + uniform_sample invariance + entropy."""

import numpy as np
import pyarrow as pa

import ray

from fscrawler_ray.functions.quantiles import grouped_quantile_cont
from fscrawler_ray.pipelines.sampling import uniform_sample

SF = "/root/testdata/sf0.001"


def _ds(keys, vals, blocks=4):
    t = pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.float64())})
    return ray.data.from_arrow(t).repartition(blocks)


def test_quantile_cont_matches_numpy_interpolation():
    rng = np.random.default_rng(3)
    keys, vals = [], []
    for k, n in (("a", 7), ("b", 8), ("c", 1), ("d", 101)):
        keys += [k] * n
        vals += list(rng.normal(size=n) * 100)
    got = grouped_quantile_cont(_ds(keys, vals), "k", "v", 1, 2, out="med").to_pandas()
    got = dict(zip(got["k"], got["med"]))
    for k in "abcd":
        ref = np.quantile(np.array([v for kk, v in zip(keys, vals) if kk == k]), 0.5)
        assert abs(got[k] - ref) < 1e-12, k


def test_quantile_cont_dyadic_q_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(11)
    keys = list(rng.choice(["x", "y", "z"], size=300))
    vals = list(np.round(rng.normal(size=300) * 50, 2))
    for num, den in ((1, 2), (1, 4), (3, 4)):
        got = grouped_quantile_cont(_ds(keys, vals), "k", "v", num, den).to_pandas()
        want = duckdb.sql(
            f"SELECT k, quantile_cont(v, {num}/{den}::DOUBLE) AS q FROM "
            "(SELECT unnest($1::VARCHAR[]) AS k, unnest($2::DOUBLE[]) AS v)"
            " GROUP BY k",
            params=[keys, vals],
        ).df()
        m = got.merge(want, on="k")
        assert len(m) == 3
        assert np.allclose(m["q_value"], m["q"], rtol=1e-13)


def test_quantile_cont_forced_narrowing_exact():
    # n >> collect_limit forces at least one histogram level before the
    # final candidate collection
    rng = np.random.default_rng(5)
    vals = list(rng.uniform(-1000, 1000, size=5000))
    keys = ["g"] * 5000
    got = grouped_quantile_cont(
        _ds(keys, vals, blocks=8), "k", "v", 1, 2, collect_limit=100, max_levels=4
    ).to_pandas()
    assert abs(got["q_value"][0] - np.quantile(np.array(vals), 0.5)) < 1e-12


def test_uniform_sample_partition_invariant_and_deterministic():
    ids = pa.table({"doc_id": pa.array(np.arange(1, 2001), pa.int64())})
    a = uniform_sample(ray.data.from_arrow(ids).repartition(2), 32).to_pandas()
    b = uniform_sample(ray.data.from_arrow(ids).repartition(17), 32).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["rnk"]) == list(range(1, 33))
    # a sample over a SUPERSET keeps the surviving members' relative order
    c = uniform_sample(ray.data.from_arrow(ids.slice(0, 1000)).repartition(3), 32).to_pandas()
    kept = [d for d in a["doc_id"] if d <= 1000]
    assert list(c["doc_id"])[: len(kept)] != [] and set(kept) <= set(c["doc_id"])


def test_entropy_bounds():
    from fscrawler_ray.pipelines.analytics import q_user_event_entropy

    t = q_user_event_entropy(SF).to_pandas()
    assert (t["entropy"] >= -1e-12).all()
    assert (t["entropy"] <= np.log(5) + 1e-12).all()  # 5 event types


def test_top_tokens_by_lang_partition_invariant():
    from fscrawler_ray.pipelines.textops import q_top_tokens_by_lang

    a = (
        q_top_tokens_by_lang(SF)
        .to_pandas()
        .sort_values(["lang", "rnk"])
        .reset_index(drop=True)
    )
    # ranks are a contiguous 1..k prefix per language, counts non-increasing
    for lang, g in a.groupby("lang"):
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["cnt"].to_numpy()) <= 0).all()


def test_quantile_cont_empty_and_all_null_input():
    t = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})
    got = grouped_quantile_cont(ray.data.from_arrow(t), "k", "v", 1, 2, out="med")
    assert got.num_rows == 0 and "med" in got.column_names
    t2 = pa.table({"k": pa.array(["a", "a"]), "v": pa.array([None, None], pa.float64())})
    got2 = grouped_quantile_cont(ray.data.from_arrow(t2), "k", "v", 1, 2, out="med")
    assert got2.num_rows == 0


def test_quantile_cont_rank_pair_straddles_bin_boundary():
    # even n with values engineered so the two middle order statistics
    # land in DIFFERENT histogram bins during forced narrowing — the
    # boundary-resolution path (vmax of lo bin / vmin of next bin)
    vals = list(np.linspace(0.0, 1.0, 1000))  # n=1000: ranks 500, 501
    got = grouped_quantile_cont(
        _ds(["g"] * 1000, vals, blocks=8), "k", "v", 1, 2,
        collect_limit=10, max_levels=6, n_bins=4,
    ).to_pandas()
    assert abs(got["q_value"][0] - np.quantile(np.array(vals), 0.5)) < 1e-12


def test_mixture_waterfill_conservation_and_clamping(tmp_path):
    """Water-filling: quotas conserve min(budget, total); a language
    below the level clamps at its availability; everyone unclamped gets
    the same level ±1 (bonus slots)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.sampling import q_mixture_waterfill

    rows = []
    for lang, n_docs, words in (("aa", 2, 5), ("bb", 3, 100), ("cc", 3, 100)):
        for i in range(n_docs):
            rows.append((lang, " ".join(["w"] * words)))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    # availability: aa=10, bb=300, cc=300 (total 610)
    out = q_mixture_waterfill(str(tmp_path), budget=100).to_pandas().set_index("lang")
    assert int(out["quota"].sum()) == 100  # budget < total -> exact budget
    assert out.loc["aa", "clamped"] == 1 and out.loc["aa", "quota"] == 10
    # remaining 90 across bb/cc: level 45 each
    assert out.loc["bb", "quota"] + out.loc["cc", "quota"] == 90
    assert abs(int(out.loc["bb", "quota"]) - int(out.loc["cc", "quota"])) <= 1

    # budget above total availability: everyone clamps, quota == avail
    out2 = q_mixture_waterfill(str(tmp_path), budget=10_000).to_pandas()
    assert (out2["quota"] == out2["available"]).all()
    assert (out2["clamped"] == 1).all()


def test_split_psi_drift_healthy_split_near_zero():
    """A hash split over a covariate it ignores must read near-zero PSI
    (the healthy-split certificate); totals partition the corpus."""
    from fscrawler_ray.pipelines.sampling import q_split_psi_drift

    out = q_split_psi_drift("/root/testdata/sf0.01").to_pandas()
    import duckdb

    n_docs = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchone()[0]
    assert int(out["n_train"].sum() + out["n_val"].sum()) == n_docs
    # classic alarm threshold is 0.2 (200000 micro); the hash split
    # stays under it even summed across bins (the val side is small, so
    # smoothing noise dominates the per-bin terms)
    assert int(out["psi_micro"].abs().sum()) < 200_000
