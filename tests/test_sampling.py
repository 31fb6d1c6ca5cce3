"""Deterministic sampling: membership is a pure row-local hash decision,
so results must be identical under any partitioning, rates must land
near their targets, and the stratified quota must be exact."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from fscrawler_ray.pipelines.sampling import (
    KNUTH32,
    stratified_sample,
    weighted_mixture,
)

SF = "/root/testdata/sf0.001"


def _docs_ds(n_blocks=1):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_mixture_is_partition_invariant_and_rate_accurate():
    rates = {"en": 0.5, "fr": 0.25}
    a = weighted_mixture(_docs_ds(), rates).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = weighted_mixture(_docs_ds(7), rates).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    for lang, r in rates.items():
        n_in = (full["lang"] == lang).sum()
        n_out = (a["lang"] == lang).sum()
        assert abs(n_out / n_in - r) < 0.1, (lang, n_out, n_in)
    # default rate 1.0: unlisted strata pass through untouched
    for lang in set(full["lang"]) - set(rates):
        assert (a["lang"] == lang).sum() == (full["lang"] == lang).sum()


def test_mixture_membership_matches_hash_rule():
    rates = {"en": 0.5}
    out = weighted_mixture(_docs_ds(), rates).to_pandas()
    en = out[out["lang"] == "en"]["doc_id"].to_numpy().astype(np.int64)
    h = (en.astype(np.uint64) * np.uint64(KNUTH32)) & np.uint64(0xFFFFFFFF)
    assert (h < np.uint64(1 << 31)).all()


def test_stratified_quota_exact_and_partition_invariant():
    a = stratified_sample(_docs_ds(), 7).to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True)
    b = stratified_sample(_docs_ds(9), 7).to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    counts = a.groupby("lang")["doc_id"].count()
    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    for lang, n in full["lang"].value_counts().items():
        assert counts[lang] == min(7, n)
    # rnk follows hash order within each stratum
    for _, g in a.groupby("lang"):
        ids = g.sort_values("rnk")["doc_id"].to_numpy().astype(np.int64)
        h = (ids.astype(np.uint64) * np.uint64(KNUTH32)) & np.uint64(0xFFFFFFFF)
        assert (np.diff(h.astype(np.int64)) >= 0).all()


def test_stratified_small_group_returns_all_rows():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "lang": pa.array(["xx"] * 3)})
    out = stratified_sample(ray.data.from_arrow(t), 10).to_pandas()
    assert len(out) == 3 and sorted(out["rnk"]) == [1, 2, 3]


def test_train_test_split_deterministic_and_leakage_safe(tmp_path, ray_session):
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.analytics import q_train_test_split

    n = 400
    src = ["s%d" % (i % 7) for i in range(n)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "source": pa.array(src)}),
        tmp_path / "documents.parquet",
    )
    df = q_train_test_split(str(tmp_path)).to_pandas()
    # per-source split is leakage-safe: one side per source
    per_src = df.assign(source=src).groupby("source")["source_split"].nunique()
    assert (per_src == 1).all()
    # doc split matches the multiplicative-hash rule exactly
    for r in df.itertuples():
        expect = "train" if (r.doc_id * 2654435761) % (1 << 32) < (90 << 32) // 100 else "test"
        assert r.doc_split == expect
    # source rule matches md5-prefix comparison
    for s in set(src):
        want = "train" if hashlib.md5(s.encode()).hexdigest()[:8] < "e6666666" else "test"
        got = df.assign(source=src).loc[lambda d: d["source"] == s, "source_split"].iloc[0]
        assert got == want
    # both splits are roughly 90/10 on the doc side
    assert 0.75 <= (df["doc_split"] == "train").mean() <= 1.0


def test_weighted_reservoir_partition_invariant_and_weight_biased():
    """ES A-Res: identical under any partitioning; weights steer inclusion
    (a group where one row holds ~all the weight must sample that row)."""
    from fscrawler_ray.pipelines.sampling import weighted_reservoir_by_key

    def ds(n_blocks):
        t = pa.table(
            {
                "k": pa.array(["a"] * 200 + ["b"] * 200),
                "id": pa.array(np.arange(400, dtype=np.int64)),
                "w": pa.array(
                    # group a: uniform weights; group b: row 200 dominates
                    np.r_[np.full(200, 1.0), np.r_[1e6, np.full(199, 0.001)]]
                ),
            }
        )
        d = ray.data.from_arrow(t)
        return d.repartition(n_blocks) if n_blocks > 1 else d

    a = weighted_reservoir_by_key(ds(1), "k", "id", "w", 5).to_pandas()
    b = weighted_reservoir_by_key(ds(9), "k", "id", "w", 5).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["k", "rnk"]).reset_index(drop=True),
        b.sort_values(["k", "rnk"]).reset_index(drop=True),
    )
    assert len(a) == 10 and set(a["k"]) == {"a", "b"}
    bgrp = a[a["k"] == "b"]
    assert int(bgrp[bgrp["rnk"] == 1]["id"].iloc[0]) == 200  # dominant weight wins rank 1


def test_epoch_shuffle_is_a_balanced_permutation():
    """(shard, pos) must be a bijection onto shard-local 0..n_s-1 ranges,
    invariant to input partitioning, and a different seed must produce a
    genuinely different permutation."""
    from fscrawler_ray.pipelines.sampling import EPOCH_SHARDS, epoch_shuffle

    def run(n_blocks=1, seed="ep1"):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        return (
            epoch_shuffle(ds, seed=seed)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run()
    b = run(n_blocks=7)
    pd.testing.assert_frame_equal(a, b)
    n = len(a)
    assert sorted(a["doc_id"]) == sorted(pd.read_parquet(f"{SF}/documents.parquet")["doc_id"])
    # per shard: pos is exactly 0..count-1 (no gaps, no dupes)
    for s, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g))), s
    # shards are hash-balanced: no shard more than 2x the mean
    sizes = a["shard"].value_counts()
    assert len(sizes) == EPOCH_SHARDS
    assert sizes.max() < 2 * n / EPOCH_SHARDS
    # another seed reshuffles: same ids, different (shard, pos) for most
    c = run(seed="ep2")
    moved = ((a["shard"] != c["shard"]) | (a["pos"] != c["pos"])).mean()
    assert moved > 0.8, moved


def test_kfold_is_stratified_balanced(ray_session):
    """Per stratum, fold sizes differ by <= 1; assignment is deterministic
    and partition-invariant."""
    from fscrawler_ray.pipelines.analytics import q_kfold_assign

    a = q_kfold_assign(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_kfold_assign(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    for lang, g in a.groupby("lang"):
        sizes = g["fold"].value_counts()
        assert sizes.max() - sizes.min() <= 1, (lang, sizes)
    assert set(a["fold"]) == set(range(5))


def test_temperature_mixture_rebalances_toward_rare(ray_session):
    """alpha<1 keeps the rarest language at ~rate 1 and downsamples the
    most common hardest; deterministic and partition-invariant."""
    from fscrawler_ray.pipelines.sampling import temperature_mixture

    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])

    def run(n_blocks=1):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        return temperature_mixture(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    a, b = run(), run(7)
    pd.testing.assert_frame_equal(a, b)
    n_in = full["lang"].value_counts()
    n_out = a["lang"].value_counts()
    rates = (n_out / n_in).dropna()
    rare, common = n_in.idxmin(), n_in.idxmax()
    assert rates[rare] > 0.9  # rarest kept near rate 1
    assert rates[common] < rates[rare]  # most common downsampled hardest


def test_split_assign_deterministic_and_ratio(ray_session):
    import numpy as np
    import pyarrow as pa

    from fscrawler_ray.pipelines.sampling import VAL_PERMILLE, split_of_ids

    ids = pa.array(np.arange(20_000, dtype=np.int64))
    s1 = split_of_ids(ids).to_pylist()
    s2 = split_of_ids(ids).to_pylist()
    assert s1 == s2  # pure function of the id
    frac = s1.count("val") / len(s1)
    assert abs(frac - VAL_PERMILLE / 1000) < 0.02  # salted hash is uniform


def test_split_leakage_is_cross_split_subset_of_pairs(ray_session):
    from fscrawler_ray.pipelines.dedup import ngram_jaccard_exact
    from fscrawler_ray.pipelines.sampling import q_split_leakage_audit, split_of_ids

    sf = "/root/testdata/sf0.001"
    leak = q_split_leakage_audit(sf)
    allp = ngram_jaccard_exact(sf)
    pairs = set(zip(allp.column("doc_a").to_pylist(), allp.column("doc_b").to_pylist()))
    for a, b, sa, sb in zip(
        leak.column("doc_a").to_pylist(),
        leak.column("doc_b").to_pylist(),
        leak.column("split_a").to_pylist(),
        leak.column("split_b").to_pylist(),
    ):
        assert (a, b) in pairs
        assert sa != sb
        import pyarrow as pa

        assert split_of_ids(pa.array([a]))[0].as_py() == sa


def test_split_repair_eliminates_leakage(ray_session):
    """After repair, re-auditing with the repaired assignment finds zero
    cross-split near-dup pairs (flipping val->train cannot create new
    leakage)."""
    from fscrawler_ray.pipelines.dedup import ngram_jaccard_exact
    from fscrawler_ray.pipelines.sampling import q_split_repair

    sf = "/root/testdata/sf0.001"
    rep = q_split_repair(sf).to_pandas().set_index("doc_id")["split"]
    pairs = ngram_jaccard_exact(sf)
    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        assert rep[a] == rep[b] or "val" not in (rep[a], rep[b])


def test_mixture_token_budget_conserves_budget(ray_session):
    from fscrawler_ray.pipelines.sampling import TOKEN_BUDGET, q_mixture_token_budget

    t = q_mixture_token_budget("/root/testdata/sf0.001").to_pandas()
    assert (t["target_tokens"] <= t["avail_tokens"]).all()
    assert t["target_tokens"].sum() <= TOKEN_BUDGET
    assert (t["rate_micro"] <= 1_000_000).all()
