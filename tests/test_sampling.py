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
