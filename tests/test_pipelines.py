"""Pipeline-level tests: flagship invariants, dedup correctness, ANN recall,
and driver-contract smoke (entry/queries/oracle_sql)."""

import numpy as np
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    t = ds.take_batch(200, batch_format="pyarrow")
    assert t.num_rows > 0
    assert pc.all(t.column("decode_ok")).as_py()
    assert pc.all(t.column("phash_match")).as_py()
    assert pc.all(t.column("verify_ok")).as_py()


def test_queries_have_oracles_subset():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls).issubset(set(qs))
    # a healthy majority of queries are SQL-checkable
    assert len(sqls) >= 30
    assert len(qs) >= 40


def test_exact_dedup_docs_keeps_firsts():
    from fscrawler_ray.pipelines.analytics import q_exact_dedup_docs

    t = q_exact_dedup_docs(SF).to_pandas()
    assert len(t) == 500  # sf0.001 documents are all distinct
    assert (t["copies"] == 1).all()


def test_phash_dedup_finds_planted_dups():
    from fscrawler_ray.pipelines.dedup import phash_dedup
    from fscrawler_ray.sources.images import images_dataset

    ds = images_dataset(512, seed=42)
    groups = phash_dedup(ds).to_pandas()
    assert len(groups) > 0  # ~5% planted duplicate payloads collide
    assert (groups["copies"] > 1).all()
    # keeper is the lexicographically-first image_id of each group
    assert groups["keeper_image_id"].str.startswith("img_").all()


def test_minhash_detects_planted_neardup(tmp_path):
    """Plant an explicit near-duplicate pair in a small parquet table and
    verify the LSH pipeline surfaces it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill "
        "and the rain falls gently on the quiet empty street below the old clock tower"
    )
    near = base.replace("rain", "snow")
    texts = [base, near] + [f"unrelated document number {i} about systems " + " ".join(f"w{i}{j}" for j in range(25)) for i in range(30)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    pairs = minhash_lsh_pairs(str(d), jaccard_threshold=0.5).to_pandas()
    assert ((pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)).any()
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_pairs_symmetric_schema():
    from fscrawler_ray.pipelines.dedup import simhash_pairs

    t = simhash_pairs(SF).to_pandas()
    assert list(t.columns) == ["doc_a", "doc_b", "hamming"]
    if len(t):
        assert (t["doc_a"] < t["doc_b"]).all()
        assert (t["hamming"] <= 3).all()


def test_knn_ivf_recall_vs_bruteforce():
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_ivf

    bf = knn_bruteforce(SF, n_queries=4, k=10).to_pandas()
    ivf = knn_ivf(SF, n_queries=4, k=10, n_centroids=8, nprobe=4).to_pandas()
    recall = []
    for q in bf["query_id"].unique():
        b = set(bf[bf["query_id"] == q]["vec_id"])
        a = set(ivf[ivf["query_id"] == q]["vec_id"])
        recall.append(len(a & b) / len(b))
    assert np.mean(recall) >= 0.5, recall


def test_thumbnail_stage_shapes():
    import ray

    from fscrawler_ray.sources.images import images_dataset
    from fscrawler_ray.stages.image_stages import ThumbnailStage

    ds = images_dataset(64).map_batches(ThumbnailStage, batch_format="pyarrow", batch_size=32, concurrency=2)
    t = ds.take_batch(64, batch_format="pyarrow")
    assert pc.max(t.column("thumb_w")).as_py() <= 64
    assert pc.max(t.column("thumb_h")).as_py() <= 64
    assert pc.min(t.column("thumb_w")).as_py() >= 1
    # thumbnails decode with our codec
    from fscrawler_ray.functions.codecs import decode

    img, w, h, fmt = decode(t.column("thumb")[0].as_py())
    assert fmt == "png" and w <= 64 and h <= 64
    _ = ray


def test_thumbnail_external_codec_is_stubbed():
    from fscrawler_ray.stages.image_stages import ThumbnailStage

    with pytest.raises(NotImplementedError):
        ThumbnailStage(codec="pillow")


def _pairkey(df, a="doc_a", b="doc_b"):
    return sorted(map(tuple, df[[a, b]].to_numpy().tolist()))


def test_minhash_distributed_path_matches_driver_path():
    """The DEFAULT path is now distributed (join-based verification); it
    must produce the same pair set + jaccard values as the driver path."""
    from fscrawler_ray.pipelines.dedup import minhash_lsh_pairs

    from tests.driver_baselines import minhash_pairs_driver

    dist = minhash_lsh_pairs(SF).to_pandas()  # package path = distributed
    drv = minhash_pairs_driver(SF).to_pandas()
    assert _pairkey(dist) == _pairkey(drv)
    d = dist.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    v = drv.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert np.allclose(d["jaccard"], v["jaccard"])


def test_simhash_distributed_matches_driver():
    from fscrawler_ray.pipelines.dedup import simhash_pairs

    from tests.driver_baselines import simhash_pairs_driver

    dist = simhash_pairs(SF).to_pandas()
    drv = simhash_pairs_driver(SF).to_pandas()
    assert _pairkey(dist) == _pairkey(drv)
    assert sorted(dist["hamming"]) == sorted(drv["hamming"])


def test_embedding_distributed_matches_driver():
    from fscrawler_ray.pipelines.dedup import embedding_neardup_pairs

    from tests.driver_baselines import embedding_pairs_driver

    dist = embedding_neardup_pairs(SF).to_pandas()
    drv = embedding_pairs_driver(SF).to_pandas()
    # float32 transport in the distributed path: pair sets equal, cosines
    # equal to ~1e-4
    assert _pairkey(dist, "vec_a", "vec_b") == _pairkey(drv, "vec_a", "vec_b")
    d = dist.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    v = drv.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    assert np.allclose(d["cosine"], v["cosine"], atol=1e-4)


def test_phash_neardup_finds_lossy_reencodes(tmp_path):
    """A jpeg re-encode of the same pixels is a NEAR-dup (tiny or zero
    hamming) — banded phash LSH must surface the planted pair."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.functions.codecs import decode, encode, synth_image
    from fscrawler_ray.functions.phash import phash_image
    from fscrawler_ray.pipelines.dedup import phash_neardup_pairs

    rows = []
    for i in range(40):
        img = synth_image(1000 + i, 96, 96)
        buf = encode(img, "png")
        rows.append(("orig_%02d" % i, phash_image(img)))
        if i < 3:  # plant jpeg re-encodes of the first three
            lossy = decode(encode(img, "jpeg"))[0]
            rows.append(("lossy_%02d" % i, phash_image(lossy)))
    t = pa.table({"image_id": pa.array([r[0] for r in rows]), "phash": pa.array([r[1] for r in rows], pa.int64())})
    pairs = phash_neardup_pairs(ray.data.from_arrow(t)).to_pandas()
    found = set(map(tuple, pairs[["image_a", "image_b"]].to_numpy().tolist()))
    for i in range(3):
        a, b = "lossy_%02d" % i, "orig_%02d" % i
        assert (a, b) in found or (b, a) in found, (i, found)
    assert (pairs["hamming"] <= 6).all()


def test_knn_ivf_prunes_partitions(tmp_path):
    """The IVF probe must READ a strict subset of the index partitions
    (IO pruning, not just compute masking) and still hit the recall bar."""
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_ivf

    idx = str(tmp_path / "ivf_idx")
    ivf, stats = knn_ivf(SF, n_queries=4, k=10, n_centroids=8, nprobe=2,
                         index_dir=idx, return_stats=True)
    assert stats["partitions_total"] >= 4
    assert stats["partitions_read"] < stats["partitions_total"], stats
    bf = knn_bruteforce(SF, n_queries=4, k=10).to_pandas()
    ivf = ivf.to_pandas()
    recall = []
    for q in bf["query_id"].unique():
        b = set(bf[bf["query_id"] == q]["vec_id"])
        a = set(ivf[ivf["query_id"] == q]["vec_id"])
        recall.append(len(a & b) / len(b))
    assert np.mean(recall) >= 0.4, recall


def test_copartition_join_matches_broadcast():
    """The big-big co-partitioned join must agree with the broadcast join
    on every row (including left rows with no match for how='left')."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.stages.joins import broadcast_join, copartition_join

    left = pa.table({"k": pa.array([1, 2, 3, 4, 5, 5, 7], pa.int64()),
                     "lv": pa.array(list("abcdeef"))})
    right = pa.table({"k": pa.array([2, 3, 5, 9], pa.int64()),
                      "rv": pa.array([20, 30, 50, 90], pa.int64()),
                      "lv": pa.array(list("WXYZ"))})  # name collision -> suffix
    lds = ray.data.from_arrow(left)
    # semi/anti included: the strategy choice must never change a query's
    # semantics (round-3 review fix — copartition used to silently degrade
    # semi/anti to a left-outer join)
    for how in ("inner", "left", "semi", "anti"):
        bc = broadcast_join(lds, right, on="k", how=how, suffix="_r").to_pandas()
        cp = copartition_join(lds, ray.data.from_arrow(right), on="k", how=how,
                              suffix="_r", n_partitions=4).to_pandas()
        key = lambda df: sorted(map(tuple, df.fillna(-1)[sorted(df.columns)].to_numpy().tolist()))
        assert sorted(bc.columns) == sorted(cp.columns)
        assert key(bc) == key(cp), how


def test_join_front_door_selects_strategy():
    """The auto join() picks broadcast under the threshold and
    co-partition above it — same rows either way."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.stages.joins import join

    left = pa.table({"k": pa.array([1, 2, 3, 5, 5], pa.int64()),
                     "lv": pa.array(list("abcde"))})
    right = pa.table({"k": pa.array([2, 5, 9], pa.int64()),
                      "rv": pa.array([20, 50, 90], pa.int64())})
    lds = ray.data.from_arrow(left)
    for how in ("inner", "left", "semi", "anti"):
        got = {}
        for thr in (64 << 20, 0):  # broadcast path, then forced co-partition
            out = join(lds, ray.data.from_arrow(right), on="k", how=how,
                       broadcast_threshold_bytes=thr).to_pandas()
            got[thr] = sorted(map(tuple, out.fillna(-1)[sorted(out.columns)].to_numpy().tolist()))
        assert got[64 << 20] == got[0], how
    # an in-memory small table goes straight to broadcast
    out = join(lds, right, on="k", how="inner").to_pandas()
    assert len(out) == 3


def test_join_planner_never_executes_lazy_right():
    """The auto planner's size probe must be metadata-only: Ray's public
    size_bytes() EXECUTES a lazy pipeline, so a transformed right side
    must estimate as unknown (→ conservative co-partition) without its
    map_batches ever running (round-3 review fix)."""
    import pyarrow as pa
    import ray

    from fscrawler_ray.stages.joins import _metadata_size_bytes, join

    base = pa.table({"k": pa.array(list(range(16)), pa.int64()),
                     "rv": pa.array([i * 10 for i in range(16)], pa.int64())})
    right = ray.data.from_arrow(base).map_batches(lambda b: b, batch_format="pyarrow")
    # a transformed pipeline has no metadata estimate → planner must treat
    # size as UNKNOWN (conservative co-partition), not execute to find out
    assert _metadata_size_bytes(right) is None

    def boom(self):
        raise AssertionError("join() called the materializing size_bytes()")

    ray.data.Dataset.size_bytes, orig = boom, ray.data.Dataset.size_bytes
    try:
        left = ray.data.from_arrow(pa.table({"k": pa.array([1, 3], pa.int64())}))
        plan = join(left, right, on="k", how="inner")
        assert sorted(plan.to_pandas()["k"].tolist()) == [1, 3]
    finally:
        ray.data.Dataset.size_bytes = orig


def test_ivf_build_idempotent_no_duplicates(tmp_path):
    """Rebuilding into the same index dir must not duplicate vectors
    (crash-safe tmp+rename build; review finding)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.similarity import build_ivf_index

    idx = str(tmp_path / "ivf")
    build_ivf_index(SF, idx, n_centroids=4)
    n1 = sum(pq.ParquetFile(f).metadata.num_rows
             for f in glob.glob(os.path.join(idx, "centroid=*", "*.parquet")))
    build_ivf_index(SF, idx, n_centroids=4)  # second call: no-op via marker
    n2 = sum(pq.ParquetFile(f).metadata.num_rows
             for f in glob.glob(os.path.join(idx, "centroid=*", "*.parquet")))
    emb_rows = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert n1 == n2 == emb_rows


def test_ivf_stale_explicit_index_rejected(tmp_path):
    """ADVICE r02: an explicit index_dir built with different parameters
    must fail loudly instead of silently serving the stale index."""
    import pytest

    from fscrawler_ray.pipelines.similarity import build_ivf_index, knn_ivf

    idx = str(tmp_path / "ivf")
    build_ivf_index(SF, idx, n_centroids=4)
    # matching params load fine
    knn_ivf(SF, n_queries=2, k=3, n_centroids=4, index_dir=idx)
    with pytest.raises(ValueError, match="different parameters"):
        knn_ivf(SF, n_queries=2, k=3, n_centroids=8, index_dir=idx)


def test_neardup_paths_handle_empty_results(tmp_path):
    """Review regression: the DEFAULT distributed paths must return typed
    empty tables (not crash) when no pairs survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from fscrawler_ray.pipelines.dedup import minhash_lsh_pairs, phash_neardup_pairs, simhash_pairs

    # phash: mutually distant hashes -> all-singleton buckets
    t = pa.table({"image_id": pa.array([f"i{k}" for k in range(6)]),
                  "phash": pa.array([k * 0x1111111111111111 for k in range(6)], pa.int64())})
    out = phash_neardup_pairs(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 0 and list(out.columns) == ["image_a", "image_b", "hamming"]

    # minhash: shingle-less docs collide in buckets but verify to nothing
    d = tmp_path / "tiny"; d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": pa.array(["ab", "cd"])}), d / "documents.parquet")
    out = minhash_lsh_pairs(str(d)).to_pandas()
    assert len(out) == 0 and list(out.columns) == ["doc_a", "doc_b", "jaccard"]
    out = simhash_pairs(str(d)).to_pandas()
    assert len(out) == 0


def test_join_fuzz_against_pandas():
    """Property fuzz: broadcast_join and copartition_join must both agree
    with a plain pandas merge on random tables (dup keys, missing keys,
    string values, both join types)."""
    import pandas as pd
    import pyarrow as pa
    import ray
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fscrawler_ray.stages.joins import broadcast_join, copartition_join

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(0, 6), min_size=0, max_size=12),   # left keys
        st.lists(st.integers(0, 6), min_size=0, max_size=6),    # right keys
        st.sampled_from(["inner", "left", "outer"]),
    )
    def check(lk, rk, how):
        left = pa.table({"k": pa.array(lk, pa.int64()),
                         "lv": pa.array([f"l{i}" for i in range(len(lk))])})
        rk_u = list(dict.fromkeys(rk))  # unique right keys (dimension side)
        right = pa.table({"k": pa.array(rk_u, pa.int64()),
                          "rv": pa.array([i * 10 for i in range(len(rk_u))], pa.int64())})
        want = left.to_pandas().merge(right.to_pandas(), on="k", how=how)

        def key(df):
            df = df.fillna(-999)[sorted(df.columns)].copy()
            for c in df.columns:  # nullable Int64 vs float64 must compare equal
                if pd.api.types.is_numeric_dtype(df[c].dtype):
                    df[c] = df[c].astype("float64")
            return sorted(map(tuple, df.astype(str).to_numpy().tolist()))

        if len(lk) and how != "outer":  # broadcast cannot express full outer
            bc = broadcast_join(ray.data.from_arrow(left), right, on="k", how=how).to_pandas()
            assert key(bc) == key(want), (how, "broadcast")
        if len(lk) and len(rk_u):
            cp = copartition_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                                  on="k", how=how, n_partitions=3).to_pandas()
            assert key(cp) == key(want), (how, "copartition")

    check()


def test_knn_int8_recall_vs_fp32():
    """int8 quantization of 64-dim normalized vectors keeps ~1/255
    per-dim error — top-10 recall vs the exact fp32 path stays high."""
    from fscrawler_ray.pipelines.similarity import knn_bruteforce, knn_int8

    sf = "/root/testdata/sf0.001"
    fp = knn_bruteforce(sf).to_pandas()
    q8 = knn_int8(sf).to_pandas()
    recalls = []
    for qid in fp["query_id"].unique():
        a = set(fp.loc[fp["query_id"] == qid, "vec_id"])
        b = set(q8.loc[q8["query_id"] == qid, "vec_id"])
        recalls.append(len(a & b) / len(a))
    assert sum(recalls) / len(recalls) >= 0.8


def test_quantize_int8_bounds_and_reconstruction():
    import numpy as np

    from fscrawler_ray.pipelines.similarity import quantize_int8

    rng = np.random.default_rng(1)
    v = rng.normal(size=(50, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    codes, scales = quantize_int8(v)
    assert codes.dtype == np.int8 and np.abs(codes).max() <= 127
    rec = codes.astype(np.float64) * scales[:, None]
    # reconstruction error bounded by half a quantization step per dim
    assert np.abs(rec - v).max() <= (scales.max() / 2) + 1e-12
    # cosine approximation error small
    cos_t = v[0] @ v[1]
    cos_q = (codes[0].astype(np.int32) @ codes[1].astype(np.int32)) * scales[0] * scales[1]
    assert abs(cos_t - cos_q) < 0.02


def test_validate_docs_planted_violations(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.analytics import q_validate_docs

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 2, 3, 4], pa.int64()),  # dup id 2
                "text": pa.array(["abc", None, "xy", "12345", "ok"]),
                "lang": pa.array(["en", "fr", "xx", "de", "zz"]),  # 2 unknown
                "n_chars": pa.array([3, 0, 2, 99, 2], pa.int64()),  # 0-len + mismatch
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = q_validate_docs(str(tmp_path)).to_pandas().set_index("rule")["violations"]
    assert df.to_dict() == {
        "null_text": 1,
        "nonpositive_len": 1,
        # null text → COALESCE('') len 0 vs n_chars 0 agrees; '12345' vs 99 disagrees
        "len_mismatch": 1,
        "unknown_lang": 2,
        "dup_doc_id": 1,
    }


def test_orphan_orders_planted(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.analytics import q_orphan_orders

    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 7, 2], pa.int64()),
                "o_orderstatus": pa.array(["O", "F", "F", "O"]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2], pa.int64())}), tmp_path / "customer.parquet")
    df = q_orphan_orders(str(tmp_path)).to_pandas().set_index("o_orderstatus")
    assert (df.loc["O", "matched"], df.loc["O", "orphans"]) == (2, 0)
    assert (df.loc["F", "matched"], df.loc["F", "orphans"]) == (1, 1)


def test_minhash_md5_twin_matches_lsh_semantics(tmp_path):
    """The SQL-replayable md5 MinHash twin: (a) mod-P permutation kernel is
    exact vs arbitrary-precision ints, (b) surfaces the planted near-dup,
    (c) its pair set is a SUBSET of the exact shared-shingle join (LSH can
    only miss, never invent — verification is exact) with full recall on
    the high-jaccard planted pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.functions.text import MERSENNE61, mh_perm_consts, mulmod61
    from fscrawler_ray.pipelines.dedup import minhash_md5_pairs, ngram_jaccard_exact

    rng = np.random.default_rng(3)
    xs = np.concatenate(
        [
            rng.integers(0, MERSENNE61, 500, dtype=np.uint64),
            np.array([0, 1, MERSENNE61 - 1], dtype=np.uint64),
        ]
    )
    a_c, b_c = mh_perm_consts(8)
    assert (a_c >= 1).all() and (a_c < 1 << 31).all() and (b_c < MERSENNE61).all()
    for a in [1, (1 << 31) - 1, int(a_c[5])]:
        ref = (a * xs.astype(object)) % MERSENNE61
        assert (mulmod61(a, xs).astype(object) == ref).all()

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches from the warm "
        "windowsill and the rain falls gently on the quiet empty street below the old clock tower"
    )
    near = base.replace("rain", "snow")
    texts = [base, near] + [
        f"unrelated document number {i} about systems " + " ".join(f"w{i}{j}" for j in range(25))
        for i in range(30)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "mini_md5"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = minhash_md5_pairs(str(d)).to_pandas()
    assert ((got["doc_a"] == 0) & (got["doc_b"] == 1)).any()
    assert (got["jaccard"] >= 0.5).all()
    exact = ngram_jaccard_exact(str(d)).to_pandas()
    sg = set(zip(got["doc_a"], got["doc_b"]))
    se = set(zip(exact["doc_a"], exact["doc_b"]))
    assert sg <= se


def test_mmr_diversity(tmp_path):
    """MMR demotes redundancy: with a tight cluster of near-identical
    high-relevance vectors and one distinct moderately-relevant vector,
    plain kNN fills the top with the cluster while MMR's second pick is
    the distinct vector."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.similarity import mmr_topk

    rng = np.random.default_rng(5)
    d = 8
    q = np.zeros(d); q[0] = 1.0
    e2 = np.zeros(d); e2[1] = 1.0
    e3 = np.zeros(d); e3[2] = 1.0
    rows = [(0, q)]  # vec_id 0 is the query (first by vec_id order)
    # tight cluster at sim≈0.9 to q, mutually ≈1.0 (pure redundancy)
    for i in range(1, 6):
        rows.append((i, 0.9 * q + 0.436 * e2 + 0.0005 * i * e3))
    # distinct direction at sim≈0.88 to q but only ≈0.79 to the cluster:
    # λ=0.7 MMR prefers it over a second clone
    rows.append((6, 0.88 * q + 0.475 * e3))
    # anti-relevant filler (sim to q ≈ −1): fills the shortlist without
    # ever out-scoring the planted vectors
    for i in range(7, 40):
        rows.append((i, -q + 0.05 * rng.normal(size=d)))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([list(map(float, r[1])) for r in rows], pa.list_(pa.float64())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = mmr_topk(str(tmp_path), n_queries=1, k=4).to_pandas()
    picks = out[out["query_id"] == 0].sort_values("mmr_rank")["vec_id"].tolist()
    assert picks[0] in range(1, 6)  # most relevant: a cluster member
    assert picks[1] == 6  # diversity: the distinct vector beats the clones


def test_rows_only_reasons_complete():
    """Every queries() entry without an oracle_sql() twin must carry a
    stated reason in ROWS_ONLY_REASONS (and no stale reasons linger) —
    the rows-only surface is documented, not accidental (VERDICT r04 #7)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    rows_only = set(m.queries()) - set(m.oracle_sql())
    documented = set(m.ROWS_ONLY_REASONS)
    assert rows_only == documented, (
        f"undocumented rows-only: {sorted(rows_only - documented)}; "
        f"stale reasons: {sorted(documented - rows_only)}"
    )


def test_adaptive_budget_planted(tmp_path, ray_session):
    """Clamp + quantile arithmetic on planted per-host size profiles:
    tiny payloads hit the max-budget clamp, huge ones the min clamp, and
    a mid host gets exactly target // p87."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fscrawler_ray.pipelines.crawl_report import adaptive_budget

    rows = []
    rows += [("tiny.example", 10)] * 8            # p87 = 10 -> clamped to 256
    rows += [("huge.example", 10_000_000)] * 8    # budget floor 4
    rows += [("mid.example", 100_000)] * 7 + [("mid.example", 200_000)]
    # ceil(7*8/8) = 7 -> rank 7 of sorted sizes = 100_000 -> 4_000_000 // 100_000 = 40
    t = pa.table(
        {
            "host": pa.array([h for h, _ in rows]),
            "size": pa.array([s for _, s in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "part-0.parquet")
    out = adaptive_budget(str(tmp_path)).to_pandas().set_index("host")
    assert out.loc["tiny.example", "budget"] == 256
    assert out.loc["huge.example", "budget"] == 4
    assert out.loc["mid.example", "p87_size"] == 100_000
    assert out.loc["mid.example", "budget"] == 40
    assert (out["n_urls"] == 8).all()
